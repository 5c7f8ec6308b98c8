"""Standalone MLP heads over frozen critic features.

Parity: reference ``src/protein_lm/train_mlp_heads.py`` — extract frozen
backbone latents once, then train small per-task MLP heads on them (fast
head-only iteration without touching the backbone).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genomics_lm_tpu.models.protein import (
    ProteinClassifierConfig,
    extract_latent,
)
from genomics_lm_tpu.ops.losses import cross_entropy
from genomics_lm_tpu.protein.dataset import (
    MultiTaskProteinDataset,
    length_bucket_batches,
    pad_width_for,
)
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
from genomics_lm_tpu.training import checkpoints as ckpt_lib


def extract_features(critic_params, critic_cfg, dataset, *, batch_size=16):
    """Frozen bottleneck latents for every dataset record."""
    feats = np.zeros((len(dataset), critic_cfg.n_embd), np.float32)

    @jax.jit
    def latents(ids, mask):
        return extract_latent(critic_params, critic_cfg, ids, mask)

    for rows in length_bucket_batches(dataset, batch_size, shuffle=False):
        width = pad_width_for([dataset.sequence_length(r) for r in rows])
        batch = dataset.batch(rows, pad_to=width)
        z = np.asarray(
            latents(jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]))
        )
        feats[np.asarray(rows)] = z
    return feats


def train(
    cfg: dict,
    critic_ckpt: str | Path,
    *,
    tasks: dict[str, str] | None = None,
    hidden: int = 128,
    epochs: int = 20,
    lr: float = 1e-3,
    batch_size: int = 64,
    seed: int = 0,
    out_dir: str | Path = "runs/protein_mlp_heads",
) -> dict:
    """Train per-task MLP heads on frozen features; returns accuracy dict."""
    tokenizer = ProteinTokenizer()
    block_size = int(cfg.get("block_size", 512))
    tasks = tasks or {"family": "family", "function": "function"}

    payload = ckpt_lib.load_checkpoint(critic_ckpt)
    critic_params = jax.tree.map(jnp.asarray, payload.get("model", payload))
    critic_cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(cfg["n_layer"]), n_head=int(cfg["n_head"]),
        n_embd=int(cfg["n_embd"]), block_size=block_size,
        dropout=0.0, pooling=str(cfg.get("pooling", "mean")),
    )
    train_ds = MultiTaskProteinDataset(cfg["train_data"], tokenizer, max_length=block_size)
    val_ds = MultiTaskProteinDataset(cfg["val_data"], tokenizer, max_length=block_size)
    X_train = extract_features(critic_params, critic_cfg, train_ds)
    X_val = extract_features(critic_params, critic_cfg, val_ds)

    from genomics_lm_tpu.evals.probes import fit_mlp

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    report = {}
    for task, label_key in tasks.items():
        tb = train_ds.batch(list(range(len(train_ds))))
        vb = val_ds.batch(list(range(len(val_ds))))
        y_train = np.asarray(tb[label_key])
        y_val = np.asarray(vb[label_key])
        keep = y_train >= 0
        if keep.sum() < 2 or len(np.unique(y_train[keep])) < 2:
            report[task] = {"skipped": "insufficient labels"}
            continue
        result = fit_mlp(
            X_train[keep], y_train[keep], epochs=epochs, hidden=hidden,
            lr=lr, batch_size=batch_size, seed=seed,
        )
        vkeep = y_val >= 0
        if vkeep.any():
            preds, _ = result.predict_fn(X_val[vkeep])
            val_acc = float((preds == y_val[vkeep]).mean())
        else:
            val_acc = None
        report[task] = {"train_metrics": result.metrics, "val_accuracy": val_acc}
    (out_dir / "metrics.json").write_text(json.dumps(report, indent=2, default=str) + "\n")
    return report


__all__ = ["extract_features", "train"]
