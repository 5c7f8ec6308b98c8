"""NoProp trainer: layer-local denoising with lifecycle integration.

Parity: reference ``src/codonlm/train_noprop.py`` — vocabulary contract +
TrainingRun integration, per-epoch train/val CE curves, noisy target
embeddings with configurable sigma. The per-block optimizers of the
reference collapse to one AdamW over the stop-gradient-isolated loss (see
``models/noprop.py`` for the equivalence argument).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genomics_lm_tpu.data import vocabulary as vocab_lib
from genomics_lm_tpu.data.datasets import EpochPlan, PackedDataset
from genomics_lm_tpu.models import CodonGPTConfig, noprop
from genomics_lm_tpu.ops.losses import cross_entropy
from genomics_lm_tpu.training import checkpoints as ckpt_lib
from genomics_lm_tpu.training.config import ensure_path_list
from genomics_lm_tpu.training.lifecycle import (
    TrainingRun,
    capture_rng_state,
    configuration_fingerprint,
)


def run_training(
    cfg: dict,
    *,
    noise_sigma: float = 0.1,
    run_id: str | None = None,
    resume: str | None = None,
    run_root: str | Path = "runs",
) -> dict:
    train_paths = ensure_path_list(None, cfg.get("train_npz"), "train_npz")
    val_paths = ensure_path_list(None, cfg.get("val_npz"), "val_npz")
    contract = vocab_lib.resolve_vocabulary_contract(
        [*train_paths, *val_paths],
        configured_path=cfg.get("itos_path"),
        configured_size=cfg.get("vocab_size"),
    )
    cfg = dict(cfg)
    cfg["vocab_size"] = contract.size

    epochs = int(cfg.get("epochs", 5))
    fingerprint = configuration_fingerprint({**cfg, "noise_sigma": noise_sigma})
    training_run = TrainingRun.open(
        run_root, run_id or cfg.get("run_id") or "noprop",
        resume=resume, target_epochs=epochs, config_fingerprint=fingerprint,
    )
    snapshot = vocab_lib.snapshot_vocabulary(contract, training_run.run_dir / "itos.txt")
    vocab_lib.write_vocabulary_manifest(
        contract.provenance(snapshot), training_run.run_dir / "vocabulary.json"
    )

    model_cfg = CodonGPTConfig(
        vocab_size=contract.size,
        block_size=int(cfg["block_size"]),
        n_layer=int(cfg.get("n_layer", 3)),
        n_head=int(cfg.get("n_head", 4)),
        n_embd=int(cfg.get("n_embd", 256)),
        dropout=float(cfg.get("dropout", 0.1)),
        sep_id=3 if cfg.get("sep_mask_enabled", True) else None,
    )
    train_ds = PackedDataset(train_paths)
    val_ds = PackedDataset(val_paths)
    batch_size = int(cfg["batch_size"])
    seed = int(cfg.get("seed", 1337))

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = noprop.init(init_key, model_cfg)
    lr = float(cfg.get("learning_rate", 5e-4))
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, xb, yb, rng):
        (total, parts), grads = jax.value_and_grad(
            lambda p: noprop.noprop_loss(
                p, model_cfg, xb, yb, rng, noise_sigma=noise_sigma
            ),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, parts["ce"]

    @jax.jit
    def val_ce(params, xb, yb):
        logits, _ = noprop.forward(params, model_cfg, xb)
        return cross_entropy(logits, yb, ignore_index=0)

    start_epoch = 1
    best = float("inf")
    if resume:
        payload = ckpt_lib.load_checkpoint(resume)
        params = jax.tree.map(jnp.asarray, payload["model"])
        best = float(payload.get("best_val_loss", float("inf")))
        start_epoch = int(payload["epoch"]) + 1

    curves = training_run.scores / "curves.csv"
    if not curves.exists():
        curves.write_text("epoch,train_ce,val_ce\n")

    history = []
    for epoch in range(start_epoch, epochs + 1):
        plan = EpochPlan(train_ds, batch_size=batch_size, seed=seed, epoch=epoch)
        ce_sum, n = 0.0, 0
        for x, y in plan.microbatches():
            key, sub = jax.random.split(key)
            params, opt_state, ce = train_step(
                params, opt_state, jnp.asarray(x), jnp.asarray(y), sub
            )
            ce_sum += float(ce)
            n += 1
        val_plan = EpochPlan(val_ds, batch_size=batch_size, seed=seed, epoch=0, shuffle=False)
        val_sum, vn = 0.0, 0
        for x, y in val_plan.microbatches():
            val_sum += float(val_ce(params, jnp.asarray(x), jnp.asarray(y)))
            vn += 1
        train_loss = ce_sum / max(n, 1)
        val_loss = val_sum / max(vn, 1)
        print(f"[noprop] epoch {epoch} train_ce {train_loss:.4f} val_ce {val_loss:.4f}")
        with curves.open("a") as f:
            f.write(f"{epoch},{train_loss:.4f},{val_loss:.4f}\n")
        history.append({"epoch": epoch, "train_ce": train_loss, "val_ce": val_loss})
        payload = {
            "model": jax.tree.map(np.asarray, params),
            "cfg": cfg,
            "epoch": epoch,
            "val_loss": val_loss,
            "best_val_loss": min(best, val_loss),
            "noise_sigma": noise_sigma,
            "rng_state": capture_rng_state(key),
            "run_fingerprint": fingerprint,
            "run_progress": {"completed_epochs": epoch, "current_epoch": epoch,
                             "microbatch": 0, "optimizer_step": epoch * max(n, 1)},
        }
        ckpt_lib.save_checkpoint(payload, training_run.checkpoints / "last.npz")
        if val_loss < best:
            best = val_loss
            ckpt_lib.save_checkpoint(payload, training_run.checkpoints / "best.npz")

    meta = {"status": "completed", "best_val_loss": best, "history": history}
    (training_run.scores / "metrics.json").write_text(json.dumps(meta, indent=2))
    training_run.mark_complete({"completed_epochs": epochs})
    training_run.close()
    return meta


__all__ = ["run_training"]
