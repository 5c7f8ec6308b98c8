"""Single-task protein classifier trainer (BOS-representation head).

Parity: reference ``src/protein_lm/train_classifier.py`` — bidirectional
backbone, CE on a single label key, AdamW, accuracy-tracked best checkpoint.
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
    classifier_forward,
    init_classifier,
)
from genomics_lm_tpu.ops.losses import cross_entropy
from genomics_lm_tpu.protein.dataset import (
    MultiTaskProteinDataset,
    length_bucket_batches,
    pad_width_for,
)
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
from genomics_lm_tpu.training import checkpoints as ckpt_lib
from genomics_lm_tpu.training.lifecycle import TrainingRun, configuration_fingerprint


def train(
    cfg: dict,
    *,
    label_key: str = "function",
    run_root: str | Path = "runs/protein_classifier",
    resume: str | None = None,
) -> dict:
    tokenizer = ProteinTokenizer()
    block_size = int(cfg.get("block_size", 512))
    train_ds = MultiTaskProteinDataset(cfg["train_data"], tokenizer, max_length=block_size)
    val_ds = MultiTaskProteinDataset(cfg["val_data"], tokenizer, max_length=block_size)

    labels = [int(s.get({"family": "pfam_id", "function": "ec_id",
                         "stability": "stability_id"}.get(label_key, label_key), -1))
              for s in train_ds.samples]
    num_classes = int(cfg.get("num_classes") or (max(labels) + 1 if labels else 2))

    model_cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(cfg.get("n_layer", 4)),
        n_head=int(cfg.get("n_head", 4)),
        n_embd=int(cfg.get("n_embd", 256)),
        block_size=block_size,
        dropout=float(cfg.get("dropout", 0.1)),
        num_classes=num_classes,
    )
    seed = int(cfg.get("seed", 1337))
    epochs = int(cfg["epochs"])
    batch_size = int(cfg.get("batch_size", 8))

    training_run = TrainingRun.open(
        run_root, cfg.get("run_id") or "protein_classifier",
        resume=resume, target_epochs=epochs,
        config_fingerprint=configuration_fingerprint(cfg),
    )

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_classifier(init_key, model_cfg)
    tx = optax.adamw(float(cfg.get("lr", 1e-4)), weight_decay=float(cfg.get("weight_decay", 0.01)))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, ids, mask, y, rng):
        def loss_fn(p):
            logits = classifier_forward(p, model_cfg, ids, mask, train=True, rng=rng)
            valid = y >= 0
            return cross_entropy(
                logits, jnp.where(valid, y, 0), ignore_index=None, valid_mask=valid
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, ids, mask):
        return jnp.argmax(classifier_forward(params, model_cfg, ids, mask), axis=-1)

    best_acc = -1.0
    history = []
    for epoch in range(1, epochs + 1):
        for rows in length_bucket_batches(train_ds, batch_size, seed=seed, epoch=epoch):
            width = pad_width_for([train_ds.sequence_length(r) for r in rows])
            batch = train_ds.batch(rows, pad_to=width)
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch[label_key]), sub,
            )
        correct = total = 0
        for rows in length_bucket_batches(val_ds, batch_size, shuffle=False, seed=seed, epoch=0):
            width = pad_width_for([val_ds.sequence_length(r) for r in rows])
            batch = val_ds.batch(rows, pad_to=width)
            y = batch[label_key]
            preds = np.asarray(predict(
                params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
            ))
            valid = y >= 0
            correct += int((preds[valid] == y[valid]).sum())
            total += int(valid.sum())
        acc = correct / max(total, 1)
        print(f"[classifier] epoch {epoch} loss {float(loss):.4f} val_acc {acc:.4f}")
        history.append({"epoch": epoch, "val_acc": acc})
        payload = {
            "model": jax.tree.map(np.asarray, params),
            "epoch": epoch,
            "val_acc": acc,
            "num_classes": num_classes,
            "label_key": label_key,
            "run_progress": {"completed_epochs": epoch, "current_epoch": epoch,
                             "microbatch": 0, "optimizer_step": epoch},
        }
        ckpt_lib.save_checkpoint(payload, training_run.checkpoints / "last.npz")
        if acc > best_acc:
            best_acc = acc
            ckpt_lib.save_checkpoint(payload, training_run.checkpoints / "best.npz")

    meta = {"status": "completed", "best_val_acc": best_acc, "history": history}
    (training_run.scores / "metrics.json").write_text(json.dumps(meta, indent=2))
    training_run.mark_complete({"completed_epochs": epochs})
    training_run.close()
    return meta


__all__ = ["train"]
