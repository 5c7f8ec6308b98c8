"""Protein LM trainer: next-token CE with cosine annealing and lifecycle.

Parity: reference ``src/protein_lm/train_lm.py`` — CE (ignore PAD) on
shift-by-one targets, AdamW + per-epoch CosineAnnealingLR, grad accumulation
with boundary stepping, periodic/wall-time/epoch checkpoints, TrainingRun
lifecycle integration, per-epoch-seeded shuffling.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genomics_lm_tpu.models.protein import (
    ProteinLMConfig,
    init_protein_lm,
    protein_lm_forward,
)
from genomics_lm_tpu.ops.losses import cross_entropy
from genomics_lm_tpu.protein.data import encode_dataset
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
from genomics_lm_tpu.training import checkpoints as ckpt_lib
from genomics_lm_tpu.training.lifecycle import (
    TrainingRun,
    capture_rng_state,
    configuration_fingerprint,
)
from genomics_lm_tpu.training.runtime import WallTimer


def train(
    config: dict,
    *,
    resume: str | None = None,
    run_id: str | None = None,
    run_root: str | Path = "runs/protein_lm",
) -> dict:
    """Train from a config dict with ``model:``, ``training:``, ``data:``."""
    model_cfg_map = config.get("model", {})
    training_cfg = config.get("training", {})
    data_cfg = config.get("data", {})
    tokenizer = ProteinTokenizer()
    cfg = ProteinLMConfig(
        vocab_size=len(tokenizer),
        n_layer=int(model_cfg_map.get("n_layer", 4)),
        n_head=int(model_cfg_map.get("n_head", 4)),
        n_embd=int(model_cfg_map.get("n_embd", 256)),
        block_size=int(model_cfg_map.get("block_size", 512)),
        dropout=float(model_cfg_map.get("dropout", 0.1)),
    )
    epochs = int(training_cfg["epochs"])
    batch_size = int(training_cfg["batch_size"])
    grad_accum = int(training_cfg.get("grad_accum_steps", 1))
    seed = int(training_cfg.get("seed", 1337))

    fingerprint = configuration_fingerprint(config)
    requested = run_id or config.get("run_id") or "protein_lm"
    training_run = TrainingRun.open(
        run_root, requested, resume=resume,
        target_epochs=epochs, config_fingerprint=fingerprint,
    )

    train_data = encode_dataset(data_cfg["train_path"], tokenizer, cfg.block_size)
    val_data = encode_dataset(data_cfg["val_path"], tokenizer, cfg.block_size)

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_protein_lm(init_key, cfg)
    base_lr = float(training_cfg["lr"])
    # per-epoch cosine annealing (torch CosineAnnealingLR(T_max=epochs))
    schedule = lambda ep: base_lr * 0.5 * (1 + math.cos(math.pi * min(ep, epochs) / epochs))  # noqa: E731
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=base_lr,
        weight_decay=float(training_cfg.get("weight_decay", 0.01)),
    )
    opt_state = tx.init(params)

    @jax.jit
    def micro_grad(params, batch, rng):
        def loss_fn(p):
            logits = protein_lm_forward(p, cfg, batch[:, :-1], train=True, rng=rng)
            return cross_entropy(
                logits, batch[:, 1:], ignore_index=tokenizer.pad_token_id
            )

        return jax.value_and_grad(loss_fn)(params)

    @jax.jit
    def apply_grads(params, opt_state, grads, lr):
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @jax.jit
    def eval_loss(params, batch):
        logits = protein_lm_forward(params, cfg, batch[:, :-1])
        return cross_entropy(logits, batch[:, 1:], ignore_index=tokenizer.pad_token_id)

    optimizer_step = 0
    start_epoch = 0
    current_microbatch = 0
    if resume:
        payload = ckpt_lib.load_checkpoint(resume)
        params = jax.tree.map(jnp.asarray, payload["model_state_dict"])
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state),
            [jnp.asarray(x) for x in jax.tree.leaves(payload["optimizer_state_dict"])],
        )
        optimizer_step = int(payload.get("optimizer_step", 0))
        start_epoch = int(payload["epoch"]) + (1 if payload.get("epoch_complete", True) else 0)

    wall_timer = WallTimer(training_cfg.get("max_time_minutes"))

    def save_ckpt(path, epoch, loss, reason):
        complete = reason == "epoch"
        ckpt_lib.save_checkpoint(
            {
                "epoch": epoch,
                "epoch_complete": complete,
                "microbatch_idx": 0 if complete else current_microbatch,
                "model_state_dict": jax.tree.map(np.asarray, params),
                "optimizer_state_dict": jax.tree.map(np.asarray, opt_state),
                "loss": float(loss),
                "optimizer_step": optimizer_step,
                "checkpoint_reason": reason,
                "cfg": {k: v for k, v in config.items() if isinstance(v, (dict, str, int, float, bool, list, type(None)))},
                "run_fingerprint": fingerprint,
                "rng_state": capture_rng_state(key),
                "run_progress": {
                    "completed_epochs": epoch + 1 if complete else epoch,
                    "current_epoch": epoch + 1,
                    "microbatch": 0 if complete else current_microbatch,
                    "optimizer_step": optimizer_step,
                },
            },
            path,
        )

    history = []
    stopped = False
    for epoch in range(start_epoch, epochs):
        order = np.random.default_rng(seed + epoch).permutation(len(train_data))
        grads_acc = None
        n_acc = 0
        lr_now = schedule(epoch)
        n_batches = math.ceil(len(order) / batch_size)
        for index in range(n_batches):
            rows = order[index * batch_size : (index + 1) * batch_size]
            current_microbatch = index + 1
            key, sub = jax.random.split(key)
            loss, grads = micro_grad(params, jnp.asarray(train_data[rows]), sub)
            grads_acc = grads if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, grads
            )
            n_acc += 1
            boundary = (index + 1) % grad_accum == 0 or index + 1 == n_batches
            if boundary:
                grads_avg = jax.tree.map(lambda g: g / n_acc, grads_acc)
                params, opt_state = apply_grads(
                    params, opt_state, grads_avg, jnp.float32(lr_now)
                )
                grads_acc, n_acc = None, 0
                optimizer_step += 1
            if index % 100 == 0:
                print(f"Epoch {epoch + 1}/{epochs}, Step {index}, Loss: {float(loss):.4f}")
            if wall_timer.expired():
                save_ckpt(training_run.checkpoints / "last.npz", epoch, float("inf"), "wall_time")
                training_run.close()
                return {"status": "stopped", "epoch": epoch}

        val_losses = [
            float(eval_loss(params, jnp.asarray(val_data[i : i + batch_size])))
            for i in range(0, len(val_data), batch_size)
        ]
        val_loss = float(np.mean(val_losses)) if val_losses else float("inf")
        print(f"Epoch {epoch + 1}, Val Loss: {val_loss:.4f}")
        history.append({"epoch": epoch + 1, "val_loss": val_loss})
        save_ckpt(training_run.checkpoints / f"epoch_{epoch + 1:03d}.npz", epoch, val_loss, "epoch")
        save_ckpt(training_run.checkpoints / "last.npz", epoch, val_loss, "epoch")

    (training_run.scores / "metrics.json").write_text(json.dumps(history, indent=2))
    training_run.mark_complete({"completed_epochs": epochs})
    training_run.close()
    return {"status": "completed", "history": history}


__all__ = ["train"]
