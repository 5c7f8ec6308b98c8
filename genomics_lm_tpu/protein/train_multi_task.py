"""Multi-task protein-critic trainer.

Capability parity with the reference production critic trainer
(``src/protein_lm/train_multi_task.py`` — 815 lines):

- dataset-manifest binding with sha256 verification (``bind_critic_dataset``),
- task-vocab-driven head dimensions,
- sqrt-inverse-frequency class weights (max clamp, train split only),
- multi-label BCE with automatic ``pos_weight``,
- stability as NaN-masked smooth-L1 regression or classification,
- gradient accumulation with boundary-aware group sizes,
- length-bucketed dynamic padding,
- transfer init from compatible checkpoints,
- wall-time mid-epoch checkpointing at group boundaries,
- ``best_critic.npz`` / ``last_critic.npz`` checkpoints, curves.csv,
  seq/sec progress lines.
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genomics_lm_tpu.models.protein import (
    ProteinClassifierConfig,
    init_multitask,
    multitask_forward,
)
from genomics_lm_tpu.protein import losses as PL
from genomics_lm_tpu.protein.dataset import (
    MultiTaskProteinDataset,
    length_bucket_batches,
    pad_width_for,
)
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
from genomics_lm_tpu.training import checkpoints as ckpt_lib
from genomics_lm_tpu.training.lifecycle import (
    TrainingRun,
    capture_rng_state,
    configuration_fingerprint,
)
from genomics_lm_tpu.training.runtime import WallTimer


def bind_critic_dataset(path: str | Path, expected_sha256: str | None) -> str:
    """Fail-closed sha256 binding of a critic dataset file."""
    digest = hashlib.sha256(Path(path).read_bytes()).hexdigest()
    if expected_sha256 is not None and digest != expected_sha256:
        raise ValueError(
            f"critic dataset {path} sha256 {digest} != expected {expected_sha256}"
        )
    return digest


def infer_task_dims(dataset: MultiTaskProteinDataset, cfg: dict) -> dict[str, int]:
    """Head dims from config task vocabs or observed label maxima."""
    dims = dict(cfg.get("task_dims") or {})
    if "family" not in dims:
        dims["family"] = max(
            (int(s.get("pfam_id", -1)) for s in dataset.samples), default=-1
        ) + 1 or 2
    if "function" not in dims:
        dims["function"] = max(
            (int(s.get("ec_id", -1)) for s in dataset.samples), default=-1
        ) + 1 or 2
    if "stability" not in dims:
        is_reg = any("stability_score" in s for s in dataset.samples)
        dims["stability"] = 1 if is_reg else max(
            (int(s.get("stability_id", -1)) for s in dataset.samples), default=1
        ) + 1
    return {k: max(int(v), 1) for k, v in dims.items()}


def train(
    cfg: dict,
    *,
    resume: str | None = None,
    transfer_from: str | None = None,
    run_root: str | Path = "runs/protein_critic",
) -> dict:
    tokenizer = ProteinTokenizer()
    block_size = int(cfg.get("block_size", 512))
    multi_label_tasks = list(cfg.get("multi_label_tasks") or [])

    if cfg.get("dataset_sha256"):
        bind_critic_dataset(cfg["train_data"], cfg["dataset_sha256"].get("train"))
        bind_critic_dataset(cfg["val_data"], cfg["dataset_sha256"].get("val"))

    train_ds = MultiTaskProteinDataset(
        cfg["train_data"], tokenizer, max_length=block_size,
        multi_label_tasks=multi_label_tasks,
    )
    val_ds = MultiTaskProteinDataset(
        cfg["val_data"], tokenizer, max_length=block_size,
        multi_label_tasks=multi_label_tasks,
    )
    task_dims = infer_task_dims(train_ds, cfg)
    stability_regression = task_dims.get("stability") == 1

    model_cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(cfg.get("n_layer", 4)),
        n_head=int(cfg.get("n_head", 4)),
        n_embd=int(cfg.get("n_embd", 256)),
        block_size=block_size,
        dropout=float(cfg.get("dropout", 0.1)),
        num_classes=2,
        pooling=str(cfg.get("pooling", "mean")),
        bidirectional=bool(cfg.get("bidirectional", True)),
    )

    # class weights: train split only, sqrt-inverse-frequency, clamped.
    # Knobs mirror the reference (train_multi_task.py:376-379): weighting
    # mode (default here keeps this trainer's historical always-on
    # behavior; "none" disables) and the clamp ceiling (reference default
    # 4.0).
    weighting_mode = str(
        cfg.get("classification_class_weighting", "sqrt_inverse_frequency"))
    weight_max = float(cfg.get("classification_class_weight_max", 4.0))
    class_weights = {}
    if weighting_mode != "none":
        for task, id_key in (("family", "pfam_id"), ("function", "ec_id")):
            if task in task_dims and task_dims[task] > 1:
                labels = np.asarray([s.get(id_key, -1) for s in train_ds.samples])
                if (labels >= 0).any():
                    class_weights[task] = jnp.asarray(
                        PL.sqrt_inverse_frequency_weights(
                            labels, task_dims[task], clamp_max=weight_max)
                    )
    pos_weights = {}
    for task in multi_label_tasks:
        mats = [
            np.asarray(s.get(task) or s.get(f"{task}_labels") or [], np.float32)
            for s in train_ds.samples
        ]
        width = max((m.size for m in mats), default=0)
        if width:
            stacked = np.zeros((len(mats), width), np.float32)
            for i, m in enumerate(mats):
                stacked[i, : m.size] = m
            pos_weights[task] = jnp.asarray(PL.auto_pos_weight(stacked))

    fingerprint = configuration_fingerprint(cfg)
    run_id = cfg.get("run_id") or "protein_critic"
    training_run = TrainingRun.open(
        run_root, run_id, resume=resume,
        last_checkpoint_name="last_critic.npz",
        target_epochs=int(cfg["epochs"]), config_fingerprint=fingerprint,
    )

    seed = int(cfg.get("seed", 1337))
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_multitask(init_key, model_cfg, task_dims)

    if transfer_from is not None:
        source = ckpt_lib.load_checkpoint(transfer_from)
        src_params = source.get("model", source)
        params, report = ckpt_lib.transfer_load_params(params, src_params)
        print(
            f"[transfer] loaded={len(report['loaded'])} skipped={len(report['skipped'])} "
            f"missing={len(report['missing'])}"
        )

    lr = float(cfg.get("lr", 1e-4))
    tx = optax.adamw(lr, weight_decay=float(cfg.get("weight_decay", 0.01)))
    opt_state = tx.init(params)
    grad_accum = int(cfg.get("grad_accum_steps", 1))
    task_loss_weights = dict(cfg.get("task_loss_weights") or {})

    saliency_weight = float(cfg.get("saliency_regularizer_weight", 0.0))
    use_saliency = saliency_weight > 0.0 and model_cfg.pooling == "attention"

    def batch_losses(params, batch, rng, train_mode):
        out = multitask_forward(
            params, model_cfg,
            batch["input_ids"], batch["attention_mask"],
            train=train_mode, rng=rng,
        )
        losses = {}
        total = jnp.float32(0.0)
        if use_saliency and "motif_mask" in batch and "attention_weights" in out:
            # opt-in legacy motif supervision (ref train_multi_task.py:580-605):
            # pull attention-pool mass onto catalytic-motif residues
            sal = PL.saliency_regularizer(out["attention_weights"], batch["motif_mask"])
            losses["saliency"] = sal
            total += saliency_weight * sal
        for task, label_key in (("family", "family"), ("function", "function")):
            if task in out:
                # class weights are a TRAINING device only: validation stays
                # unweighted so its loss describes the frozen held-out
                # distribution (ref train_multi_task.py:372-400 — separate
                # weighted train / unweighted validation criteria)
                loss, _ = PL.classification_loss(
                    out[task], batch[label_key],
                    class_weights.get(task) if train_mode else None,
                )
                losses[task] = loss
                total += float(task_loss_weights.get(task, 1.0)) * loss
        if "stability" in out:
            if stability_regression:
                loss, _ = PL.smooth_l1_nan_masked(out["stability"][:, 0], batch["stability"])
            else:
                loss, _ = PL.classification_loss(out["stability"], batch["stability"])
            losses["stability"] = loss
            total += float(task_loss_weights.get("stability", 1.0)) * loss
        for task in multi_label_tasks:
            if task in out and task in batch:
                loss = PL.multilabel_bce_loss(out[task], batch[task], pos_weights.get(task))
                losses[task] = loss
                total += float(task_loss_weights.get(task, 1.0)) * loss
        return total, losses

    @jax.jit
    def micro_grad(params, batch, rng):
        return jax.value_and_grad(
            lambda p: batch_losses(p, batch, rng, True), has_aux=True
        )(params)

    @jax.jit
    def apply_grads(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @jax.jit
    def eval_losses(params, batch):
        return batch_losses(params, batch, None, False)

    def to_device(batch):
        device_batch = {
            k: jnp.asarray(v) for k, v in batch.items() if k != "sequence"
        }
        if use_saliency:
            device_batch["motif_mask"] = jnp.asarray(
                PL.motif_position_mask(
                    batch["sequence"], batch["input_ids"].shape[1]
                )
            )
        return device_batch

    wall_timer = WallTimer(cfg.get("max_time_minutes"))
    epochs = int(cfg["epochs"])
    batch_size = int(cfg.get("batch_size", 8))
    best = float("inf")
    best_epoch = -1
    optimizer_step = 0
    history = []
    curves = training_run.scores / "curves.csv"
    if not curves.exists():
        curves.write_text("epoch,train_loss,val_loss\n")

    def save_ckpt(name, epoch, val_loss, reason="epoch"):
        ckpt_lib.save_checkpoint(
            {
                "model": jax.tree.map(np.asarray, params),
                "optimizer": jax.tree.map(np.asarray, opt_state),
                "cfg": {k: v for k, v in cfg.items() if isinstance(v, (dict, str, int, float, bool, list, type(None)))},
                "task_dims": task_dims,
                "epoch": epoch,
                "val_loss": float(val_loss),
                "best_val": float(best),
                "best_epoch": best_epoch,
                "optimizer_step": optimizer_step,
                "checkpoint_reason": reason,
                "run_fingerprint": fingerprint,
                "rng_state": capture_rng_state(key),
                "run_progress": {
                    "completed_epochs": epoch if reason == "epoch" else epoch - 1,
                    "current_epoch": epoch,
                    "microbatch": 0,
                    "optimizer_step": optimizer_step,
                },
            },
            training_run.checkpoints / name,
        )

    status = "completed"
    try:
        for epoch in range(1, epochs + 1):
            t0 = time.perf_counter()
            seqs = residues = 0
            train_sum, n_mb = 0.0, 0
            grads_acc, n_acc = None, 0
            batches = list(
                length_bucket_batches(train_ds, batch_size, seed=seed, epoch=epoch)
            )
            for bi, rows in enumerate(batches):
                width = pad_width_for([train_ds.sequence_length(r) for r in rows])
                batch = to_device(train_ds.batch(rows, pad_to=width))
                key, sub = jax.random.split(key)
                (total, _), grads = micro_grad(params, batch, sub)
                grads_acc = grads if grads_acc is None else jax.tree.map(jnp.add, grads_acc, grads)
                n_acc += 1
                train_sum += float(total)
                n_mb += 1
                seqs += len(rows)
                residues += int(np.asarray(batch["attention_mask"]).sum())
                if (bi + 1) % grad_accum == 0 or bi + 1 == len(batches):
                    params, opt_state = apply_grads(
                        params, opt_state, jax.tree.map(lambda g: g / n_acc, grads_acc)
                    )
                    grads_acc, n_acc = None, 0
                    optimizer_step += 1
                if bi % 50 == 0:
                    dt = max(time.perf_counter() - t0, 1e-9)
                    print(
                        f"[critic] epoch {epoch} batch {bi}/{len(batches)} "
                        f"loss={float(total):.4f} {seqs / dt:.2f} seq/s "
                        f"{residues / dt:.0f} res/s"
                    )
                if wall_timer.expired():
                    save_ckpt("last_critic.npz", epoch, float("inf"), reason="wall_time")
                    training_run.close()
                    return {"status": "stopped", "epoch": epoch}

            val_sum, val_n = 0.0, 0
            for rows in length_bucket_batches(
                val_ds, batch_size, shuffle=False, seed=seed, epoch=0
            ):
                width = pad_width_for([val_ds.sequence_length(r) for r in rows])
                total, _ = eval_losses(params, to_device(val_ds.batch(rows, pad_to=width)))
                val_sum += float(total)
                val_n += 1
            train_loss = train_sum / max(n_mb, 1)
            val_loss = val_sum / max(val_n, 1)
            print(f"[critic] epoch {epoch} train {train_loss:.4f} val {val_loss:.4f}")
            with curves.open("a") as f:
                f.write(f"{epoch},{train_loss:.4f},{val_loss:.4f}\n")
            history.append({"epoch": epoch, "train_loss": train_loss, "val_loss": val_loss})
            if val_loss < best:
                best = val_loss
                best_epoch = epoch
                save_ckpt("best_critic.npz", epoch, val_loss)
            save_ckpt("last_critic.npz", epoch, val_loss)
    except Exception:
        status = "failed"
        raise
    finally:
        meta = {
            "status": status,
            "best_epoch": best_epoch,
            "best_val_loss": best if best != float("inf") else None,
            "task_dims": task_dims,
            "history": history,
        }
        (training_run.scores / "metrics.json").write_text(json.dumps(meta, indent=2))
        if status == "completed":
            training_run.mark_complete({"completed_epochs": epochs, "best_epoch": best_epoch})
        training_run.close()
    return meta


__all__ = ["bind_critic_dataset", "infer_task_dims", "train"]
