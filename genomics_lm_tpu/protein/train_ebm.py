"""Latent EBM trainer: NCE over frozen-critic latents.

Parity: reference ``src/protein_lm/train_ebm.py`` — negatives are 20%%
random-substitution corruptions of each real sequence
(``corrupt_sequence`` :31-38), latents come from the frozen multi-task
critic backbone, and the loss is the softplus ranking objective
``mean(softplus(E_pos − E_neg))`` (:215). Checkpoints ``last_ebm.npz`` /
``best_ebm.npz`` with curves.csv.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genomics_lm_tpu.models.protein import (
    ProteinClassifierConfig,
    ebm_energy,
    extract_latent,
    init_ebm,
    init_multitask,
)
from genomics_lm_tpu.protein.dataset import (
    MultiTaskProteinDataset,
    length_bucket_batches,
    pad_width_for,
)
from genomics_lm_tpu.tokenizers.protein import AMINO_ACIDS, ProteinTokenizer
from genomics_lm_tpu.training import checkpoints as ckpt_lib
from genomics_lm_tpu.training.lifecycle import (
    TrainingRun,
    capture_rng_state,
    configuration_fingerprint,
)


def corrupt_sequence(seq: str, mutation_rate: float = 0.20, rng=None) -> str:
    """Random amino-acid substitutions at ``mutation_rate`` of positions."""
    rng = rng or random
    seq_list = list(seq)
    n_mutations = max(1, int(len(seq) * mutation_rate))
    indices = rng.sample(range(len(seq)), min(n_mutations, len(seq)))
    for idx in indices:
        seq_list[idx] = rng.choice(AMINO_ACIDS)
    return "".join(seq_list)


def _encode_batch(tokenizer, seqs, width):
    B = len(seqs)
    ids = np.full((B, width), tokenizer.pad_token_id, np.int32)
    mask = np.zeros((B, width), np.int32)
    for i, seq in enumerate(seqs):
        t = (
            [tokenizer.bos_token_id]
            + tokenizer.encode_sequence(seq)[: width - 2]
            + [tokenizer.eos_token_id]
        )
        ids[i, : len(t)] = t
        mask[i, : len(t)] = 1
    return ids, mask


def train(
    cfg: dict,
    critic_ckpt: str | Path,
    *,
    epochs: int = 5,
    lr: float = 1e-3,
    hidden_dim: int = 512,
    pooling: str = "attention",
    run_id: str = "protein_ebm",
    run_root: str | Path = "runs",
    resume: str | None = None,
    seed: int = 1337,
) -> dict:
    random.seed(seed)
    tokenizer = ProteinTokenizer()
    block_size = int(cfg.get("block_size", 512))

    critic_payload = ckpt_lib.load_checkpoint(critic_ckpt)
    critic_params = jax.tree.map(jnp.asarray, critic_payload.get("model", critic_payload))
    model_cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(cfg["n_layer"]),
        n_head=int(cfg["n_head"]),
        n_embd=int(cfg["n_embd"]),
        block_size=block_size,
        dropout=float(cfg.get("dropout", 0.1)),
        pooling=pooling,
        num_classes=2,
    )

    fingerprint = configuration_fingerprint(
        {**cfg, "critic_ckpt": str(Path(critic_ckpt).resolve()), "lr": lr,
         "pooling": pooling, "hidden_dim": hidden_dim, "seed": seed}
    )
    training_run = TrainingRun.open(
        run_root, run_id, resume=resume,
        last_checkpoint_name="last_ebm.npz",
        target_epochs=epochs, config_fingerprint=fingerprint,
    )

    train_ds = MultiTaskProteinDataset(cfg["train_data"], tokenizer, max_length=block_size)
    val_ds = MultiTaskProteinDataset(cfg["val_data"], tokenizer, max_length=block_size)
    batch_size = int(cfg.get("batch_size", 4))

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    ebm = init_ebm(init_key, n_embd=int(cfg["n_embd"]), hidden_dim=hidden_dim)
    tx = optax.adamw(lr, weight_decay=0.01)
    opt_state = tx.init(ebm)

    @jax.jit
    def latents(ids, mask):
        return extract_latent(critic_params, model_cfg, ids, mask)

    @jax.jit
    def nce_step(ebm, opt_state, z_pos, z_neg):
        def loss_fn(p):
            e_pos = ebm_energy(p, z_pos)
            e_neg = ebm_energy(p, z_neg)
            return jnp.mean(jax.nn.softplus(e_pos - e_neg)), (e_pos.mean(), e_neg.mean())

        (loss, (ep, en)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ebm)
        updates, opt_state = tx.update(grads, opt_state, ebm)
        return optax.apply_updates(ebm, updates), opt_state, loss, ep, en

    @jax.jit
    def nce_loss(ebm, z_pos, z_neg):
        return jnp.mean(jax.nn.softplus(ebm_energy(ebm, z_pos) - ebm_energy(ebm, z_neg)))

    curves = training_run.scores / "curves.csv"
    if not curves.exists():
        curves.write_text("epoch,train_loss,val_loss\n")
    best = float("inf")
    best_epoch = 0
    start_epoch = 1
    if resume:
        payload = ckpt_lib.load_checkpoint(resume)
        ebm = jax.tree.map(jnp.asarray, payload["model"])
        best = float(payload.get("best_val_loss", float("inf")))
        best_epoch = int(payload.get("best_epoch", 0))
        start_epoch = int(payload["epoch"]) + 1

    def epoch_pass(ds, epoch, train_mode):
        nonlocal ebm, opt_state
        total, n = 0.0, 0
        for rows in length_bucket_batches(ds, batch_size, shuffle=train_mode, seed=seed, epoch=epoch):
            width = pad_width_for([ds.sequence_length(r) for r in rows])
            batch = ds.batch(rows, pad_to=width)
            neg_seqs = [corrupt_sequence(s, 0.20) for s in batch["sequence"]]
            neg_ids, neg_mask = _encode_batch(tokenizer, neg_seqs, width)
            z_pos = latents(jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]))
            z_neg = latents(jnp.asarray(neg_ids), jnp.asarray(neg_mask))
            if train_mode:
                ebm, opt_state, loss, ep, en = nce_step(ebm, opt_state, z_pos, z_neg)
                if n % 50 == 0:
                    print(
                        f"[ebm] epoch {epoch} step {n} loss {float(loss):.4f} "
                        f"E_pos {float(ep):.3f} E_neg {float(en):.3f}"
                    )
            else:
                loss = nce_loss(ebm, z_pos, z_neg)
            total += float(loss)
            n += 1
        return total / max(n, 1)

    history = []
    for epoch in range(start_epoch, epochs + 1):
        avg_train = epoch_pass(train_ds, epoch, True)
        avg_val = epoch_pass(val_ds, 0, False)
        print(f"[ebm] epoch {epoch} train {avg_train:.4f} val {avg_val:.4f}")
        with curves.open("a") as f:
            f.write(f"{epoch},{avg_train:.4f},{avg_val:.4f}\n")
        history.append({"epoch": epoch, "train_loss": avg_train, "val_loss": avg_val})
        payload = {
            "model": jax.tree.map(np.asarray, ebm),
            "epoch": epoch,
            "val_loss": avg_val,
            "best_val_loss": min(best, avg_val),
            "best_epoch": epoch if avg_val < best else best_epoch,
            "rng_state": capture_rng_state(key),
            "run_fingerprint": fingerprint,
            "run_progress": {
                "completed_epochs": epoch, "current_epoch": epoch,
                "microbatch": 0, "optimizer_step": epoch,
            },
        }
        ckpt_lib.save_checkpoint(payload, training_run.checkpoints / "last_ebm.npz")
        if avg_val < best:
            best = avg_val
            best_epoch = epoch
            ckpt_lib.save_checkpoint(payload, training_run.checkpoints / "best_ebm.npz")
            print(f"[saved] best_ebm.npz (new best validation loss: {best:.4f})")

    meta = {"status": "completed", "best_epoch": best_epoch, "best_val_loss": best,
            "history": history}
    (training_run.scores / "metrics.json").write_text(json.dumps(meta, indent=2))
    training_run.mark_complete({"completed_epochs": epochs})
    training_run.close()
    return meta


__all__ = ["corrupt_sequence", "train"]
