"""Critic / EBM scoring of candidate amino-acid sequences for guidance.

Parity: reference ``src/codonlm/generate.py:410-486`` (``batch_score_critic``)
— candidates are BOS/EOS-wrapped, padded, run through the multi-task critic;
classifier-head mode returns ``log(softmax[target_class] + 1e-10)``, EBM mode
returns negative energy of the bottleneck latent. Also provides the
``score_fn`` factory consumed by ``generation.constrained``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.models.protein import (
    ProteinClassifierConfig,
    ebm_energy,
    extract_latent,
    multitask_forward,
)


def _tokenize_batch(tokenizer, aa_seqs):
    ids_list = [
        [tokenizer.bos_token_id]
        + tokenizer.encode_sequence(seq)
        + [tokenizer.eos_token_id]
        for seq in aa_seqs
    ]
    max_len = max(len(t) for t in ids_list)
    ids = np.full((len(ids_list), max_len), tokenizer.pad_token_id, np.int32)
    mask = np.zeros((len(ids_list), max_len), np.int32)
    for i, t in enumerate(ids_list):
        ids[i, : len(t)] = t
        mask[i, : len(t)] = 1
    return jnp.asarray(ids), jnp.asarray(mask)


def batch_score_critic(
    critic_params: dict,
    critic_cfg: ProteinClassifierConfig,
    tokenizer,
    aa_seqs: list[str],
    target_task: str,
    target_class_idx: int | None,
    ebm_params: dict | None = None,
) -> np.ndarray:
    """Scores (K,) — log-probs of the target class, or negative energies."""
    if not aa_seqs:
        return np.zeros(0, np.float32)
    ids, mask = _tokenize_batch(tokenizer, aa_seqs)
    if target_task == "ebm" and ebm_params is not None:
        latent = extract_latent(critic_params, critic_cfg, ids, mask)
        energy = ebm_energy(ebm_params, latent)
        return -np.asarray(energy)
    logits_dict = multitask_forward(critic_params, critic_cfg, ids, mask)
    if target_task not in logits_dict:
        return np.zeros(len(aa_seqs), np.float32)
    probs = jax.nn.softmax(logits_dict[target_task], axis=-1)
    class_idx = target_class_idx if target_class_idx is not None else 0
    if class_idx >= probs.shape[-1]:
        class_idx = 0
    return np.asarray(jnp.log(probs[:, class_idx] + 1e-10))


def make_score_fn(
    critic_params,
    critic_cfg,
    tokenizer,
    *,
    target_task: str = "stability",
    target_class_idx: int | None = None,
    ebm_params: dict | None = None,
):
    """Bind critic state into the ``score_fn(aa_seqs)`` interface used by
    ``generation.constrained.generate_cds_critic_guided``."""

    def score_fn(aa_seqs):
        return batch_score_critic(
            critic_params, critic_cfg, tokenizer, aa_seqs,
            target_task, target_class_idx, ebm_params,
        )

    return score_fn


__all__ = ["batch_score_critic", "make_score_fn"]
