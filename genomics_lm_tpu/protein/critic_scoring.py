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





def load_score_fn(
    critic_ckpt,
    *,
    ebm_ckpt=None,
    target_task: str = "stability",
    target_class_idx: int | None = None,
):
    """Build a ``score_fn`` straight from checkpoint paths (CLI glue).

    Returns ``(score_fn, critic_bundle)`` where the bundle carries the
    loaded params/config/tokenizer for callers that also need direct
    critic access (e.g. per-candidate task probabilities).
    """
    import jax.numpy as jnp

    from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    payload = load_checkpoint(critic_ckpt)
    params = jax.tree.map(jnp.asarray, payload["model"])
    cfg_map = payload.get("cfg", {})
    cfg = ProteinClassifierConfig(
        vocab_size=28,
        n_layer=int(cfg_map.get("n_layer", 4)),
        n_head=int(cfg_map.get("n_head", 4)),
        n_embd=int(cfg_map.get("n_embd", 256)),
        block_size=int(cfg_map.get("block_size", 512)),
        dropout=0.0,
        pooling=str(cfg_map.get("pooling", "mean")),
    )
    ebm_params = None
    if ebm_ckpt:
        ebm_params = jax.tree.map(jnp.asarray, load_checkpoint(ebm_ckpt)["model"])
    tokenizer = ProteinTokenizer()
    score_fn = make_score_fn(
        params, cfg, tokenizer,
        target_task="ebm" if ebm_params is not None else target_task,
        target_class_idx=target_class_idx,
        ebm_params=ebm_params,
    )
    bundle = {
        "params": params,
        "cfg": cfg,
        "tokenizer": tokenizer,
        "task_dims": payload.get("task_dims", {}),
        "ebm_params": ebm_params,
    }
    return score_fn, bundle


def score_candidate_tasks(bundle: dict, aa_seq: str) -> dict:
    """Per-task critic readout for one candidate (reference
    ``generative_design_loop.py score_with_critic``): stability probability
    and prediction, family/function top-1/top-5 ids + confidences + entropy.
    ``bundle`` comes from ``load_score_fn``."""
    if not aa_seq:
        return {}
    ids, mask = _tokenize_batch(bundle["tokenizer"], [aa_seq])
    logits_dict = multitask_forward(bundle["params"], bundle["cfg"], ids, mask)
    task_dims = bundle.get("task_dims") or {}
    scores: dict = {}

    if "stability" in logits_dict:
        stab = np.asarray(jax.nn.softmax(logits_dict["stability"][0]))
        scores["stability_prob"] = float(stab[-1])
        scores["stability_pred"] = int(stab.argmax())

    for task in ("family", "function"):
        if task not in logits_dict:
            continue
        probs = np.asarray(jax.nn.softmax(logits_dict[task][0]))
        top = min(5, int(task_dims.get(task, probs.size)))
        order = np.argsort(probs)[::-1][:top]
        scores[f"{task}_top1"] = int(order[0])
        scores[f"{task}_top1_conf"] = float(probs[order[0]])
        scores[f"{task}_top5"] = [int(i) for i in order]
        scores[f"{task}_top5_conf"] = [float(probs[i]) for i in order]
        scores[f"{task}_entropy"] = float(
            -(probs * np.log(probs + 1e-10)).sum()
        )

    if "attention_weights" in logits_dict:
        scores["attention_weights"] = np.asarray(
            logits_dict["attention_weights"][0]
        ).tolist()
    return scores


__all__ = ["batch_score_critic", "load_score_fn", "make_score_fn", "score_candidate_tasks"]
