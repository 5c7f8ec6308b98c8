"""Checkpoint model expansion: grow depth/width by partial tensor copy.

Parity: reference ``scripts/expand_model.py:92-116`` — a target model of the
new shape is initialized fresh, then every source tensor is copied into the
overlapping hyperrectangle of its same-named target (extra rows/cols keep
their fresh init). Stacked block parameters additionally expand on the
leading layer axis, so depth growth copies the first ``n_layer_src`` layers.
"""

from __future__ import annotations

import numpy as np

import jax

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt


def _copy_overlap(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    out = np.array(dst)
    if src.ndim != dst.ndim:
        return out
    slices = tuple(slice(0, min(s, d)) for s, d in zip(src.shape, dst.shape))
    out[slices] = np.asarray(src)[slices]
    return out


def _walk(src_tree, dst_tree, report, path=""):
    if isinstance(dst_tree, dict):
        out = {}
        for key, dst_val in dst_tree.items():
            if isinstance(src_tree, dict) and key in src_tree:
                out[key] = _walk(src_tree[key], dst_val, report, f"{path}/{key}")
            else:
                report["missing_initialized"].append(f"{path}/{key}")
                out[key] = dst_val
        return out
    src = np.asarray(src_tree)
    dst = np.asarray(dst_tree)
    if src.shape == dst.shape:
        report["copied"].append(path)
        return src.astype(dst.dtype)
    report["expanded"].append(path)
    return _copy_overlap(src, dst).astype(dst.dtype)


def expand_params(
    src_params: dict,
    src_cfg: CodonGPTConfig,
    dst_cfg: CodonGPTConfig,
    *,
    seed: int = 0,
) -> tuple[dict, dict]:
    """Expand ``src_params`` into a fresh ``dst_cfg`` init. Returns
    (params, report{copied, expanded, missing_initialized})."""
    dst_params = codon_gpt.init(jax.random.PRNGKey(seed), dst_cfg)
    report = {"copied": [], "expanded": [], "missing_initialized": []}
    out = _walk(src_params, jax.tree.map(np.asarray, dst_params), report)
    return out, report


def expand_checkpoint(
    src_payload: dict, dst_cfg: CodonGPTConfig, *, seed: int = 0
) -> tuple[dict, dict]:
    """Expand a full checkpoint payload into a fresh training start."""
    src_cfg = CodonGPTConfig.from_run_config(src_payload.get("cfg", {}))
    params, report = expand_params(src_payload["model"], src_cfg, dst_cfg, seed=seed)
    cfg_out = dict(src_payload.get("cfg", {}))
    cfg_out.update({
        "n_layer": dst_cfg.n_layer,
        "n_head": dst_cfg.n_head,
        "n_embd": dst_cfg.n_embd,
        "block_size": dst_cfg.block_size,
        "vocab_size": dst_cfg.vocab_size,
    })
    payload = {
        "model": params,
        "cfg": cfg_out,
        "epoch": 0,
        "step": 0,
        "best_val": float("inf"),
        "no_improve": 0,
        "run_progress": {
            "completed_epochs": 0, "current_epoch": 0,
            "microbatch": 0, "optimizer_step": 0,
        },
        "expansion_report": {k: len(v) for k, v in report.items()},
    }
    return payload, report


__all__ = ["expand_checkpoint", "expand_params"]
