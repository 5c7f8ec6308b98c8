"""LoRA adapters for parameter-efficient fine-tuning (beyond reference scope).

The reference's transfer story is full-weight: ``--transfer_from`` remaps a
whole checkpoint and fine-tunes every parameter (or freezes the backbone
entirely via ``freeze_backbone``). LoRA adds the middle ground production
fine-tuning wants: freeze the pretrained weights and train rank-``r``
factors on the block linears, cutting trainable parameters (and ZeRO-1
optimizer-state memory) by orders of magnitude while serving through the
unchanged dense path after a merge.

Design, TPU-first:

* Adapter leaves live INSIDE each target linear's param dict
  (``lora_a: (fan_in, r)``, ``lora_b: (r, fan_out)``, stacked under the
  blocks' leading L axis like every other block leaf). The model forward
  (``models/codon_gpt.py::_linear``) dispatches on leaf presence, so no
  config threading, no second code path, and ``lax.scan`` over layers,
  checkpointing, DP/ZeRO-1 sharding, and PP stage-splitting all treat the
  adapters as ordinary block leaves.
* ``lora_b`` starts at zero, so an adapted model is exactly the base model
  at step 0. The conventional ``alpha / r`` output scale is a real output
  scale (standard LoRA semantics): it rides as a frozen ``lora_scale`` leaf
  (shape ``(L,)`` so pipeline stage-splitting slices it like every other
  block leaf), applied under ``stop_gradient`` in the forward and labeled
  ``frozen`` by the optimizer, so tuning ``lora_alpha`` rescales the whole
  update direction throughout training — not just the init.
* ``merge_lora`` folds ``a @ b`` back into ``w`` and drops the adapter
  leaves — the merged checkpoint is a plain dense checkpoint, so decode,
  serving, and int8 weight-only quantization (``ops/quant.py``) need no
  LoRA awareness.
* Only-adapters training reuses the existing optimizer label machinery:
  ``training/optim.py::param_group_labels`` puts adapter factors in their
  own no-weight-decay ``lora`` group (LR = ``lora_lr``, default cfg ``lr``)
  and, under ``lora_only``, freezes everything else except the aux-head
  fast group.

MoE blocks: attention targets apply as usual; expert/router weights are
never adapted (same exclusion ``ops/quant.py`` applies to int8).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# target-name groups, resolved against what the block actually contains
ATTN_LINEARS = ("query", "key", "value", "proj")
MLP_LINEARS = ("fc", "proj", "w_gate", "w_up", "w_down")

__all__ = [
    "add_lora_adapters",
    "adapter_state",
    "apply_adapter_state",
    "merge_lora",
    "has_lora",
    "lora_param_count",
]


def _attach(linear: dict, rng, rank: int, scale: float) -> None:
    w = linear["w"]
    if w.ndim != 3:
        raise ValueError(
            f"LoRA targets expect stacked block linears (L, fan_in, fan_out); "
            f"got shape {w.shape}"
        )
    n_layer, fan_in, fan_out = w.shape
    k = 1.0 / math.sqrt(fan_in)
    linear["lora_a"] = jax.random.uniform(
        rng, (n_layer, fan_in, rank), jnp.float32, -k, k
    )
    linear["lora_b"] = jnp.zeros((n_layer, rank, fan_out), jnp.float32)
    linear["lora_scale"] = jnp.full((n_layer,), scale, jnp.float32)


def add_lora_adapters(
    params: dict,
    rng: jax.Array,
    *,
    rank: int,
    alpha: float | None = None,
    targets: str = "attn",
) -> dict:
    """Return a copy of ``params`` with adapters on the target block linears.

    ``targets``: ``"attn"`` (q/k/v/out-proj — the standard recipe) or
    ``"attn+mlp"`` (additionally the dense/SwiGLU MLP linears). Call AFTER
    any ``transfer_load_params`` so the base tree matches the source
    checkpoint; forwards are bit-identical to the base model until the
    first optimizer step (``lora_b = 0``).
    """
    if rank < 1:
        raise ValueError("lora rank must be >= 1")
    if targets not in ("attn", "attn+mlp"):
        raise ValueError(f"unknown lora targets {targets!r}")
    params = jax.tree.map(lambda x: x, params)  # shallow-copy containers
    blocks = params["blocks"]
    scale = (alpha if alpha is not None else float(rank)) / float(rank)

    chosen: list[dict] = [blocks["attn"][name] for name in ATTN_LINEARS]
    if targets == "attn+mlp":
        if "router" in blocks:
            raise ValueError(
                "LoRA mlp targets are unsupported on MoE models — expert "
                "banks are excluded from adaptation (use targets='attn')"
            )
        chosen += [
            blocks["mlp"][name] for name in MLP_LINEARS if name in blocks["mlp"]
        ]
    for linear, key in zip(chosen, jax.random.split(rng, len(chosen))):
        if "w_q" in linear:
            raise ValueError(
                "cannot attach LoRA to int8-quantized weights — fine-tune "
                "the float checkpoint, merge, then quantize"
            )
        _attach(linear, key, rank, scale)
    return params


def _merge_node(node):
    if isinstance(node, dict) and "lora_a" in node:
        node = dict(node)
        delta = jnp.einsum(
            "...ir,...ro->...io", node.pop("lora_a"), node.pop("lora_b")
        )
        if "lora_scale" in node:
            scale = node.pop("lora_scale")  # (L,) → broadcast over (L, in, out)
            delta = delta * scale[..., None, None]
        node["w"] = node["w"] + delta.astype(node["w"].dtype)
        return node
    if isinstance(node, dict):
        return {k: _merge_node(v) for k, v in node.items()}
    return node


def merge_lora(params: dict) -> dict:
    """Fold every adapter into its base weight; drop the adapter leaves.

    The result is a plain dense parameter tree — byte-compatible with every
    existing checkpoint consumer (eval, decode, serving, int8 quant).
    """
    return _merge_node(params)


def adapter_state(params: dict) -> dict:
    """Only the adapter leaves, tree structure preserved.

    The shippable unit of a LoRA fine-tune: orders of magnitude smaller
    than a dense checkpoint (measured at the d512 tier in
    ``docs/benchmarks/lora_transfer.json`` ``efficiency_d512``), and
    re-attachable to any copy of the frozen base via
    :func:`apply_adapter_state` (multi-adapter serving, adapter registries).
    """
    def visit(node):
        if not isinstance(node, dict):
            return None
        if "lora_a" in node:
            return {k: v for k, v in node.items() if k.startswith("lora_")}
        out = {k: r for k, r in ((k, visit(v)) for k, v in node.items())
               if r is not None}
        return out or None

    found = visit(params)
    if found is None:
        raise ValueError("params carry no LoRA adapter leaves")
    return found


def apply_adapter_state(params: dict, adapters: dict) -> dict:
    """Graft an :func:`adapter_state` tree onto a base parameter tree.

    The base must be the SAME frozen checkpoint the adapters were trained
    against (LoRA deltas are base-specific); shapes are validated, and the
    result forwards exactly like the original adapter checkpoint.
    """
    params = jax.tree.map(lambda x: x, params)  # fresh containers

    def graft(dst, src, path=""):
        for k, v in src.items():
            if k.startswith("lora_"):
                if "w" not in dst:
                    raise ValueError(f"no linear at {path!r} to adapt")
                expect = (dst["w"].shape[:-1] if k == "lora_a"
                          else dst["w"].shape[:-2] if k == "lora_scale"
                          else None)
                if expect is not None and tuple(v.shape[: len(expect)]) != tuple(expect):
                    raise ValueError(
                        f"adapter leaf {path}/{k} shape {v.shape} does not "
                        f"match base linear {dst['w'].shape}")
                dst[k] = v
            else:
                if k not in dst:
                    raise ValueError(f"base tree has no node {path}/{k}")
                graft(dst[k], v, f"{path}/{k}")

    graft(params, adapters)
    return params


def has_lora(params: dict) -> bool:
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
    return any("lora_a" in jax.tree_util.keystr(p) for p, _ in paths)


def lora_param_count(params: dict) -> int:
    """Trainable adapter parameters (the frozen ``lora_scale`` leaf excluded)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = jax.tree_util.keystr(path)
        if "lora_" in key and "lora_scale" not in key:
            total += int(leaf.size)
    return total
