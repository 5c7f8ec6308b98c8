"""Cross-framework weight transplant between CodonGPT (JAX) and the
reference ``TinyGPT`` (torch, ``src/codonlm/model_tiny_gpt.py:155-389``).

This is the machinery behind the numerical-parity harness
(``tests/test_torch_parity.py``): it imports the *actual* reference model
from the mounted reference checkout (read-only), moves weights in either
direction through the documented layout map below, and lets the tests assert
logit/top-k/hidden-state/training-trace agreement. Nothing here is imported
by the training or serving paths — torch and the reference checkout are
optional, test-time-only dependencies.

Layout map (JAX param tree ⇄ torch ``state_dict``):

====================================  =================================  =========
JAX leaf (this repo)                  torch key (reference TinyGPT)      transform
====================================  =================================  =========
``tok_emb``                (V, D)     ``tok_emb.weight``        (V, D)   none
``pos_emb``                (P, D)     ``pos_emb.weight``        (P, D)   none
``blocks/ln1/scale``    [L] (D,)      ``blocks.{i}.ln1.weight``          stack/none
``blocks/ln1/bias``     [L] (D,)      ``blocks.{i}.ln1.bias``            stack/none
``blocks/attn/query/w`` [L] (D, D)    ``blocks.{i}.attn.query.weight``   stack + T
``blocks/attn/key/w``   [L] (D, Dkv)  ``blocks.{i}.attn.key.weight``     stack + T
``blocks/attn/value/w`` [L] (D, Dkv)  ``blocks.{i}.attn.value.weight``   stack + T
``blocks/attn/proj/w``  [L] (D, D)    ``blocks.{i}.attn.proj.weight``    stack + T
``blocks/attn/*/b``     [L] (out,)    ``blocks.{i}.attn.*.bias``         stack/none
``blocks/ln2/*``                      ``blocks.{i}.ln2.*``               stack/none
``blocks/mlp/fc/{w,b}``               ``blocks.{i}.mlp.0.{weight,bias}`` stack + T
``blocks/mlp/proj/{w,b}``             ``blocks.{i}.mlp.2.{weight,bias}`` stack + T
``blocks/mlp/w_gate/w``               ``blocks.{i}.mlp.w_gate.weight``   stack + T
``blocks/mlp/w_up/w``                 ``blocks.{i}.mlp.w_up.weight``     stack + T
``blocks/mlp/w_down/w``               ``blocks.{i}.mlp.w_down.weight``   stack + T
``ln_f/{scale,bias}``                 ``ln_f.{weight,bias}``             none
``head/w``                 (D, V)     ``head.weight``           (V, D)   T (untied)
``termination_head/{w,b}``            ``termination_head.{weight,bias}`` T
``shape_proj/{w,b}``       (3, D)     ``shape_proj.{weight,bias}``       T
``offset_projs/{o}/fc/{w,b}``         ``offset_projs.{o}.0.{weight,bias}``  T
``offset_projs/{o}/proj/{w,b}``       ``offset_projs.{o}.2.{weight,bias}``  T
====================================  =================================  =========

Conventions: torch ``nn.Linear`` stores ``weight`` as (out, in); this repo
stores ``w`` as (in, out) so every Linear weight transposes ("T"). Per-layer
tensors are stacked on a leading L axis on the JAX side (the model scans over
layers). Non-persistent torch buffers (causal ``mask``, rotary caches) and
the ``loss_weights`` buffer have no parameter counterpart and are skipped.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path
from typing import TYPE_CHECKING, Any

import numpy as np

from genomics_lm_tpu.models.config import CodonGPTConfig

if TYPE_CHECKING:  # pragma: no cover
    import torch

REFERENCE_ROOT_ENV = "GENOMICS_REFERENCE_ROOT"
_DEFAULT_REFERENCE_ROOT = "/root/reference"


def reference_root() -> Path:
    return Path(os.environ.get(REFERENCE_ROOT_ENV, _DEFAULT_REFERENCE_ROOT))


def reference_available() -> bool:
    """True when the reference checkout and torch are both importable."""
    if not (reference_root() / "src" / "codonlm" / "model_tiny_gpt.py").exists():
        return False
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return True


def load_reference_model_module() -> Any:
    """Import the reference ``model_tiny_gpt`` module from the read-only
    checkout without putting the whole reference tree on ``sys.path``."""
    path = reference_root() / "src" / "codonlm" / "model_tiny_gpt.py"
    name = "_genomics_reference_model_tiny_gpt"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    if spec is None or spec.loader is None:
        raise ImportError(f"cannot load reference model from {path}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def build_reference_model(cfg: CodonGPTConfig, *, use_sdpa: bool = False):
    """Instantiate the reference TinyGPT with this config's toggles."""
    module = load_reference_model_module()
    model = module.TinyGPT(
        vocab_size=cfg.vocab_size,
        block_size=cfg.block_size,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        n_embd=cfg.n_embd,
        dropout=cfg.dropout,
        label_smoothing=cfg.label_smoothing,
        sep_id=cfg.sep_id,
        tie_embeddings=cfg.tie_embeddings,
        n_kv_head=cfg.n_kv_head,
        use_sdpa=use_sdpa,
        loss_weights=list(cfg.loss_weights) if cfg.loss_weights else None,
        termination_aux=cfg.termination_aux,
        termination_n_classes=cfg.termination_n_classes,
        multi_offset_targets=list(cfg.multi_offset_targets) or None,
        use_swiglu=cfg.use_swiglu,
        use_rope=cfg.use_rope,
        use_shape_guidance=cfg.use_shape_guidance,
    )
    return model


# --- the per-tensor map ------------------------------------------------------


def _linear_entries(jax_prefix: list[str], torch_prefix: str, *, bias: bool):
    yield jax_prefix + ["w"], f"{torch_prefix}.weight", True
    if bias:
        yield jax_prefix + ["b"], f"{torch_prefix}.bias", False


def _toplevel_entries(cfg: CodonGPTConfig):
    """(jax_path, torch_key, transpose) for every non-block parameter."""
    yield ["tok_emb"], "tok_emb.weight", False
    if not cfg.use_rope:
        yield ["pos_emb"], "pos_emb.weight", False
    yield ["ln_f", "scale"], "ln_f.weight", False
    yield ["ln_f", "bias"], "ln_f.bias", False
    if not cfg.tie_embeddings:
        yield ["head", "w"], "head.weight", True
    if cfg.termination_aux:
        yield from _linear_entries(["termination_head"], "termination_head", bias=True)
    if cfg.use_shape_guidance:
        yield from _linear_entries(["shape_proj"], "shape_proj", bias=True)
    for offset in cfg.multi_offset_targets:
        base = ["offset_projs", str(offset)]
        yield from _linear_entries(base + ["fc"], f"offset_projs.{offset}.0", bias=True)
        yield from _linear_entries(base + ["proj"], f"offset_projs.{offset}.2", bias=True)


def _block_entries(cfg: CodonGPTConfig, layer: int):
    """Same, for one transformer block (JAX paths relative to ``blocks``)."""
    t = f"blocks.{layer}"
    for ln in ("ln1", "ln2"):
        yield [ln, "scale"], f"{t}.{ln}.weight", False
        yield [ln, "bias"], f"{t}.{ln}.bias", False
    for name in ("query", "key", "value", "proj"):
        yield from _linear_entries(["attn", name], f"{t}.attn.{name}", bias=True)
    if cfg.use_swiglu:
        for name in ("w_gate", "w_up", "w_down"):
            yield from _linear_entries(["mlp", name], f"{t}.mlp.{name}", bias=False)
    else:
        yield from _linear_entries(["mlp", "fc"], f"{t}.mlp.0", bias=True)
        yield from _linear_entries(["mlp", "proj"], f"{t}.mlp.2", bias=True)


def _tree_get(tree, path):
    for key in path:
        tree = tree[key]
    return tree


def _tree_set(tree, path, value):
    for key in path[:-1]:
        tree = tree.setdefault(key, {})
    tree[path[-1]] = value


def torch_state_to_jax(state_dict: dict, cfg: CodonGPTConfig) -> dict:
    """Reference ``state_dict`` → this repo's parameter pytree (float32)."""
    import jax.numpy as jnp

    def grab(key: str, transpose: bool) -> np.ndarray:
        arr = state_dict[key].detach().cpu().to_dense().numpy().astype(np.float32)
        return arr.T if transpose else arr

    params: dict = {}
    for path, key, transpose in _toplevel_entries(cfg):
        _tree_set(params, path, jnp.asarray(grab(key, transpose)))

    blocks: dict = {}
    for path, _, _ in _block_entries(cfg, 0):
        _tree_set(blocks, path, [])
    for layer in range(cfg.n_layer):
        for path, key, transpose in _block_entries(cfg, layer):
            _tree_get(blocks, path).append(grab(key, transpose))
    import jax

    params["blocks"] = jax.tree.map(
        lambda xs: jnp.asarray(np.stack(xs)),
        blocks,
        is_leaf=lambda n: isinstance(n, list),
    )
    return params


def jax_params_to_torch(params: dict, cfg: CodonGPTConfig, model=None):
    """Load this repo's parameter pytree into a reference TinyGPT.

    Returns the model (built fresh unless passed in) with every mapped
    parameter overwritten; tied embeddings come along automatically because
    the reference shares the ``head.weight`` storage with ``tok_emb.weight``.
    """
    import torch

    if model is None:
        model = build_reference_model(cfg)

    def put(key: str, value: np.ndarray, transpose: bool):
        tensor = torch.from_numpy(np.array(value.T if transpose else value))
        target = dict(model.named_parameters())[key]
        with torch.no_grad():
            target.copy_(tensor)

    for path, key, transpose in _toplevel_entries(cfg):
        put(key, np.asarray(_tree_get(params, path), dtype=np.float32), transpose)
    for layer in range(cfg.n_layer):
        for path, key, transpose in _block_entries(cfg, layer):
            stacked = np.asarray(_tree_get(params["blocks"], path), dtype=np.float32)
            put(key, stacked[layer], transpose)
    return model


# --- protein-stack transplant -------------------------------------------------


def _t(tensor):
    import numpy as np

    return np.asarray(tensor.detach().cpu(), dtype=np.float32)


def protein_backbone_torch_to_jax(state: dict, n_layer: int,
                                  prefix: str = "") -> dict:
    """torch ``ProteinConditionalTransformer`` state → repo backbone params.

    The reference stacks ``nn.TransformerEncoderLayer`` (post-LN, GELU,
    packed QKV in ``self_attn.in_proj_weight`` rows [q; k; v]); this repo's
    functional blocks store separate q/k/v ``{"w" (in,out), "b"}`` linears
    (``models/protein.py:98-135``). ``prefix`` handles nesting ("" for the
    LM itself, "backbone." inside the classifiers/critic)."""
    g = lambda name: _t(state[prefix + name])
    D = g("token_embedding.weight").shape[1]
    blocks = []
    for i in range(n_layer):
        b = f"transformer_blocks.{i}."
        w_in = g(b + "self_attn.in_proj_weight")  # (3D, D)
        b_in = g(b + "self_attn.in_proj_bias")    # (3D,)
        blocks.append({
            "attn": {
                "query": {"w": w_in[0:D].T, "b": b_in[0:D]},
                "key": {"w": w_in[D:2 * D].T, "b": b_in[D:2 * D]},
                "value": {"w": w_in[2 * D:3 * D].T, "b": b_in[2 * D:3 * D]},
                "out": {"w": g(b + "self_attn.out_proj.weight").T,
                        "b": g(b + "self_attn.out_proj.bias")},
            },
            "ln1": {"scale": g(b + "norm1.weight"), "bias": g(b + "norm1.bias")},
            "ff": {
                "w1": {"w": g(b + "linear1.weight").T, "b": g(b + "linear1.bias")},
                "w2": {"w": g(b + "linear2.weight").T, "b": g(b + "linear2.bias")},
            },
            "ln2": {"scale": g(b + "norm2.weight"), "bias": g(b + "norm2.bias")},
        })
    return {
        "token_embedding": g("token_embedding.weight"),
        "position_embedding": g("position_embedding.weight"),
        "blocks": blocks,
        "layer_norm": {"scale": g("layer_norm.weight"),
                       "bias": g("layer_norm.bias")},
    }


def protein_lm_torch_to_jax(state: dict, n_layer: int) -> dict:
    params = protein_backbone_torch_to_jax(state, n_layer)
    params["output_head"] = {"w": _t(state["output_head.weight"]).T}
    return params


def protein_classifier_torch_to_jax(state: dict, n_layer: int) -> dict:
    return {
        "backbone": protein_backbone_torch_to_jax(state, n_layer, "backbone."),
        "classification_head": {
            "w": _t(state["classification_head.weight"]).T,
            "b": _t(state["classification_head.bias"]),
        },
    }


def protein_multitask_torch_to_jax(state: dict, n_layer: int,
                                   task_names: list[str]) -> dict:
    """torch ``MultiTaskProteinClassifier`` state → repo multitask params
    (backbone + optional attention pooler + shared latent + task heads)."""
    params = {
        "backbone": protein_backbone_torch_to_jax(state, n_layer, "backbone."),
        "shared_latent": {
            "fc": {"w": _t(state["shared_latent.0.weight"]).T,
                   "b": _t(state["shared_latent.0.bias"])},
            "ln": {"scale": _t(state["shared_latent.1.weight"]),
                   "bias": _t(state["shared_latent.1.bias"])},
        },
        "heads": {
            name: {"w": _t(state[f"heads.{name}.weight"]).T,
                   "b": _t(state[f"heads.{name}.bias"])}
            for name in task_names
        },
    }
    if "pooler.query" in state:
        params["pooler"] = {
            "query": _t(state["pooler.query"]),
            "key_proj": {"w": _t(state["pooler.key_proj.weight"]).T,
                         "b": _t(state["pooler.key_proj.bias"])},
            "value_proj": {"w": _t(state["pooler.value_proj.weight"]).T,
                           "b": _t(state["pooler.value_proj.bias"])},
        }
    return params


__all__ = [
    "REFERENCE_ROOT_ENV",
    "build_reference_model",
    "jax_params_to_torch",
    "load_reference_model_module",
    "protein_backbone_torch_to_jax",
    "protein_classifier_torch_to_jax",
    "protein_lm_torch_to_jax",
    "protein_multitask_torch_to_jax",
    "reference_available",
    "reference_root",
    "torch_state_to_jax",
]
