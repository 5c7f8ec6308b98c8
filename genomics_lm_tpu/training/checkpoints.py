"""Checkpoint store: pytree payloads in a single atomic ``.npz`` file.

Replaces the reference's ``torch.save`` pickles (``runtime.py:84-90``) with a
dependency-free, language-neutral format: every array leaf of the payload
tree is stored as an npz entry keyed by its tree path; non-array structure
and scalars are stored as one JSON metadata entry. This gives

- atomic writes (temp file + ``os.replace``),
- metadata-only reads (lifecycle checks never load model weights),
- exact round-tripping of JAX/numpy arrays including dtypes like bfloat16
  (stored via a uint16 view with a dtype tag).

Also provides the transfer-learning loaders: token-aware embedding-row remap
(parity: ``src/codonlm/training/checkpoint.py:16-85``) and checkpoint
width/depth expansion (parity: ``scripts/expand_model.py:92-116``).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from pathlib import Path
from typing import Any

import jax
import numpy as np

from genomics_lm_tpu.training.runtime import atomic_write

_ARRAY_TAG = "__array__"
_TUPLE_TAG = "__tuple__"
_META_ENTRY = "__meta__"
_BFLOAT16_TAG = "bfloat16"


def _host_materialize(x):
    """Device → host copy that works for cross-process-sharded arrays.

    A leaf sharded over a multi-process mesh axis (e.g. ZeRO-1 moments with
    the data axis crossing hosts) is not fully addressable, so ``np.asarray``
    raises; gather it collectively instead — every process must reach this
    call in the same order (the trainer saves on all hosts symmetrically).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _to_numpy(x):
    return _host_materialize(x)


def _flatten(obj: Any, path: str, arrays: dict[str, np.ndarray]):
    """Split payload into (JSON-able skeleton, path→array dict)."""
    if isinstance(obj, dict):
        return {str(k): _flatten(v, f"{path}/{k}", arrays) for k, v in obj.items()}
    if isinstance(obj, tuple):
        return {_TUPLE_TAG: [_flatten(v, f"{path}/{i}", arrays) for i, v in enumerate(obj)]}
    if isinstance(obj, list):
        return [_flatten(v, f"{path}/{i}", arrays) for i, v in enumerate(obj)]
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):
        arr = _to_numpy(obj)
        key = path.lstrip("/")
        if arr.dtype.name == _BFLOAT16_TAG:
            arrays[key] = arr.view(np.uint16)
            return {_ARRAY_TAG: key, "dtype": _BFLOAT16_TAG}
        arrays[key] = arr
        return {_ARRAY_TAG: key}
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"Unsupported checkpoint leaf at {path}: {type(obj)}")


def _unflatten(skel: Any, arrays) -> Any:
    if isinstance(skel, dict):
        if _ARRAY_TAG in skel:
            arr = arrays[skel[_ARRAY_TAG]]
            if skel.get("dtype") == _BFLOAT16_TAG and isinstance(arr, np.ndarray):
                import jax.numpy as jnp

                return np.asarray(arr).view(jnp.bfloat16.dtype)
            return arr
        if _TUPLE_TAG in skel:
            return tuple(_unflatten(v, arrays) for v in skel[_TUPLE_TAG])
        return {k: _unflatten(v, arrays) for k, v in skel.items()}
    if isinstance(skel, list):
        return [_unflatten(v, arrays) for v in skel]
    return skel


def save_checkpoint(payload: dict[str, Any], path: str | Path) -> None:
    """Atomically write a payload tree to ``path`` (npz container)."""
    arrays: dict[str, np.ndarray] = {}
    skel = _flatten(payload, "", arrays)
    meta = json.dumps(skel, sort_keys=True).encode()

    def write(tmp: Path) -> None:
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED, allowZip64=True) as zf:
            zf.writestr(_META_ENTRY, meta)
            for key, arr in arrays.items():
                buf = io.BytesIO()
                np.save(buf, arr, allow_pickle=False)
                zf.writestr(key + ".npy", buf.getvalue())

    atomic_write(path, write)


class AsyncCheckpointer:
    """Background checkpoint writer (orbax-style async semantics, SURVEY
    §5.4): the device→host copy happens on the caller thread (it must —
    arrays may be donated/overwritten next step), the serialization + atomic
    file write happens on one worker thread. ``wait()`` joins the in-flight
    write; a new ``save`` first joins the previous one so writes never
    reorder. Exceptions surface on the next ``save``/``wait``.
    """

    def __init__(self):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._pending = None

    def save(self, payload: dict[str, Any], path: str | Path) -> None:
        self.wait()
        host_payload = jax.tree.map(
            lambda v: _host_materialize(v) if hasattr(v, "shape") else v, payload
        )
        self._pending = self._pool.submit(save_checkpoint, host_payload, path)

    def wait(self) -> None:
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()  # re-raises writer exceptions

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def load_checkpoint(path: str | Path) -> dict[str, Any]:
    """Load the full payload tree (arrays as host numpy)."""
    with zipfile.ZipFile(path, "r") as zf:
        skel = json.loads(zf.read(_META_ENTRY).decode())
        arrays = {}
        for name in zf.namelist():
            if name == _META_ENTRY:
                continue
            arrays[name[: -len(".npy")]] = np.load(
                io.BytesIO(zf.read(name)), allow_pickle=False
            )
    return _unflatten(skel, arrays)


def load_checkpoint_meta(path: str | Path) -> dict[str, Any]:
    """Load only the JSON skeleton — arrays replaced by shape-free tags.

    Used by run-lifecycle progress/fingerprint validation so opening a run
    never reads gigabytes of weights.
    """

    class _Missing:
        def __getitem__(self, key):
            return {"__array_ref__": key}

    with zipfile.ZipFile(path, "r") as zf:
        skel = json.loads(zf.read(_META_ENTRY).decode())
    return _unflatten(skel, _Missing())


def checkpoint_array(path: str | Path, key: str) -> np.ndarray:
    """Load a single array entry by tree path (e.g. 'model/tok_emb')."""
    with zipfile.ZipFile(path, "r") as zf:
        return np.load(io.BytesIO(zf.read(key + ".npy")), allow_pickle=False)


# --- Transfer loading with token-level vocabulary remap ----------------------


def transfer_load_params(
    target_params: dict,
    source_params: dict,
    *,
    source_itos: list[str] | None = None,
    target_itos: list[str] | None = None,
    vocab_axis_size: int | None = None,
) -> tuple[dict, dict]:
    """Initialize ``target_params`` from a source tree, remapping vocab rows.

    Exact-shape leaves copy directly; leaves whose leading axis equals the
    vocabulary size copy row-wise through the token remap built from the two
    itos lists (unknown target tokens keep their fresh init). Returns
    (params, report) with loaded/adapted/skipped path lists — behavior parity
    with the reference transfer adapter
    (``src/codonlm/training/checkpoint.py:16-85``).
    """
    import jax

    remap = None
    if source_itos is not None and target_itos is not None:
        src_index = {tok: i for i, tok in enumerate(source_itos)}
        remap = [(t, src_index[tok]) for t, tok in enumerate(target_itos) if tok in src_index]

    report = {"loaded": [], "adapted": [], "skipped": [], "missing": []}

    flat_src = _flatten_paths(source_params)
    flat_tgt = _flatten_paths(target_params)
    out = dict(flat_tgt)
    for path, tgt in flat_tgt.items():
        if path not in flat_src:
            report["missing"].append(path)
            continue
        src = np.asarray(flat_src[path])
        tgt_np = np.asarray(tgt)
        if src.shape == tgt_np.shape:
            out[path] = src.astype(tgt_np.dtype)
            report["loaded"].append(path)
        elif (
            remap is not None
            and vocab_axis_size is not None
            and src.ndim == tgt_np.ndim
            and src.shape[0] == len(remap and source_itos or [])
            and tgt_np.shape[0] == len(target_itos or [])
            and src.shape[1:] == tgt_np.shape[1:]
        ):
            merged = tgt_np.copy()
            for t_row, s_row in remap:
                merged[t_row] = src[s_row]
            out[path] = merged.astype(tgt_np.dtype)
            report["adapted"].append(path)
        else:
            report["skipped"].append(path)

    for path in flat_src:
        if path not in flat_tgt:
            report["skipped"].append(f"(source-only) {path}")

    return _unflatten_paths(out, target_params), report


def _flatten_paths(tree, prefix="") -> dict[str, Any]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten_paths(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        # per-layer block LISTS (the protein backbone) must transfer
        # leaf-by-leaf — treating the list as one leaf silently collapses
        # it to a numpy object array that later poisons optimizer init
        for i, v in enumerate(tree):
            flat.update(_flatten_paths(v, f"{prefix}/{i}"))
    else:
        flat[prefix.lstrip("/")] = tree
    return flat


def _unflatten_paths(flat: dict[str, Any], like: dict) -> dict:
    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [rebuild(v, f"{prefix}/{i}") for i, v in enumerate(node)]
            return tuple(seq) if isinstance(node, tuple) else seq
        return flat[prefix.lstrip("/")]

    return rebuild(like)


__all__ = [
    "AsyncCheckpointer",
    "checkpoint_array",
    "load_checkpoint",
    "load_checkpoint_meta",
    "save_checkpoint",
    "transfer_load_params",
]
