"""ctypes bindings for the native C++ data-path library.

Builds ``libgenomics_native.so`` on first use (``make`` + g++, both baked
into the image); every entry point has a pure-Python fallback so the
framework works without a toolchain. See ``genomics_native.cpp`` for the
exported C ABI.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libgenomics_native.so"
_lib = None
_build_attempted = False


def _load():
    """Load (building if needed) the shared library; None on failure."""
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    src = _DIR / "genomics_native.cpp"
    stale = (
        not _LIB_PATH.exists()
        or (src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)
    )
    if stale and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_DIR), "-B"], check=True, capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.tokenize_codons.restype = ctypes.c_int
    lib.tokenize_codons.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.reverse_complement.restype = None
    lib.reverse_complement.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_char),
    ]
    lib.sha256.restype = None
    lib.sha256.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.minhash_signatures.restype = None
    lib.minhash_signatures.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.minhash_greedy_cluster.restype = ctypes.c_int
    lib.minhash_greedy_cluster.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def tokenize_codons(dna: str) -> np.ndarray:
    """DNA → per-codon ids (int32, -1 for ambiguous codons)."""
    lib = _load()
    data = dna.encode("ascii", errors="replace")
    n = len(data) // 3
    if lib is None:
        from genomics_lm_tpu.tokenizers.codon import _codon_ids_array

        return _codon_ids_array(dna)[0]
    out = np.empty(n, dtype=np.int32)
    lib.tokenize_codons(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out


def reverse_complement(seq: str) -> str:
    lib = _load()
    if lib is None:
        return seq.translate(str.maketrans("ACGTacgt", "TGCAtgca"))[::-1]
    data = seq.encode("ascii", errors="replace")
    out = ctypes.create_string_buffer(len(data))
    lib.reverse_complement(data, len(data), out)
    return out.raw.decode("ascii")


def sha256_hex(data: bytes) -> str:
    lib = _load()
    if lib is None:
        return hashlib.sha256(data).hexdigest()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data) if data else (ctypes.c_uint8 * 1)()
    out = (ctypes.c_uint8 * 32)()
    lib.sha256(buf, len(data), out)
    return bytes(out).hex()


def minhash_cluster(
    sequences: list[str], *, k: int = 5, n_hashes: int = 64, min_jaccard: float = 0.5
) -> np.ndarray:
    """Greedy minhash clustering; returns representative index per sequence."""
    n = len(sequences)
    if n == 0:
        return np.zeros(0, np.int32)
    lib = _load()
    concat = "".join(sequences).encode("ascii", errors="replace")
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sequences], out=offsets[1:])
    if lib is None:
        return _minhash_cluster_py(sequences, k, n_hashes, min_jaccard)
    sigs = np.empty(n * n_hashes, dtype=np.uint64)
    lib.minhash_signatures(
        concat,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, k, n_hashes,
        sigs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    labels = np.empty(n, dtype=np.int32)
    lib.minhash_greedy_cluster(
        sigs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, n_hashes, float(min_jaccard),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels


def _minhash_cluster_py(sequences, k, n_hashes, min_jaccard) -> np.ndarray:
    """Pure-python fallback with identical greedy semantics (slow)."""
    def shingles(s):
        return {s[i : i + k] for i in range(max(0, len(s) - k + 1))}

    sets = [shingles(s) for s in sequences]
    reps: list[int] = []
    labels = np.empty(len(sequences), np.int32)
    for i, sh in enumerate(sets):
        assigned = -1
        for r in reps:
            union = sets[r] | sh
            jac = len(sets[r] & sh) / len(union) if union else 1.0
            if jac >= min_jaccard:
                assigned = r
                break
        if assigned < 0:
            reps.append(i)
            assigned = i
        labels[i] = assigned
    return labels


def native_protein_clusters(
    proteins: dict[str, str], *, min_identity: float = 0.3,
    k: int = 4, n_hashes: int = 64,
) -> dict[str, list[str]]:
    """MMseqs2-easy-cluster-shaped output from minhash greedy clustering.

    ``min_identity`` maps to a shingle-jaccard threshold via the standard
    approximation j ≈ t / (2 − t) for identity t — conservative (clusters
    more aggressively than alignment identity would), which is the right
    failure direction for leakage screening.
    """
    ids = list(proteins.keys())
    seqs = [proteins[i] for i in ids]
    t = float(min_identity)
    jaccard = max(0.05, t / (2.0 - t))
    labels = minhash_cluster(seqs, k=k, n_hashes=n_hashes, min_jaccard=jaccard)
    clusters: dict[str, list[str]] = {}
    for i, label in enumerate(labels):
        clusters.setdefault(ids[int(label)], []).append(ids[i])
    return clusters


__all__ = [
    "available",
    "minhash_cluster",
    "native_protein_clusters",
    "reverse_complement",
    "sha256_hex",
    "tokenize_codons",
]
