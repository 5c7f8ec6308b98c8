"""Sequence-diversity metrics for generated designs.

Parity: reference ``src/eval/diversity.py`` — sampled average pairwise
identity, k-mer diversity over the 20^k amino-acid space, per-sequence GC
content.
"""

from __future__ import annotations

import random

import numpy as np


def pairwise_identity(seqs: list[str], max_pairs: int = 500, seed: int | None = None) -> float:
    """Average pairwise identity (fraction identical positions, min-length)."""
    if len(seqs) < 2:
        return 1.0
    pairs = [
        (seqs[i], seqs[j]) for i in range(len(seqs)) for j in range(i + 1, len(seqs))
    ]
    if len(pairs) > max_pairs:
        rng = random.Random(seed)
        pairs = rng.sample(pairs, max_pairs)
    identities = []
    for a, b in pairs:
        min_len = min(len(a), len(b))
        if min_len == 0:
            continue
        matches = sum(x == y for x, y in zip(a[:min_len], b[:min_len]))
        identities.append(matches / min_len)
    return float(np.mean(identities)) if identities else 0.0


def kmer_diversity(seqs: list[str], k: int = 3) -> float:
    """Fraction of possible amino-acid k-mers observed."""
    observed = set()
    for seq in seqs:
        for i in range(len(seq) - k + 1):
            observed.add(seq[i : i + k])
    return len(observed) / (20**k)


def gc_content(codon_seqs: list[list[str]]) -> list[float]:
    """GC fraction per codon sequence."""
    results = []
    for codons in codon_seqs:
        dna = "".join(codons)
        if not dna:
            results.append(0.0)
            continue
        results.append(sum(1 for c in dna.upper() if c in "GC") / len(dna))
    return results


__all__ = ["gc_content", "kmer_diversity", "pairwise_identity"]
