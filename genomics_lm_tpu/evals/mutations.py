"""In-silico mutagenesis: per-position Δlog-P for all 64 codon substitutions.

Parity: reference ``src/codonlm/score_mutations.py`` — for one CDS, the
log-probability of every codon at every position given the left context,
reported as Δ vs the wild-type codon (sensitive positions proxy
conservation). The reference re-runs the model per sliding window; here one
jitted forward yields all positions at once (log-softmax of the next-token
logits at each position), with a sliding-window path for CDS longer than the
block.
"""

from __future__ import annotations

import csv
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.tokenizers.codon import BOS_ID, CODONS, CODON_BASE_ID, stoi


def dna_to_ids(dna: str) -> list[int]:
    """DNA → [BOS, codons...] skipping ambiguous codons (ref :15-27)."""
    s = dna.strip().upper().replace("U", "T")
    L = (len(s) // 3) * 3
    ids = [BOS_ID]
    for i in range(0, L, 3):
        idx = stoi.get(s[i : i + 3])
        if idx is not None:
            ids.append(idx)
    return ids


def score_mutations(
    params,
    cfg: CodonGPTConfig,
    dna: str,
) -> list[dict]:
    """Per-position rows: wild-type codon, WT log-prob, all 64 mutant log-probs.

    Position t's distribution is the model's next-token prediction given
    tokens < t (BOS-anchored), i.e. the same conditional the reference
    scores. Long sequences stream through overlapping windows.
    """
    ids = dna_to_ids(dna)
    if len(ids) < 2:
        return []

    @jax.jit
    def logp_fn(idx_batch):
        logits, _ = codon_gpt.forward(params, cfg, idx_batch)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    rows: list[dict] = []
    block = cfg.block_size
    position = 1  # first codon position in ids
    while position < len(ids):
        # window must include at least one token before `position` so the
        # model's next-token prediction at position-1 is available
        start = max(0, position - block + 1)
        window = ids[start : start + block]
        logp = np.asarray(logp_fn(jnp.asarray([window], jnp.int32)))[0]
        # scores for positions in this window beyond already-emitted ones
        for local in range(position - start, len(window)):
            target_global = start + local
            if target_global >= len(ids):
                break
            wt_id = ids[target_global]
            pred = logp[local - 1]  # distribution for token at `local`
            codon_logps = pred[CODON_BASE_ID : CODON_BASE_ID + 64]
            wt_logp = float(pred[wt_id])
            rows.append(
                {
                    "position": target_global - 1,  # codon index (0-based)
                    "wt_codon": CODONS[wt_id - CODON_BASE_ID]
                    if wt_id >= CODON_BASE_ID
                    else str(wt_id),
                    "wt_logp": wt_logp,
                    **{
                        f"logp_{codon}": float(codon_logps[i])
                        for i, codon in enumerate(CODONS)
                    },
                    **{
                        f"delta_{codon}": float(codon_logps[i]) - wt_logp
                        for i, codon in enumerate(CODONS)
                    },
                }
            )
        position = start + len(window)
    return rows


def write_mutation_tsv(rows: list[dict], out_path: str | Path) -> None:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if not rows:
        out_path.write_text("")
        return
    with out_path.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()), delimiter="\t")
        writer.writeheader()
        writer.writerows(rows)


__all__ = ["dna_to_ids", "score_mutations", "write_mutation_tsv"]
