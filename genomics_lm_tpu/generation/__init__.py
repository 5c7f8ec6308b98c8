"""Generation layer: KV-cached decoding and constrained CDS design loops.

The reference decodes cache-free — every sampled token re-runs the full
forward over the clipped context (``src/codonlm/generate.py:13-27``). Here
the hot path is a jitted single-token decode step over a static-shape KV
cache, with an uncached reference path kept for logit-parity gates
(BASELINE.json: "identical next-codon top-k").
"""

from genomics_lm_tpu.generation.genetic_code import (  # noqa: F401
    AA_TO_CODONS,
    CODON_TABLE,
    translate_codons_to_aa,
)
