"""Functional JAX model definitions.

Models are pure functions over explicit parameter pytrees (no module
framework): ``init(rng, cfg) → params`` and ``forward(params, cfg, ...) →
(logits, loss, aux)``. Per-layer parameters are stacked on a leading axis and
iterated with ``lax.scan`` so compile time and HBM layout stay flat in depth,
and sharding rules apply uniformly across layers.
"""

from genomics_lm_tpu.models.config import CodonGPTConfig  # noqa: F401
from genomics_lm_tpu.models import codon_gpt  # noqa: F401
