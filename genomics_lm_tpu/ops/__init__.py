"""Compute ops: XLA reference implementations + Pallas TPU kernels.

- ``masks``   — causal / segment / local-window attention mask builders
- ``losses``  — f32 cross-entropy (PyTorch-semantics weighted mean, label
  smoothing, ignore-index), multi-offset and termination auxiliary losses
- ``attention`` — einsum attention (XLA reference path) + dispatcher
- ``flash_attention`` — Pallas segment-aware flash-attention kernel
"""
