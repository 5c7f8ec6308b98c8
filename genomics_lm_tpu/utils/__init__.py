"""Small shared utilities (metrics IO, tree helpers)."""

from genomics_lm_tpu.utils.metrics_io import read_metrics, write_metrics  # noqa: F401
