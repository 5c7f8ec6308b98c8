"""Data layer: lossless packing, packed datasets, manifests, leakage audit.

Artifact formats are bit-compatible with the reference so frozen corrected
datasets can be consumed directly: NPZ packs with ``X/Y`` (fixed) or
``X/lengths`` (dynamic) arrays plus ``segment_ids/source_positions/chunk_ids``
provenance, uint8 ``_X.npy/_Y.npy/_lengths.npy`` mmap sidecars, and the
content-addressed ``codonlm_dataset_manifest v1`` JSON schema.
"""

from genomics_lm_tpu.data.packing import (  # noqa: F401
    PACKING_METADATA_FIELDS,
    PackedSpan,
    PackedWindow,
    TokenChunk,
    chunk_record,
    pack_chunks,
    packed_arrays,
    packing_metadata_rows,
)
