"""Lossless token chunking and auditable multi-window packing.

Behavioral parity with the reference (``src/codonlm/lossless_packing.py``):

- ``chunk_record``: a fragment is split into chunks of at most
  ``block_size + 1`` tokens with **one-token overlap**, so every next-token
  transition of the source appears in exactly one chunk ("exactly_once"
  transition policy, asserted by the dataset manifest).
- ``pack_chunks``: ``single``/``dynamic`` keep one chunk per window; ``multi``
  packs several complete CDS chunks per window separated by ``sep_id``,
  flushing before/after continuation chunks so overlapping chunks never share
  a window.
- ``packed_arrays``: fixed mode emits shifted X/Y ``(N, block_size)`` int32
  arrays (TPU-friendly static shapes); dynamic mode emits a flat token stream
  plus per-window lengths. Both carry aligned provenance rows
  (``segment_ids/source_positions/chunk_ids``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Mapping

import numpy as np

PACKING_METADATA_FIELDS = [
    "split",
    "window_index",
    "window_token_count",
    "window_token_start",
    "window_token_end",
    "source_id",
    "source_line_idx",
    "fragment_line_idx",
    "fragment_index",
    "chunk_index",
    "source_token_start",
    "source_token_end",
    "codon_start",
    "codon_end",
    "continues_from_previous",
    "continues_to_next",
    "starts_fragment",
    "ends_fragment",
]


@dataclass(frozen=True)
class TokenChunk:
    """One transition-complete chunk derived from a tokenized CDS fragment."""

    tokens: tuple[int, ...]
    source_id: str
    source_line_idx: int
    fragment_line_idx: int
    fragment_index: int
    chunk_index: int
    split: str
    token_start: int
    token_end: int
    codon_start: int
    codon_end: int
    continues_from_previous: bool
    continues_to_next: bool


@dataclass(frozen=True)
class PackedSpan:
    """Location and provenance of a chunk inside a packed token window."""

    source_id: str
    source_line_idx: int
    fragment_line_idx: int
    fragment_index: int
    chunk_index: int
    split: str
    source_token_start: int
    source_token_end: int
    codon_start: int
    codon_end: int
    window_token_start: int
    window_token_end: int
    continues_from_previous: bool
    continues_to_next: bool


@dataclass(frozen=True)
class PackedWindow:
    """A token window and the source spans placed within it."""

    tokens: tuple[int, ...]
    spans: tuple[PackedSpan, ...]


def chunk_record(record: Mapping[str, Any], block_size: int) -> list[TokenChunk]:
    """Chunk one fragment with one-token overlap and complete transition cover.

    ``block_size`` is the number of next-token transitions the model consumes,
    so a chunk holds at most ``block_size + 1`` tokens and consecutive chunks
    share exactly one boundary token.
    """
    if block_size < 1:
        raise ValueError("block_size must be at least 1")
    tokens = tuple(int(t) for t in record["tokens"])
    if len(tokens) < 2:
        return []

    codon_lo = int(record["fragment_codon_start"])
    codon_count = int(record["fragment_codon_end"]) - codon_lo
    capacity = block_size + 1
    chunks: list[TokenChunk] = []
    start = 0
    while start < len(tokens) - 1:
        end = min(start + capacity, len(tokens))
        chunks.append(
            TokenChunk(
                tokens=tokens[start:end],
                source_id=str(record["source_id"]),
                source_line_idx=int(record["source_line_idx"]),
                fragment_line_idx=int(record["fragment_line_idx"]),
                fragment_index=int(record["fragment_index"]),
                chunk_index=len(chunks),
                split=str(record["split"]),
                token_start=start,
                token_end=end,
                # Token index t maps to codon t-1 (token 0 is <BOS_CDS>).
                codon_start=codon_lo + max(0, start - 1),
                codon_end=codon_lo + min(codon_count, end - 1),
                continues_from_previous=start > 0,
                continues_to_next=end < len(tokens),
            )
        )
        if end == len(tokens):
            break
        start = end - 1
    return chunks


def _span(chunk: TokenChunk, window_start: int, window_end: int) -> PackedSpan:
    return PackedSpan(
        source_id=chunk.source_id,
        source_line_idx=chunk.source_line_idx,
        fragment_line_idx=chunk.fragment_line_idx,
        fragment_index=chunk.fragment_index,
        chunk_index=chunk.chunk_index,
        split=chunk.split,
        source_token_start=chunk.token_start,
        source_token_end=chunk.token_end,
        codon_start=chunk.codon_start,
        codon_end=chunk.codon_end,
        window_token_start=window_start,
        window_token_end=window_end,
        continues_from_previous=chunk.continues_from_previous,
        continues_to_next=chunk.continues_to_next,
    )


def pack_chunks(
    chunks: Iterable[TokenChunk],
    *,
    block_size: int,
    mode: str,
    sep_id: int,
) -> list[PackedWindow]:
    """Pack chunks without losing or duplicating any source transition."""
    if mode not in {"single", "dynamic", "multi"}:
        raise ValueError(f"Unsupported pack mode: {mode!r}")
    capacity = block_size + 1
    chunk_list = list(chunks)
    if any(len(c.tokens) > capacity for c in chunk_list):
        raise ValueError("Chunk exceeds block_size + 1 token capacity")

    if mode in {"single", "dynamic"}:
        return [
            PackedWindow(tokens=c.tokens, spans=(_span(c, 0, len(c.tokens)),))
            for c in chunk_list
        ]

    windows: list[PackedWindow] = []
    cur_tokens: list[int] = []
    cur_spans: list[PackedSpan] = []

    def flush() -> None:
        nonlocal cur_tokens, cur_spans
        if len(cur_tokens) >= 2:
            windows.append(PackedWindow(tokens=tuple(cur_tokens), spans=tuple(cur_spans)))
        cur_tokens = []
        cur_spans = []

    for chunk in chunk_list:
        # Continuation chunks must start their own window: the one-token
        # overlap would otherwise duplicate a transition across the <SEP>.
        if chunk.continues_from_previous and cur_tokens:
            flush()
        need_sep = 1 if cur_tokens else 0
        if len(cur_tokens) + need_sep + len(chunk.tokens) > capacity:
            flush()
            need_sep = 0
        if need_sep:
            cur_tokens.append(sep_id)
        start = len(cur_tokens)
        cur_tokens.extend(chunk.tokens)
        cur_spans.append(_span(chunk, start, len(cur_tokens)))
        if chunk.continues_to_next or len(cur_tokens) == capacity:
            flush()
    flush()
    return windows


def packing_metadata_rows(split: str, windows: Iterable[PackedWindow]) -> list[dict[str, Any]]:
    """Portable tabular provenance rows for packed windows."""
    rows = []
    for window_index, window in enumerate(windows):
        for span in window.spans:
            rows.append(
                {
                    "split": split,
                    "window_index": window_index,
                    "window_token_count": len(window.tokens),
                    "window_token_start": span.window_token_start,
                    "window_token_end": span.window_token_end,
                    "source_id": span.source_id,
                    "source_line_idx": span.source_line_idx,
                    "fragment_line_idx": span.fragment_line_idx,
                    "fragment_index": span.fragment_index,
                    "chunk_index": span.chunk_index,
                    "source_token_start": span.source_token_start,
                    "source_token_end": span.source_token_end,
                    "codon_start": span.codon_start,
                    "codon_end": span.codon_end,
                    "continues_from_previous": int(span.continues_from_previous),
                    "continues_to_next": int(span.continues_to_next),
                    "starts_fragment": int(span.source_token_start == 0),
                    "ends_fragment": int(not span.continues_to_next),
                }
            )
    return rows


def packed_arrays(
    windows: Iterable[PackedWindow], *, block_size: int, mode: str
) -> dict[str, np.ndarray]:
    """Packed windows → loader-compatible arrays with aligned provenance."""
    window_list = list(windows)
    seg_rows, pos_rows, chunk_rows = [], [], []
    for window in window_list:
        n = len(window.tokens)
        seg = np.full(n, -1, dtype=np.int32)
        pos = np.full(n, -1, dtype=np.int32)
        cid = np.full(n, -1, dtype=np.int32)
        for span in window.spans:
            lo, hi = span.window_token_start, span.window_token_end
            seg[lo:hi] = span.fragment_line_idx
            pos[lo:hi] = np.arange(span.source_token_start, span.source_token_end, dtype=np.int32)
            cid[lo:hi] = span.chunk_index
        seg_rows.append(seg)
        pos_rows.append(pos)
        chunk_rows.append(cid)

    if mode == "dynamic":
        def cat(rows, builder=None):
            if not rows:
                return np.zeros((0,), dtype=np.int32)
            return np.concatenate(rows)

        return {
            "X": cat([np.asarray(w.tokens, dtype=np.int32) for w in window_list]),
            "lengths": np.asarray([len(w.tokens) for w in window_list], dtype=np.int32),
            "segment_ids": cat(seg_rows),
            "source_positions": cat(pos_rows),
            "chunk_ids": cat(chunk_rows),
        }

    n_win = len(window_list)
    X = np.zeros((n_win, block_size), dtype=np.int32)
    Y = np.zeros((n_win, block_size), dtype=np.int32)
    segment_ids = np.full((n_win, block_size), -1, dtype=np.int32)
    source_positions = np.full((n_win, block_size), -1, dtype=np.int32)
    chunk_ids = np.full((n_win, block_size), -1, dtype=np.int32)
    for i, window in enumerate(window_list):
        tokens = np.asarray(window.tokens, dtype=np.int32)
        t = len(tokens) - 1  # number of transitions
        X[i, :t] = tokens[:-1]
        Y[i, :t] = tokens[1:]
        segment_ids[i, :t] = seg_rows[i][:-1]
        source_positions[i, :t] = pos_rows[i][:-1]
        chunk_ids[i, :t] = chunk_rows[i][:-1]
    return {
        "X": X,
        "Y": Y,
        "segment_ids": segment_ids,
        "source_positions": source_positions,
        "chunk_ids": chunk_ids,
    }


__all__ = [
    "PACKING_METADATA_FIELDS",
    "PackedSpan",
    "PackedWindow",
    "TokenChunk",
    "chunk_record",
    "pack_chunks",
    "packed_arrays",
    "packing_metadata_rows",
]
