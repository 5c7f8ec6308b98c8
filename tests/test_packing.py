"""Lossless packing: transition-exactness, overlap, and array emission."""

import numpy as np
import pytest

from genomics_lm_tpu.data.packing import (
    TokenChunk,
    chunk_record,
    pack_chunks,
    packed_arrays,
    packing_metadata_rows,
)


def make_record(tokens, **overrides):
    rec = {
        "tokens": tokens,
        "source_id": "src0",
        "source_line_idx": 0,
        "fragment_line_idx": 0,
        "fragment_index": 0,
        "split": "train",
        "fragment_codon_start": 0,
        "fragment_codon_end": max(0, len(tokens) - 2),
    }
    rec.update(overrides)
    return rec


def all_transitions(tokens):
    return {(i, tokens[i], tokens[i + 1]) for i in range(len(tokens) - 1)}


class TestChunkRecord:
    def test_short_fragment_single_chunk(self):
        chunks = chunk_record(make_record([1, 10, 11, 2]), block_size=8)
        assert len(chunks) == 1
        assert chunks[0].tokens == (1, 10, 11, 2)
        assert not chunks[0].continues_from_previous
        assert not chunks[0].continues_to_next

    def test_one_token_overlap(self):
        tokens = list(range(1, 12))  # 11 tokens
        chunks = chunk_record(make_record(tokens), block_size=4)  # capacity 5
        # chunks cover [0:5], [4:9], [8:11]
        assert [(c.token_start, c.token_end) for c in chunks] == [(0, 5), (4, 9), (8, 11)]
        assert chunks[0].tokens[-1] == chunks[1].tokens[0]
        assert chunks[1].continues_from_previous and chunks[1].continues_to_next

    def test_transition_exactly_once(self):
        tokens = list(range(100, 137))
        chunks = chunk_record(make_record(tokens), block_size=7)
        seen = []
        for c in chunks:
            for i in range(len(c.tokens) - 1):
                seen.append((c.token_start + i, c.tokens[i], c.tokens[i + 1]))
        assert len(seen) == len(set(seen)), "duplicated transition"
        assert set(seen) == all_transitions(tokens)

    def test_too_short(self):
        assert chunk_record(make_record([5]), block_size=4) == []
        with pytest.raises(ValueError):
            chunk_record(make_record([1, 2, 3]), block_size=0)


class TestPackChunks:
    def test_single_mode_passthrough(self):
        chunks = chunk_record(make_record([1, 10, 11, 2]), block_size=8)
        windows = pack_chunks(chunks, block_size=8, mode="single", sep_id=3)
        assert len(windows) == 1
        assert windows[0].tokens == (1, 10, 11, 2)

    def test_multi_mode_sep_packing(self):
        c1 = chunk_record(make_record([1, 10, 2]), block_size=10)
        c2 = chunk_record(make_record([1, 11, 2], fragment_line_idx=1), block_size=10)
        windows = pack_chunks(c1 + c2, block_size=10, mode="multi", sep_id=3)
        assert len(windows) == 1
        assert windows[0].tokens == (1, 10, 2, 3, 1, 11, 2)
        assert windows[0].spans[0].window_token_start == 0
        assert windows[0].spans[1].window_token_start == 4

    def test_multi_mode_flush_on_capacity(self):
        c1 = chunk_record(make_record([1, 10, 11, 2]), block_size=5)
        c2 = chunk_record(make_record([1, 12, 13, 2], fragment_line_idx=1), block_size=5)
        windows = pack_chunks(c1 + c2, block_size=5, mode="multi", sep_id=3)
        # capacity 6: 4 + sep + 4 > 6 → two windows
        assert len(windows) == 2

    def test_multi_mode_continuation_isolated(self):
        long = chunk_record(make_record(list(range(1, 12))), block_size=4)
        short = chunk_record(make_record([1, 90, 2], fragment_line_idx=1), block_size=4)
        windows = pack_chunks(short + long, block_size=4, mode="multi", sep_id=3)
        # continuation chunks each occupy their own window
        for w in windows:
            spans_cont = [s for s in w.spans if s.continues_from_previous or s.continues_to_next]
            if spans_cont:
                assert len(w.spans) == 1

    def test_transition_conservation_through_packing(self):
        records = [
            make_record(list(range(10, 27)), fragment_line_idx=0, source_line_idx=0),
            make_record([1, 50, 51, 2], fragment_line_idx=1, source_line_idx=1),
            make_record([1, 60, 2], fragment_line_idx=2, source_line_idx=2),
        ]
        chunks = [c for r in records for c in chunk_record(r, block_size=6)]
        windows = pack_chunks(chunks, block_size=6, mode="multi", sep_id=3)
        # count source transitions recovered from spans
        recovered = set()
        for w in windows:
            for s in w.spans:
                for t in range(s.source_token_start, s.source_token_end - 1):
                    recovered.add((s.fragment_line_idx, t))
        expected = set()
        for r in records:
            for t in range(len(r["tokens"]) - 1):
                expected.add((r["fragment_line_idx"], t))
        assert recovered == expected

    def test_binpack_conserves_transitions_and_cuts_padding(self):
        """binpack (first-fit-decreasing) keeps the exactly-once transition
        contract while wasting no more capacity than arrival-order multi."""
        import numpy as np

        rng = np.random.default_rng(0)
        records = []
        for i in range(200):
            n = int(np.clip(rng.lognormal(3.0, 0.8), 2, 40))
            records.append(make_record(
                [1] + [int(t) for t in rng.integers(10, 60, n)] + [2],
                fragment_line_idx=i, source_line_idx=i))
        chunks = [c for r in records for c in chunk_record(r, block_size=32)]

        def recovered(windows):
            got = set()
            for w in windows:
                for s in w.spans:
                    for t in range(s.source_token_start, s.source_token_end - 1):
                        got.add((s.fragment_line_idx, t))
            return got

        expected = set()
        for r in records:
            for t in range(len(r["tokens"]) - 1):
                expected.add((r["fragment_line_idx"], t))

        multi = pack_chunks(chunks, block_size=32, mode="multi", sep_id=3)
        packed = pack_chunks(chunks, block_size=32, mode="binpack", sep_id=3)
        assert recovered(packed) == expected
        waste = lambda ws: sum(33 - len(w.tokens) for w in ws) + 33 * 0  # noqa: E731
        assert len(packed) <= len(multi)
        assert waste(packed) <= waste(multi)
        # determinism: independent of input chunk order
        rng.shuffle(chunks)
        packed2 = pack_chunks(chunks, block_size=32, mode="binpack", sep_id=3)
        assert [w.tokens for w in packed2] == [w.tokens for w in packed]

    def test_oversize_chunk_rejected(self):
        big = TokenChunk(
            tokens=tuple(range(10)), source_id="s", source_line_idx=0,
            fragment_line_idx=0, fragment_index=0, chunk_index=0, split="train",
            token_start=0, token_end=10, codon_start=0, codon_end=8,
            continues_from_previous=False, continues_to_next=False,
        )
        with pytest.raises(ValueError):
            pack_chunks([big], block_size=4, mode="multi", sep_id=3)

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            pack_chunks([], block_size=4, mode="weird", sep_id=3)


class TestPackedArrays:
    def test_fixed_arrays_shifted(self):
        chunks = chunk_record(make_record([1, 10, 11, 2]), block_size=8)
        windows = pack_chunks(chunks, block_size=8, mode="single", sep_id=3)
        arrays = packed_arrays(windows, block_size=8, mode="single")
        assert arrays["X"].shape == (1, 8)
        np.testing.assert_array_equal(arrays["X"][0, :3], [1, 10, 11])
        np.testing.assert_array_equal(arrays["Y"][0, :3], [10, 11, 2])
        assert arrays["X"][0, 3:].sum() == 0  # pad
        assert (arrays["segment_ids"][0, 3:] == -1).all()

    def test_dynamic_arrays(self):
        recs = [make_record([1, 10, 11, 2]), make_record([1, 12, 2], fragment_line_idx=1)]
        chunks = [c for r in recs for c in chunk_record(r, block_size=8)]
        windows = pack_chunks(chunks, block_size=8, mode="dynamic", sep_id=3)
        arrays = packed_arrays(windows, block_size=8, mode="dynamic")
        np.testing.assert_array_equal(arrays["lengths"], [4, 3])
        assert arrays["X"].shape == (7,)
        np.testing.assert_array_equal(arrays["X"], [1, 10, 11, 2, 1, 12, 2])

    def test_empty(self):
        arrays = packed_arrays([], block_size=8, mode="dynamic")
        assert arrays["X"].shape == (0,)
        arrays = packed_arrays([], block_size=8, mode="single")
        assert arrays["X"].shape == (0, 8)

    def test_metadata_rows(self):
        chunks = chunk_record(make_record(list(range(1, 12))), block_size=4)
        windows = pack_chunks(chunks, block_size=4, mode="multi", sep_id=3)
        rows = packing_metadata_rows("train", windows)
        assert all(r["split"] == "train" for r in rows)
        assert rows[0]["starts_fragment"] == 1
        assert rows[-1]["ends_fragment"] == 1
