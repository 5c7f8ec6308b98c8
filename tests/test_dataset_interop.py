"""Bit-for-bit dataset interop with the reference framework.

SURVEY §7 step 2 requires dataset artifacts to be "shared bit-for-bit with
the reference format". These tests prove it against the *actual* reference
implementation (``src/codonlm/lossless_packing.py:80-303`` and
``src/codonlm/dataset_manifest.py:57-209``), imported read-only from the
mounted checkout — not against re-derived properties:

- the same fragment records chunked + packed by both frameworks yield
  byte-identical X/Y/lengths/segment_ids/source_positions/chunk_ids arrays
  and identical provenance metadata rows, across pack modes;
- a dataset packed and manifested entirely by reference code validates
  under this repo's fail-closed manifest loader (artifact hashes included),
  and its content-addressed dataset id is reproduced by this repo's
  identity algorithm;
- a dataset prepared end-to-end by this repo's pipeline validates under the
  reference's ``validate_dataset_manifest`` with artifact verification on;
- a reference-packed NPZ feeds this repo's ``PackedDataset`` loader and
  yields exactly the batches the repo's own packing would.

Skipped when the reference checkout is unavailable.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from genomics_lm_tpu.data import manifest as repo_manifest
from genomics_lm_tpu.data import packing as repo_packing
from genomics_lm_tpu.data.datasets import PackedDataset
from genomics_lm_tpu.data.pipeline import prepare_dataset
from genomics_lm_tpu.tokenizers import codon as codon_tok
from genomics_lm_tpu.utils.torch_bridge import reference_root

REF_SRC = reference_root() / "src"

if not (REF_SRC / "codonlm" / "lossless_packing.py").exists():  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)


def _load_reference_module(dotted: str):
    """Import ``codonlm.<x>`` from the mounted checkout, with sys.path
    pinned only for the duration of the import (relative imports inside
    the reference package need the package root visible)."""
    name = f"codonlm.{dotted}"
    if name in sys.modules:
        return sys.modules[name]
    sys.path.insert(0, str(REF_SRC))
    try:
        pkg_init = REF_SRC / "codonlm" / "__init__.py"
        if "codonlm" not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                "codonlm", pkg_init, submodule_search_locations=[str(pkg_init.parent)]
            )
            pkg = importlib.util.module_from_spec(spec)
            sys.modules["codonlm"] = pkg
            spec.loader.exec_module(pkg)
        module = importlib.import_module(name)
    finally:
        sys.path.remove(str(REF_SRC))
    return module


ref_packing = _load_reference_module("lossless_packing")
ref_manifest = _load_reference_module("dataset_manifest")


# --- shared fixture records --------------------------------------------------

SEP_ID = codon_tok.SEP_ID
BLOCK = 24  # small enough that fixtures exercise every chunking branch


def _record(tokens, *, source_line_idx, fragment_line_idx, split="train",
            fragment_index=0, source_id=None):
    tokens = list(tokens)
    return {
        "tokens": tokens,
        "source_id": source_id or f"src{source_line_idx}",
        "source_line_idx": source_line_idx,
        "fragment_line_idx": fragment_line_idx,
        "fragment_index": fragment_index,
        "split": split,
        # token 0 is <BOS_CDS>; the rest are codons for these fixtures
        "fragment_codon_start": 0,
        "fragment_codon_end": max(0, len(tokens) - 1),
    }


def _fixture_records():
    """Fragments covering every chunking branch: sub-capacity, exactly at
    capacity (block+1 tokens), multi-chunk with 1-token overlap, a
    2-token minimum, and a degenerate <2-token record (yields nothing)."""
    rng = np.random.default_rng(20260818)
    toks = lambda n: [1] + list(rng.integers(4, 68, size=n - 1))
    return [
        _record(toks(7), source_line_idx=0, fragment_line_idx=0),
        _record(toks(BLOCK + 1), source_line_idx=1, fragment_line_idx=1),
        _record(toks(3 * BLOCK), source_line_idx=2, fragment_line_idx=2),
        _record(toks(2), source_line_idx=3, fragment_line_idx=3),
        _record(toks(12), source_line_idx=4, fragment_line_idx=4,
                fragment_index=1),
        _record([1], source_line_idx=5, fragment_line_idx=5),  # too short
        _record(toks(BLOCK // 2), source_line_idx=6, fragment_line_idx=6),
        _record(toks(2 * BLOCK + 5), source_line_idx=7, fragment_line_idx=7),
    ]


def _chunks(module, records, block_size=BLOCK):
    return [c for rec in records for c in module.chunk_record(rec, block_size)]


class TestPackingBitForBit:
    """chunk → pack → arrays produces byte-identical artifacts both ways."""

    @pytest.mark.parametrize(
        "pack_mode,array_mode",
        [("multi", "fixed"), ("single", "fixed"), ("dynamic", "dynamic")],
    )
    def test_packed_arrays_identical(self, pack_mode, array_mode):
        records = _fixture_records()
        ours = repo_packing.packed_arrays(
            repo_packing.pack_chunks(
                _chunks(repo_packing, records),
                block_size=BLOCK, mode=pack_mode, sep_id=SEP_ID,
            ),
            block_size=BLOCK, mode=array_mode,
        )
        theirs = ref_packing.packed_arrays(
            ref_packing.pack_chunks(
                _chunks(ref_packing, records),
                block_size=BLOCK, mode=pack_mode, sep_id=SEP_ID,
            ),
            block_size=BLOCK, mode=array_mode,
        )
        assert set(ours) == set(theirs)
        for key in sorted(ours):
            assert ours[key].dtype == theirs[key].dtype, key
            np.testing.assert_array_equal(ours[key], theirs[key], err_msg=key)

    def test_chunk_provenance_identical(self):
        records = _fixture_records()
        ours = _chunks(repo_packing, records)
        theirs = _chunks(ref_packing, records)
        assert len(ours) == len(theirs)
        fields = (
            "tokens", "source_id", "source_line_idx", "fragment_line_idx",
            "fragment_index", "chunk_index", "split", "token_start",
            "token_end", "codon_start", "codon_end",
            "continues_from_previous", "continues_to_next",
        )
        for a, b in zip(ours, theirs):
            for field in fields:
                assert getattr(a, field) == getattr(b, field), field

    def test_metadata_rows_identical(self):
        records = _fixture_records()
        ours = repo_packing.packing_metadata_rows(
            "train",
            repo_packing.pack_chunks(
                _chunks(repo_packing, records),
                block_size=BLOCK, mode="multi", sep_id=SEP_ID,
            ),
        )
        theirs = ref_packing.packing_metadata_rows(
            "train",
            ref_packing.pack_chunks(
                _chunks(ref_packing, records),
                block_size=BLOCK, mode="multi", sep_id=SEP_ID,
            ),
        )
        assert ours == theirs

    def test_reference_npz_feeds_repo_loader(self, tmp_path):
        """Arrays written by the reference's packer load through this repo's
        ``PackedDataset`` identically to repo-packed arrays."""
        records = _fixture_records()
        ref_arrays = ref_packing.packed_arrays(
            ref_packing.pack_chunks(
                _chunks(ref_packing, records),
                block_size=BLOCK, mode="multi", sep_id=SEP_ID,
            ),
            block_size=BLOCK, mode="fixed",
        )
        path = tmp_path / "ref_train.npz"
        np.savez(path, X=ref_arrays["X"], Y=ref_arrays["Y"])
        ds = PackedDataset([path])
        repo_arrays = repo_packing.packed_arrays(
            repo_packing.pack_chunks(
                _chunks(repo_packing, records),
                block_size=BLOCK, mode="multi", sep_id=SEP_ID,
            ),
            block_size=BLOCK, mode="fixed",
        )
        got_x, got_y = ds.fetch_batch(np.arange(len(ds)))[:2]
        np.testing.assert_array_equal(np.asarray(got_x), repo_arrays["X"])
        np.testing.assert_array_equal(np.asarray(got_y), repo_arrays["Y"])


# --- manifest interop ---------------------------------------------------------


def _codon_sequences(rng, n, n_codons):
    bases = np.array(list("ACGT"))
    out = []
    for _ in range(n):
        body = "".join(rng.choice(bases, size=3 * n_codons))
        out.append("ATG" + body + "TAA")
    return out


def _prepare_with_repo(tmp_path):
    rng = np.random.default_rng(7)
    records = [
        {
            "sequence": seq,
            "source_id": f"cds{i}",
            "genome": f"g{i % 5}",
            "genus": f"genus{i % 3}",
            "organism": f"org{i % 5}",
        }
        for i, seq in enumerate(_codon_sequences(rng, 24, 40))
    ]
    out_dir = tmp_path / "repo_prepared"
    manifest = prepare_dataset(
        records, out_dir, block_size=BLOCK, pack_mode="multi",
        group_by="genome", split_seed=3, skip_homology=True,
        audit_engine="native",
    )
    return manifest, out_dir / "manifest.json"


class TestManifestInterop:
    def test_identity_algorithms_agree(self, tmp_path):
        """Same manifest dict → same content-addressed dataset id."""
        manifest, _ = _prepare_with_repo(tmp_path)
        assert ref_manifest.dataset_identity(manifest) == manifest["dataset"]["id"]
        assert repo_manifest.dataset_identity(manifest) == manifest["dataset"]["id"]

    def test_repo_dataset_passes_reference_validation(self, tmp_path):
        """A dataset prepared end-to-end by this repo's pipeline is accepted
        by the reference's fail-closed validator, artifact hashes and all."""
        _, manifest_path = _prepare_with_repo(tmp_path)
        validated = ref_manifest.load_dataset_manifest(
            manifest_path, verify_artifacts=True
        )
        assert validated["packing"]["transition_policy"] == "exactly_once"

    def test_reference_built_manifest_passes_repo_validation(self, tmp_path):
        """Artifacts packed and manifested by REFERENCE code (packer, hash
        entries, finalize) validate under this repo's loader bit-for-bit."""
        out = tmp_path / "ref_prepared"
        out.mkdir()
        rng = np.random.default_rng(11)
        splits = {"train": 6, "val": 2, "test": 2}
        line = 0
        per_split_records: dict[str, list[dict]] = {}
        all_sequences = []
        for split, count in splits.items():
            recs = []
            for seq in _codon_sequences(rng, count, 30):
                result = codon_tok.tokenize_cds_fragments(
                    seq, source_id=f"{split}{line}", min_fragment_codons=5,
                    termination="eos",
                )
                for frag in result.fragments:
                    recs.append({
                        "tokens": frag.ids,
                        "source_id": f"{split}{line}",
                        "source_line_idx": line,
                        "fragment_line_idx": line,
                        "fragment_index": frag.fragment_index,
                        "split": split,
                        "fragment_codon_start": frag.codon_start,
                        "fragment_codon_end": frag.codon_end,
                    })
                all_sequences.append(seq)
                line += 1
            per_split_records[split] = recs

        itos_path = out / "itos.txt"
        codon_tok.write_itos(itos_path)
        artifacts: dict[str, Path] = {"vocabulary": itos_path}
        # pack every split with the REFERENCE packer
        for split, recs in per_split_records.items():
            chunks = [
                c for rec in recs for c in ref_packing.chunk_record(rec, BLOCK)
            ]
            windows = ref_packing.pack_chunks(
                chunks, block_size=BLOCK, mode="multi", sep_id=SEP_ID
            )
            arrays = ref_packing.packed_arrays(
                windows, block_size=BLOCK, mode="fixed"
            )
            npz = out / f"{split}_bs{BLOCK}.npz"
            np.savez(npz, X=arrays["X"], Y=arrays["Y"])
            artifacts[f"{split}_tokens"] = npz
            rows = ref_packing.packing_metadata_rows(split, windows)
            meta = out / f"{split}_packing_metadata.tsv"
            header = list(rows[0]) if rows else ["split"]
            meta.write_text(
                "\t".join(header) + "\n"
                + "\n".join("\t".join(str(r[k]) for k in header) for r in rows)
                + "\n"
            )
            artifacts[f"{split}_packing_metadata"] = meta
        for name, text in (
            ("source_metadata", "source_id\tsplit\n"),
            ("fragment_metadata", "fragment_line_idx\n"),
            ("source_dna", "\n".join(all_sequences) + "\n"),
            ("leakage_audit", json.dumps({"status": "passed"}) + "\n"),
        ):
            path = out / f"{name}.txt"
            path.write_text(text)
            artifacts[name] = path

        manifest = {
            "schema": {
                "name": ref_manifest.SCHEMA_NAME,
                "version": ref_manifest.SCHEMA_VERSION,
            },
            "dataset": {
                "source_record_count": sum(splits.values()),
                "scientific_valid": False,
            },
            "split_policy": {
                "record_counts": splits,
                "requested_fractions": {"val": 0.2, "test": 0.2},
                "scientific_valid": False,
                "effective_group_by": "sequence",
            },
            "leakage_audit": {
                "status": "passed",
                "homology_audit_skipped": True,
                "exact_duplicate_override": False,
            },
            "vocabulary": {
                "size": len(codon_tok.VOCAB),
                "sha256": ref_manifest.file_sha256(itos_path),
                "special_tokens": {
                    tok: i for i, tok in enumerate(codon_tok.SPECIALS)
                },
            },
            "tokenization": {"ambiguous_codon_policy": "fragment"},
            "packing": {
                "mode": "multi",
                "block_size": BLOCK,
                "transition_policy": "exactly_once",
            },
            "reproducibility": {"split_seed": 11, "packing_seed": 11},
            "sources": {},
            "artifacts": {
                name: ref_manifest.artifact_entry(path, out, role=name)
                for name, path in artifacts.items()
            },
        }
        manifest = ref_manifest.finalize_manifest(manifest)
        manifest_path = out / "manifest.json"
        manifest_path.write_text(json.dumps(manifest, indent=2, sort_keys=True))

        # reference accepts its own product…
        ref_manifest.load_dataset_manifest(manifest_path, verify_artifacts=True)
        # …and this repo accepts it bit-for-bit, identity included
        validated = repo_manifest.load_dataset_manifest(
            manifest_path, verify_artifacts=True
        )
        assert validated["dataset"]["id"] == manifest["dataset"]["id"]
        assert repo_manifest.dataset_identity(validated) == manifest["dataset"]["id"]

    def test_tampered_reference_artifact_rejected_by_repo(self, tmp_path):
        """Fail-closed symmetry: flip one byte in a reference-hashed artifact
        and the repo validator must reject it."""
        _, manifest_path = _prepare_with_repo(tmp_path)
        manifest = json.loads(manifest_path.read_text())
        ref_manifest.validate_dataset_manifest(
            manifest, manifest_path, verify_artifacts=True
        )
        npz = manifest_path.parent / manifest["artifacts"]["train_tokens"]["path"]
        raw = bytearray(npz.read_bytes())
        raw[-1] ^= 0xFF
        npz.write_bytes(bytes(raw))
        with pytest.raises(repo_manifest.DatasetManifestError):
            repo_manifest.validate_dataset_manifest(
                manifest, manifest_path, verify_artifacts=True
            )
        with pytest.raises(ref_manifest.DatasetManifestError):
            ref_manifest.validate_dataset_manifest(
                manifest, manifest_path, verify_artifacts=True
            )
