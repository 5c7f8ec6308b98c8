"""Leakage audit policies + native C++ library bindings."""

import hashlib
import json

import numpy as np
import pytest

from genomics_lm_tpu.data import leakage
from genomics_lm_tpu import native


def rec(seq, split, sid):
    return {"sequence": seq, "split": split, "source_id": sid}


class TestNormalizeTranslate:
    def test_normalize(self):
        assert leakage.normalize_cds(" aug\nuaa ") == "ATGTAA"

    def test_translate(self):
        assert leakage.translate_cds("ATGAAATAA") == "MK"  # trailing stop trimmed
        assert leakage.translate_cds("ATGTAAAAA") == "MXK"  # internal stop → X
        assert leakage.translate_cds("AT") == ""
        assert leakage.translate_cds("ATGAA") == "M"  # partial codon dropped


class TestExactDuplicates:
    def test_detection_and_quarantine(self):
        records = [
            rec("ATGAAATAA", "train", "a"),
            rec("ATGAAATAA", "val", "b"),
            rec("ATGCCCTAA", "train", "c"),
        ]
        violations = leakage.exact_cross_split_duplicates(records)
        assert len(violations) == 1
        assert violations[0]["splits"] == ["train", "val"]

        retained, report = leakage.quarantine_cross_split_exact_duplicates(records)
        # priority test > val > train → the val copy is kept
        assert report["duplicate_family_count"] == 1
        assert report["families"][0]["kept_split"] == "val"
        assert {r["source_id"] for r in retained} == {"b", "c"}
        assert report["removed_by_split"]["train"] == 1

    def test_quarantine_priority_validation(self):
        with pytest.raises(ValueError):
            leakage.quarantine_cross_split_exact_duplicates(
                [], split_priority=("train", "train", "val")
            )


class TestClusterViolations:
    def test_cross_split_clusters(self):
        clusters = {"repA": ["a", "b"], "repC": ["c"]}
        split_by = {"a": "train", "b": "test", "c": "train"}
        v = leakage.cross_split_cluster_violations(clusters, split_by)
        assert len(v) == 1 and v[0]["representative"] == "repA"
        assert v[0]["splits"] == ["train", "test"]


class TestAuditSourceRecords:
    def test_exact_block_writes_report(self, tmp_path):
        records = [rec("ATGAAATAA", "train", "a"), rec("ATGAAATAA", "test", "b")]
        out = tmp_path / "audit.json"
        with pytest.raises(leakage.LeakageAuditError):
            leakage.audit_source_records(records, out, skip_homology=True)
        report = json.loads(out.read_text())
        assert report["status"] == "failed"
        assert "cross_split_exact_duplicates" in report["blocking_reasons"]

    def test_clean_pass_skip_homology(self, tmp_path):
        records = [rec("ATGAAATAA", "train", "a"), rec("ATGCCCTAA", "test", "b")]
        out = tmp_path / "audit.json"
        report = leakage.audit_source_records(records, out, skip_homology=True)
        assert report["status"] == "passed"
        assert report["homology_audit_skipped"] is True

    def test_missing_external_tools_fail_closed(self, tmp_path):
        records = [rec("ATGAAATAA", "train", "a"), rec("ATGCCCTAA", "test", "b")]
        out = tmp_path / "audit.json"
        with pytest.raises(leakage.LeakageAuditError, match="was not found"):
            leakage.audit_source_records(
                records, out, executable="mmseqs-definitely-missing"
            )
        assert json.loads(out.read_text())["status"] == "error"

    def test_native_engine_clusters(self, tmp_path):
        # two near-identical proteins in different splits must cluster → block
        base = "ATGGCTGCAGCTGCGGCAGCCGCTGCAGCTGCGGCAGCC" * 3 + "TAA"
        records = [
            rec(base, "train", "a"),
            rec(base[:-6] + "GCGTAA", "test", "b"),  # near-duplicate
            rec("ATGTTTTACTGGCATCACAAGAAATAA", "train", "c"),
        ]
        out = tmp_path / "audit.json"
        with pytest.raises(leakage.LeakageAuditError, match="protein_clusters"):
            leakage.audit_source_records(records, out, engine="native")
        report = json.loads(out.read_text())
        assert report["engine"] == "native"
        assert report["protein_homology"]["cross_split_cluster_count"] >= 1

    def test_generated_audit_coverage(self, tmp_path):
        training = [rec("ATGAAACCCGGGTTTAAATAG", "train", "t1")]
        generated = [
            rec("ATGAAACCCGGGTTTAAATAG", "gen", "g1"),  # exact copy
            rec("ATGTGCTGCTGCTGCTGCTAA", "gen", "g2"),  # unrelated
        ]
        report = leakage.audit_generated_sequences(
            training, generated, tmp_path / "gen.json",
            nucleotide_window=6, protein_window=3,
        )
        cov = {r["source_id"]: r for r in report["coverage"]}
        assert cov["g1"]["nucleotide_coverage"] == 1.0
        assert cov["g2"]["nucleotide_coverage"] < 0.5


class TestNative:
    def test_build_and_tokenize(self):
        assert native.available(), "native library failed to build"
        ids = native.tokenize_codons("ATGAAATAA")
        from genomics_lm_tpu.tokenizers.codon import stoi

        np.testing.assert_array_equal(ids, [stoi["ATG"], stoi["AAA"], stoi["TAA"]])
        assert native.tokenize_codons("ATGNNN")[1] == -1

    def test_reverse_complement(self):
        assert native.reverse_complement("ATGC") == "GCAT"
        assert native.reverse_complement("TTACAT") == "ATGTAA"

    def test_sha256_matches_hashlib(self):
        for payload in [b"", b"hello", b"x" * 1000, bytes(range(256))]:
            assert native.sha256_hex(payload) == hashlib.sha256(payload).hexdigest()

    def test_minhash_cluster(self):
        seqs = [
            "MKVLAAGMKVLAAGMKVLAAG",
            "MKVLAAGMKVLAAGMKVLAAX",  # near-dup of 0
            "WWWHHHYYYCCCFFFPPPQQQ",  # distinct
        ]
        labels = native.minhash_cluster(seqs, k=3, min_jaccard=0.4)
        assert labels[0] == labels[1]
        assert labels[2] != labels[0]

    def test_native_matches_python_fallback(self):
        seqs = ["AAAABBBBCCCC", "AAAABBBBCCCD", "ZZZZYYYYXXXX", "AAAABBBBCCCC"]
        native_labels = native.minhash_cluster(seqs, k=3, n_hashes=128, min_jaccard=0.3)
        py_labels = native._minhash_cluster_py(seqs, 3, 128, 0.3)
        # same grouping structure (exact jaccard vs estimate may differ at
        # the threshold; identical sequences must always co-cluster)
        assert native_labels[0] == native_labels[3]
        assert py_labels[0] == py_labels[3]
