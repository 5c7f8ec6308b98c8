"""Fail-closed evaluation provenance (evals/provenance.py).

Spec: reference ``src/codonlm/evaluation_provenance.py`` — tampering with a
manifest, mixing checkpoints across datasets, or pairing embeddings from
different models/data must fail loudly.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from genomics_lm_tpu.data import manifest as manifest_lib
from genomics_lm_tpu.data.pipeline import prepare_dataset
from genomics_lm_tpu.evals import provenance as prov


def make_records(n_genomes=6, per=4, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for g in range(n_genomes):
        for i in range(per):
            seq = "ATG" + "".join(
                rng.choice(["AAA", "CCC", "GGG", "TTC", "GAT", "CTG"], 30)
            ) + "TAA"
            out.append({
                "sequence": seq,
                "source_id": f"g{g}:c{i}",
                "genome": f"genome_{g}",
                "genus": f"genus_{g % 3}",
            })
    return out


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("provenance_ds") / "ds"
    prepare_dataset(
        make_records(), d, block_size=32, skip_homology=False,
        audit_engine="native",
    )
    return d


@pytest.fixture(scope="module")
def scientific_dataset_dir(tmp_path_factory, dataset_dir):
    """A copy of the dataset whose manifest claims scientific_valid.

    Only the external-tool audit can produce this in production; tests flip
    the flags and re-finalize the content identity to simulate it.
    """
    import shutil

    d = tmp_path_factory.mktemp("provenance_sci") / "ds"
    shutil.copytree(dataset_dir, d)
    manifest = json.loads((d / "manifest.json").read_text())
    manifest["dataset"]["scientific_valid"] = True
    manifest["split_policy"]["scientific_valid"] = True
    manifest["leakage_audit"]["homology_audit_skipped"] = False
    manifest = manifest_lib.finalize_manifest(manifest)
    (d / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return d


class TestManifestBinding:
    def test_binds_and_reports_identity(self, dataset_dir):
        manifest, record = prov.bind_dataset_manifest(
            dataset_dir / "manifest.json", require_scientific=False
        )
        assert record["status"] == "frozen_manifest_verified"
        assert record["dataset_id"] == manifest["dataset"]["id"]
        assert record["vocabulary"]["sha256"]

    def test_non_scientific_fails_closed(self, dataset_dir):
        with pytest.raises(prov.EvaluationProvenanceError, match="scientific_valid"):
            prov.bind_dataset_manifest(
                dataset_dir / "manifest.json", require_scientific=True
            )

    def test_scientific_manifest_passes(self, scientific_dataset_dir):
        _, record = prov.bind_dataset_manifest(
            scientific_dataset_dir / "manifest.json", require_scientific=True
        )
        assert record["scientific_valid"] is True

    def test_artifact_pinning(self, dataset_dir):
        good = dataset_dir / "test_bs32.npz"
        _, record = prov.bind_dataset_manifest(
            dataset_dir / "manifest.json",
            expected_artifacts={"test_tokens": good},
            require_scientific=False,
        )
        assert record["bound_artifacts"]["test_tokens"]["sha256"]
        wrong = dataset_dir / "train_bs32.npz"
        with pytest.raises(prov.EvaluationProvenanceError, match="does not match"):
            prov.bind_dataset_manifest(
                dataset_dir / "manifest.json",
                expected_artifacts={"test_tokens": wrong},
                require_scientific=False,
            )

    def test_tampered_manifest_rejected(self, dataset_dir, tmp_path):
        import shutil

        d = tmp_path / "tampered"
        shutil.copytree(dataset_dir, d)
        manifest = json.loads((d / "manifest.json").read_text())
        manifest["split_policy"]["record_counts"]["train"] += 0  # no-op
        manifest["dataset"]["source_record_count"] = int(
            manifest["dataset"]["source_record_count"]
        )
        manifest["reproducibility"]["split_seed"] = 999  # content change, stale id
        (d / "manifest.json").write_text(json.dumps(manifest, indent=2))
        with pytest.raises(manifest_lib.DatasetManifestError, match="identity mismatch"):
            prov.bind_dataset_manifest(d / "manifest.json", require_scientific=False)


class TestCheckpointBinding:
    def test_matching_checkpoint_verified(self, dataset_dir):
        _, record = prov.bind_dataset_manifest(
            dataset_dir / "manifest.json", require_scientific=False
        )
        cfg = {
            "dataset_manifest": {"dataset_id": record["dataset_id"]},
            "vocabulary": {"sha256": record["vocabulary"]["sha256"]},
        }
        bound = prov.bind_checkpoint_dataset(cfg, record)
        assert bound["status"] == "checkpoint_manifest_verified"

    def test_dataset_id_mismatch_fails(self, dataset_dir):
        _, record = prov.bind_dataset_manifest(
            dataset_dir / "manifest.json", require_scientific=False
        )
        cfg = {"dataset_manifest": {"dataset_id": "deadbeef"}}
        with pytest.raises(prov.EvaluationProvenanceError, match="identity mismatch"):
            prov.bind_checkpoint_dataset(cfg, record)

    def test_vocab_hash_mismatch_fails(self, dataset_dir):
        _, record = prov.bind_dataset_manifest(
            dataset_dir / "manifest.json", require_scientific=False
        )
        cfg = {
            "dataset_manifest": {"dataset_id": record["dataset_id"]},
            "vocabulary": {"sha256": "0" * 64},
        }
        with pytest.raises(prov.EvaluationProvenanceError, match="vocabulary mismatch"):
            prov.bind_checkpoint_dataset(cfg, record)

    def test_legacy_checkpoint_degrades(self):
        bound = prov.bind_checkpoint_dataset({}, None)
        assert bound["status"] == "legacy_checkpoint_unverified"

    def test_corrected_checkpoint_without_manifest_fails(self):
        cfg = {"dataset_manifest": {"dataset_id": "abc"}}
        with pytest.raises(prov.EvaluationProvenanceError, match="requires"):
            prov.bind_checkpoint_dataset(cfg, None)


def write_pack(path: Path, *, dataset_id="ds1", model_sha="m1", vocab_sha="v1",
               sidecar=True, status="causal_verified"):
    np.savez_compressed(path, X=np.zeros((2, 4), np.float32), ids=np.asarray(["a", "b"]))
    if sidecar:
        meta = {
            "validation_status": status,
            "dataset_manifest": {
                "status": "frozen_manifest_verified",
                "dataset_id": dataset_id,
            },
            "checkpoint_dataset": {
                "status": "checkpoint_manifest_verified",
                "dataset_id": dataset_id,
            },
            "checkpoint": {"path": "ckpt", "sha256": model_sha},
            "vocabulary": {"path": "itos", "sha256": vocab_sha},
        }
        prov.embedding_sidecar_path(path).write_text(json.dumps(meta))
    return path


class TestEmbeddingPairBinding:
    def test_matching_pair_verified(self, tmp_path):
        a = write_pack(tmp_path / "train.npz")
        b = write_pack(tmp_path / "test.npz")
        bound = prov.bind_embedding_pair(a, b, require_verified=True)
        assert bound["train"]["status"] == "verified_embedding"
        assert bound["test"]["status"] == "verified_embedding"

    def test_model_mismatch_fails(self, tmp_path):
        a = write_pack(tmp_path / "train.npz", model_sha="m1")
        b = write_pack(tmp_path / "test.npz", model_sha="m2")
        with pytest.raises(prov.EvaluationProvenanceError, match="mismatch"):
            prov.bind_embedding_pair(a, b, require_verified=True)

    def test_dataset_mismatch_fails(self, tmp_path):
        a = write_pack(tmp_path / "train.npz", dataset_id="ds1")
        b = write_pack(tmp_path / "test.npz", dataset_id="ds2")
        with pytest.raises(prov.EvaluationProvenanceError, match="mismatch"):
            prov.bind_embedding_pair(a, b, require_verified=True)

    def test_missing_sidecar_fails_verified(self, tmp_path):
        a = write_pack(tmp_path / "train.npz")
        b = write_pack(tmp_path / "test.npz", sidecar=False)
        with pytest.raises(prov.EvaluationProvenanceError, match="sidecar"):
            prov.bind_embedding_pair(a, b, require_verified=True)
        # unverified mode degrades instead of failing
        bound = prov.bind_embedding_pair(a, b, require_verified=False)
        assert bound["test"]["status"] == "legacy_embedding_unverified"

    def test_unverified_status_fails(self, tmp_path):
        a = write_pack(tmp_path / "train.npz", status="unverified")
        b = write_pack(tmp_path / "test.npz")
        with pytest.raises(prov.EvaluationProvenanceError, match="causally verified"):
            prov.bind_embedding_pair(a, b, require_verified=True)


class TestDerivedDatasetBinding:
    def make_derived(self, tmp_path, dataset_dir, *, tamper=False):
        _, record = prov.bind_dataset_manifest(
            dataset_dir / "manifest.json", require_scientific=False
        )
        source = dataset_dir / "test_bs32.npz"
        derived = tmp_path / "shuffled_test.npz"
        np.savez_compressed(derived, X=np.zeros((2, 4), np.int32))
        derivation = {
            "status": "derived_control_verified",
            "dataset_id": record["dataset_id"],
            "vocabulary": {"sha256": record["vocabulary"]["sha256"]},
            "output": prov.artifact_provenance(derived),
            "source_test": prov.artifact_provenance(source),
        }
        if tamper:
            np.savez_compressed(derived, X=np.ones((3, 4), np.int32))
        record_path = tmp_path / "shuffled_test.provenance.json"
        record_path.write_text(json.dumps(derivation))
        return derived, record_path, record, source

    def test_intact_derivation_verifies(self, tmp_path, dataset_dir):
        derived, record_path, record, source = self.make_derived(tmp_path, dataset_dir)
        bound = prov.bind_derived_dataset(
            derived, record_path,
            manifest_provenance=record, source_artifact_path=source,
        )
        assert bound["status"] == "derived_dataset_verified"

    def test_tampered_output_fails(self, tmp_path, dataset_dir):
        derived, record_path, record, source = self.make_derived(
            tmp_path, dataset_dir, tamper=True
        )
        with pytest.raises(prov.EvaluationProvenanceError, match="derived output"):
            prov.bind_derived_dataset(
                derived, record_path,
                manifest_provenance=record, source_artifact_path=source,
            )
