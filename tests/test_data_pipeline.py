"""End-to-end dataset preparation: records → frozen manifest → trainable."""

import json

import numpy as np
import pytest

from genomics_lm_tpu.data import manifest as manifest_lib
from genomics_lm_tpu.data.datasets import PackedDataset
from genomics_lm_tpu.data.leakage import LeakageAuditError
from genomics_lm_tpu.data.pipeline import assign_group_splits, prepare_dataset


def make_records(n_genomes=6, per_genome=4, seed=0):
    rng = np.random.default_rng(seed)
    records = []
    for g in range(n_genomes):
        for i in range(per_genome):
            n_codons = int(rng.integers(12, 30))
            seq = "ATG" + "".join(
                rng.choice(["AAA", "CCC", "GGG", "TTC", "GAT", "CTG"], n_codons)
            ) + "TAA"
            records.append({
                "sequence": seq,
                "source_id": f"g{g}:cds{i}",
                "genome": f"genome_{g}",
                "genus": f"genus_{g % 3}",
            })
    return records


class TestGroupSplit:
    def test_group_disjoint(self):
        records, policy = assign_group_splits(make_records(), group_by="genome", seed=1)
        assert policy["scientific_valid"] is True
        by_genome = {}
        for r in records:
            by_genome.setdefault(r["genome"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_genome.values())
        assert sum(policy["record_counts"].values()) == len(records)
        assert all(policy["record_counts"][s] > 0 for s in ("train", "val", "test"))

    def test_deterministic(self):
        r1, _ = assign_group_splits(make_records(), seed=7)
        r2, _ = assign_group_splits(make_records(), seed=7)
        assert [r["split"] for r in r1] == [r["split"] for r in r2]

    def test_too_few_groups_fails_closed(self):
        records = make_records(n_genomes=2)
        with pytest.raises(LeakageAuditError, match="fewer than 3"):
            assign_group_splits(records, group_by="genome")
        _, policy = assign_group_splits(
            records, group_by="genome", allow_sequence_split=True
        )
        assert policy["effective_group_by"] == "sequence"
        assert policy["scientific_valid"] is False


class TestPrepareDataset:
    def test_full_pipeline_multi(self, tmp_path):
        manifest = prepare_dataset(
            make_records(), tmp_path / "ds", block_size=32, pack_mode="multi",
            skip_homology=True,
        )
        ds_dir = tmp_path / "ds"
        for f in (
            "manifest.json", "itos.txt", "train_bs32.npz", "val_bs32.npz",
            "test_bs32.npz", "train_bs32_X.npy", "leakage_audit.json",
            "fragment_metadata.tsv", "pipeline_prepare.json",
        ):
            assert (ds_dir / f).exists(), f
        # manifest revalidates (content-addressed id intact)
        loaded = manifest_lib.load_dataset_manifest(
            ds_dir / "manifest.json", verify_artifacts=True
        )
        assert loaded["dataset"]["id"] == manifest["dataset"]["id"]
        # skip_homology → never scientific_valid
        assert loaded["dataset"]["scientific_valid"] is False

        # packs load through both storage modes
        ds_mem = PackedDataset(ds_dir / "train_bs32.npz")
        ds_map = PackedDataset(ds_dir / "train_bs32.npz", use_mmap=True)
        assert len(ds_mem) == len(ds_map) > 0
        x1, y1 = ds_mem.fetch_batch([0, 1])
        x2, y2 = ds_map.fetch_batch([0, 1])
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)

    def test_discover_manifest_binds_real_manifests_only(self, tmp_path):
        """Adjacent discovery finds true dataset manifests (dict schema),
        skips path-index manifests (the hybrid combined manifest.json), and
        still fails closed on unparseable files."""
        import json

        import pytest

        prepare_dataset(make_records(), tmp_path / "ds", block_size=32,
                        pack_mode="multi", skip_homology=True)
        ds_dir = tmp_path / "ds"
        found = manifest_lib.discover_manifest([ds_dir / "train_bs32.npz"])
        assert found == (ds_dir / "manifest.json").resolve()

        # a hybrid combined manifest (path index, no dataset schema) is not
        # discovered as a dataset contract
        hyb = tmp_path / "hyb"
        hyb.mkdir()
        (hyb / "train.npz").write_bytes(b"")
        (hyb / "manifest.json").write_text(json.dumps(
            {"train": "train.npz", "datasets": []}))
        assert manifest_lib.discover_manifest([hyb / "train.npz"]) is None

        # unparseable adjacent manifest still raises
        (hyb / "manifest.json").write_text("{not json")
        with pytest.raises(manifest_lib.DatasetManifestError):
            manifest_lib.discover_manifest([hyb / "train.npz"])

    def test_full_pipeline_binpack(self, tmp_path):
        """binpack mode flows through prepare: manifest revalidates, padding
        never exceeds arrival-order packing's."""
        manifest = prepare_dataset(
            make_records(), tmp_path / "bp", block_size=32, pack_mode="binpack",
            skip_homology=True,
        )
        assert manifest["packing"]["mode"] == "binpack"
        loaded = manifest_lib.load_dataset_manifest(
            tmp_path / "bp" / "manifest.json", verify_artifacts=True
        )
        assert loaded["packing"]["transition_policy"] == "exactly_once"
        prepare_dataset(
            make_records(), tmp_path / "mu", block_size=32, pack_mode="multi",
            skip_homology=True,
        )
        pad = lambda d: float(np.mean(
            PackedDataset(d / "train_bs32.npz").fetch_batch(
                list(range(len(PackedDataset(d / "train_bs32.npz")))))[1] == 0))
        assert pad(tmp_path / "bp") <= pad(tmp_path / "mu")

    def test_dynamic_mode(self, tmp_path):
        prepare_dataset(
            make_records(), tmp_path / "dyn", block_size=32, pack_mode="dynamic",
            skip_homology=True, write_mmap_sidecars=False,
        )
        ds = PackedDataset(tmp_path / "dyn" / "train_bs32.npz")
        assert ds.is_dynamic
        x, y = ds.fetch_batch([0])
        assert (y[0][:5] != 0).all()

    def test_duplicate_quarantine_in_pipeline(self, tmp_path):
        records = make_records()
        # plant a duplicate across genomes (→ across splits, likely)
        records.append(dict(records[0], source_id="dupe", genome="genome_5"))
        manifest = prepare_dataset(
            records, tmp_path / "q", block_size=32, skip_homology=True,
        )
        audit = json.loads((tmp_path / "q" / "leakage_audit.json").read_text())
        assert audit["status"] == "passed"  # dup removed before the audit

    def test_trains_end_to_end(self, tmp_path):
        from genomics_lm_tpu.training.loop import run_training

        prepare_dataset(
            make_records(), tmp_path / "ds", block_size=32, pack_mode="multi",
            skip_homology=True,
        )
        cfg = dict(
            train_npz=str(tmp_path / "ds" / "train_bs32.npz"),
            val_npz=str(tmp_path / "ds" / "val_bs32.npz"),
            block_size=32, n_layer=1, n_head=2, n_embd=16, dropout=0.0,
            batch_size=4, grad_accum_steps=1, lr=1e-3, warmup_steps=1,
            epochs=1, seed=0, run_id="pipe-train", use_mmap_dataset=True,
        )
        meta = run_training(cfg, run_root=str(tmp_path / "runs"))
        assert meta["status"] == "completed"
        # manifest was discovered and bound
        vocab_json = json.loads(
            (tmp_path / "runs" / "pipe-train" / "vocabulary.json").read_text()
        )
        assert vocab_json["size"] == 68


class TestDevicePrefetcher:
    def test_order_and_values_preserved(self):
        from genomics_lm_tpu.data.datasets import DevicePrefetcher

        items = list(range(50))
        out = list(DevicePrefetcher(iter(items), lambda x: x * 2, depth=3))
        assert out == [x * 2 for x in items]

    def test_error_propagates(self):
        from genomics_lm_tpu.data.datasets import DevicePrefetcher

        def gen():
            yield 1
            raise RuntimeError("loader exploded")

        pf = DevicePrefetcher(gen(), lambda x: x, depth=2)
        assert next(pf) == 1
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="loader exploded"):
            list(pf)

    def test_exhausted_iterator_keeps_raising_stopiteration(self):
        from genomics_lm_tpu.data.datasets import DevicePrefetcher

        pf = DevicePrefetcher(iter([1, 2]), lambda x: x, depth=2)
        assert list(pf) == [1, 2]
        import pytest as _pytest

        with _pytest.raises(StopIteration):  # must not hang
            next(pf)
        pf.close()
        with _pytest.raises(StopIteration):
            next(pf)

    def test_close_unblocks_worker(self):
        import time as _time

        from genomics_lm_tpu.data.datasets import DevicePrefetcher

        pf = DevicePrefetcher(iter(range(1000)), lambda x: x, depth=1)
        assert next(pf) == 0
        pf.close()
        deadline = _time.time() + 5.0
        while pf._worker.is_alive() and _time.time() < deadline:
            _time.sleep(0.01)
        assert not pf._worker.is_alive()
