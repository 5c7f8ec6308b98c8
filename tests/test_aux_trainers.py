"""NoProp trainer, shape-guided training, MLP heads, corrected dataset."""

import json

import numpy as np
import pytest

from genomics_lm_tpu.tokenizers.codon import write_itos
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer


def make_codon_fixture(tmp_path, n=24, block=16):
    rng = np.random.default_rng(0)
    for name, count in (("train", n), ("val", 8)):
        X = rng.integers(4, 68, (count, block)).astype(np.int32)
        X[:, 0] = 1
        Y = np.roll(X, -1, axis=1)
        Y[:, -1] = 2
        np.savez(tmp_path / f"{name}.npz", X=X, Y=Y)
    write_itos(tmp_path / "itos.txt")


class TestNoPropTrainer:
    def test_trains_and_checkpoints(self, tmp_path):
        from genomics_lm_tpu.training.train_noprop import run_training

        make_codon_fixture(tmp_path)
        cfg = dict(
            train_npz=str(tmp_path / "train.npz"), val_npz=str(tmp_path / "val.npz"),
            block_size=16, n_layer=2, n_head=2, n_embd=16, dropout=0.0,
            batch_size=8, epochs=2, learning_rate=1e-3, run_id="noprop-test",
        )
        meta = run_training(cfg, run_root=str(tmp_path / "runs"))
        assert meta["status"] == "completed"
        assert len(meta["history"]) == 2
        run_dir = tmp_path / "runs" / "noprop-test"
        assert (run_dir / "checkpoints" / "best.npz").exists()
        curves = (run_dir / "scores" / "curves.csv").read_text()
        assert curves.startswith("epoch,train_ce,val_ce")


class TestShapeGuidedTraining:
    def test_end_to_end_with_encoder(self, tmp_path):
        from genomics_lm_tpu.training.loop import run_training

        make_codon_fixture(tmp_path)
        cfg = dict(
            train_npz=str(tmp_path / "train.npz"), val_npz=str(tmp_path / "val.npz"),
            block_size=16, n_layer=1, n_head=2, n_embd=16, dropout=0.0,
            batch_size=8, grad_accum_steps=1, lr=1e-3, warmup_steps=1,
            epochs=1, seed=0, run_id="shape-run",
            use_shape_guidance=True, unfreeze_encoder=True,
        )
        meta = run_training(cfg, run_root=str(tmp_path / "runs"))
        assert meta["status"] == "completed"
        # encoder weights saved in the checkpoint
        from genomics_lm_tpu.training.checkpoints import load_checkpoint

        payload = load_checkpoint(
            tmp_path / "runs" / "shape-run" / "checkpoints" / "last.npz"
        )
        assert "shape_encoder" in payload["model"]

    def test_frozen_encoder_unchanged(self, tmp_path):
        from genomics_lm_tpu.training.checkpoints import load_checkpoint
        from genomics_lm_tpu.training.loop import run_training

        make_codon_fixture(tmp_path)
        cfg = dict(
            train_npz=str(tmp_path / "train.npz"), val_npz=str(tmp_path / "val.npz"),
            block_size=16, n_layer=1, n_head=2, n_embd=16, dropout=0.0,
            batch_size=8, grad_accum_steps=1, lr=1e-2, warmup_steps=0,
            epochs=1, seed=0, run_id="shape-frozen",
            use_shape_guidance=True, unfreeze_encoder=False,
        )
        run_training(cfg, run_root=str(tmp_path / "runs"))
        payload = load_checkpoint(
            tmp_path / "runs" / "shape-frozen" / "checkpoints" / "last.npz"
        )
        # re-init with same seed path: encoder used PRNG from trainer seed; we
        # instead assert tok_emb changed while conv biases stayed exactly zero
        enc = payload["model"]["shape_encoder"]
        assert float(np.abs(enc["conv1"]["b"]).max()) == 0.0
        assert float(np.abs(enc["conv2"]["b"]).max()) == 0.0


class TestCorrectedCriticDataset:
    def test_manifest_binding(self, tmp_path):
        from genomics_lm_tpu.protein.corrected_dataset import (
            CorrectedCriticDatasetError,
            CorrectedMultiTaskProteinDataset,
            write_critic_manifest,
        )

        records = [
            {"sequence": "MKVLA", "pfam_id": 0, "ec_id": 1},
            {"sequence": "WWHHY", "pfam_id": 1, "ec_id": 0},
        ]
        train = tmp_path / "train.jsonl"
        train.write_text("\n".join(json.dumps(r) for r in records) + "\n")
        manifest_path = tmp_path / "critic_manifest.json"
        write_critic_manifest(
            {"train": train},
            {"family": ["fam0", "fam1"], "function": ["ec0", "ec1"]},
            manifest_path,
        )
        ds = CorrectedMultiTaskProteinDataset(
            manifest_path, "train", ProteinTokenizer(), max_length=16
        )
        assert len(ds) == 2
        assert ds.task_dims == {"family": 2, "function": 2}
        # tamper → fail closed
        train.write_text(train.read_text() + "\n")
        with pytest.raises(CorrectedCriticDatasetError, match="size mismatch"):
            CorrectedMultiTaskProteinDataset(
                manifest_path, "train", ProteinTokenizer(), max_length=16
            )
        with pytest.raises(CorrectedCriticDatasetError, match="no split"):
            CorrectedMultiTaskProteinDataset(
                manifest_path, "val", ProteinTokenizer(), max_length=16
            )


class TestMlpHeads:
    def test_heads_over_frozen_features(self, tmp_path):
        import jax

        from genomics_lm_tpu.models.protein import ProteinClassifierConfig, init_multitask
        from genomics_lm_tpu.protein.train_mlp_heads import train
        from genomics_lm_tpu.training.checkpoints import save_checkpoint

        rng = np.random.default_rng(0)
        records = [
            {"sequence": "".join(rng.choice(list("ARNDC"), 8)),
             "pfam_id": int(i % 2), "ec_id": int(i % 2)}
            for i in range(16)
        ]
        for name, rows in (("train", records), ("val", records[:6])):
            (tmp_path / f"{name}.jsonl").write_text(
                "\n".join(json.dumps(r) for r in rows) + "\n"
            )
        cfg_model = ProteinClassifierConfig(
            vocab_size=28, n_layer=1, n_head=2, n_embd=16, block_size=32,
            dropout=0.0, num_classes=2,
        )
        params = init_multitask(
            jax.random.PRNGKey(0), cfg_model, {"family": 2, "function": 2}
        )
        ckpt = tmp_path / "critic.npz"
        save_checkpoint({"model": jax.tree.map(np.asarray, params)}, ckpt)
        cfg = dict(
            train_data=str(tmp_path / "train.jsonl"),
            val_data=str(tmp_path / "val.jsonl"),
            n_layer=1, n_head=2, n_embd=16, block_size=32,
        )
        report = train(cfg, ckpt, epochs=5, hidden=16,
                       out_dir=str(tmp_path / "heads"))
        assert "family" in report
        assert (tmp_path / "heads" / "metrics.json").exists()


class TestMetricsIO:
    def test_merge_write(self, tmp_path):
        from genomics_lm_tpu.utils.metrics_io import read_metrics, write_metrics

        path = tmp_path / "metrics.json"
        write_metrics(path, {"a": 1})
        merged = write_metrics(path, {"b": 2})
        assert merged == {"a": 1, "b": 2}
        assert read_metrics(path) == {"a": 1, "b": 2}
        assert read_metrics(tmp_path / "missing.json") == {}
