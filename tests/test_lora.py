"""LoRA fine-tuning adapters (beyond reference scope; training/lora.py).

The reference fine-tunes full checkpoints (``--transfer_from``) or freezes
the backbone outright (``freeze_backbone``); LoRA adds frozen-base low-rank
adaptation. Semantics under test:

- attach is a forward no-op (``lora_b = 0``) across the architecture
  toggles whose matmul paths differ (fused QKV, GQA, SwiGLU),
- ``lora_only`` training updates ONLY adapter leaves; the base stays
  bit-frozen while the loss still moves,
- ``merge_lora`` folds the trained adapters into a plain dense tree whose
  forward matches the adapter forward exactly,
- trainer end-to-end: base pretrain → LoRA transfer fine-tune → resume →
  merge CLI → shared evaluator agreement on the merged checkpoint,
- fail-closed contracts: int8 weights, MoE mlp targets, pipeline stages.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.models import codon_gpt
from genomics_lm_tpu.models.config import CodonGPTConfig
from genomics_lm_tpu.training import lora as lora_lib
from genomics_lm_tpu.training import optim as optim_lib
from genomics_lm_tpu.training.train_step import LossConfig, make_train_step

REPO = Path(__file__).resolve().parent.parent


def tiny_cfg(**kw):
    base = dict(vocab_size=68, block_size=16, n_layer=2, n_head=2,
                n_embd=16, dropout=0.0)
    base.update(kw)
    return CodonGPTConfig(**base)


def tiny_batch(cfg, rng_seed=0, B=4):
    rng = np.random.default_rng(rng_seed)
    x = rng.integers(4, cfg.vocab_size, (B, cfg.block_size)).astype(np.int32)
    y = np.roll(x, -1, axis=1)
    y[:, -1] = 2
    return jnp.asarray(x), jnp.asarray(y)


def leaf_paths(tree):
    return {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


class TestAttach:
    @pytest.mark.parametrize("toggles", [
        {},
        {"fused_qkv": True},
        {"n_kv_head": 1, "fused_qkv": True},
        {"use_swiglu": True},
    ])
    def test_attach_is_forward_noop(self, toggles):
        cfg = tiny_cfg(**toggles)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        targets = "attn" if not toggles.get("use_swiglu") else "attn+mlp"
        adapted = lora_lib.add_lora_adapters(
            params, jax.random.PRNGKey(1), rank=4, targets=targets)
        x, _ = tiny_batch(cfg)
        base_logits = codon_gpt.forward(params, cfg, x)[0]
        lora_logits = codon_gpt.forward(adapted, cfg, x)[0]
        np.testing.assert_array_equal(np.asarray(base_logits),
                                      np.asarray(lora_logits))
        assert lora_lib.has_lora(adapted) and not lora_lib.has_lora(params)
        # rank-r factors on q/k/v/proj (+ mlp when targeted), stacked on L
        a = adapted["blocks"]["attn"]["query"]["lora_a"]
        assert a.shape == (cfg.n_layer, cfg.n_embd, 4)

    def test_alpha_is_a_standard_output_scale(self):
        # doubling alpha doubles the adapter *delta* on the logits (standard
        # LoRA alpha/r semantics), not just lora_a's init magnitude
        cfg = tiny_cfg()
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        a1 = lora_lib.add_lora_adapters(params, jax.random.PRNGKey(1),
                                        rank=4, alpha=4.0)
        a2 = lora_lib.add_lora_adapters(params, jax.random.PRNGKey(1),
                                        rank=4, alpha=8.0)
        np.testing.assert_array_equal(  # same init; only the scale differs
            np.asarray(a1["blocks"]["attn"]["query"]["lora_a"]),
            np.asarray(a2["blocks"]["attn"]["query"]["lora_a"]))
        rng = np.random.default_rng(7)
        for name in lora_lib.ATTN_LINEARS:
            b = jnp.asarray(
                rng.standard_normal(
                    a1["blocks"]["attn"][name]["lora_b"].shape) * 0.02,
                jnp.float32)
            a1["blocks"]["attn"][name]["lora_b"] = b
            a2["blocks"]["attn"][name]["lora_b"] = b
        # merged-weight delta is the exact adapter contribution: doubling
        # alpha doubles it (scale * a @ b), layer nonlinearity aside
        for name in lora_lib.ATTN_LINEARS:
            d1 = np.asarray(lora_lib.merge_lora(a1)["blocks"]["attn"][name]["w"]
                            - params["blocks"]["attn"][name]["w"])
            d2 = np.asarray(lora_lib.merge_lora(a2)["blocks"]["attn"][name]["w"]
                            - params["blocks"]["attn"][name]["w"])
            np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5, atol=1e-7)
        # and the forward honors the scale leaf: q-projection outputs obey
        # the same exact 2x relation through _linear's dispatch
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            (2, cfg.block_size, cfg.n_embd)), jnp.float32)
        lin = lambda t: np.asarray(  # noqa: E731
            codon_gpt._linear(
                jax.tree.map(lambda l: l[0], t["blocks"]["attn"]["query"]), x))
        base_q = lin(params)
        dq1 = lin(a1) - base_q
        dq2 = lin(a2) - base_q
        np.testing.assert_allclose(dq2, 2.0 * dq1, rtol=1e-4, atol=1e-6)

    def test_alpha_survives_training_direction(self):
        # the scale leaf is frozen: training never changes it, and gradients
        # still flow through stop_gradient's value
        cfg = tiny_cfg()
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        adapted = lora_lib.add_lora_adapters(params, jax.random.PRNGKey(1),
                                             rank=4, alpha=16.0)
        scale = adapted["blocks"]["attn"]["query"]["lora_scale"]
        np.testing.assert_allclose(np.asarray(scale), 16.0 / 4.0)

    def test_int8_and_moe_mlp_fail_closed(self):
        cfg = tiny_cfg()
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        from genomics_lm_tpu.ops.quant import quantize_params

        with pytest.raises(ValueError, match="int8"):
            lora_lib.add_lora_adapters(
                quantize_params(params), jax.random.PRNGKey(1), rank=2)
        # …and the mirror direction: quantizing an unmerged adapter tree
        # would silently drop the trained factors — must refuse
        adapted = lora_lib.add_lora_adapters(params, jax.random.PRNGKey(1),
                                             rank=2)
        with pytest.raises(ValueError, match="merge"):
            quantize_params(adapted)
        quantize_params(lora_lib.merge_lora(adapted))  # merged: allowed
        moe = tiny_cfg(moe_experts=2, moe_top_k=1)
        moe_params = codon_gpt.init(jax.random.PRNGKey(0), moe)
        with pytest.raises(ValueError, match="MoE"):
            lora_lib.add_lora_adapters(
                moe_params, jax.random.PRNGKey(1), rank=2, targets="attn+mlp")
        # attention-only targets stay allowed on MoE models
        ok = lora_lib.add_lora_adapters(
            moe_params, jax.random.PRNGKey(1), rank=2, targets="attn")
        assert lora_lib.has_lora(ok)


class TestTrainingSemantics:
    def _train_steps(self, cfg, params, run_cfg, n=3):
        bundle = optim_lib.build_optimizer(run_cfg, params, total_steps=10)
        step = make_train_step(cfg, LossConfig(), bundle.tx)
        opt_state = bundle.tx.init(params)
        x, y = tiny_batch(cfg)
        batch = {"x": x[None], "y": y[None]}
        key = jax.random.PRNGKey(2)
        metrics = None
        for _ in range(n):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step(
                params, opt_state, batch, k, jnp.float32(1.0))
        return params, metrics

    def test_lora_only_updates_adapters_exclusively(self):
        cfg = tiny_cfg()
        base = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        params = lora_lib.add_lora_adapters(base, jax.random.PRNGKey(1), rank=4)
        run_cfg = {"lr": 1e-2, "warmup_steps": 0, "lora_rank": 4}
        before = leaf_paths(params)
        trained, metrics = self._train_steps(cfg, params, run_cfg)
        after = leaf_paths(trained)
        changed = {p for p in before
                   if not np.array_equal(np.asarray(before[p]),
                                         np.asarray(after[p]))}
        assert changed, "training must move some parameters"
        assert all("lora_" in p for p in changed), sorted(changed - {
            p for p in changed if "lora_" in p})
        # every lora_b moved off zero once gradients flow
        assert any("lora_b" in p for p in changed)
        assert float(metrics["total_loss_sum"]) > 0

    def test_adapters_train_at_lora_lr_not_lr_embedding(self):
        # pretrain configs set lr_embedding for the aux-head fast group;
        # adapters must follow cfg lr / lora_lr, not silently ride that knob
        cfg = tiny_cfg()
        params = lora_lib.add_lora_adapters(
            codon_gpt.init(jax.random.PRNGKey(0), cfg),
            jax.random.PRNGKey(1), rank=4)
        run_cfg = {"lr": 1e-3, "lr_embedding": 1e-1, "warmup_steps": 0,
                   "lora_rank": 4}
        labels = optim_lib.param_group_labels(params, lora_only=True)
        flat = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]
        }
        assert flat["['blocks']['attn']['query']['lora_a']"] == "lora"
        assert flat["['blocks']['attn']['query']['lora_scale']"] == "frozen"
        # amplifying lora_lr amplifies the first-step adapter delta while
        # lr_embedding is held fixed — proof the adapter LR is its own knob
        t_small, _ = self._train_steps(cfg, params, run_cfg, n=1)
        t_big, _ = self._train_steps(
            cfg, params, dict(run_cfg, lora_lr=1e-2), n=1)
        def delta(t):
            return float(jnp.abs(
                t["blocks"]["attn"]["query"]["lora_b"]
                - params["blocks"]["attn"]["query"]["lora_b"]).max())
        assert delta(t_big) > 2.0 * delta(t_small)

    def test_merge_matches_adapter_forward(self):
        cfg = tiny_cfg(fused_qkv=True)
        base = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        params = lora_lib.add_lora_adapters(base, jax.random.PRNGKey(1), rank=4)
        trained, _ = self._train_steps(
            cfg, params, {"lr": 1e-2, "warmup_steps": 0, "lora_rank": 4})
        merged = lora_lib.merge_lora(trained)
        assert not lora_lib.has_lora(merged)
        x, _ = tiny_batch(cfg)
        got = codon_gpt.forward(merged, cfg, x)[0]
        want = codon_gpt.forward(trained, cfg, x)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # merged tree has exactly the base leaf structure
        assert set(leaf_paths(merged)) == set(leaf_paths(base))

    def test_trainable_fraction_is_small(self):
        cfg = tiny_cfg(n_embd=64, n_layer=4, n_head=4)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        adapted = lora_lib.add_lora_adapters(params, jax.random.PRNGKey(1),
                                             rank=2)
        frac = lora_lib.lora_param_count(adapted) / codon_gpt.param_count(adapted)
        assert frac < 0.1


class TestTrainerEndToEnd:
    def test_pretrain_lora_finetune_resume_merge(self, tmp_path):
        from genomics_lm_tpu.evals.perplexity import evaluate_perplexity
        from genomics_lm_tpu.tokenizers.codon import write_itos
        from genomics_lm_tpu.training import checkpoints as ckpt_lib
        from genomics_lm_tpu.training.loop import run_training

        rng = np.random.default_rng(0)
        for name, n in (("train", 48), ("val", 16)):
            X = rng.integers(4, 68, (n, 24)).astype(np.int32)
            X[:, 0] = 1
            Y = np.roll(X, -1, axis=1)
            Y[:, -1] = 2
            np.savez(tmp_path / f"{name}.npz", X=X, Y=Y)
        write_itos(tmp_path / "itos.txt")
        shared = dict(
            train_npz=str(tmp_path / "train.npz"),
            val_npz=str(tmp_path / "val.npz"),
            block_size=24, n_layer=2, n_head=2, n_embd=32, dropout=0.0,
            batch_size=8, grad_accum_steps=1, lr=1e-3, warmup_steps=1,
            seed=0, itos_path=str(tmp_path / "itos.txt"),
        )
        base_cfg = dict(shared, epochs=1, run_id="base")
        run_training(base_cfg, run_root=str(tmp_path / "runs"))
        base_ckpt = tmp_path / "runs" / "base" / "checkpoints" / "last.npz"

        ft_cfg = dict(shared, epochs=1, run_id="ft", lora_rank=4,
                      lora_targets="attn+mlp")
        run_training(ft_cfg, run_root=str(tmp_path / "runs"),
                     transfer_from=str(base_ckpt))
        ft_ckpt = tmp_path / "runs" / "ft" / "checkpoints" / "last.npz"
        ft_params = ckpt_lib.load_checkpoint(ft_ckpt)["model"]
        assert lora_lib.has_lora(ft_params)

        # frozen base: backbone weights identical to the pretrained source
        base_params = ckpt_lib.load_checkpoint(base_ckpt)["model"]
        np.testing.assert_array_equal(
            np.asarray(ft_params["blocks"]["attn"]["query"]["w"]),
            np.asarray(base_params["blocks"]["attn"]["query"]["w"]))

        # resume continues the fine-tune (lifecycle accepts the lora tree)
        ft_cfg["epochs"] = 2
        run_training(ft_cfg, run_root=str(tmp_path / "runs"),
                     resume=str(ft_ckpt))

        # merge CLI → dense checkpoint the shared evaluator scores identically
        merged = tmp_path / "merged.npz"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "merge_lora.py"),
             str(ft_ckpt), str(merged)],
            capture_output=True, text=True, timeout=300,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)},
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        merged_payload = ckpt_lib.load_checkpoint(merged)
        # the merged cfg must not re-seed adapters (build_optimizer's
        # lora_only default keys off lora_rank) on a checkpoint without any
        assert not any(k.startswith("lora_") for k in merged_payload["cfg"])
        model_cfg = CodonGPTConfig.from_run_config(dict(ft_cfg, vocab_size=68))
        ev_adapter = evaluate_perplexity(
            ckpt_lib.load_checkpoint(ft_ckpt)["model"], model_cfg,
            tmp_path / "val.npz")
        ev_merged = evaluate_perplexity(
            ckpt_lib.load_checkpoint(merged)["model"], model_cfg,
            tmp_path / "val.npz")
        assert ev_merged["nll"] == pytest.approx(ev_adapter["nll"], rel=1e-5)

    def test_pipeline_stages_fail_closed(self, tmp_path):
        from genomics_lm_tpu.tokenizers.codon import write_itos
        from genomics_lm_tpu.training.loop import run_training

        rng = np.random.default_rng(0)
        X = rng.integers(4, 68, (16, 24)).astype(np.int32)
        np.savez(tmp_path / "train.npz", X=X, Y=np.roll(X, -1, axis=1))
        np.savez(tmp_path / "val.npz", X=X[:4], Y=np.roll(X[:4], -1, axis=1))
        write_itos(tmp_path / "itos.txt")
        cfg = dict(
            train_npz=str(tmp_path / "train.npz"),
            val_npz=str(tmp_path / "val.npz"),
            block_size=24, n_layer=2, n_head=2, n_embd=16,
            batch_size=8, epochs=1, seed=0, run_id="pp-lora",
            itos_path=str(tmp_path / "itos.txt"),
            lora_rank=2, pipeline_stages=2,
        )
        with pytest.raises(ValueError, match="lora_rank with pipeline_stages"):
            run_training(cfg, run_root=str(tmp_path / "runs"))


class TestAdapterState:
    """Adapter-only checkpoints: extract / re-attach (the shippable unit of
    a LoRA fine-tune — measured in lora_transfer.json efficiency_d512)."""

    def test_roundtrip_forward_identity(self, tmp_path):
        from genomics_lm_tpu.training import checkpoints as ckpt_lib

        cfg = tiny_cfg(fused_qkv=True)
        base = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        adapted = lora_lib.add_lora_adapters(base, jax.random.PRNGKey(1),
                                             rank=4, alpha=8.0)
        # give the adapters signal so identity isn't trivially zero
        trained, _ = TestTrainingSemantics()._train_steps(
            cfg, adapted, {"lr": 1e-2, "warmup_steps": 0, "lora_rank": 4})
        ckpt_lib.save_checkpoint(
            {"adapters": lora_lib.adapter_state(trained)},
            tmp_path / "adapters.npz")
        loaded = ckpt_lib.load_checkpoint(tmp_path / "adapters.npz")["adapters"]
        reattached = lora_lib.apply_adapter_state(base, loaded)
        x, _ = tiny_batch(cfg)
        np.testing.assert_allclose(
            np.asarray(codon_gpt.forward(reattached, cfg, x)[0]),
            np.asarray(codon_gpt.forward(trained, cfg, x)[0]), atol=1e-6)
        # adapter state is tiny relative to the dense tree
        a_bytes = sum(l.nbytes for l in jax.tree.leaves(loaded))
        d_bytes = sum(np.asarray(l).nbytes for l in jax.tree.leaves(base))
        assert a_bytes < 0.2 * d_bytes

    def test_fail_closed(self):
        cfg = tiny_cfg()
        base = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="no LoRA adapter"):
            lora_lib.adapter_state(base)
        adapters = lora_lib.adapter_state(
            lora_lib.add_lora_adapters(base, jax.random.PRNGKey(1), rank=2))
        wrong = codon_gpt.init(jax.random.PRNGKey(0), tiny_cfg(n_embd=32))
        with pytest.raises(ValueError, match="does not match"):
            lora_lib.apply_adapter_state(wrong, adapters)


class TestFrozenGradientElimination:
    def test_labeled_step_matches_unlabeled_updates(self):
        """param_labels only removes computation the optimizer would zero:
        with frozen leaves under stop_gradient, the committed update is
        identical to the full-gradient step."""
        cfg = tiny_cfg()
        params = lora_lib.add_lora_adapters(
            codon_gpt.init(jax.random.PRNGKey(0), cfg),
            jax.random.PRNGKey(1), rank=4)
        run_cfg = {"lr": 1e-2, "warmup_steps": 0, "lora_rank": 4}
        bundle = optim_lib.build_optimizer(run_cfg, params, total_steps=10)
        x, y = tiny_batch(cfg)
        batch = {"x": x[None], "y": y[None]}
        key = jax.random.PRNGKey(2)
        one = jnp.float32(1.0)

        outs = []
        for labels in (None, bundle.labels):
            step = make_train_step(cfg, LossConfig(), bundle.tx,
                                   param_labels=labels)
            p, o = params, bundle.tx.init(params)
            for _ in range(2):
                key2, k = jax.random.split(key)
                p, o, m = step(p, o, batch, k, one)
            outs.append(p)
        for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
