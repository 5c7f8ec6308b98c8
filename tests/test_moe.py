"""Mixture-of-Experts MLP + expert parallelism (beyond reference scope).

The reference has no MoE; this is a TPU-first addition (SURVEY §2.6 lists
EP among the parallelism axes the framework covers). Semantics under test:

- routing/dispatch parity against a per-token numpy reference (top-k
  selection, gate renormalization, rank-major/token-order slot priority,
  capacity dropping),
- dropless inference: full forward == per-token expert math exactly, and
  the KV-cached decode reproduces uncached logits (the identical-top-k
  gate extends to MoE models),
- the Switch load-balancing aux loss value and its training-only coupling,
- expert-parallel sharding: step parity vs single device on the virtual
  8-device mesh, expert weights actually sharded on their E axis,
- trainer integration end-to-end (train → checkpoint → resume) and the
  PP fail-closed contract.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from genomics_lm_tpu.models import codon_gpt
from genomics_lm_tpu.models.codon_gpt import _moe_mlp
from genomics_lm_tpu.models.config import CodonGPTConfig
from genomics_lm_tpu.parallel.mesh import make_mesh
from genomics_lm_tpu.parallel.sharding import (
    moe_param_sharding,
    opt_state_sharding,
)
from genomics_lm_tpu.training.train_step import LossConfig, make_train_step


def moe_cfg(**kw):
    base = dict(vocab_size=68, block_size=16, n_layer=2, n_head=2,
                n_embd=16, dropout=0.0, moe_experts=4, moe_top_k=2)
    base.update(kw)
    return CodonGPTConfig(**base)


def numpy_moe_reference(block_p, cfg, h, *, capped):
    """Per-token loop implementing the documented MoE contract."""
    B, T, D = h.shape
    N = B * T
    E = cfg.moe_experts
    k = min(cfg.moe_top_k, E)
    C = max(1, math.ceil(cfg.moe_capacity_factor * k * N / E)) if capped else N
    ht = np.asarray(h, np.float32).reshape(N, D)
    logits = ht @ np.asarray(block_p["router"]["w"], np.float32)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    # top-k indices in descending prob order (ties: lower index first, like
    # lax.top_k)
    order = np.argsort(-probs, axis=-1, kind="stable")[:, :k]
    gates = np.take_along_axis(probs, order, axis=-1)
    gates = gates / np.maximum(gates.sum(-1, keepdims=True), 1e-9)

    counts = np.zeros(E, np.int64)
    slot = -np.ones((N, k), np.int64)
    for rank in range(k):  # rank-major, then token-order priority
        for n in range(N):
            e = order[n, rank]
            if counts[e] < C:
                slot[n, rank] = counts[e]
            counts[e] += 1

    fc_w = np.asarray(block_p["mlp"]["fc"]["w"], np.float32)
    fc_b = np.asarray(block_p["mlp"]["fc"]["b"], np.float32)
    pr_w = np.asarray(block_p["mlp"]["proj"]["w"], np.float32)
    pr_b = np.asarray(block_p["mlp"]["proj"]["b"], np.float32)

    def gelu(x):
        from scipy.stats import norm  # exact (non-tanh) gelu

        return x * norm.cdf(x)

    y = np.zeros((N, D), np.float32)
    for n in range(N):
        for rank in range(k):
            if slot[n, rank] < 0:
                continue  # dropped: residual passthrough
            e = order[n, rank]
            mid = gelu(ht[n] @ fc_w[e] + fc_b[e])
            y[n] += gates[n, rank] * (mid @ pr_w[e] + pr_b[e])

    top1 = np.zeros((N, E), np.float32)
    top1[np.arange(N), order[:, 0]] = 1.0
    aux = E * float(np.sum(top1.mean(0) * probs.mean(0)))
    return y.reshape(B, T, D), aux


def layer0(params):
    return jax.tree.map(lambda p: p[0], params["blocks"])


class TestMoeForward:
    @pytest.mark.parametrize("capped", [True, False])
    def test_matches_per_token_reference(self, capped):
        pytest.importorskip("scipy")
        cfg = moe_cfg(moe_capacity_factor=0.5 if capped else 1.25)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        h = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.n_embd))
        block_p = layer0(params)
        y, aux = _moe_mlp(block_p, cfg, h, capped=capped)
        y_ref, aux_ref = numpy_moe_reference(block_p, cfg, h, capped=capped)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)
        assert abs(float(aux) - aux_ref) < 1e-5

    def test_capacity_drop_passes_through_residual(self):
        """All tokens routed to one expert at capacity 1: every dropped
        token's MLP contribution is exactly zero."""
        cfg = moe_cfg(moe_top_k=1, moe_capacity_factor=1e-9)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        block_p = jax.tree.map(lambda x: x, layer0(params))
        # bias the router hard toward expert 0
        w = np.zeros((cfg.n_embd, cfg.moe_experts), np.float32)
        w[:, 0] = 1.0
        block_p["router"] = {"w": jnp.asarray(w)}
        h = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.n_embd)))
        y, _ = _moe_mlp(block_p, cfg, h, capped=True)
        y = np.asarray(y)[0]
        # C = 1: token 0 gets the slot, tokens 1.. are dropped
        assert np.abs(y[0]).max() > 0
        np.testing.assert_array_equal(y[1:], 0.0)

    def test_aux_loss_near_one_when_balanced(self):
        cfg = moe_cfg()
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 4, 68)
        _, _, aux = codon_gpt.forward(params, cfg, x, jnp.roll(x, -1, 1),
                                      return_aux=True)
        assert 0.8 < float(aux["moe_aux_loss"]) < 1.5

    def test_aux_loss_trains_only(self):
        """composite_loss adds the router aux in training, not in eval."""
        from genomics_lm_tpu.training.train_step import composite_loss

        cfg = moe_cfg(moe_aux_weight=0.5)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 4, 68)
        y = jnp.roll(x, -1, 1)
        total_eval, parts_eval = composite_loss(
            params, cfg, LossConfig(), x, y, train=False, rng=None)
        total_train, parts_train = composite_loss(
            params, cfg, LossConfig(), x, y, train=True, rng=None)
        assert "moe_aux" not in parts_eval
        assert float(total_eval) == pytest.approx(float(parts_eval["next_loss"]))
        # train total = (capped-CE) + 0.5 * aux; verify the aux term wiring
        assert float(total_train) == pytest.approx(
            float(parts_train["next_loss"])
            + 0.5 * float(parts_train["moe_aux"]), rel=1e-6)

    def test_grads_reach_router_and_every_expert(self):
        cfg = moe_cfg(moe_top_k=2, dropout=0.0)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 4, 68)
        y = jnp.roll(x, -1, 1)

        def loss_fn(p):
            from genomics_lm_tpu.training.train_step import composite_loss

            total, _ = composite_loss(p, cfg, LossConfig(), x, y,
                                      train=True, rng=None)
            return total

        grads = jax.grad(loss_fn)(params)
        g_router = np.asarray(grads["blocks"]["router"]["w"])
        assert np.abs(g_router).max() > 0
        # per-expert grad magnitude: with 64 tokens and top-2 of 4 experts,
        # every expert should receive some tokens at balanced init
        g_fc = np.asarray(grads["blocks"]["mlp"]["fc"]["w"])  # (L, E, D, H)
        per_expert = np.abs(g_fc).reshape(g_fc.shape[0] * g_fc.shape[1], -1).max(1)
        assert (per_expert > 0).all()


class TestMoeInference:
    def test_cached_decode_matches_uncached(self):
        from genomics_lm_tpu.generation.decode import (
            CachedDecoder,
            next_token_logits,
        )

        cfg = moe_cfg(block_size=32)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        ids = [1] + [int(t) for t in rng.integers(4, 68, 10)]
        ids.insert(5, 3)
        decoder = CachedDecoder(params, cfg)
        for t in range(3, len(ids) + 1):
            cached = decoder.next_logits(ids[:t])
            uncached = next_token_logits(params, cfg, ids[:t])
            np.testing.assert_allclose(cached, uncached, atol=2e-4)
            assert list(np.argsort(cached)[-5:]) == list(np.argsort(uncached)[-5:])

    def test_swiglu_moe_forward(self):
        cfg = moe_cfg(use_swiglu=True)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        assert params["blocks"]["mlp"]["w_gate"]["w"].shape == (
            cfg.n_layer, cfg.moe_experts, cfg.n_embd, cfg.mlp_hidden)
        x = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 4, 68)
        logits, loss = codon_gpt.forward(params, cfg, x, jnp.roll(x, -1, 1))
        assert logits.shape == (2, 16, 68)
        assert np.isfinite(float(loss))

    def test_serving_engine_drains_moe_model(self):
        """MoE models serve through the continuous-batching engine, and the
        greedy drain matches the offline cached decode token for token."""
        from genomics_lm_tpu.generation.decode import CachedDecoder
        from genomics_lm_tpu.serving import ServingEngine

        cfg = moe_cfg(block_size=64, n_head=4, n_embd=32, n_layer=2)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        eng = ServingEngine(params, cfg, slots=2, max_seq_len=32,
                            steps_per_sync=4)
        prompts = [[1, 10 + k, 20 + k] for k in range(3)]
        rids = [eng.submit(p, 6) for p in prompts]
        results = eng.run()
        decoder = CachedDecoder(params, cfg)
        for rid, prompt in zip(rids, prompts):
            got = list(results[rid].tokens)
            assert len(got) == 6
            seq = list(prompt)
            for tok in got:
                logits = decoder.next_logits(seq)
                assert int(np.argmax(logits)) == tok
                seq.append(tok)

    def test_quantize_params_keeps_experts_full_precision(self):
        from genomics_lm_tpu.ops.quant import quantize_params

        cfg = moe_cfg()
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        q = quantize_params(params)
        assert "w_q" in q["blocks"]["attn"]["query"]
        assert "w" in q["blocks"]["mlp"]["fc"]          # experts untouched
        assert "w" in q["blocks"]["router"]
        x = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 4, 68)
        ref, _ = codon_gpt.forward(params, cfg, x)
        got, _ = codon_gpt.forward(q, cfg, x)
        # int8 attention quantization noise only (experts stayed exact)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1.0)
        agree = np.mean(
            np.argmax(np.asarray(got), -1) == np.argmax(np.asarray(ref), -1))
        assert agree > 0.9


class TestExpertParallel:
    def test_param_sharding_specs(self):
        mesh = make_mesh(axes={"data": 2, "model": 4})
        cfg = moe_cfg(n_embd=16, moe_experts=4)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        shardings = moe_param_sharding(params, mesh, n_experts=4,
                                       axis="model", tp_axis="model")
        def norm(spec):
            parts = tuple(spec)
            while parts and parts[-1] is None:
                parts = parts[:-1]
            return parts

        assert norm(shardings["blocks"]["mlp"]["fc"]["w"].spec) == (None, "model")
        assert norm(shardings["blocks"]["mlp"]["fc"]["b"].spec) == (None, "model")
        assert norm(shardings["blocks"]["router"]["w"].spec) == ()
        assert norm(shardings["tok_emb"].spec) == ()
        # attention takes the Megatron column split over the shared axis
        assert norm(shardings["blocks"]["attn"]["query"]["w"].spec) == (
            None, None, "model")

    def test_ep_step_matches_single_device(self):
        assert jax.device_count() >= 8
        cfg = moe_cfg(n_layer=1, moe_experts=4, moe_top_k=2,
                      moe_capacity_factor=4.0)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        tx = optax.adamw(1e-3)
        opt_state = tx.init(params)
        step = make_train_step(cfg, LossConfig(), tx)

        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.integers(4, 68, (1, 8, 16)), jnp.int32),
            "y": jnp.asarray(rng.integers(4, 68, (1, 8, 16)), jnp.int32),
        }
        key = jax.random.key(1)
        one = jnp.asarray(1.0)
        p_ref, _, m_ref = step(params, opt_state, batch, key, one)

        mesh = make_mesh(axes={"data": 2, "model": 4})
        shardings = moe_param_sharding(params, mesh, n_experts=4,
                                       axis="model", tp_axis="model")
        params_s = jax.device_put(params, shardings)
        # expert weights really are E-sharded on device
        fc = params_s["blocks"]["mlp"]["fc"]["w"]
        assert tuple(fc.sharding.spec)[:2] == (None, "model")
        opt_s = jax.device_put(
            opt_state,
            opt_state_sharding(opt_state, mesh, tp_axis="model",
                               ep_axis="model", n_experts=4, zero1=True),
        )
        batch_s = {
            k: jax.device_put(v, NamedSharding(mesh, P(None, "data")))
            for k, v in batch.items()
        }
        p_sh, _, m_sh = step(params_s, opt_s, batch_s, key, one)

        np.testing.assert_allclose(float(m_ref["total_loss_sum"]),
                                   float(m_sh["total_loss_sum"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_explicit_expert_constraint_under_mesh(self):
        """cfg.expert_sharding pins the dispatched activations when an
        ambient mesh is installed (the dryrun/e2e path)."""
        mesh = make_mesh(axes={"model": 8})
        cfg = moe_cfg(n_layer=1, moe_experts=8, moe_top_k=1,
                      expert_sharding="model")
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        shardings = moe_param_sharding(params, mesh, n_experts=8, axis="model")
        params_s = jax.device_put(params, shardings)
        x = jnp.asarray(np.random.default_rng(0).integers(4, 68, (2, 16)),
                        jnp.int32)
        ref_logits, _ = codon_gpt.forward(params, cfg.replace(expert_sharding=None), x)
        with jax.sharding.set_mesh(mesh):
            logits, _ = jax.jit(
                lambda p, t: codon_gpt.forward(p, cfg, t)
            )(params_s, x)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                                   atol=2e-4)


class TestMoeTrainer:
    def _write_fixture(self, tmp_path):
        from genomics_lm_tpu.tokenizers.codon import write_itos

        rng = np.random.default_rng(7)
        for name, n in [("train", 64), ("val", 16)]:
            X = rng.integers(4, 68, (n, 16)).astype(np.int32)
            X[:, 0] = 1
            Y = np.roll(X, -1, axis=1)
            Y[:, -1] = 2
            np.savez(tmp_path / f"{name}.npz", X=X, Y=Y)
        write_itos(tmp_path / "itos.txt")
        return {
            "train_npz": str(tmp_path / "train.npz"),
            "val_npz": str(tmp_path / "val.npz"),
            "block_size": 16, "n_layer": 2, "n_head": 2, "n_embd": 16,
            "dropout": 0.1, "batch_size": 8, "grad_accum_steps": 2,
            "lr": 1e-3, "warmup_steps": 1, "epochs": 2, "seed": 1,
            "moe_experts": 4, "moe_top_k": 2, "moe_aux_weight": 0.01,
            "run_id": "moe-e2e", "early_stop_patience": 0,
        }

    def test_trains_checkpoints_and_resumes(self, tmp_path):
        from genomics_lm_tpu.training.checkpoints import load_checkpoint
        from genomics_lm_tpu.training.loop import run_training

        cfg = self._write_fixture(tmp_path)
        meta = run_training(dict(cfg), run_root=tmp_path / "runs")
        assert meta["status"] == "completed"
        run_dir = tmp_path / "runs" / "moe-e2e"
        payload = load_checkpoint(run_dir / "checkpoints" / "last.npz")
        assert payload["model"]["blocks"]["router"]["w"].shape == (2, 16, 4)
        assert payload["cfg"]["moe_experts"] == 4
        # resume for one more epoch
        cfg["epochs"] = 3
        meta2 = run_training(
            dict(cfg),
            resume=str(run_dir / "checkpoints" / "last.npz"),
            run_root=tmp_path / "runs",
        )
        assert meta2["status"] == "completed"
        assert meta2["last_epoch"] == 3

    def test_pipeline_fails_closed_on_moe(self, tmp_path):
        from genomics_lm_tpu.training.loop import run_training

        cfg = self._write_fixture(tmp_path)
        cfg["run_id"] = "moe-pp"
        cfg["pipeline_stages"] = 2
        mesh = make_mesh(axes={"pipe": 2, "data": 4})
        with pytest.raises(ValueError, match="moe"):
            run_training(dict(cfg), run_root=tmp_path / "runs", mesh=mesh)


class TestMoeConfig:
    def test_run_config_roundtrip(self):
        cfg = CodonGPTConfig.from_run_config({
            "vocab_size": 68, "block_size": 16, "moe_experts": 4,
            "moe_top_k": 1, "moe_capacity_factor": 2.0,
            "moe_aux_weight": 0.1,
        })
        assert cfg.moe_experts == 4 and cfg.moe_top_k == 1
        spec = cfg.to_dict()
        assert spec["moe_experts"] == 4
        assert spec["moe_capacity_factor"] == 2.0
        # dense config: no moe keys in the spec (reference parity)
        dense = CodonGPTConfig.from_run_config(
            {"vocab_size": 68, "block_size": 16})
        assert "moe_experts" not in dense.to_dict()

    def test_validation(self):
        with pytest.raises(ValueError):
            CodonGPTConfig(vocab_size=68, block_size=16, moe_experts=1)
        with pytest.raises(ValueError):
            CodonGPTConfig(vocab_size=68, block_size=16, moe_experts=4,
                           moe_top_k=5)
