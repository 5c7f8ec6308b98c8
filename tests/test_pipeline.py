"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh.

The GPipe schedule must be an *exact* re-execution of the single-device
model: same composition of blocks, same whole-batch weighted-mean CE
(via cross_entropy_parts accumulation), differentiable end to end. These
tests transplant one set of weights between the stacked single-device
layout and the stage-split layout and assert loss/grad agreement, plus
the PP×DP composed mesh and a full optimizer step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.parallel.mesh import make_mesh
from genomics_lm_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_pipeline_train_step,
    merge_stage_params,
    pipeline_loss,
    split_stage_params,
    stage_param_sharding,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _cfg(**kw):
    base = dict(
        vocab_size=68, block_size=32, n_layer=4, n_head=2, n_embd=32,
        dropout=0.0, sep_id=3, attention_impl="xla",
    )
    base.update(kw)
    return CodonGPTConfig(**base)


def _batch(rng, B, T):
    X = rng.integers(4, 68, (B, T)).astype(np.int32)
    X[:, 0] = 1
    X[2::3, T // 2] = 3            # mid-stream SEP: segment reset exercised
    Y = np.roll(X, -1, axis=1).astype(np.int32)
    Y[:, -1] = 2
    Y[0, -4:] = 0                  # PAD targets: CE denominator differs/mb
    return jnp.asarray(X), jnp.asarray(Y)


class TestPipelineLoss:
    def test_matches_single_device_forward(self):
        cfg = _cfg()
        rng = np.random.default_rng(0)
        X, Y = _batch(rng, 8, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        _, want, _ = codon_gpt.forward(params, cfg, X, Y, return_aux=True)

        mesh = make_mesh(4, axes={PIPE_AXIS: 4})
        staged = split_stage_params(params, 4)
        staged = jax.device_put(staged, stage_param_sharding(mesh, staged))
        got = pipeline_loss(staged, cfg, X, Y, mesh=mesh, n_microbatches=4)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_label_smoothing_and_weights(self):
        w = tuple(1.0 + (i % 3) * 0.25 for i in range(68))
        cfg = _cfg(label_smoothing=0.05, loss_weights=w)
        rng = np.random.default_rng(1)
        X, Y = _batch(rng, 4, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(1), cfg)
        _, want, _ = codon_gpt.forward(params, cfg, X, Y, return_aux=True)
        mesh = make_mesh(2, axes={PIPE_AXIS: 2})
        staged = split_stage_params(params, 2)
        got = pipeline_loss(staged, cfg, X, Y, mesh=mesh, n_microbatches=2)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_more_microbatches_than_stages(self):
        cfg = _cfg()
        rng = np.random.default_rng(2)
        X, Y = _batch(rng, 8, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(2), cfg)
        _, want, _ = codon_gpt.forward(params, cfg, X, Y, return_aux=True)
        mesh = make_mesh(2, axes={PIPE_AXIS: 2})
        staged = split_stage_params(params, 2)
        got = pipeline_loss(staged, cfg, X, Y, mesh=mesh, n_microbatches=8)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_pp_dp_composed_mesh(self):
        cfg = _cfg()
        rng = np.random.default_rng(3)
        X, Y = _batch(rng, 8, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(3), cfg)
        _, want, _ = codon_gpt.forward(params, cfg, X, Y, return_aux=True)
        mesh = make_mesh(8, axes={"data": 2, PIPE_AXIS: 4})
        staged = split_stage_params(params, 4)
        staged = jax.device_put(staged, stage_param_sharding(mesh, staged))
        got = pipeline_loss(staged, cfg, X, Y, mesh=mesh, n_microbatches=2)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_split_merge_roundtrip(self):
        cfg = _cfg()
        params = codon_gpt.init(jax.random.PRNGKey(4), cfg)
        back = merge_stage_params(split_stage_params(params, 4))
        jax.tree.map(np.testing.assert_array_equal, params["blocks"],
                     back["blocks"])

    def test_indivisible_layers_rejected(self):
        cfg = _cfg(n_layer=3)
        params = codon_gpt.init(jax.random.PRNGKey(5), cfg)
        with pytest.raises(ValueError, match="not divisible"):
            split_stage_params(params, 2)


class TestPipelineGrad:
    def test_grads_match_single_device(self):
        cfg = _cfg()
        rng = np.random.default_rng(6)
        X, Y = _batch(rng, 4, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(6), cfg)

        def plain_loss(p):
            _, loss, _ = codon_gpt.forward(p, cfg, X, Y, return_aux=True)
            return loss

        want = jax.grad(plain_loss)(params)

        mesh = make_mesh(4, axes={PIPE_AXIS: 4})
        staged = split_stage_params(params, 4)
        got_staged = jax.grad(
            lambda p: pipeline_loss(p, cfg, X, Y, mesh=mesh, n_microbatches=2)
        )(staged)
        got = merge_stage_params(got_staged)

        flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
        flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
        # tree_flatten_with_path returns list of (path, leaf); align by path
        got_map = {jax.tree_util.keystr(k): v
                   for k, v in jax.tree_util.tree_flatten_with_path(got)[0]}
        del flat_g
        for path, leaf in flat_w:
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(got_map[key]),
                atol=2e-5, rtol=2e-4, err_msg=key)

    def test_train_step_improves_loss(self):
        cfg = _cfg()
        rng = np.random.default_rng(7)
        X, Y = _batch(rng, 8, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(7), cfg)
        mesh = make_mesh(4, axes={PIPE_AXIS: 4})
        staged = split_stage_params(params, 4)
        staged = jax.device_put(staged, stage_param_sharding(mesh, staged))
        opt = optax.adamw(1e-2)
        opt_state = opt.init(staged)
        step = jax.jit(make_pipeline_train_step(cfg, mesh, 4, opt))
        losses = []
        for _ in range(4):
            staged, opt_state, loss = step(staged, opt_state, X, Y)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
        # updated params remain transplantable back to the plain layout
        merged = merge_stage_params(jax.device_get(staged))
        _, loss_plain, _ = codon_gpt.forward(merged, cfg, X, Y, return_aux=True)
        step2 = pipeline_loss(staged, cfg, X, Y, mesh=mesh, n_microbatches=4)
        np.testing.assert_allclose(float(loss_plain), float(step2), rtol=1e-5)


class TestCheckpointLayoutInterop:
    """split/merge work on optax states too — pipeline checkpoints are
    layout-neutral (store merged; resume under any stage count)."""

    def test_optax_state_split_merge_roundtrip(self):
        cfg = _cfg()
        params = codon_gpt.init(jax.random.PRNGKey(8), cfg)
        opt = optax.adamw(1e-2)
        state_merged = opt.init(params)

        state_staged = split_stage_params(state_merged, 4)
        # params-shaped subtrees (mu/nu) gained the stage axis...
        mu = state_staged[0].mu["blocks"]
        L = cfg.n_layer
        for leaf in jax.tree.leaves(mu):
            assert leaf.shape[:2] == (4, L // 4)
        # ...scalars (count) and non-block leaves passed through untouched
        assert state_staged[0].count.shape == state_merged[0].count.shape
        np.testing.assert_array_equal(
            state_staged[0].mu["tok_emb"], state_merged[0].mu["tok_emb"])

        back = jax.device_get(merge_stage_params(state_staged))
        jax.tree.map(np.testing.assert_array_equal,
                     jax.device_get(state_merged), back)

    def test_stage_param_sharding_accepts_optax_state(self):
        cfg = _cfg()
        params = codon_gpt.init(jax.random.PRNGKey(9), cfg)
        mesh = make_mesh(4, axes={PIPE_AXIS: 4})
        staged_params = split_stage_params(params, 4)
        state = optax.adamw(1e-2).init(staged_params)
        sharded = jax.device_put(state, stage_param_sharding(mesh, state))
        mu_leaf = jax.tree.leaves(sharded[0].mu["blocks"])[0]
        assert len(mu_leaf.sharding.device_set) == 4      # split over pipe
        assert len(sharded[0].count.sharding.device_set) == 4  # replicated

    def _run(self, cfg, opt, X, Y, n_stages, n_steps, params, opt_state=None):
        mesh = make_mesh(n_stages, axes={PIPE_AXIS: n_stages})
        staged = split_stage_params(params, n_stages)
        staged = jax.device_put(staged, stage_param_sharding(mesh, staged))
        if opt_state is None:
            opt_state = opt.init(staged)
        else:
            opt_state = split_stage_params(opt_state, n_stages)
            opt_state = jax.device_put(
                opt_state, stage_param_sharding(mesh, opt_state))
        step = jax.jit(make_pipeline_train_step(cfg, mesh, 4, opt))
        for _ in range(n_steps):
            staged, opt_state, _ = step(staged, opt_state, X, Y)
        return (merge_stage_params(jax.device_get(staged)),
                merge_stage_params(jax.device_get(opt_state)))

    @staticmethod
    def _assert_trees(got, want, **tol):
        got_map = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_flatten_with_path(got)[0]}
        for path, leaf in jax.tree_util.tree_flatten_with_path(want)[0]:
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                np.asarray(got_map[key]), np.asarray(leaf),
                err_msg=key, **tol)

    def test_resume_same_stage_count_is_bit_identical(self):
        """checkpoint (merged layout) after 2 steps at S=4, resume at S=4
        for 2 more == uninterrupted 4 steps, bit for bit (adamw)."""
        cfg = _cfg()
        rng = np.random.default_rng(10)
        X, Y = _batch(rng, 8, cfg.block_size)
        params0 = codon_gpt.init(jax.random.PRNGKey(10), cfg)
        opt = optax.adamw(1e-2)
        p_mid, s_mid = self._run(cfg, opt, X, Y, 4, 2, params0)
        p_resumed, _ = self._run(cfg, opt, X, Y, 4, 2, p_mid, opt_state=s_mid)
        p_straight, _ = self._run(cfg, opt, X, Y, 4, 4, params0)
        self._assert_trees(p_resumed, p_straight, atol=0.0, rtol=0.0)

    def test_resume_under_different_stage_count(self):
        """Train 2 steps at S=4, checkpoint merged, resume at S=2 for 2
        more; final params match an uninterrupted 4-step S=2 run.

        SGD keeps updates linear in the gradients, so the only divergence
        between stage counts is the GPipe psum reduction order (~fp32
        epsilon) — unlike adamw, whose sqrt/eps normalization amplifies
        that noise over steps into the 1e-3 range."""
        cfg = _cfg()
        rng = np.random.default_rng(10)
        X, Y = _batch(rng, 8, cfg.block_size)
        params0 = codon_gpt.init(jax.random.PRNGKey(10), cfg)
        opt = optax.sgd(0.1)
        p_mid, s_mid = self._run(cfg, opt, X, Y, 4, 2, params0)
        p_resumed, _ = self._run(cfg, opt, X, Y, 2, 2, p_mid, opt_state=s_mid)
        p_straight, _ = self._run(cfg, opt, X, Y, 2, 4, params0)
        self._assert_trees(p_resumed, p_straight, atol=1e-6, rtol=1e-5)


class TestTrainerUnderPipeline:
    """run_training with a (data, pipe) mesh: the production-trainer PP path
    (training/loop.py) — fail-closed objective gate, merged-layout
    checkpoints, resume, and single-device equivalence at G=1."""

    @staticmethod
    def _fixture(tmp_path, n_train=32, n_val=8, block=16):
        rng = np.random.default_rng(0)
        for name, n in [("train", n_train), ("val", n_val)]:
            X = rng.integers(4, 68, (n, block)).astype(np.int32)
            Y = np.roll(X, -1, axis=1)
            Y[:, -1] = 0
            np.savez(tmp_path / f"{name}.npz", X=X, Y=Y)
        from genomics_lm_tpu.tokenizers.codon import write_itos
        write_itos(tmp_path / "itos.txt")

    @staticmethod
    def _cfg(tmp_path, **kw):
        cfg = dict(
            train_npz=str(tmp_path / "train.npz"),
            val_npz=str(tmp_path / "val.npz"),
            block_size=16, n_layer=4, n_head=2, n_embd=16,
            dropout=0.0, batch_size=8, grad_accum_steps=2,
            lr=1e-3, min_lr=1e-4, warmup_steps=2, epochs=2,
            seed=1337, run_id="pp-run", early_stop_patience=0,
        )
        cfg.update(kw)
        return cfg

    def test_train_resume_and_merged_checkpoints(self, tmp_path):
        from genomics_lm_tpu.training import checkpoints as ckpt_lib
        from genomics_lm_tpu.training.loop import run_training

        self._fixture(tmp_path)
        mesh = make_mesh(4, axes={"data": 2, PIPE_AXIS: 2})
        cfg = self._cfg(tmp_path, dropout=0.1)  # exercises the PP dropout path
        meta = run_training(cfg, run_root=str(tmp_path / "runs"), mesh=mesh)
        assert meta["status"] == "completed"
        run_dir = tmp_path / "runs" / "pp-run"

        payload = ckpt_lib.load_checkpoint(run_dir / "checkpoints" / "last.npz")
        # checkpoint stores the MERGED layout: blocks lead with n_layer,
        # not (n_stages, layers_per_stage)
        for leaf in jax.tree.leaves(payload["model"]["blocks"]):
            assert leaf.shape[0] == cfg["n_layer"]
        # ... and is directly evaluable by the plain single-device forward
        m_cfg = CodonGPTConfig(
            vocab_size=68, block_size=16, n_layer=4, n_head=2, n_embd=16,
            dropout=0.0)
        params = jax.tree.map(jnp.asarray, payload["model"])
        X = jnp.asarray(
            np.load(tmp_path / "val.npz")["X"][:4], jnp.int32)
        Y = jnp.asarray(
            np.load(tmp_path / "val.npz")["Y"][:4], jnp.int32)
        _, loss, _ = codon_gpt.forward(params, m_cfg, X, Y, return_aux=True)
        assert np.isfinite(float(loss))

        # resume continues under the mesh (checkpoint → re-staged)
        cfg3 = dict(cfg, epochs=3)
        meta2 = run_training(
            cfg3, run_root=str(tmp_path / "runs"),
            resume=str(run_dir / "checkpoints" / "last.npz"), mesh=mesh)
        assert meta2["status"] == "completed"
        curves = (run_dir / "scores" / "curves.csv").read_text().splitlines()
        assert len(curves) == 4  # header + 3 epochs

    def test_fails_closed_on_unsupported_objectives(self, tmp_path):
        from genomics_lm_tpu.training.loop import run_training

        self._fixture(tmp_path)
        mesh = make_mesh(4, axes={"data": 2, PIPE_AXIS: 2})
        cfg = self._cfg(
            tmp_path, termination_loss_enabled=True, run_id="pp-term")
        with pytest.raises(ValueError, match="plain next-token CE"):
            run_training(cfg, run_root=str(tmp_path / "runs"), mesh=mesh)

    def test_matches_single_device_trainer_at_g1(self, tmp_path):
        """grad_accum 1, dropout 0: the PP group step commits the identical
        whole-batch objective, so the two trainers' curves agree (adamw
        amplifies fp reduction-order differences, hence the loose-but-tight
        tolerance over 8 steps)."""
        from genomics_lm_tpu.training.loop import run_training

        self._fixture(tmp_path)
        cfg = self._cfg(tmp_path, grad_accum_steps=1, run_id="pp-eq")
        mesh = make_mesh(4, axes={"data": 2, PIPE_AXIS: 2})
        meta_pp = run_training(
            dict(cfg), run_root=str(tmp_path / "runs_pp"), mesh=mesh)
        meta_sd = run_training(
            dict(cfg), run_root=str(tmp_path / "runs_sd"), mesh=None)
        for key in ("last_val_loss", "best_val_loss"):
            a, b = float(meta_pp[key]), float(meta_sd[key])
            np.testing.assert_allclose(a, b, rtol=5e-3, err_msg=key)


class TestZero1UnderPipeline:
    """ZeRO-1 composed with PP: AdamW moments shard over (pipe, data)."""

    def test_opt_state_shardings_span_pipe_and_data(self):
        from genomics_lm_tpu.parallel.mesh import DATA_AXIS
        from genomics_lm_tpu.parallel.pipeline import stage_opt_state_sharding

        cfg = _cfg()
        params = codon_gpt.init(jax.random.PRNGKey(6), cfg)
        tx = optax.adamw(1e-3)
        opt_state = tx.init(params)
        mesh = make_mesh(8, axes={"data": 2, PIPE_AXIS: 4})
        staged = split_stage_params(opt_state, 4)
        shardings = stage_opt_state_sharding(mesh, staged, zero1=True)
        staged = jax.device_put(staged, shardings)

        def specs_under(tree, key):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return [
                (path, leaf) for path, leaf in flat
                if any(getattr(p, "key", None) == key for p in path)
            ]

        block_leaves = specs_under(staged, "blocks")
        assert block_leaves
        for _, leaf in block_leaves:
            spec = leaf.sharding.spec
            assert spec[0] == PIPE_AXIS
            # every block moment has a data-divisible dim at this width
            assert DATA_AXIS in tuple(spec), spec
        # non-block moments (embeddings etc.) shard over data where divisible
        emb_leaves = specs_under(staged, "tok_emb")
        assert emb_leaves
        assert any(
            DATA_AXIS in tuple(leaf.sharding.spec) for _, leaf in emb_leaves
        )
        # without zero1, nothing shards over data
        plain = stage_opt_state_sharding(mesh, split_stage_params(opt_state, 4))
        for leaf in jax.tree.leaves(plain):
            assert DATA_AXIS not in tuple(leaf.spec)

    def test_group_step_parity_with_sharded_moments(self):
        """Two group steps with ZeRO-1 moments must produce the same params
        and losses as with replicated moments, and the updated opt state
        must keep its (pipe, data) shardings."""
        from genomics_lm_tpu.parallel.mesh import DATA_AXIS
        from genomics_lm_tpu.parallel.pipeline import (
            make_pipeline_group_step,
            stage_opt_state_sharding,
        )

        cfg = _cfg()
        rng = np.random.default_rng(7)
        X, Y = _batch(rng, 16, cfg.block_size)
        batch = {
            "x": jnp.asarray(np.asarray(X).reshape(2, 8, cfg.block_size)),
            "y": jnp.asarray(np.asarray(Y).reshape(2, 8, cfg.block_size)),
        }
        params = codon_gpt.init(jax.random.PRNGKey(7), cfg)
        tx = optax.adamw(1e-3)
        mesh = make_mesh(8, axes={"data": 2, PIPE_AXIS: 4})
        key = jax.random.PRNGKey(0)
        results = {}
        for zero1 in (False, True):
            p = split_stage_params(params, 4)
            p = jax.device_put(p, stage_param_sharding(mesh, p))
            s = split_stage_params(tx.init(params), 4)
            shardings = stage_opt_state_sharding(mesh, s, zero1=zero1)
            s = jax.device_put(s, shardings)
            step = make_pipeline_group_step(cfg, tx, mesh,
                                            opt_shardings=shardings)
            losses = []
            for _ in range(2):
                p, s, metrics = step(p, s, batch, key, jnp.float32(1.0))
                losses.append(float(metrics["first_loss"]))
            results[zero1] = (jax.device_get(merge_stage_params(p)), losses)
            if zero1:
                flat = jax.tree_util.tree_flatten_with_path(s)[0]
                sharded = [
                    leaf for path, leaf in flat
                    if any(getattr(q, "key", None) == "blocks" for q in path)
                ]
                assert sharded
                for leaf in sharded:
                    assert DATA_AXIS in tuple(leaf.sharding.spec)

        np.testing.assert_allclose(results[False][1], results[True][1],
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
            results[False][0], results[True][0],
        )

    def test_trainer_pp_zero1_completes_and_resumes(self, tmp_path):
        from genomics_lm_tpu.training.loop import run_training

        TestTrainerUnderPipeline._fixture(tmp_path)
        mesh = make_mesh(8, axes={"data": 2, PIPE_AXIS: 4})
        cfg = TestTrainerUnderPipeline._cfg(
            tmp_path, run_id="pp-z1", shard_optimizer_state=True)
        meta = run_training(cfg, run_root=str(tmp_path / "runs"), mesh=mesh)
        assert meta["status"] == "completed"
        last = tmp_path / "runs" / "pp-z1" / "checkpoints" / "last.npz"
        meta2 = run_training(
            dict(cfg, epochs=3), resume=str(last),
            run_root=str(tmp_path / "runs"), mesh=mesh)
        assert meta2["status"] == "completed"


class TestGroupStepObjective:
    """Quantify the G>1 semantics gap: the PP group step commits the
    whole-group token-weighted CE, the non-PP trainer commits the mean of
    per-microbatch token-weighted means. Both are convex combinations of
    the per-microbatch losses, so their gap is bounded by the
    per-microbatch loss spread; at equal non-pad counts they coincide."""

    def _ragged_batch(self, cfg, G=4, B=4):
        rng = np.random.default_rng(21)
        X = rng.integers(4, 68, (G * B, cfg.block_size)).astype(np.int32)
        X[:, 0] = 1
        Y = np.roll(X, -1, axis=1).astype(np.int32)
        Y[:, -1] = 2
        # heavily ragged non-pad counts: microbatch g keeps only the first
        # few targets of most rows
        for g in range(G):
            keep = 3 + 6 * g
            Y[g * B:(g + 1) * B - 1, keep:] = 0
        return jnp.asarray(X), jnp.asarray(Y)

    def test_whole_group_vs_accumulation_objective(self):
        from genomics_lm_tpu.ops.losses import cross_entropy_parts

        cfg = _cfg()
        G, B = 4, 4
        X, Y = self._ragged_batch(cfg, G, B)
        params = codon_gpt.init(jax.random.PRNGKey(21), cfg)

        # per-microbatch CE parts via the single-device forward
        numers, denoms, per_mb = [], [], []
        for g in range(G):
            xb, yb = X[g * B:(g + 1) * B], Y[g * B:(g + 1) * B]
            logits, _ = codon_gpt.forward(params, cfg, xb)
            n, d = cross_entropy_parts(logits, yb, ignore_index=0)
            numers.append(float(n))
            denoms.append(float(d))
            per_mb.append(float(n) / float(d))
        whole_group = sum(numers) / sum(denoms)
        mean_of_means = float(np.mean(per_mb))

        mesh = make_mesh(4, axes={PIPE_AXIS: 4})
        staged = split_stage_params(params, 4)
        staged = jax.device_put(staged, stage_param_sharding(mesh, staged))
        pp_loss = float(pipeline_loss(
            staged, cfg, X, Y, mesh=mesh, n_microbatches=G))

        # the PP objective IS the whole-group token-weighted CE
        np.testing.assert_allclose(pp_loss, whole_group, rtol=1e-5)
        # the raggedness makes the two objectives measurably different …
        gap = abs(whole_group - mean_of_means)
        assert gap > 1e-6, "fixture failed to produce ragged counts"
        # … but both are convex combinations of per-microbatch losses, so
        # the gap is bounded by the per-microbatch loss spread
        assert gap <= max(per_mb) - min(per_mb)
        # document the measured scale: on random init the objectives agree
        # to well under 1% relative — the gap is a weighting nuance, not a
        # different loss landscape
        assert gap / whole_group < 0.01

    def test_objectives_coincide_at_equal_counts(self):
        from genomics_lm_tpu.ops.losses import cross_entropy_parts

        cfg = _cfg()
        G, B = 4, 4
        rng = np.random.default_rng(22)
        X = rng.integers(4, 68, (G * B, cfg.block_size)).astype(np.int32)
        X[:, 0] = 1
        Y = np.roll(X, -1, axis=1).astype(np.int32)
        Y[:, -1] = 2                      # every row: identical non-pad count
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        params = codon_gpt.init(jax.random.PRNGKey(22), cfg)
        per_mb = []
        for g in range(G):
            xb, yb = X[g * B:(g + 1) * B], Y[g * B:(g + 1) * B]
            logits, _ = codon_gpt.forward(params, cfg, xb)
            n, d = cross_entropy_parts(logits, yb, ignore_index=0)
            per_mb.append(float(n) / float(d))
        mesh = make_mesh(4, axes={PIPE_AXIS: 4})
        staged = split_stage_params(params, 4)
        pp_loss = float(pipeline_loss(
            staged, cfg, X, Y, mesh=mesh, n_microbatches=G))
        np.testing.assert_allclose(pp_loss, float(np.mean(per_mb)), rtol=1e-5)

    def test_resume_objective_switch_fails_closed(self, tmp_path):
        """Toggling pipeline_stages mid-run at G>1 silently changed the
        objective weighting before; now it is rejected, while resuming
        under a different stage COUNT (same objective) stays allowed."""
        from genomics_lm_tpu.training.lifecycle import RunLifecycleError
        from genomics_lm_tpu.training.loop import run_training

        TestTrainerUnderPipeline._fixture(tmp_path)
        mesh_pp2 = make_mesh(4, axes={"data": 2, PIPE_AXIS: 2})
        cfg = TestTrainerUnderPipeline._cfg(tmp_path, run_id="pp-obj")
        run_training(cfg, run_root=str(tmp_path / "runs"), mesh=mesh_pp2)
        last = tmp_path / "runs" / "pp-obj" / "checkpoints" / "last.npz"

        # PP → non-PP at gacc 2: objective would change → fail closed
        with pytest.raises(RunLifecycleError, match="objective"):
            run_training(dict(cfg, epochs=3), resume=str(last),
                         run_root=str(tmp_path / "runs"), mesh=None)

        # PP → PP with a DIFFERENT stage count: same objective, exact
        mesh_pp4 = make_mesh(8, axes={"data": 2, PIPE_AXIS: 4})
        meta = run_training(dict(cfg, epochs=3), resume=str(last),
                            run_root=str(tmp_path / "runs"), mesh=mesh_pp4)
        assert meta["status"] == "completed"

        # a run trained at gacc 1 may switch PP → non-PP on resume: the
        # objectives coincide at G=1 (gacc itself is fingerprint-immutable)
        cfg_g1 = TestTrainerUnderPipeline._cfg(
            tmp_path, run_id="pp-obj-g1", grad_accum_steps=1)
        run_training(cfg_g1, run_root=str(tmp_path / "runs"), mesh=mesh_pp2)
        last2 = tmp_path / "runs" / "pp-obj-g1" / "checkpoints" / "last.npz"
        meta2 = run_training(
            dict(cfg_g1, epochs=3), resume=str(last2),
            run_root=str(tmp_path / "runs"), mesh=None)
        assert meta2["status"] == "completed"


class TestPipelineEvalStep:
    def test_pad_rows_are_exact(self):
        """B=6 on a quantum-4 mesh pads 2 PAD-target rows; the returned
        token-weighted CE must equal the plain forward on the 6 real rows."""
        from genomics_lm_tpu.parallel.pipeline import make_pipeline_eval_step

        cfg = _cfg()
        rng = np.random.default_rng(11)
        X, Y = _batch(rng, 6, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(11), cfg)
        _, want, _ = codon_gpt.forward(params, cfg, X, Y, return_aux=True)

        mesh = make_mesh(4, axes={"data": 2, PIPE_AXIS: 2})
        staged = split_stage_params(params, 2)
        staged = jax.device_put(staged, stage_param_sharding(mesh, staged))
        out = make_pipeline_eval_step(cfg, mesh)(staged, X, Y)
        np.testing.assert_allclose(
            float(out["next_loss"]), float(want), rtol=1e-5)
        assert int(out["nonpad_tokens"]) == int(np.sum(np.asarray(Y) != 0))
        np.testing.assert_allclose(
            float(out["next_loss_token_sum"]),
            float(want) * int(out["nonpad_tokens"]), rtol=1e-5)


class TestArchitectureToggles:
    def test_rope_swiglu_gqa_parity(self):
        """The stage forward must reproduce every architecture variant the
        stacked model supports — RoPE cache construction, SwiGLU MLPs, and
        GQA head grouping all live inside _block_apply, so the GPipe
        schedule inherits them; this locks that in."""
        cfg = _cfg(use_rope=True, use_swiglu=True, n_kv_head=1)
        rng = np.random.default_rng(12)
        X, Y = _batch(rng, 8, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(12), cfg)
        _, want, _ = codon_gpt.forward(params, cfg, X, Y, return_aux=True)
        mesh = make_mesh(4, axes={PIPE_AXIS: 4})
        staged = split_stage_params(params, 4)
        staged = jax.device_put(staged, stage_param_sharding(mesh, staged))
        got = pipeline_loss(staged, cfg, X, Y, mesh=mesh, n_microbatches=4)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


class TestThreeAxisComposition:
    """DP x TP x PP on one (data=2, model=2, pipe=2) mesh — the full pod
    layout (VERDICT r4 directive 6): Megatron splits run GSPMD-auto inside
    each GPipe stage (the shard_map is manual over data+pipe only), DP
    shards the microbatch rows, ZeRO-1 takes whatever dimension is left."""

    def _mesh(self):
        return make_mesh(8, axes={"data": 2, "model": 2, PIPE_AXIS: 2})

    def test_loss_and_grads_match_single_device(self):
        cfg = _cfg()
        rng = np.random.default_rng(30)
        X, Y = _batch(rng, 8, cfg.block_size)
        params = codon_gpt.init(jax.random.PRNGKey(30), cfg)
        _, want, _ = codon_gpt.forward(params, cfg, X, Y, return_aux=True)

        mesh = self._mesh()
        staged = split_stage_params(params, 2)
        shardings = stage_param_sharding(mesh, staged)
        staged = jax.device_put(staged, shardings)
        # the weights really are sharded over BOTH pipe and model
        q_spec = tuple(staged["blocks"]["attn"]["query"]["w"].sharding.spec)
        assert q_spec[0] == PIPE_AXIS and "model" in q_spec, q_spec
        p_spec = tuple(staged["blocks"]["attn"]["proj"]["w"].sharding.spec)
        assert p_spec[0] == PIPE_AXIS and p_spec[-2] == "model", p_spec

        # jit as the production steps do — mixed manual/auto shard_map is
        # a compiled-program construct (GSPMD owns the model axis)
        loss_fn = jax.jit(lambda p: pipeline_loss(
            p, cfg, X, Y, mesh=mesh, n_microbatches=2))
        got = loss_fn(staged)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

        want_g = merge_stage_params(jax.jit(jax.grad(loss_fn))(staged))
        ref_g = jax.grad(
            lambda p: codon_gpt.forward(p, cfg, X, Y, return_aux=True)[1]
        )(params)
        got_map = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_flatten_with_path(want_g)[0]}
        for path, leaf in jax.tree_util.tree_flatten_with_path(ref_g)[0]:
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(got_map[key]),
                atol=2e-5, rtol=2e-4, err_msg=key)

    def test_opt_state_shardings_span_all_three_axes(self):
        from genomics_lm_tpu.parallel.pipeline import stage_opt_state_sharding

        cfg = _cfg()
        params = codon_gpt.init(jax.random.PRNGKey(31), cfg)
        opt_state = optax.adamw(1e-3).init(params)
        staged = split_stage_params(opt_state, 2)
        shardings = stage_opt_state_sharding(self._mesh(), staged, zero1=True)
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        q_moments = [s for p, s in flat
                     if "query" in jax.tree_util.keystr(p)
                     and jax.tree_util.keystr(p).endswith("['w']")]
        assert q_moments
        for s in q_moments:
            spec = tuple(s.spec)
            # (pipe, data, None, model): depth, ZeRO-1, and Megatron column
            assert spec[0] == PIPE_AXIS
            assert "model" in spec and "data" in spec, spec

    def test_trainer_epoch_resume_matches_single_device(self, tmp_path):
        from genomics_lm_tpu.training import checkpoints as ckpt_lib
        from genomics_lm_tpu.training.loop import run_training

        TestTrainerUnderPipeline._fixture(tmp_path)
        cfg = TestTrainerUnderPipeline._cfg(
            tmp_path, grad_accum_steps=1, n_embd=32, run_id="pp3-run",
            shard_optimizer_state=True)
        mesh = self._mesh()
        meta = run_training(dict(cfg), run_root=str(tmp_path / "runs"),
                            mesh=mesh)
        assert meta["status"] == "completed"
        meta_sd = run_training(dict(cfg), run_root=str(tmp_path / "runs_sd"),
                               mesh=None)
        for key in ("last_val_loss", "best_val_loss"):
            np.testing.assert_allclose(
                float(meta[key]), float(meta_sd[key]), rtol=5e-3, err_msg=key)

        # merged checkpoint + resume under the same 3-axis mesh
        run_dir = tmp_path / "runs" / "pp3-run"
        payload = ckpt_lib.load_checkpoint(run_dir / "checkpoints" / "last.npz")
        for leaf in jax.tree.leaves(payload["model"]["blocks"]):
            assert leaf.shape[0] == cfg["n_layer"]
        meta2 = run_training(
            dict(cfg, epochs=3), run_root=str(tmp_path / "runs"),
            resume=str(run_dir / "checkpoints" / "last.npz"), mesh=mesh)
        assert meta2["status"] == "completed"
