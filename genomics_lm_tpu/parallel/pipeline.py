"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference is strictly single-device (SURVEY.md §2.6), so — like the
tensor-parallel layer — this is TPU-native scaling headroom with no
reference analog: depth sharding for models whose layer stack outgrows
one chip's HBM, composable with the existing data axis (DP/ZeRO-1) and
usable where the layer count, not the weight width, is the memory bound.

Design (SPMD collective pipelining, the shard_map idiom):

- The model's blocks already live as a stacked pytree with a leading
  ``n_layer`` axis (``models/codon_gpt.py:init``). :func:`split_stage_params`
  reshapes that axis to ``(n_stages, layers_per_stage)`` and the leading
  axis is sharded over the ``pipe`` mesh axis — each device holds its own
  stage's contiguous block slice. Embedding/head/ln_f stay replicated
  (at 68-token vocab they are a rounding error next to one block).
- :func:`pipeline_loss` runs the classic GPipe schedule as ONE jitted
  SPMD program: ``n_microbatches + n_stages - 1`` ticks scanned with
  ``lax.scan``; at every tick each stage applies its local blocks to its
  in-flight microbatch, then the activations rotate one stage to the
  right via ``jax.lax.ppermute`` — a neighbour-only ICI transfer, never
  a broadcast. Stage 0 injects ``embed(microbatch[t])``; the last stage
  accumulates the CE numerator/denominator of microbatch ``t - (S-1)``.
  Bubble fraction is the textbook ``(S-1)/(M+S-1)``.
- The loss accumulates :func:`ops.losses.cross_entropy_parts` so the
  final division reproduces the whole-batch weighted-mean CE exactly —
  training under PP is bit-compatible (fp32 reduction order aside) with
  the single-device objective (``/root/reference/src/codonlm/
  model_tiny_gpt.py:343-349`` semantics).
- Reverse-mode AD differentiates straight through ``shard_map`` +
  ``ppermute`` (the transpose of a rotation is the reverse rotation), so
  ``jax.grad`` of :func:`pipeline_loss` yields the 1F1B-equivalent
  backward schedule without hand-written backward plumbing; replicated
  parameters' cotangents are psum'ed across stages by the shard_map
  transpose rule.

Every stage traces the embed/head computation and masks the result by
stage id (SPMD programs are identical across devices); both are tiny
next to a block stack — the waste is ``O(B·T·(d + vocab))`` FLOPs versus
``O(B·T·d²·layers_per_stage)`` of useful work per tick.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.ops.losses import cross_entropy_parts
from genomics_lm_tpu.ops.masks import segment_ids_from_tokens
from genomics_lm_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def _map_block_leaves(tree, fn):
    """Apply ``fn`` to every leaf that lives under a ``blocks`` dict key.

    Works on the params dict AND on any params-shaped subtree inside an
    optax state (mu/nu mirror the params tree paths), which is what makes
    pipeline checkpoints layout-neutral: the same transform converts the
    whole optimizer state between stacked and stage-split layouts.
    """
    def visit(path, leaf):
        under_blocks = any(
            getattr(p, "key", None) == "blocks" for p in path)
        return fn(leaf) if under_blocks else leaf

    return jax.tree_util.tree_map_with_path(visit, tree)


def split_stage_params(params: dict, n_stages: int) -> dict:
    """Reshape every stacked block axis (n_layer, …) → (n_stages, Lps, …).

    Non-block entries (embeddings, ln_f, head, aux heads) pass through
    untouched; shard the result's ``blocks`` leading axes over ``pipe``.
    Accepts the params dict or an optax state containing params-shaped
    subtrees (checkpoint/resume interop).
    """
    def reshape(leaf):
        n_layer = leaf.shape[0]
        if n_layer % n_stages:
            raise ValueError(
                f"n_layer={n_layer} not divisible by n_stages={n_stages}")
        return leaf.reshape(n_stages, n_layer // n_stages, *leaf.shape[1:])

    return _map_block_leaves(params, reshape)


def merge_stage_params(params: dict) -> dict:
    """Inverse of :func:`split_stage_params` (for checkpoint interop).

    Checkpoints always store the merged (single-device) layout, so a
    pipeline run's artifacts transplant/evaluate/resume anywhere —
    including resuming under a different stage count.
    """
    return _map_block_leaves(
        params, lambda leaf: leaf.reshape(-1, *leaf.shape[2:]))


def stage_param_sharding(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree: block leaves split over ``pipe``, rest
    replicated. Accepts the params dict or a stage-split optax state.

    When the mesh also carries a ``model`` axis (>1), block linears
    additionally take the Megatron column/row tensor-parallel splits on
    their fan dimensions (``sharding.tp_spec`` — the rules match path
    suffixes, so the 4-D stage-split shapes (S, Lps, fan_in, fan_out)
    shard exactly like the stacked 3-D layout): all three axes compose on
    one mesh — DP outside, TP inside each pipeline stage.
    """
    from genomics_lm_tpu.parallel.mesh import MODEL_AXIS
    from genomics_lm_tpu.parallel.sharding import _path_names, tp_spec

    tp = mesh.shape.get(MODEL_AXIS, 1)

    def leaf(path, x):
        names = _path_names(path)
        shape = getattr(x, "shape", ())
        if "blocks" not in names:
            return NamedSharding(mesh, P())
        parts = list(tp_spec(names, shape, tp, MODEL_AXIS))
        parts += [None] * (len(shape) - len(parts))
        if shape:
            parts[0] = PIPE_AXIS
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(leaf, tree)


def stage_opt_state_sharding(mesh: Mesh, opt_state: Any, *,
                             zero1: bool = False) -> Any:
    """NamedShardings for a stage-split optax state, optionally ZeRO-1.

    Block-path leaves (AdamW moments mirror the params tree) lead with the
    ``pipe`` axis like :func:`stage_param_sharding`, and take the same
    Megatron fan splits when the mesh carries a ``model`` axis. With
    ``zero1`` each leaf additionally shards its first remaining divisible
    dimension over the ``data`` axis — the PP analog of
    ``sharding.zero1_opt_state_sharding``, so stage-param moments never
    replicate across data-parallel peers.
    """
    from genomics_lm_tpu.parallel.mesh import MODEL_AXIS
    from genomics_lm_tpu.parallel.sharding import _path_names, tp_spec

    dp = mesh.shape.get(DATA_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def visit(path, leaf):
        names = _path_names(path)
        shape = getattr(leaf, "shape", ())
        under_blocks = "blocks" in names
        if under_blocks:
            parts = list(tp_spec(names, shape, tp, MODEL_AXIS))
            parts += [None] * (len(shape) - len(parts))
            if shape:
                parts[0] = PIPE_AXIS
        else:
            parts = [None] * len(shape)
        if zero1 and dp > 1:
            for dim, size in enumerate(shape):
                if parts[dim] is None and size > 0 and size % dp == 0:
                    parts[dim] = DATA_AXIS
                    break
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(visit, opt_state)


def _stage_forward(blocks_stage, params_rest, cfg: CodonGPTConfig, x,
                   segment_ids, rope_cache, rng=None):
    """Apply this stage's block stack to x — mirrors ``_run_blocks``.

    ``rng`` enables train-mode dropout: one fold per local layer (dropout
    needs per-layer independence, not any cross-layout reproducibility).
    """
    train = rng is not None
    n_local = jax.tree.leaves(blocks_stage)[0].shape[0]

    def body(h, layer_in):
        block_p, layer_rng = layer_in if train else (layer_in, None)
        h, _ = codon_gpt._block_apply(  # MoE fails closed before PP; aux unused
            block_p, h, cfg,
            segment_ids=segment_ids,
            attention_window=None,
            rope_cache=rope_cache,
            train=train,
            rng=layer_rng,
        )
        return h, None

    if cfg.use_checkpoint:
        body = jax.checkpoint(body)
    xs = (blocks_stage, jax.random.split(rng, n_local)) if train else blocks_stage
    x, _ = jax.lax.scan(body, x, xs)
    return x


def _pipeline_shard_fn(params, Xm, Ym, train_rng=None, *,
                       cfg: CodonGPTConfig, n_stages: int,
                       has_data_axis: bool):
    """Per-device body (runs under shard_map over ('data'?, 'pipe'))."""
    sid = jax.lax.axis_index(PIPE_AXIS)
    # local block stack: leading pipe-shard axis is 1 wide on-device
    blocks_local = jax.tree.map(lambda b: b[0], params["blocks"])
    M, mb, T = Xm.shape
    S = n_stages
    rope_cache = (
        codon_gpt.rope_cos_sin(T, cfg.head_dim, cfg.rope_base, cfg.dtype)
        if cfg.use_rope else None
    )
    weight = (
        None if cfg.uniform_loss_weights
        else jnp.asarray(cfg.loss_weights, jnp.float32)
    )

    def tick(carry, t):
        h_prev, numer, denom = carry
        m = jnp.clip(t - sid, 0, M - 1)       # this stage's microbatch index
        active = (t - sid >= 0) & (t - sid < M)
        xb = jax.lax.dynamic_index_in_dim(Xm, m, 0, keepdims=False)
        seg = (
            segment_ids_from_tokens(xb, cfg.sep_id)
            if cfg.sep_id is not None else None
        )
        # per-(stage, tick) dropout keys — unique per (microbatch, stage);
        # the replicated rng also folds the data-axis index so each
        # data-parallel shard draws independent masks for its local rows
        if train_rng is not None:
            tick_rng = jax.random.fold_in(
                jax.random.fold_in(train_rng, sid), t)
            if has_data_axis:
                tick_rng = jax.random.fold_in(
                    tick_rng, jax.lax.axis_index(DATA_AXIS))
            embed_rng = jax.random.fold_in(tick_rng, 0)
            stage_rng = jax.random.fold_in(tick_rng, 1)
        else:
            embed_rng = stage_rng = None
        # stage 0 injects the embedded microbatch; others consume the ring
        x0 = codon_gpt._embed(params, cfg, xb, None,
                              train=train_rng is not None, rng=embed_rng)
        x0 = codon_gpt._constrain_residual(x0, cfg)
        x_in = jnp.where(sid == 0, x0.astype(cfg.dtype), h_prev)
        h_out = _stage_forward(blocks_local, params, cfg, x_in, seg,
                               rope_cache, rng=stage_rng)

        # last stage: ln_f + head + CE parts of its (t - S + 1) microbatch
        yb = jax.lax.dynamic_index_in_dim(Ym, m, 0, keepdims=False)
        xf = codon_gpt._layer_norm(params["ln_f"], h_out)
        logits = codon_gpt._lm_logits(params, cfg, xf)
        n_part, d_part = cross_entropy_parts(
            logits, yb, ignore_index=0,
            label_smoothing=cfg.label_smoothing, weight=weight,
        )
        take = active & (sid == S - 1)
        numer = numer + jnp.where(take, n_part, 0.0)
        denom = denom + jnp.where(take, d_part, 0.0)

        h_next = jax.lax.ppermute(
            h_out, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)])
        return (h_next, numer, denom), None

    h0 = jnp.zeros((mb, T, cfg.n_embd), cfg.dtype)
    (_, numer, denom), _ = jax.lax.scan(
        tick, (h0, jnp.float32(0.0), jnp.float32(0.0)),
        jnp.arange(M + S - 1))
    numer = jax.lax.psum(numer, PIPE_AXIS)
    denom = jax.lax.psum(denom, PIPE_AXIS)
    if has_data_axis:
        numer = jax.lax.psum(numer, DATA_AXIS)
        denom = jax.lax.psum(denom, DATA_AXIS)
    return numer / jnp.maximum(denom, 1e-12)


def pipeline_loss(
    params: dict,
    cfg: CodonGPTConfig,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    *,
    mesh: Mesh,
    n_microbatches: int,
    train_rng: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Whole-batch CE loss under the GPipe schedule (differentiable).

    ``params`` must be stage-split (:func:`split_stage_params`) and laid
    out per :func:`stage_param_sharding`. X/Y are the global (B, T)
    batch; B must divide into ``n_microbatches`` (times the data-axis
    size when the mesh has one). Returns the scalar whole-batch mean CE —
    identical reduction to ``codon_gpt.forward``'s loss. ``train_rng``
    switches the forward to train mode (dropout active).
    """
    n_stages = mesh.shape[PIPE_AXIS]
    has_data = DATA_AXIS in mesh.shape
    B, T = X.shape
    M = int(n_microbatches)
    dp = mesh.shape[DATA_AXIS] if has_data else 1
    if B % (M * dp):
        raise ValueError(f"batch {B} not divisible by {M} microbatches × dp {dp}")
    # (B, T) → (M, mb·dp, T); the data axis shards the microbatch dim
    Xm = X.reshape(M, B // M, T)
    Ym = Y.reshape(M, B // M, T)

    data_spec = P(None, DATA_AXIS, None) if has_data else P(None, None, None)
    in_specs = (
        stage_param_specs(params),
        data_spec,
        data_spec,
    )
    if train_rng is not None:
        in_specs = in_specs + (P(),)      # rng key replicated
    # manual only over (data, pipe): any further mesh axis (e.g. 'model')
    # stays GSPMD-auto, so Megatron-split block weights inside each stage
    # get their tensor-parallel collectives from the compiler — the
    # DP × TP × PP composition runs as one program
    manual = {PIPE_AXIS} | ({DATA_AXIS} if has_data else set())
    fn = jax.shard_map(
        functools.partial(_pipeline_shard_fn, cfg=cfg, n_stages=n_stages,
                          has_data_axis=has_data),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
        axis_names=manual,
        check_vma=False,
    )
    if train_rng is not None:
        return fn(params, Xm, Ym, train_rng)
    return fn(params, Xm, Ym)


def stage_param_specs(params: dict) -> Any:
    """PartitionSpec pytree matching :func:`stage_param_sharding`."""
    specs = jax.tree.map(lambda _: P(), params)
    specs["blocks"] = jax.tree.map(lambda _: P(PIPE_AXIS), params["blocks"])
    return specs


def make_pipeline_train_step(cfg: CodonGPTConfig, mesh: Mesh,
                             n_microbatches: int, optimizer):
    """(params, opt_state, X, Y) → (params, opt_state, loss) under PP.

    ``optimizer`` is any optax GradientTransformation; its state follows
    the parameter shardings (stage-sharded for blocks). jit with
    donate_argnums on (params, opt_state) for in-place updates.
    """
    import optax

    def step(params, opt_state, X, Y):
        loss, grads = jax.value_and_grad(pipeline_loss)(
            params, cfg, X, Y, mesh=mesh, n_microbatches=n_microbatches)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_pipeline_group_step(cfg: CodonGPTConfig, tx, mesh: Mesh,
                             opt_shardings=None):
    """Production-trainer group step (``training/loop.py`` contract) under PP.

    Signature matches ``train_step.make_train_step``'s returned function::

        new_params, new_opt_state, metrics = step(
            params, opt_state, batch, rng, lr_scale)

    ``batch['x']/['y']`` are (G, B, T); the accumulation group is consumed
    as ONE GPipe run with M=G microbatches, committing the exact
    token-weighted whole-group CE — the full-batch objective itself rather
    than grad accumulation's mean-of-microbatch-means approximation of it.
    (The two objectives coincide at G=1 or whenever every microbatch holds
    the same non-pad token count; at ragged counts they differ by the
    token-weighting — quantified in
    ``test_pipeline.py::TestGroupStepObjective``.)
    Dropout follows ``cfg.dropout`` via the step rng. Aux losses are not
    supported here; ``run_training`` fails closed before selecting this
    step. Nonfinite handling is group-granular (GPipe has no per-microbatch
    commit point): any nonfinite loss/grad skips the whole update, matching
    the trainer's abort-discards-the-group semantics.

    ``opt_shardings`` (a NamedSharding pytree from
    :func:`stage_opt_state_sharding`) pins the updated optimizer state to
    its ZeRO-1 layout so GSPMD keeps the moments sharded across steps.
    """
    import optax

    def step(params, opt_state, batch, rng, lr_scale):
        x, y = batch["x"], batch["y"]
        G, B, T = x.shape
        X = x.reshape(G * B, T)
        Y = y.reshape(G * B, T)
        train_rng = rng if cfg.dropout > 0.0 else None
        loss, grads = jax.value_and_grad(pipeline_loss)(
            params, cfg, X, Y, mesh=mesh, n_microbatches=G,
            train_rng=train_rng)
        grads_finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        group_ok = jnp.isfinite(loss) & grads_finite

        def apply_update(_):
            updates, new_opt = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            return optax.apply_updates(params, updates), new_opt

        new_params, new_opt_state = jax.lax.cond(
            group_ok, apply_update, lambda _: (params, opt_state), None)
        if opt_shardings is not None:
            new_opt_state = jax.lax.with_sharding_constraint(
                new_opt_state, opt_shardings)

        ok_f = group_ok.astype(jnp.float32)
        ok_i = group_ok.astype(jnp.int32)
        committed = jnp.int32(G) * ok_i
        metrics = {
            "applied": group_ok,
            "saw_nonfinite": ~group_ok,
            "finite_microbatches": committed,
            "committed_microbatches": committed,
            # the whole-group objective has no per-microbatch commit point
            "discarded_before_nonfinite": jnp.int32(0),
            # NOTE: under PP this is the whole-group token-weighted loss;
            # the non-PP trainer logs the FIRST microbatch's loss here, so
            # `initial_loss` curves are not directly comparable across
            # trainer modes (they converge as the first group averages out)
            "first_loss": loss,
            "total_loss_sum": loss * jnp.float32(G) * ok_f,
            "next_loss_sum": loss * jnp.float32(G) * ok_f,
            "nonpad_tokens": jnp.sum(Y != 0).astype(jnp.int32) * ok_i,
        }
        return new_params, new_opt_state, metrics

    return jax.jit(step)


def make_pipeline_eval_step(cfg: CodonGPTConfig, mesh: Mesh,
                            max_microbatch_rows: int = 8):
    """Validation step (``train_step.make_eval_step`` contract) under PP.

    Pads the batch with PAD-target rows up to the pipeline quantum —
    exact: rows whose targets are all PAD contribute zero CE numerator
    and denominator, and the token counts are computed on the padded
    targets (still PAD). Returns the token-weighted batch CE for both
    loss fields; ``next_loss_token_sum`` is therefore the exact corpus CE
    sum the trainer's perplexity accounting expects.

    The microbatch count is chosen per batch shape (shapes are static
    under jit) as the most bubble-amortizing schedule: microbatches of at
    most ``max_microbatch_rows`` rows per data shard, at least ``S``
    microbatches total, so large validation batches run at bubble
    fraction (S-1)/(M+S-1) with M ≫ S instead of the fixed worst case
    (S-1)/(2S-1).
    """
    n_stages = mesh.shape[PIPE_AXIS]
    dp = mesh.shape.get(DATA_AXIS, 1)

    def step(params, xb, yb):
        rows_per_shard = -(-xb.shape[0] // dp)              # ceil
        mb_rows = max(1, min(max_microbatch_rows, rows_per_shard // n_stages))
        M = max(n_stages, -(-rows_per_shard // mb_rows))
        pad = M * mb_rows * dp - xb.shape[0]
        if pad:
            xb = jnp.concatenate(
                [xb, jnp.zeros((pad, xb.shape[1]), xb.dtype)])
            yb = jnp.concatenate(
                [yb, jnp.zeros((pad, yb.shape[1]), yb.dtype)])
        loss = pipeline_loss(
            params, cfg, xb, yb, mesh=mesh, n_microbatches=M)
        nonpad = jnp.sum(yb != 0)
        return {
            "total_loss": loss,
            "next_loss": loss,
            "nonpad_tokens": nonpad.astype(jnp.int32),
            "next_loss_token_sum": loss * nonpad.astype(jnp.float32),
        }

    return jax.jit(step)


__all__ = [
    "PIPE_AXIS",
    "make_pipeline_eval_step",
    "make_pipeline_group_step",
    "make_pipeline_train_step",
    "merge_stage_params",
    "pipeline_loss",
    "split_stage_params",
    "stage_opt_state_sharding",
    "stage_param_sharding",
    "stage_param_specs",
]
