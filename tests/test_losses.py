"""Loss semantics: PyTorch-equivalent CE and auxiliary objectives.

torch (CPU) is a baked dependency, so CE semantics are asserted directly
against ``torch.nn.functional.cross_entropy`` — the exact op the reference
uses (``model_tiny_gpt.py:343-349``).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from genomics_lm_tpu.ops import losses


rng = np.random.default_rng(42)


def torch_ce(logits, targets, **kw):
    return float(
        F.cross_entropy(
            torch.tensor(logits).view(-1, logits.shape[-1]),
            torch.tensor(targets).view(-1),
            **kw,
        )
    )


class TestCrossEntropy:
    def test_plain_with_ignore(self):
        logits = rng.normal(size=(4, 16, 68)).astype(np.float32)
        targets = rng.integers(0, 68, (4, 16))
        targets[0, :5] = 0
        ref = torch_ce(logits, targets, ignore_index=0)
        mine = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
        assert abs(ref - mine) < 1e-5

    def test_label_smoothing(self):
        logits = rng.normal(size=(3, 8, 10)).astype(np.float32)
        targets = rng.integers(1, 10, (3, 8))
        ref = torch_ce(logits, targets, ignore_index=0, label_smoothing=0.1)
        mine = float(
            losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets), label_smoothing=0.1)
        )
        assert abs(ref - mine) < 1e-5

    def test_class_weights(self):
        logits = rng.normal(size=(5, 12, 20)).astype(np.float32)
        targets = rng.integers(0, 20, (5, 12))
        w = rng.uniform(0.25, 2.0, 20).astype(np.float32)
        ref = torch_ce(logits, targets, ignore_index=0, weight=torch.tensor(w))
        mine = float(
            losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets), weight=jnp.asarray(w))
        )
        assert abs(ref - mine) < 1e-5

    def test_weights_and_smoothing(self):
        logits = rng.normal(size=(2, 6, 9)).astype(np.float32)
        targets = rng.integers(0, 9, (2, 6))
        w = rng.uniform(0.5, 1.5, 9).astype(np.float32)
        ref = torch_ce(
            logits, targets, ignore_index=0, weight=torch.tensor(w), label_smoothing=0.2
        )
        mine = float(
            losses.cross_entropy(
                jnp.asarray(logits), jnp.asarray(targets),
                weight=jnp.asarray(w), label_smoothing=0.2,
            )
        )
        assert abs(ref - mine) < 1e-5

    def test_valid_mask_composes(self):
        logits = rng.normal(size=(2, 6, 9)).astype(np.float32)
        targets = rng.integers(1, 9, (2, 6))
        mask = np.zeros((2, 6), bool)
        mask[:, :3] = True
        ref = torch_ce(logits[:, :3], targets[:, :3], ignore_index=0)
        mine = float(
            losses.cross_entropy(
                jnp.asarray(logits), jnp.asarray(targets), valid_mask=jnp.asarray(mask)
            )
        )
        assert abs(ref - mine) < 1e-5


class TestOffsetObjectives:
    def test_offset_mask_blocks_boundaries(self):
        # y: [c, c, EOS, c, c, c]; predicting t+2 across the EOS is invalid
        yb = jnp.asarray([[10, 11, 2, 12, 13, 14]])
        mask = losses.offset_target_mask(yb, 2)
        # target seq is y[:, 1:]; position 1 targets y[2]=EOS — allowed;
        # position 2's path crosses boundary y[2] → invalid
        assert mask.shape == (1, 5)
        assert bool(mask[0, 1])  # target is the boundary itself: allowed
        assert not bool(mask[0, 2])  # crosses the boundary: blocked

    def test_offset_mask_pad(self):
        yb = jnp.asarray([[10, 11, 0, 0]])
        mask = losses.offset_target_mask(yb, 2)
        assert not bool(mask[0, 1]) and not bool(mask[0, 2])

    def test_offset_too_large(self):
        yb = jnp.asarray([[10, 11]])
        assert losses.offset_target_mask(yb, 5).shape == (1, 0)
        with pytest.raises(ValueError):
            losses.offset_target_mask(yb, 0)

    def test_multi_offset_loss_runs(self):
        yb = jnp.asarray(rng.integers(4, 68, (2, 10)))
        logits = jnp.asarray(rng.normal(size=(2, 10, 68)).astype(np.float32))
        total, per = losses.multi_offset_lm_loss(logits, yb, {2: 0.5, 3: 0.25})
        assert set(per) == {2, 3}
        assert float(total) > 0

    def test_multi_offset_dict_heads(self):
        yb = jnp.asarray(rng.integers(4, 68, (2, 10)))
        heads = {2: jnp.asarray(rng.normal(size=(2, 10, 68)).astype(np.float32))}
        total, per = losses.multi_offset_lm_loss(heads, yb, {2: 1.0, 3: 1.0})
        assert set(per) == {2}


class TestTermination:
    def test_bucket_labels(self):
        # stops at id 5; sequence [x, 5, x, x, x(PAD)]
        yb = jnp.asarray([[9, 5, 9, 9, 0]])
        labels = losses.termination_distance_bucket_labels(yb, (5,), bucket_edges=(0, 2))
        # pos0: distance 1 → bucket 1; pos1: distance 0 → bucket 0
        assert int(labels[0, 0]) == 1
        assert int(labels[0, 1]) == 0
        # pos2,3: no stop ahead → final bucket (len(edges))
        assert int(labels[0, 2]) == 2
        # PAD → ignore
        assert int(labels[0, 4]) == -100

    def test_bucket_edges_sorted(self):
        with pytest.raises(ValueError):
            losses.termination_distance_bucket_labels(jnp.zeros((1, 4), jnp.int32), (5,), bucket_edges=(3, 0))
        with pytest.raises(ValueError):
            losses.termination_distance_bucket_labels(jnp.zeros((1, 4), jnp.int32), ())

    def test_termination_loss_vs_torch(self):
        yb = np.asarray(rng.integers(0, 68, (3, 12)))
        labels = losses.termination_distance_bucket_labels(jnp.asarray(yb), (22, 24, 40))
        tl = rng.normal(size=(3, 12, 5)).astype(np.float32)
        ref = float(
            F.cross_entropy(
                torch.tensor(tl).view(-1, 5),
                torch.tensor(np.asarray(labels)).long().view(-1),
                ignore_index=-100,
            )
        )
        mine = float(losses.termination_aux_loss(jnp.asarray(tl), labels))
        assert abs(ref - mine) < 1e-5


class TestCompositeLossSharedHead:
    def test_offset_weights_without_offset_heads(self):
        """multi_offset_weights set but the model has NO per-offset heads:
        the shared LM head's logits must be reused (regression: truthiness
        of a traced array raised ValueError)."""
        import jax
        from genomics_lm_tpu.models.config import CodonGPTConfig
        from genomics_lm_tpu.models import codon_gpt
        from genomics_lm_tpu.training.train_step import LossConfig, composite_loss

        cfg = CodonGPTConfig(vocab_size=68, block_size=16, n_layer=1, n_head=2,
                             n_embd=16, dropout=0.0)  # no multi_offset_targets
        params = codon_gpt.init(jax.random.key(0), cfg)
        lcfg = LossConfig(multi_offset_weights=((2, 0.5), (3, 0.25)))
        xb = jnp.asarray(rng.integers(4, 68, (2, 16)), jnp.int32)
        yb = jnp.asarray(rng.integers(4, 68, (2, 16)), jnp.int32)
        total, parts = jax.jit(
            lambda p: composite_loss(p, cfg, lcfg, xb, yb, train=False, rng=None)
        )(params)
        assert np.isfinite(float(total))
        assert set(parts["offset_losses"]) == {2, 3}
        # shared head: total = next + sum of weighted offset CEs, all finite
        assert float(total) > float(parts["next_loss"]) - 1e-6
