"""End-to-end protein-critic training-equivalence gate (scaled down).

Drives ``scripts/cross_framework_equivalence_critic.py``: the ACTUAL
reference multi-task critic trainer (``src/protein_lm/train_multi_task.py``,
torch CPU subprocess) and this framework's critic trainer train on one
shared frozen multi-task corpus from identical transplanted initial
weights; a single unified evaluator gates final val loss agreement
(<0.5%), per-task metric agreement, and trained-checkpoint latent
identity. The full-scale run (12L8H d384 block512) is recorded in
``docs/benchmarks/cross_framework_equivalence_critic_d384.json``; this
test reruns the whole chain at a small scale.

Skipped when torch or the reference checkout is unavailable.
"""

import argparse

import pytest

pytestmark = pytest.mark.slow  # heavy cross-framework suite

from genomics_lm_tpu.utils import torch_bridge

if not torch_bridge.reference_available():  # pragma: no cover
    pytest.skip(
        "reference checkout or torch unavailable", allow_module_level=True
    )

from scripts.cross_framework_equivalence_critic import run_equivalence  # noqa: E402


def test_critic_training_equivalence(tmp_path):
    args = argparse.Namespace(
        workdir=str(tmp_path / "equiv"),
        n_train=100,
        n_val=40,
        n_family=3,
        n_ec=2,
        block_size=256,
        n_layer=2,
        n_head=2,
        n_embd=64,
        pooling="mean",
        batch_size=8,
        grad_accum=2,
        lr=1e-4,
        epochs=2,
        divergence_epochs=0,  # the small-scale chain stays in lockstep
        chaos_perturbation=1e-7,
        seed=1337,
        fresh=False,
        ref_timeout=1200,
    )
    report = run_equivalence(args)

    assert report["gates"]["val_loss_within_half_percent"], report
    assert report["val_loss_rel_diff"] < 0.005
    assert report["gates"]["chain_ref_logged_vs_transplant_eval"], report
    assert report["gates"]["family_accuracy_agrees"], report
    assert report["gates"]["function_accuracy_agrees"], report
    assert report["gates"]["stability_smooth_l1_agrees"], report
    assert report["gates"]["trained_latents_identical"], report
    assert report["trained_latents"]["rel_diff"] <= 5e-4
    assert report["all_gates_pass"]
