"""End-to-end cross-framework training-equivalence gate (scaled down).

Drives ``scripts/cross_framework_equivalence.py``: the ACTUAL reference
trainer (``src/codonlm/training/loop.py:173``, torch CPU subprocess) and
this framework's production trainer train on one shared frozen synthetic
dataset from identical transplanted initial weights; a single unified
evaluator then gates final val NLL agreement (<0.5%), Markov-baseline
margin reproduction, and probe-embedding identity on the transplanted
reference checkpoint. The full-scale run (660 genes, 4L4H d128, 12
epochs) is recorded in ``docs/benchmarks/cross_framework_equivalence.json``;
this test reruns the whole chain at a small scale.

Skipped when torch or the reference checkout is unavailable.
"""

import argparse
import json

import pytest

pytestmark = pytest.mark.slow  # heavy cross-framework / multi-process suite

from genomics_lm_tpu.utils import torch_bridge

if not torch_bridge.reference_available():  # pragma: no cover
    pytest.skip(
        "reference checkout or torch unavailable", allow_module_level=True
    )

from scripts.cross_framework_equivalence import run_equivalence  # noqa: E402


def test_cross_framework_training_equivalence(tmp_path):
    args = argparse.Namespace(
        workdir=str(tmp_path / "equiv"),
        genes=200,
        block_size=128,
        n_layer=2,
        n_head=2,
        n_embd=64,
        batch_size=16,
        grad_accum=1,
        lr=1e-3,
        warmup_steps=20,
        epochs=12,
        seed=1337,
        fresh=False,
    )
    report = run_equivalence(args)

    assert report["gates"]["val_nll_within_half_percent"], report
    assert report["val_nll_rel_diff"] < 0.005
    assert report["gates"]["chain_ref_logged_vs_transplant_eval"], report
    assert report["gates"]["markov_margins_same_side"], report
    assert report["gates"]["both_beat_unigram"], report
    assert report["gates"]["probe_embeddings_identical"], report
    assert report["probe_embeddings"]["rel_diff"] <= 5e-4
    assert report["all_gates_pass"]

    # the report artifact is written and self-consistent
    on_disk = json.loads(
        (tmp_path / "equiv" / "equivalence_report.json").read_text()
    )
    assert on_disk["all_gates_pass"]
