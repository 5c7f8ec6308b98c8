"""The committed cross-framework equivalence artifact must pass its gates.

Unlike tests/test_equivalence_run.py (slow, needs torch + the mounted
reference), this reads only the committed JSON — it runs in every core CI
job, so a regenerated artifact with a failing gate cannot land silently.
"""

import json
from pathlib import Path


import pytest


@pytest.mark.parametrize("artifact", [
    "docs/benchmarks/cross_framework_equivalence.json",
    "docs/benchmarks/cross_framework_equivalence_d384_tpu.json",
])
def test_recorded_full_scale_report_passes_gates(artifact):
    path = Path(__file__).resolve().parent.parent / artifact
    report = json.loads(path.read_text())
    assert report["all_gates_pass"]
    assert all(report["gates"].values()), report["gates"]
    assert report["val_nll_rel_diff"] < 0.005
    assert report["tolerance"] == 0.005
    assert report["probe_embeddings"]["rel_diff"] <= 5e-4
    assert report["probe_embeddings"]["min_cosine"] >= 1 - 1e-6
    for name in ("Uniform", "Unigram", "Bigram", "Trigram"):
        assert report["markov_baselines"][name]["same_side"]
