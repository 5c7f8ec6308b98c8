"""Docs-as-tests: recorded numbers and CLI-surface invariants stay consistent
(reference pattern: tests/test_scientific_claims_docs.py)."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


class TestBaselineConsistency:
    def test_bench_baseline_matches_baseline_md(self):
        bench = (REPO / "bench.py").read_text()
        constant = float(
            re.search(r"BASELINE_TOKENS_PER_SEC = ([\d.]+)", bench).group(1)
        )
        baseline_md = (REPO / "BASELINE.md").read_text()
        assert f"{constant:,.1f}" in baseline_md or str(constant) in baseline_md

    def test_benchmarks_doc_cites_bench_baseline(self):
        doc = (REPO / "docs" / "BENCHMARKS.md").read_text()
        assert "2,891.9" in doc

    def test_bench_uses_flash_and_bf16_on_tpu(self):
        bench = (REPO / "bench.py").read_text()
        assert '"flash"' in bench
        assert '"bfloat16"' in bench


class TestScriptSurface:
    def test_every_script_has_bootstrap_header(self):
        missing = []
        for path in sorted((REPO / "scripts").glob("*.py")):
            if path.name.startswith("_"):
                continue
            text = path.read_text()
            if "_sys.path.insert" not in text and "sys.path.insert" not in text:
                missing.append(path.name)
        assert not missing, f"scripts without path bootstrap: {missing}"

    def test_reference_script_inventory_complete(self):
        """Every CLI named in SURVEY.md §2.5 exists under scripts/."""
        survey = (REPO / "SURVEY.md").read_text()
        have = {p.name for p in (REPO / "scripts").glob("*.py")}
        # script names cited in the survey's scripts/ inventory section
        section = survey.split("### 2.5")[1].split("### 2.6")[0]
        cited = set(re.findall(r"`([a-z0-9_]+\.py)`", section))
        missing = sorted(n for n in cited if n not in have)
        assert not missing, f"SURVEY §2.5 scripts missing: {missing}"
