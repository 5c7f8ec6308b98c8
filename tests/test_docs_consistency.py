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


class TestCoverageCitations:
    def test_cited_test_files_and_names_exist(self):
        """Every `test_*.py` / `test_*.py::Name` citation in the docs must
        point at a real file (and a real class/function in it). Guards
        against the silent-staleness mode where a test file is renamed or
        clobbered by a same-named new file (happened to test_pipeline.py:
        the data-pipeline e2e tests vanished for two commits)."""
        import re
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        tests_dir = repo / "tests"
        problems = []
        for doc in sorted((repo / "docs").glob("*.md")):
            for m in re.finditer(
                r"`(test_\w+\.py)(?:::(\w+))?`", doc.read_text()
            ):
                fname, member = m.group(1), m.group(2)
                # reference-parity scripts are also named test_*.py
                path = tests_dir / fname
                if not path.exists() and (repo / "scripts" / fname).exists():
                    path = repo / "scripts" / fname
                if not path.exists():
                    problems.append(f"{doc.name}: {fname} does not exist")
                    continue
                if member and not re.search(
                    rf"^(class {member}\b|\s*def {member}\b)",
                    path.read_text(), re.MULTILINE,
                ):
                    problems.append(
                        f"{doc.name}: {fname}::{member} not found in file")
        assert not problems, "\n".join(problems)


class TestBenchmarkArtifactsTracked:
    def test_docs_referenced_benchmark_json_are_git_tracked(self):
        """Every docs/benchmarks/*.json mentioned anywhere under docs/ (or
        README) must be committed — an artifact cited by documentation that
        exists only in a working tree vanishes on a fresh clone (VERDICT r4
        weak #4: lora_transfer.json was untracked)."""
        import re
        import subprocess

        repo = Path(__file__).resolve().parent.parent
        tracked = set(subprocess.run(
            ["git", "ls-files", "docs/benchmarks"], cwd=repo,
            capture_output=True, text=True, timeout=60,
        ).stdout.split())
        referenced = set()
        sources = list((repo / "docs").rglob("*.md")) + [repo / "README.md"]
        for doc in sources:
            for name in re.findall(r"([\w.\-]+\.json)", doc.read_text()):
                candidate = f"docs/benchmarks/{name}"
                if (repo / candidate).exists() or candidate in tracked:
                    referenced.add(candidate)
        assert referenced, "no benchmark artifacts referenced from docs?"
        untracked = sorted(
            r for r in referenced
            if (repo / r).exists() and r not in tracked)
        assert not untracked, (
            f"benchmark artifacts referenced from docs but not committed: "
            f"{untracked}")
