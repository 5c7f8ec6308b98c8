"""CLI scripts + dashboard data layer, driven headlessly on a tiny run."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """Train a tiny model once; reuse across script tests."""
    from genomics_lm_tpu.tokenizers.codon import write_itos
    from genomics_lm_tpu.training.loop import run_training

    work = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    for name, n in (("train", 32), ("val", 8)):
        X = rng.integers(4, 68, (n, 24)).astype(np.int32)
        X[:, 0] = 1
        Y = np.roll(X, -1, axis=1)
        Y[:, -1] = 2
        np.savez(work / f"{name}.npz", X=X, Y=Y)
    write_itos(work / "itos.txt")
    cfg = dict(
        train_npz=str(work / "train.npz"), val_npz=str(work / "val.npz"),
        block_size=24, n_layer=1, n_head=2, n_embd=16, dropout=0.0,
        batch_size=8, grad_accum_steps=1, lr=1e-3, warmup_steps=1,
        epochs=1, seed=0, run_id="cli-run",
    )
    run_training(cfg, run_root=str(work / "runs"))
    return work


def run_cli(script, *args):
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        capture_output=True, text=True, timeout=500,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)},
    )
    return proc


class TestCLIs:
    def test_query_model_next(self, tiny_run):
        proc = run_cli(
            "query_model.py", "cli-run", "--mode", "next", "--dna", "ATGAAA",
            "--run_root", str(tiny_run / "runs"),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        payload = json.loads(proc.stdout[proc.stdout.index("{"):])
        assert len(payload["next"]) == 10
        assert abs(sum(r["prob"] for r in payload["next"])) <= 1.001

    def test_query_model_generate_and_score(self, tiny_run):
        for mode in ("generate", "score"):
            proc = run_cli(
                "query_model.py", "cli-run", "--mode", mode, "--dna", "ATG",
                "--target_codons", "4", "--hard_cap", "8",
                "--run_root", str(tiny_run / "runs"),
            )
            assert proc.returncode == 0, (mode, proc.stderr[-2000:])

    def test_evaluate_test(self, tiny_run):
        proc = run_cli(
            "evaluate_test.py", "cli-run",
            "--test_npz", str(tiny_run / "val.npz"),
            "--train_npz", str(tiny_run / "train.npz"),
            "--run_root", str(tiny_run / "runs"),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(
            (tiny_run / "runs" / "cli-run" / "scores" / "test_evaluation.json").read_text()
        )
        assert "baselines" in report and "Trigram" in report["baselines"]
        assert report["model"]["tokens"] > 0

    def test_extract_embeddings_cli(self, tiny_run, tmp_path):
        seqs = tmp_path / "seqs.txt"
        seqs.write_text("ATGAAATAA\nATGCCCGGGTAA\n")
        out = tmp_path / "emb.npz"
        proc = run_cli(
            "extract_embeddings.py", "cli-run", "--input", str(seqs),
            "--out", str(out), "--run_root", str(tiny_run / "runs"),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        with np.load(out) as blob:
            assert blob["X"].shape == (2, 16)
        assert out.with_suffix(".provenance.json").exists()

    def test_make_run_id(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("n_layer: 2\nn_head: 4\nn_embd: 64\nepochs: 3\n")
        proc = run_cli("make_run_id.py", str(cfg))
        assert proc.returncode == 0
        assert "2L4H_d64_e3" in proc.stdout

    def test_expand_model_cli(self, tiny_run, tmp_path):
        src = tiny_run / "runs" / "cli-run" / "checkpoints" / "best.npz"
        out = tmp_path / "expanded.npz"
        proc = run_cli(
            "expand_model.py", "--checkpoint", str(src),
            "--out_checkpoint", str(out),
            "--n_layer", "2", "--n_head", "2", "--n_embd", "32",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        from genomics_lm_tpu.training.checkpoints import load_checkpoint

        payload = load_checkpoint(out)
        assert payload["cfg"]["n_layer"] == 2

    def test_score_mutations_cli(self, tiny_run):
        proc = run_cli(
            "score_mutations.py", "cli-run", "--dna", "ATGAAACCCTAA",
            "--run_root", str(tiny_run / "runs"),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        tsv = tiny_run / "runs" / "cli-run" / "scores" / "mutation_scores.tsv"
        assert tsv.exists() and tsv.read_text().count("\n") == 5  # header + 4

    def test_cleanup_runs_dry(self, tiny_run):
        proc = run_cli("cleanup_runs.py", "--root", str(tiny_run / "runs"))
        assert proc.returncode == 0
        assert "nothing to remove" in proc.stdout

    def test_training_preflight(self, tmp_path):
        proc = run_cli("training_preflight.py", "--work_dir", str(tmp_path / "pf"))
        assert proc.returncode == 0, proc.stderr[-2000:]
        marker = [l for l in proc.stdout.splitlines() if l.startswith("PREFLIGHT_RESULT:")]
        report = json.loads(marker[0].split(":", 1)[1])
        assert report["passed"] is True


class TestDashboardData:
    def test_run_browser_and_details(self, tiny_run):
        from genomics_lm_tpu.dashboard import run_browser_data, run_details_data

        browser = run_browser_data(tiny_run / "runs")
        assert browser["table"][0]["run_id"] == "cli-run"
        details = run_details_data(tiny_run / "runs" / "cli-run")
        assert "train_loss" in details["series"]

    def test_playground_pages(self, tiny_run):
        from genomics_lm_tpu.dashboard import (
            playground_generate,
            playground_next_codon,
        )

        run_dir = tiny_run / "runs" / "cli-run"
        payload = playground_next_codon(run_dir, "ATGAAA", top_k=5)
        assert len(payload["next"]) == 5
        gen = playground_generate(run_dir, "ATG", target_codons=4, hard_cap=8)
        assert "info" in gen and gen["ids"]

    def test_attention_and_saliency_pages(self, tiny_run):
        from genomics_lm_tpu.dashboard import attention_data, saliency_data

        run_dir = tiny_run / "runs" / "cli-run"
        attn = attention_data(run_dir, "ATGAAACCC")
        assert attn["attention"].shape[0] == 2  # heads
        np.testing.assert_allclose(attn["attention"][0].sum(-1), 1.0, atol=1e-4)
        sal = saliency_data(run_dir, "ATGAAACCC")
        assert len(sal["saliency"]) == len(sal["tokens"])
        assert np.isfinite(sal["saliency"]).all()

    def test_embeddings_page(self, tiny_run):
        from genomics_lm_tpu.dashboard import embeddings_data

        payload = embeddings_data(
            tiny_run / "runs" / "cli-run", ["ATGAAATAA", "ATGCCCTAA", "ATGGGGTAA"]
        )
        assert payload["embeddings"].shape == (3, 16)
        assert payload["pca"].shape == (3, 2)


class TestAnalysisPipeline:
    def test_full_analysis(self, tiny_run):
        from genomics_lm_tpu.evals.analysis import run_full_analysis

        run_dir = tiny_run / "runs" / "cli-run"
        steps = run_full_analysis(run_dir, tiny_run / "val.npz", probe_dna="ATGAAACCC")
        assert set(steps) == {
            "frequencies", "embeddings", "attention", "next_token_probe", "saliency",
        }
        assert (run_dir / "charts" / "embedding_pca.png").exists()
        assert (run_dir / "tables" / "run_summary.md").exists()
        assert 0.0 <= steps["next_token_probe"]["top1_accuracy"] <= 1.0


class TestRemoteBio:
    def test_mock_and_cache(self, tmp_path):
        from genomics_lm_tpu.evals import remote_bio

        db = str(tmp_path / "cache.db")
        r1 = remote_bio.blast_query("MKVLAAG", db_path=db)
        assert r1["engine"] == "mock"
        assert not r1.get("from_cache")
        r2 = remote_bio.blast_query("MKVLAAG", db_path=db)
        assert r2.get("from_cache") is True
        # deterministic mock branches
        no_met = remote_bio.mock_blast_query("KVLAAG")
        assert no_met["hits"][0]["species"] == "Bacillus subtilis"


class TestShapeTabs:
    def test_shape_profile_data(self):
        from genomics_lm_tpu.dashboard import shape_profile_data

        payload = shape_profile_data("ATGAAAACCC")
        assert len(payload["MGW"]) == len(payload["bases"]) == 10
        assert set(payload) >= {"MGW", "Roll", "EP", "positions", "bases"}

    def test_shape_comparison_synonymous_shift(self):
        from genomics_lm_tpu.dashboard import shape_comparison_data

        comp = shape_comparison_data("ATGAAAACCC", "ATGAAGACCC")
        assert comp["aligned_length"] == 10
        assert comp["mean_abs_delta_MGW"] >= 0.0
        # identical sequences → zero deltas
        same = shape_comparison_data("ATGAAA", "ATGAAA")
        assert same["mean_abs_delta_MGW"] == 0.0
        assert same["mean_abs_delta_Roll"] == 0.0


class _FakeTab:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakeStreamlit:
    """Headless streamlit stand-in: records every render call.

    Buttons return True and text inputs return their defaults (overridable
    per label), so ``web_dashboard.main()`` executes every tab's render
    branch against the real data layer — the render path can't silently
    rot while only the data layer stays tested (VERDICT r4 directive 8).
    """

    def __init__(self, text_overrides=None):
        self.calls = []
        self.text_overrides = dict(text_overrides or {})
        self.sidebar = _FakeSidebar(self)

    def _record(self, name, *args, **kwargs):
        self.calls.append((name, args, kwargs))

    def names(self):
        return [c[0] for c in self.calls]

    # inputs -----------------------------------------------------------
    def text_input(self, label, value=""):
        self._record("text_input", label)
        return self.text_overrides.get(label, value)

    def text_area(self, label, value=""):
        self._record("text_area", label)
        return self.text_overrides.get(label, value)

    def number_input(self, label, value=0):
        self._record("number_input", label)
        return value

    def button(self, label):
        self._record("button", label)
        return True

    def selectbox(self, label, options):
        self._record("selectbox", label, tuple(options))
        return options[0]

    def tabs(self, labels):
        self._record("tabs", tuple(labels))
        return [_FakeTab() for _ in labels]

    # outputs: record-only ---------------------------------------------
    def __getattr__(self, name):
        def sink(*args, **kwargs):
            self._record(name, *args, **kwargs)

        return sink


class _FakeSidebar:
    def __init__(self, parent):
        self._parent = parent

    def selectbox(self, label, options):
        self._parent._record("sidebar.selectbox", label, tuple(options))
        return options[0]


class TestStreamlitRenderPath:
    """Drive scripts/web_dashboard.py's real main() headlessly, one
    assertion per tab, against the tiny fixture run."""

    def _render(self, tiny_run, monkeypatch, overrides=None):
        import importlib
        import sys as _sys

        fake = _FakeStreamlit(overrides)
        monkeypatch.setitem(_sys.modules, "streamlit", fake)
        monkeypatch.chdir(tiny_run)  # renderer resolves runs/ relative to cwd
        mod = importlib.import_module("scripts.web_dashboard")
        mod.main()
        return fake

    def test_all_tabs_render(self, tiny_run, monkeypatch):
        fake = self._render(tiny_run, monkeypatch, overrides={
            "DNA prompt": "ATGAAACCCGGG",
            "synonymous variant (optional)": "ATGAAACCAGGG",
        })
        names = fake.names()
        # page scaffold + run browser
        assert "set_page_config" in names and "title" in names
        tabs_call = next(c for c in fake.calls if c[0] == "tabs")
        assert tabs_call[1][0] == ("overview", "curves", "playground",
                                   "attention", "saliency", "embeddings")
        # overview: browser table + meta json
        assert names.count("dataframe") >= 1
        assert "json" in names
        # curves: the 1-epoch fixture has a curve → line_chart (not info)
        assert "line_chart" in names
        # playground: next-codon + generate JSON payloads with real keys
        json_payloads = [c[1][0] for c in fake.calls if c[0] == "json"
                        and isinstance(c[1][0], dict)]
        assert any("next" in p for p in json_payloads)  # next-codon payload
        assert any("dna" in p and "info" in p for p in json_payloads)  # ReD
        # shape tabs: profile line_chart + comparison deltas rendered
        assert any("mean_abs_delta_MGW" in p for p in json_payloads
                   if isinstance(p, dict))
        # attention: one dataframe per head (n_head=2) + tokens line
        writes = [c for c in fake.calls if c[0] == "write"]
        assert any(args and args[0] == "tokens:" for _, args, _ in writes)
        # saliency + embeddings
        assert "bar_chart" in names
        assert "scatter_chart" in names

    def test_empty_run_root_warns(self, tmp_path, monkeypatch):
        import importlib
        import sys as _sys

        fake = _FakeStreamlit()
        monkeypatch.setitem(_sys.modules, "streamlit", fake)
        monkeypatch.chdir(tmp_path)
        mod = importlib.import_module("scripts.web_dashboard")
        mod.main()
        assert "warning" in fake.names()
