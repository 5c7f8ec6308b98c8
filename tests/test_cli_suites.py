"""CLI regression tests for the analysis/termination/data-prep script suites
(subprocess-driven on a tiny trained run, reference §4 pattern)."""

import csv
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    from genomics_lm_tpu.tokenizers.codon import write_itos
    from genomics_lm_tpu.training.loop import run_training

    work = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    for name, n in (("train", 48), ("val", 16)):
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
        epochs=2, seed=0, run_id="cli-run", save_epochs=False,
        termination_aux=True,
    )
    run_training(cfg, run_root=str(work / "runs"))
    return work


def run_cli(script, *args, timeout=400):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        capture_output=True, text=True, timeout=timeout,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)},
    )


class TestAnalysisSteps:
    def test_analyze_frequencies(self, tiny_run):
        r = run_cli("analyze_frequencies.py", "cli-run",
                    "--npz", str(tiny_run / "val.npz"),
                    "--run_root", str(tiny_run / "runs"))
        assert r.returncode == 0, r.stderr
        assert (tiny_run / "runs" / "cli-run" / "tables" /
                "frequencies.json").exists()

    def test_saliency_then_top_report(self, tiny_run):
        r = run_cli("analyze_saliency.py", "cli-run", "--dna", "ATGAAACCC",
                    "--run_root", str(tiny_run / "runs"))
        assert r.returncode == 0, r.stderr
        r = run_cli("report_top_saliency.py", "cli-run", "--window", "3",
                    "--run_root", str(tiny_run / "runs"))
        assert r.returncode == 0, r.stderr
        out = (tiny_run / "runs" / "cli-run" / "tables" /
               "top_saliency_segments.csv")
        assert out.exists() and out.read_text().count("\n") > 1

    def test_probe_next_token_prefixes(self, tiny_run):
        r = run_cli("probe_next_token.py", "cli-run",
                    "--run_root", str(tiny_run / "runs"))
        assert r.returncode == 0, r.stderr
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["prefixes"]

    def test_generate_probe_labels(self, tiny_run):
        r = run_cli("generate_probe_labels.py", "cli-run",
                    "--run_root", str(tiny_run / "runs"))
        assert r.returncode == 0, r.stderr
        labels = (tiny_run / "runs" / "cli-run" / "probe_labels.csv")
        rows = list(csv.DictReader(labels.open()))
        assert len(rows) == 68
        assert sum(r["is_stop"] == "1" for r in rows) == 3


class TestTerminationSuite:
    def test_evaluate_termination_head(self, tiny_run):
        r = run_cli("evaluate_termination_head.py", "cli-run",
                    "--npz", str(tiny_run / "val.npz"),
                    "--run_root", str(tiny_run / "runs"), "--max_batches", "2")
        assert r.returncode == 0, r.stderr
        assert "accuracy" in r.stdout

    def test_check_termination_motifs(self, tiny_run, tmp_path):
        rng = np.random.default_rng(0)
        dna = tmp_path / "cds.txt"
        dna.write_text("\n".join(
            "".join(rng.choice(list("ACGT"), 90)) for _ in range(6)) + "\n")
        r = run_cli("check_termination_motifs.py", "--dna", str(dna),
                    "--window", "20", "--out", str(tmp_path / "tm.json"))
        assert r.returncode == 0, r.stderr
        report = json.loads((tmp_path / "tm.json").read_text())
        assert report["real"]["sequences_scored"] == 6


class TestDataPrepSuite:
    def test_build_reference_tables_and_seq_quality(self, tmp_path):
        cds = tmp_path / "cds.txt"
        cds.write_text("ATGGCAGCATAA\nATGAAACCCGGGTTTTAA\n")
        r = run_cli("build_reference_tables.py", "--name", "t",
                    "--cds", str(cds), "--out_root", str(tmp_path / "ref"))
        assert r.returncode == 0, r.stderr
        usage = tmp_path / "ref" / "t" / "codon_usage.tsv"
        assert usage.exists()
        r = run_cli("seq_quality.py", "--dna", str(cds),
                    "--reference_usage", str(usage),
                    "--out", str(tmp_path / "q.json"))
        assert r.returncode == 0, r.stderr
        q = json.loads((tmp_path / "q.json").read_text())
        assert q["orf_intact_rate"] == 1.0

    def test_convert_npz_to_npy(self, tiny_run, tmp_path):
        r = run_cli("convert_npz_to_npy.py", str(tiny_run / "val.npz"))
        assert r.returncode == 0, r.stderr
        assert (tiny_run / "val_X.npy").exists()

    def test_generate_synonymous_controls_skips_non_dna(self, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text("id,dna\ng0,ATGGCAGCATAA\nbad,NOTDNA!\n")
        out = tmp_path / "controls.tsv"
        r = run_cli("generate_synonymous_controls.py", "--input", str(src),
                    "--out", str(out))
        assert r.returncode == 0, r.stderr
        rows = list(csv.DictReader(out.open(), delimiter="\t"))
        assert len(rows) == 1
        assert rows[0]["original"] == "ATGGCAGCATAA"


class TestProteinSuite:
    @pytest.fixture(scope="class")
    def critic_ckpt(self, tmp_path_factory):
        import jax
        import numpy as np_

        from genomics_lm_tpu.models.protein import (
            ProteinClassifierConfig,
            init_multitask,
        )
        from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
        from genomics_lm_tpu.training.checkpoints import save_checkpoint

        t = ProteinTokenizer()
        cfg = ProteinClassifierConfig(
            vocab_size=len(t), n_layer=1, n_head=2, n_embd=16,
            block_size=64, dropout=0.0, pooling="attention",
        )
        params = init_multitask(jax.random.key(0), cfg,
                                {"stability": 2, "function": 3})
        path = tmp_path_factory.mktemp("critic") / "critic.npz"
        save_checkpoint({
            "model": jax.tree.map(np_.asarray, params),
            "cfg": {"n_layer": 1, "n_head": 2, "n_embd": 16,
                    "block_size": 64, "pooling": "attention"},
        }, path)
        return path

    def test_extract_protein_embeddings(self, critic_ckpt, tmp_path):
        fasta = tmp_path / "p.fasta"
        fasta.write_text(">a\nMKVLAAGR\n>b\nMAATKGLVNN\n")
        out = tmp_path / "emb.npz"
        r = run_cli("extract_protein_embeddings.py",
                    "--critic_ckpt", str(critic_ckpt),
                    "--input", str(fasta), "--out", str(out))
        assert r.returncode == 0, r.stderr
        with np.load(out, allow_pickle=True) as z:
            assert z["X"].shape == (2, 16)

    def test_protein_critic_bridge(self, critic_ckpt, tmp_path):
        dna = tmp_path / "gen.csv"
        dna.write_text("id,dna\ng0,ATGGCAGCAAAA\ng1,ATGTAAGCA\n")
        out = tmp_path / "bridge.csv"
        r = run_cli("protein_critic_bridge.py", "--dna_csv", str(dna),
                    "--critic_ckpt", str(critic_ckpt), "--out", str(out))
        assert r.returncode == 0, r.stderr
        rows = list(csv.DictReader(out.open()))
        assert rows[0]["translation_ok"] == "True"
        assert rows[1]["translation_ok"] == "False"  # internal stop

    def test_verify_saliency_contrast(self, critic_ckpt):
        r = run_cli("verify_saliency_contrast.py", "--ckpt", str(critic_ckpt))
        assert r.returncode == 0, r.stderr
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert "contrast_ratio" in payload
