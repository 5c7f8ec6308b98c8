"""Evals layer: metrics, probes, Markov baselines, extraction, mutations."""

import numpy as np
import pytest

import jax

from genomics_lm_tpu.evals import diversity, markov, metrics, probes
from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt


def make_model():
    cfg = CodonGPTConfig(vocab_size=68, block_size=24, n_layer=1, n_head=2,
                         n_embd=16, dropout=0.0)
    return codon_gpt.init(jax.random.PRNGKey(0), cfg), cfg


class TestMetrics:
    def test_compute_metrics_with_bootstrap(self):
        rng = np.random.default_rng(0)
        y = rng.integers(0, 3, 120)
        pred = y.copy()
        flip = rng.random(120) < 0.2
        pred[flip] = (pred[flip] + 1) % 3
        proba = np.full((120, 3), 0.1)
        proba[np.arange(120), pred] = 0.8
        m = metrics.compute_metrics(y, pred, proba, bootstrap=True, n_resamples=50)
        assert 0.7 < m["accuracy"] <= 1.0
        assert "macro_f1" in m and "auroc" in m
        assert m["accuracy_ci_lower"] <= m["accuracy"] <= m["accuracy_ci_upper"]

    def test_plots(self, tmp_path):
        y = np.array([0, 1, 1, 0, 1, 0, 1, 1])
        pred = np.array([0, 1, 0, 0, 1, 0, 1, 1])
        proba = np.clip(pred + np.random.default_rng(0).normal(0, 0.2, 8), 0.01, 0.99)
        metrics.plot_confusion(y, pred, tmp_path / "cm.png")
        metrics.plot_calibration(y, proba, tmp_path / "cal.png", n_bins=3)
        assert (tmp_path / "cm.png").exists() and (tmp_path / "cal.png").exists()


class TestProbes:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.X = np.concatenate([
            rng.normal(0, 1, (40, 8)), rng.normal(2, 1, (40, 8))
        ])
        self.y = np.concatenate([np.zeros(40, int), np.ones(40, int)])

    def test_logreg_svm(self):
        r1 = probes.fit_logreg(self.X, self.y)
        r2 = probes.fit_linear_svm(self.X, self.y)
        assert r1.metrics["accuracy"] > 0.9
        assert r2.metrics["accuracy"] > 0.9
        assert r1.y_proba is not None

    def test_mlp(self):
        r = probes.fit_mlp(self.X, self.y, epochs=40, hidden=32)
        assert r.metrics["accuracy"] > 0.85
        preds, proba = r.predict_fn(self.X[:5])
        assert preds.shape == (5,) and proba.shape == (5, 2)

    def test_kmer_baselines(self):
        rng = np.random.default_rng(0)
        seqs = ["ATG" * 5 + "".join(rng.choice(list("ACGT"), 6)) for _ in range(20)]
        seqs += ["GGC" * 5 + "".join(rng.choice(list("ACGT"), 6)) for _ in range(20)]
        y = np.array([0] * 20 + [1] * 20)
        r = probes.fit_kmer_logreg(seqs, y, k=3)
        assert r.metrics["accuracy"] > 0.9
        r2 = probes.fit_kmer_svm(seqs, y, k=3)
        assert r2.metrics["accuracy"] > 0.9


class TestMarkov:
    def test_fit_and_evaluate(self):
        rng = np.random.default_rng(0)
        # deterministic bigram structure: token t+1 = t (so bigram >> unigram)
        xs = np.tile(np.arange(4, 20), (50, 1))
        ys = np.roll(xs, -1, axis=1)
        ys[:, -1] = 0
        counts = markov.fit_baselines(xs, ys, 68)
        results, tokens, best = markov.evaluate_baselines(xs, ys, counts, 68)
        assert tokens > 0
        assert results["Bigram"]["perplexity"] < results["Unigram"]["perplexity"]
        assert results["Uniform"]["perplexity"] == pytest.approx(67.0)
        assert best in ("Bigram", "Trigram")

    def test_sep_reset(self):
        xs = np.asarray([[4, 3, 4, 5]])
        ys = np.asarray([[3, 4, 5, 6]])
        counts = markov.fit_baselines(xs, ys, 68, reset_token_ids=frozenset({3}))
        # trigram context after SEP (pos 2: previous=4 which follows SEP at
        # pos1) must reset previous2 to PAD
        tri = counts[2]
        assert (0, 4) in tri

    def test_sparse_path_matches_dense(self):
        """Above _DENSE_VOCAB_LIMIT the V^3 bincount cube gives way to
        sparse np.unique accumulation — same counts, same perplexities."""
        rng = np.random.default_rng(1)
        xs = rng.integers(4, 60, (20, 32))
        ys = np.roll(xs, -1, axis=1)
        ys[:, -1] = 0
        dense = markov.fit_baselines(xs, ys, 68)
        sparse_v = markov._DENSE_VOCAB_LIMIT + 44  # 300 > limit, same ids fit
        sparse = markov.fit_baselines(xs, ys, sparse_v)
        np.testing.assert_array_equal(dense[0], sparse[0][:68])
        assert set(dense[1]) == set(sparse[1])
        for p, row in dense[1].items():
            np.testing.assert_array_equal(row, sparse[1][p][:68])
            assert int(sparse[1][p][68:].sum()) == 0
        assert set(dense[2]) == set(sparse[2])
        for ctx, row in dense[2].items():
            np.testing.assert_array_equal(row, sparse[2][ctx][:68])
        # end-to-end fit+evaluate at V>LIMIT: sparse path must reproduce the
        # dense path exactly (dense forced by raising the limit)
        sparse_counts = markov.fit_baselines(xs, ys, sparse_v)
        r_sparse, t1, best1 = markov.evaluate_baselines(
            xs, ys, sparse_counts, sparse_v)
        old = markov._DENSE_VOCAB_LIMIT
        try:
            markov._DENSE_VOCAB_LIMIT = sparse_v + 1
            dense_counts = markov.fit_baselines(xs, ys, sparse_v)
            r_dense, t2, best2 = markov.evaluate_baselines(
                xs, ys, dense_counts, sparse_v)
        finally:
            markov._DENSE_VOCAB_LIMIT = old
        assert t1 == t2 and best1 == best2
        for name in markov.MODEL_NAMES:
            assert r_sparse[name]["cross_entropy_nats"] == pytest.approx(
                r_dense[name]["cross_entropy_nats"], rel=1e-12)


class TestSignificance:
    """Per-row NLL decomposition + paired-bootstrap margin CIs
    (evals/significance.py, VERDICT r4 weak #1)."""

    def _pack(self, rng, n_rows=40, width=32):
        xs = rng.integers(4, 20, (n_rows, width)).astype(np.int32)
        # bigram-predictable structure on most rows: next = same token
        xs[::2] = np.tile(np.arange(4, 4 + width) % 16 + 4, (len(xs[::2]), 1))
        ys = np.roll(xs, -1, axis=1)
        ys[:, -1] = 0
        return xs, ys

    def test_per_row_baseline_matches_corpus_totals(self):
        rng = np.random.default_rng(0)
        xs, ys = self._pack(rng)
        counts = markov.fit_baselines(xs, ys, 68)
        results, tokens, _ = markov.evaluate_baselines(xs, ys, counts, 68)
        rows, tok_rows = markov.per_row_baseline_nll(xs, ys, counts, 68)
        assert int(tok_rows.sum()) == tokens
        for name in markov.MODEL_NAMES:
            assert rows[name].sum() / tokens == pytest.approx(
                results[name]["cross_entropy_nats"], rel=1e-12)

    def test_per_row_model_matches_corpus_totals(self, tmp_path):
        from genomics_lm_tpu.evals.perplexity import (
            evaluate_perplexity,
            per_row_model_nll,
        )

        params, cfg = make_model()
        rng = np.random.default_rng(1)
        X = rng.integers(4, 68, (10, 24)).astype(np.int32)
        Y = np.roll(X, -1, axis=1)
        Y[:, -1] = 0
        Y[3] = 0  # a row with no evaluable targets pairs as zero
        np.savez(tmp_path / "val.npz", X=X, Y=Y)
        out = evaluate_perplexity(params, cfg, tmp_path / "val.npz", batch_size=4)
        sums, toks = per_row_model_nll(
            params, cfg, tmp_path / "val.npz", batch_size=4)
        assert toks[3] == 0 and sums[3] == 0.0
        assert int(toks.sum()) == out["tokens"]
        assert sums.sum() / toks.sum() == pytest.approx(out["nll"], rel=1e-6)

    def test_paired_bootstrap_behaviour(self):
        from genomics_lm_tpu.evals.significance import paired_bootstrap_margins

        rng = np.random.default_rng(2)
        n = 200
        toks = np.full(n, 100.0)
        base = rng.normal(300.0, 5.0, n)  # baseline: 3.0 nats/token
        # model A: clearly better (2.5 nats/token) — CI must exclude zero
        model_a = base - 50.0 + rng.normal(0.0, 2.0, n)
        m = paired_bootstrap_margins(model_a, toks, {"Bigram": base},
                                     n_boot=500, seed=0)
        assert m["Bigram"]["margin_nats"] == pytest.approx(0.5, abs=0.05)
        assert m["Bigram"]["excludes_zero"] and m["Bigram"]["ci_low"] > 0
        # model B: pure noise around the baseline — CI must include zero
        model_b = base + rng.normal(0.0, 2.0, n)
        m = paired_bootstrap_margins(model_b, toks, {"Bigram": base},
                                     n_boot=500, seed=0)
        assert not m["Bigram"]["excludes_zero"]
        # zero-token rows are dropped, not diluted
        toks2 = toks.copy()
        toks2[:10] = 0.0
        m2 = paired_bootstrap_margins(model_a, toks2, {"Bigram": base},
                                      n_boot=100, seed=0)
        assert m2["Bigram"]["n_rows"] == n - 10
        # determinism: same seed, same interval
        m3 = paired_bootstrap_margins(model_a, toks2, {"Bigram": base},
                                      n_boot=100, seed=0)
        assert m2["Bigram"] == m3["Bigram"]


class TestPerplexityEval:
    def test_evaluate_perplexity(self, tmp_path):
        from genomics_lm_tpu.evals.perplexity import context_ablation, evaluate_perplexity

        params, cfg = make_model()
        rng = np.random.default_rng(0)
        X = rng.integers(4, 68, (8, 24)).astype(np.int32)
        Y = np.roll(X, -1, axis=1)
        Y[:, -1] = 0
        np.savez(tmp_path / "val.npz", X=X, Y=Y)
        out = evaluate_perplexity(params, cfg, tmp_path / "val.npz", batch_size=4)
        assert out["tokens"] == int((Y != 0).sum())
        assert out["perplexity"] > 1
        ab = context_ablation(params, cfg, tmp_path / "val.npz", windows=(1, None), batch_size=4)
        assert set(ab) == {"1", "full"}
        # narrower context can't be better than full on average... (not
        # guaranteed for random params; just check both computed)
        assert ab["1"]["tokens"] == ab["full"]["tokens"]


class TestEmbeddings:
    def test_extract_modes(self):
        from genomics_lm_tpu.evals.embeddings import extract_embeddings, ids_from_dna

        params, cfg = make_model()
        rows = np.stack([
            ids_from_dna("ATGAAATAA", cfg.block_size),
            ids_from_dna("ATGCCCGGGTAA", cfg.block_size),
        ])
        for mode in ("mean_nonpad", "mean_content", "eos"):
            emb = extract_embeddings(params, cfg, rows, mode=mode, batch_size=2)
            assert emb.shape == (2, 16)
            assert np.isfinite(emb).all()
        with pytest.raises(ValueError):
            extract_embeddings(params, cfg, rows, mode="bogus")

    def test_padding_invariance(self):
        """mean_nonpad pooling must ignore PAD rows entirely."""
        from genomics_lm_tpu.evals.embeddings import extract_embeddings, ids_from_dna

        params, cfg = make_model()
        row = ids_from_dna("ATGAAATAA", cfg.block_size)
        emb1 = extract_embeddings(params, cfg, row[None, :], mode="mean_nonpad")
        emb2 = extract_embeddings(params, cfg, np.stack([row, row]), mode="mean_nonpad")
        np.testing.assert_allclose(emb1[0], emb2[1], atol=1e-5)


class TestMutations:
    def test_score_mutations(self):
        from genomics_lm_tpu.evals.mutations import score_mutations, write_mutation_tsv

        params, cfg = make_model()
        rows = score_mutations(params, cfg, "ATGAAACCCGGGTAA")
        assert len(rows) == 5  # 5 codons
        assert rows[0]["wt_codon"] == "ATG"
        # delta of the wild type vs itself is zero
        for r in rows:
            assert abs(r[f"delta_{r['wt_codon']}"]) < 1e-6

    def test_long_sequence_windows(self, tmp_path):
        from genomics_lm_tpu.evals.mutations import score_mutations, write_mutation_tsv

        params, cfg = make_model()  # block 24
        dna = "ATG" + "AAA" * 40 + "TAA"  # 42 codons > block
        rows = score_mutations(params, cfg, dna)
        assert len(rows) == 42
        write_mutation_tsv(rows, tmp_path / "m.tsv")
        assert (tmp_path / "m.tsv").read_text().count("\n") == 43


class TestDiversityAndMotifs:
    def test_diversity(self):
        assert diversity.pairwise_identity(["AAAA", "AAAA"]) == 1.0
        assert diversity.pairwise_identity(["AAAA", "CCCC"]) == 0.0
        assert 0 < diversity.kmer_diversity(["ACDEFG"], k=2) < 1
        gc = diversity.gc_content([["GGC", "GCC"], ["AAT"]])
        assert gc[0] == 1.0 and gc[1] == pytest.approx(0.0)

    def test_motif_pipeline(self):
        from genomics_lm_tpu.evals.motifs import (
            MotifClusterer,
            cluster_consensus,
            extract_window_embeddings,
            match_known_motifs,
        )
        from genomics_lm_tpu.tokenizers.codon import itos

        params, cfg = make_model()
        rng = np.random.default_rng(0)
        ids = rng.integers(4, 68, (3, 24)).astype(np.int32)
        emb, meta = extract_window_embeddings(params, cfg, ids, window_size=5, stride=2)
        assert emb.shape[0] == len(meta) > 0
        clusterer = MotifClusterer(n_clusters=3)
        labels = clusterer.fit_predict(emb)
        assert len(labels) == len(meta)
        consensus = cluster_consensus(ids, meta, labels, itos)
        assert len(consensus) <= 3
        assert match_known_motifs("xxATGxx") == ["START_Codon"]
        # exclusion removes windows containing the token
        emb2, meta2 = extract_window_embeddings(
            params, cfg, ids, window_size=5, stride=2, exclude_ids=[int(ids[0, 0])]
        )
        assert len(meta2) <= len(meta)

    def test_pwm_math_on_toy_alignment(self):
        from genomics_lm_tpu.evals.motifs import (
            position_weight_matrix,
            pwm_consensus,
            pwm_entropy,
            pwm_information_content,
        )

        vocab = ["A", "C", "G", "T"]
        # column 0 fully conserved A; column 1 split A/C; column 2 uniform
        sequences = [
            ["A", "A", "A"],
            ["A", "A", "C"],
            ["A", "C", "G"],
            ["A", "C", "T"],
        ]
        pwm = position_weight_matrix(sequences, vocab)
        assert pwm.shape == (4, 3)
        np.testing.assert_allclose(pwm[:, 0], [1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(pwm[:, 1], [0.5, 0.5, 0.0, 0.0])
        np.testing.assert_allclose(pwm[:, 2], [0.25] * 4)
        assert pwm_consensus(pwm, vocab) == "AAA"

        entropy = pwm_entropy(pwm)
        # conserved ≈ 0 bits, 50/50 = 1 bit, uniform over 4 = 2 bits
        assert entropy[0] == pytest.approx(0.0, abs=1e-6)
        assert entropy[1] == pytest.approx(1.0, abs=1e-6)
        assert entropy[2] == pytest.approx(2.0, abs=1e-6)

        info = pwm_information_content(pwm, len(vocab))
        assert info[0] == pytest.approx(2.0, abs=1e-6)
        assert info[2] == pytest.approx(0.0, abs=1e-6)

        # unknown tokens contribute no counts; empty input well-defined
        sparse = position_weight_matrix([["A", "N"]], vocab)
        assert sparse[:, 1].sum() == 0.0
        empty = position_weight_matrix([], vocab)
        assert empty.shape == (4, 0)
        assert pwm_consensus(empty, vocab) == ""
        assert pwm_entropy(empty).size == 0

    def test_cluster_pwm_report(self):
        from genomics_lm_tpu.evals.motifs import cluster_pwm_report

        itos = {0: "<PAD>", 4: "AAA", 5: "AAC", 6: "AAG"}
        ids = np.array([[4, 5, 6, 4, 5, 6]])
        # two windows of width 3 in cluster 0 with identical content,
        # one divergent window in cluster 1
        metadata = [(0, 0, 3), (0, 3, 6), (0, 1, 4)]
        labels = np.array([0, 0, 1])
        report = cluster_pwm_report(ids, metadata, labels, itos)
        assert set(report) == {0, 1}
        assert report[0]["pwm_consensus"] == "AAA AAC AAG"
        # identical members → fully conserved → ~0 entropy everywhere
        assert report[0]["mean_entropy_bits"] == pytest.approx(0.0, abs=1e-6)
        assert report[0]["information_content_bits"] > 0
        assert len(report[0]["per_position_entropy_bits"]) == 3


class TestAggregation:
    def test_aggregator_and_summary(self, tmp_path):
        import json

        from genomics_lm_tpu.evals.aggregator import load_all_runs, summary_rows
        from genomics_lm_tpu.evals.summaries import generate_summary

        run = tmp_path / "runs" / "r1"
        (run / "scores").mkdir(parents=True)
        (run / "checkpoints").mkdir()
        (run / "scores" / "metrics.json").write_text(json.dumps({"best_val_loss": 1.5}))
        (run / "checkpoints" / "meta.json").write_text(
            json.dumps({"status": "completed", "best_val_loss": 1.5, "best_epoch": 2})
        )
        (run / "scores" / "curves.csv").write_text("epoch,train_loss,val_loss\n1,2.0,1.5\n")
        runs = load_all_runs(tmp_path / "runs")
        assert len(runs) == 1
        assert runs[0]["meta"]["status"] == "completed"
        rows = summary_rows(runs)
        assert rows[0]["best_epoch"] == 2
        md = generate_summary(tmp_path / "runs")
        assert md.exists()
        assert (tmp_path / "runs" / "_summary" / "summary.csv").exists()


class TestTerminationMotifs:
    def test_synthetic_hairpin_scores_high(self):
        from genomics_lm_tpu.evals.termination_motifs import (
            hairpin_score,
            max_poly_t_run,
            synthetic_hairpin,
        )

        motif = synthetic_hairpin()
        assert hairpin_score(motif) >= 15.0
        assert max_poly_t_run(motif) >= 6
        # an A-only sequence has no stem at all
        assert hairpin_score("A" * 24) == 0.0

    def test_terminal_window_contrast_detects_planted_terminator(self):
        import numpy as np

        from genomics_lm_tpu.evals.termination_motifs import (
            synthetic_hairpin,
            terminal_window_contrast,
        )

        rng = np.random.default_rng(0)
        seqs = []
        for _ in range(8):
            body = "".join(rng.choice(list("ACGT"), 90))
            seqs.append(body + synthetic_hairpin())
        report = terminal_window_contrast(seqs, window=25, seed=0)
        assert report["sequences_scored"] == 8
        assert report["hairpin_contrast"] > 0
        assert report["poly_t_contrast"] > 0
