"""NoProp model, checkpoint expansion, biophysics encoder, GenBank parsing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt, noprop
from genomics_lm_tpu.models import biophysics
from genomics_lm_tpu.training.expansion import expand_checkpoint, expand_params
from genomics_lm_tpu.data import genbank


class TestNoProp:
    def test_forward_and_loss(self):
        cfg = CodonGPTConfig(vocab_size=68, block_size=16, n_layer=2, n_head=2,
                             n_embd=16, dropout=0.0)
        params = noprop.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 4, 68)
        y = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 4, 68)
        logits, preds = noprop.forward(params, cfg, x)
        assert logits.shape == (2, 16, 68) and len(preds) == 2
        total, parts = noprop.noprop_loss(params, cfg, x, y, jax.random.PRNGKey(3))
        assert jnp.isfinite(total)
        assert len(parts["block_mse"]) == 2

    def test_layer_local_gradient_isolation(self):
        """Block-1 params must receive no gradient from block-2's loss."""
        cfg = CodonGPTConfig(vocab_size=68, block_size=8, n_layer=2, n_head=2,
                             n_embd=16, dropout=0.0)
        params = noprop.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 4, 68)
        y = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 4, 68)

        def block2_loss(p):
            y_clean = jax.lax.stop_gradient(p["tok_emb"][y])
            _, preds = noprop.forward(p, cfg, x, y_clean, layer_local=True)
            nonpad = (y != 0).astype(jnp.float32)[:, :, None]
            return jnp.sum(((preds[1] - y_clean) ** 2) * nonpad)

        grads = jax.grad(block2_loss)(params)
        g_block1 = jax.tree.map(lambda g: g[0], grads["blocks"])
        g_block2 = jax.tree.map(lambda g: g[1], grads["blocks"])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(g_block1))
        assert any(float(jnp.abs(g).max()) > 0.0 for g in jax.tree.leaves(g_block2))


class TestExpansion:
    def test_width_and_depth_expansion(self):
        src_cfg = CodonGPTConfig(vocab_size=68, block_size=16, n_layer=2,
                                 n_head=2, n_embd=16, dropout=0.0)
        dst_cfg = CodonGPTConfig(vocab_size=68, block_size=16, n_layer=3,
                                 n_head=4, n_embd=32, dropout=0.0)
        src = codon_gpt.init(jax.random.PRNGKey(0), src_cfg)
        out, report = expand_params(src, src_cfg, dst_cfg, seed=1)
        assert report["expanded"]
        # overlapping region of tok_emb preserved
        np.testing.assert_allclose(
            np.asarray(out["tok_emb"])[:, :16], np.asarray(src["tok_emb"]), atol=1e-6
        )
        # expanded model runs
        out_jnp = jax.tree.map(jnp.asarray, out)
        idx = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 4, 68)
        logits, _ = codon_gpt.forward(out_jnp, dst_cfg, idx)
        assert logits.shape == (1, 16, 68)

    def test_expand_checkpoint_payload(self):
        src_cfg = CodonGPTConfig(vocab_size=68, block_size=16, n_layer=1,
                                 n_head=2, n_embd=16, dropout=0.0)
        src = codon_gpt.init(jax.random.PRNGKey(0), src_cfg)
        payload = {"model": jax.tree.map(np.asarray, src),
                   "cfg": {"vocab_size": 68, "block_size": 16, "n_layer": 1,
                           "n_head": 2, "n_embd": 16}}
        dst_cfg = src_cfg.replace(n_layer=2)
        out, report = expand_checkpoint(payload, dst_cfg)
        assert out["cfg"]["n_layer"] == 2
        assert out["epoch"] == 0 and out["step"] == 0


class TestBiophysics:
    def test_encoder_shapes(self):
        params = biophysics.init_encoder(jax.random.PRNGKey(0))
        one_hot = jnp.asarray(
            biophysics.one_hot_dna("ATGAAATTTCCC")[None, :, :]
        )  # (1, 12, 4) → 4 codons
        shapes = biophysics.encode(params, one_hot)
        assert shapes.shape == (1, 4, 3)

    def test_theoretical_shape(self):
        shapes = biophysics.get_theoretical_shape("AAAAAA")
        assert shapes["MGW"][2] == 3.5  # poly-A window
        assert len(shapes["Roll"]) == 6

    def test_training_reduces_loss(self):
        params, losses = biophysics.train_encoder(
            num_samples=64, seq_len_codons=8, epochs=3, batch_size=16
        )
        assert losses[-1] < losses[0]

    def test_lookup_table(self):
        table = biophysics.shape_lookup_table()
        assert table.shape == (68, 3, 4)
        from genomics_lm_tpu.tokenizers.codon import stoi

        np.testing.assert_array_equal(table[stoi["ATG"]][0], [1, 0, 0, 0])  # A
        np.testing.assert_array_equal(table[stoi["ATG"]][1], [0, 0, 0, 1])  # T
        assert table[0].sum() == 0  # specials have no nucleotides


GBFF = """LOCUS       TESTSEQ                 60 bp    DNA     linear   BCT 01-JAN-2020
DEFINITION  Test organism chromosome.
ACCESSION   TEST001
SOURCE      test
  ORGANISM  Testus exampleus
FEATURES             Location/Qualifiers
     source          1..60
                     /organism="Testus exampleus"
     CDS             4..12
                     /locus_tag="TL_0001"
                     /product="hypothetical protein
                     with a wrapped description"
                     /protein_id="TP00001.1"
     CDS             complement(20..28)
                     /locus_tag="TL_0002"
                     /gene="testB"
ORIGIN
        1 aaaatgaaat aacccccttt acatcccccc gggggtttta aaccggttaa ccggttaacc
//
"""


class TestGenBank:
    def test_parse_record(self, tmp_path):
        path = tmp_path / "test.gbff"
        path.write_text(GBFF)
        records = list(genbank.parse_genbank(path))
        assert len(records) == 1
        rec = records[0]
        assert rec.accession == "TEST001"
        assert rec.organism == "Testus exampleus"
        assert len(rec.sequence) == 60
        assert len(rec.cds_features) == 2
        assert "wrapped description" in rec.cds_features[0].qualifiers["product"]

    def test_cds_extraction_with_strand(self, tmp_path):
        path = tmp_path / "test.gbff"
        path.write_text(GBFF)
        rows = genbank.extract_cds_records(path)
        assert len(rows) == 2
        # forward CDS at 4..12 (1-based) = seq[3:12]
        assert rows[0]["sequence"] == "ATGAAATAA"
        assert rows[0]["locus_tag"] == "TL_0001"
        # reverse CDS: revcomp of seq[19:28]
        seq = records_seq = rows[1]["sequence"]
        assert rows[1]["strand"] == "-"
        assert len(seq) == 9

    def test_location_parsing(self):
        intervals, strand, partial = genbank._parse_location("join(1..5,8..10)")
        assert intervals == [(0, 5), (7, 10)]
        assert strand == "+"
        intervals, strand, _ = genbank._parse_location("complement(join(1..5,8..10))")
        assert strand == "-"
        _, _, partial = genbank._parse_location("<1..>99")
        assert partial

    def test_genomic_tape_and_operons(self, tmp_path):
        path = tmp_path / "test.gbff"
        path.write_text(GBFF)
        tape = genbank.extract_genomic_tape(path, window=30, stride=15)
        assert len(tape) >= 2
        assert all(len(t["sequence"]) <= 30 for t in tape)
        operons = genbank.extract_anchored_operons(path, upstream=5, downstream=5)
        assert len(operons) == 2

    def test_hybrid_records(self, tmp_path):
        path = tmp_path / "test.gbff"
        path.write_text(GBFF)
        rows = genbank.extract_hybrid_records(path)
        assert len(rows) == 1
        assert rows[0]["cds_intervals"][0] == (3, 12, "+")
        from genomics_lm_tpu.tokenizers.hybrid import HybridTokenizer

        t = HybridTokenizer()
        ids = t.encode(rows[0]["sequence"], rows[0]["cds_intervals"])
        assert len(ids) > 0
