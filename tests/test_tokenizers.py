"""Tokenizer vocabulary and encoding contracts (reference parity)."""

import numpy as np
import pytest

from genomics_lm_tpu.tokenizers import codon
from genomics_lm_tpu.tokenizers.hybrid import HybridTokenizer
from genomics_lm_tpu.tokenizers.kmer import build_vocab, build_stoi, to_ids as kmer_to_ids
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer


class TestCodonVocab:
    def test_vocab_layout(self):
        assert len(codon.VOCAB) == 68
        assert codon.VOCAB[:4] == ["<PAD>", "<BOS_CDS>", "<EOS_CDS>", "<SEP>"]
        assert codon.VOCAB[4] == "AAA"
        assert codon.VOCAB[67] == "TTT"
        # lexical A<C<G<T ordering
        assert codon.stoi["AAA"] == 4
        assert codon.stoi["AAC"] == 5
        assert codon.stoi["ACA"] == 8
        assert codon.stoi["CAA"] == 20
        assert codon.stoi["TTT"] == 67

    def test_aliases(self):
        assert codon.stoi["<bos>"] == 1
        assert codon.stoi["<eog>"] == 2
        assert codon.stoi["<eos>"] == 2
        # itos is canonical only
        assert codon.itos[1] == "<BOS_CDS>"

    def test_stop_ids(self):
        assert set(codon.STOP_IDS) == {codon.stoi["TAA"], codon.stoi["TAG"], codon.stoi["TGA"]}


class TestToIds:
    def test_simple(self):
        ids = codon.to_ids("ATGTAA")
        assert ids == [1, codon.stoi["ATG"], codon.stoi["TAA"], 2]

    def test_termination_policies(self):
        assert codon.to_ids("ATG", termination="eos")[-1] == 2
        assert codon.to_ids("ATG", termination="sep")[-1] == 3
        assert codon.to_ids("ATG", termination="none") == [1, codon.stoi["ATG"]]
        with pytest.raises(ValueError):
            codon.to_ids("ATG", termination="bogus")

    def test_case_and_rna(self):
        assert codon.to_ids("augUAA") == codon.to_ids("ATGTAA")

    def test_short_returns_empty(self):
        assert codon.to_ids("AT") == []
        assert codon.to_ids("") == []

    def test_trailing_partial_trimmed(self):
        assert codon.to_ids("ATGTAAG") == codon.to_ids("ATGTAA")

    def test_ambiguous_raises(self):
        with pytest.raises(codon.AmbiguousCodonError):
            codon.to_ids("ATGNNNTAA")
        with pytest.raises(codon.AmbiguousCodonError):
            codon.to_ids("ATGTAANN")  # ambiguous partial trailing codon


class TestFragments:
    def test_no_ambiguity_single_fragment(self):
        r = codon.tokenize_cds_fragments("ATGAAATAA")
        assert len(r.fragments) == 1
        f = r.fragments[0]
        assert f.ids == [1, codon.stoi["ATG"], codon.stoi["AAA"], codon.stoi["TAA"], 2]
        assert (f.codon_start, f.codon_end) == (0, 3)
        assert (f.base_start, f.base_end) == (0, 9)
        assert r.ambiguous_codons == 0
        assert not r.source_had_ambiguity

    def test_ambiguity_splits(self):
        # ATG | NNN | TAA → two fragments, no cross-gap adjacency
        r = codon.tokenize_cds_fragments("ATGNNNTAA")
        assert r.ambiguous_codons == 1
        assert len(r.fragments) == 2
        assert r.fragments[0].ids[1:-1] == [codon.stoi["ATG"]]
        assert r.fragments[1].ids[1:-1] == [codon.stoi["TAA"]]
        assert r.fragments[0].fragment_index == 0
        assert r.fragments[1].fragment_index == 1
        assert (r.fragments[1].codon_start, r.fragments[1].codon_end) == (2, 3)

    def test_min_fragment_codons_discards(self):
        r = codon.tokenize_cds_fragments("ATGNNNAAACCC", min_fragment_codons=2)
        assert r.discarded_fragments == 1
        assert len(r.fragments) == 1
        assert r.fragments[0].ids[1:-1] == [codon.stoi["AAA"], codon.stoi["CCC"]]
        # discarded fragments still advance the fragment index
        assert r.fragments[0].fragment_index == 1

    def test_leading_trailing_consecutive_ambiguity(self):
        r = codon.tokenize_cds_fragments("NNNATGNNNNNNTAANNN")
        assert r.ambiguous_codons == 4
        assert len(r.fragments) == 2
        assert r.partial_trailing_bases == 0

    def test_partial_trailing_bases(self):
        r = codon.tokenize_cds_fragments("ATGTAAGG")
        assert r.partial_trailing_bases == 2

    def test_min_fragment_validation(self):
        with pytest.raises(ValueError):
            codon.tokenize_cds_fragments("ATG", min_fragment_codons=0)


class TestHybridTokenizer:
    def test_vocab(self):
        t = HybridTokenizer()
        assert t.vocab_size == 74
        assert t.vocab[:6] == ["<PAD>", "<BOS_CDS>", "<EOS_CDS>", "<UNK>", "<UTR_START>", "<UTR_END>"]
        assert t.vocab[6] == "AAA"
        assert t.vocab[-4:] == ["A", "C", "G", "T"]

    def test_encode_mixed(self):
        t = HybridTokenizer()
        seq = "AAATGCCCTAAGG"
        ids = t.encode(seq, [(2, 11, "+")])
        # UTR "AA", CDS "ATGCCCTAA", UTR "GG"
        expected = (
            [t.stoi["<UTR_START>"], t.stoi["A"], t.stoi["A"], t.stoi["<UTR_END>"]]
            + [t.stoi["<BOS_CDS>"], t.stoi["ATG"], t.stoi["CCC"], t.stoi["TAA"], t.stoi["<EOS_CDS>"]]
            + [t.stoi["<UTR_START>"], t.stoi["G"], t.stoi["G"], t.stoi["<UTR_END>"]]
        )
        assert ids == expected

    def test_reverse_strand(self):
        t = HybridTokenizer()
        # reverse complement of "TTACAT" is "ATGTAA"
        ids = t.encode("TTACAT", [(0, 6, "-")])
        assert ids == [t.stoi["<BOS_CDS>"], t.stoi["ATG"], t.stoi["TAA"], t.stoi["<EOS_CDS>"]]

    def test_overlap_rejected(self):
        t = HybridTokenizer()
        with pytest.raises(ValueError):
            t.encode("A" * 20, [(0, 9, "+"), (6, 15, "+")])

    def test_decode_genomic_roundtrip(self):
        t = HybridTokenizer()
        seq = "AATTACATGG"
        intervals = [(2, 8, "-")]
        ids = t.encode(seq, intervals)
        assert t.decode_genomic(ids, intervals) == seq.upper()


class TestKmer:
    def test_vocab(self):
        v = build_vocab(2)
        assert v[:4] == ["<pad>", "<bos>", "<eos>", "<unk>"]
        assert len(v) == 4 + 16
        assert v[4] == "AA"

    def test_to_ids_overlapping(self):
        stoi = build_stoi(2)
        ids = kmer_to_ids("ACGT", 2, stoi)
        assert ids[0] == stoi["<bos>"] and ids[-1] == stoi["<eos>"]
        assert ids[1:-1] == [stoi["AC"], stoi["CG"], stoi["GT"]]


class TestProteinTokenizer:
    def test_vocab(self):
        t = ProteinTokenizer()
        assert len(t) == 28
        assert t.pad_token_id == 0
        assert t.bos_token_id == 1
        assert t.eos_token_id == 2
        assert t.vocab[3] == "A"
        assert t.vocab[23] == "X"
        assert t.vocab[24] == "<FUNC:ENZYME>"

    def test_encode_decode(self):
        t = ProteinTokenizer()
        ids = t.encode_sequence("MKVX")
        assert t.decode_sequence(ids) == "MKVX"
        # unknown AA maps to X
        assert t.encode_sequence("B") == [t.token_to_id["X"]]

    def test_conditions(self):
        t = ProteinTokenizer()
        ids = t.encode_conditions(["<FUNC:ENZYME>", "<TOPO:TM>"])
        assert ids == [24, 26]
        assert t.decode_sequence(ids) == ""
