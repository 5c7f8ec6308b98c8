"""Tokenizer parity against the ACTUAL reference implementations.

The existing tokenizer tests (`tests/test_tokenizers.py`) assert this
repo's semantics against re-derived expectations; these assert them
against the reference's own modules imported read-only from the mounted
checkout (`src/codonlm/codon_tokenize.py`, `hybrid_tokenizer.py`,
`src/protein_lm/tokenizer.py`) — ids, fragment provenance, ambiguity
handling, termination policies, and vocab tables, bit for bit.

Skipped when the reference checkout is unavailable.
"""

from __future__ import annotations

import numpy as np
import pytest

from genomics_lm_tpu.tokenizers import codon as repo_codon
from genomics_lm_tpu.tokenizers.hybrid import HybridTokenizer as RepoHybrid
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer as RepoProtein
from genomics_lm_tpu.utils.torch_bridge import reference_root

from tests.test_dataset_interop import _load_reference_module  # noqa: E402

if not (reference_root() / "src" / "codonlm" / "codon_tokenize.py").exists():
    pytest.skip("reference checkout unavailable", allow_module_level=True)

ref_codon = _load_reference_module("codon_tokenize")
ref_hybrid_mod = _load_reference_module("hybrid_tokenizer")


def _random_cds(rng, n_codons, ambiguity_every=0):
    bases = np.array(list("ACGT"))
    seq = list("ATG") + list(rng.choice(bases, size=3 * n_codons)) + list("TAA")
    if ambiguity_every:
        for i in range(ambiguity_every, len(seq), ambiguity_every):
            seq[i] = "N"
    return "".join(seq)


class TestCodonTokenizerParity:
    def test_vocab_tables_identical(self):
        assert list(repo_codon.VOCAB) == list(ref_codon.VOCAB)
        assert repo_codon.stoi == ref_codon.stoi
        assert list(repo_codon.itos) == list(ref_codon.itos)

    @pytest.mark.parametrize("termination", ["eos", "sep", "none"])
    def test_to_ids_identical(self, termination):
        rng = np.random.default_rng(5)
        for n in (1, 2, 40, 171):
            dna = _random_cds(rng, n)
            assert repo_codon.to_ids(dna, termination) == ref_codon.to_ids(
                dna, termination
            ), (n, termination)

    @pytest.mark.parametrize("termination", ["eos", "sep", "none"])
    @pytest.mark.parametrize("amb", [0, 17, 50])
    def test_fragment_splitting_identical(self, termination, amb):
        """Ambiguity-aware fragmentation: ids, codon spans, fragment
        indices, and aggregate stats all match the reference."""
        rng = np.random.default_rng(amb + 1)
        for n in (12, 60, 200):
            dna = _random_cds(rng, n, ambiguity_every=amb)
            ours = repo_codon.tokenize_cds_fragments(
                dna, source_id="x", min_fragment_codons=5,
                termination=termination,
            )
            ref = ref_codon.tokenize_cds_fragments(
                dna, source_id="x", min_fragment_codons=5,
                termination=termination,
            )
            assert len(ours.fragments) == len(ref.fragments)
            for a, b in zip(ours.fragments, ref.fragments):
                assert list(a.ids) == list(b.ids)
                assert (a.fragment_index, a.codon_start, a.codon_end) == (
                    b.fragment_index, b.codon_start, b.codon_end)
            assert ours.source_had_ambiguity == ref.source_had_ambiguity
            assert ours.ambiguous_codons == ref.ambiguous_codons
            assert ours.discarded_fragments == ref.discarded_fragments
            assert (ours.partial_trailing_bases
                    == ref.partial_trailing_bases)

    def test_lowercase_and_u_normalization(self):
        dna = "atgURAcgtTaa".replace("R", "A")
        assert repo_codon.to_ids(dna) == ref_codon.to_ids(dna)


class TestHybridTokenizerParity:
    def test_vocab_identical(self):
        ours, theirs = RepoHybrid(), ref_hybrid_mod.HybridTokenizer()
        assert list(ours.itos) == list(theirs.itos)
        assert ours.stoi == theirs.stoi

    def test_encoding_identical(self):
        rng = np.random.default_rng(9)
        bases = np.array(list("ACGT"))
        seq = "".join(rng.choice(bases, size=300))
        intervals = [(30, 90, "+"), (120, 210, "-")]
        ours, theirs = RepoHybrid(), ref_hybrid_mod.HybridTokenizer()
        assert ours.encode(seq, intervals) == theirs.encode(seq, intervals)

    def test_overlapping_intervals_rejected_by_both(self):
        seq = "ACGT" * 40
        intervals = [(10, 70, "+"), (40, 100, "+")]
        ours, theirs = RepoHybrid(), ref_hybrid_mod.HybridTokenizer()
        with pytest.raises(ValueError):
            ours.encode(seq, intervals)
        with pytest.raises(ValueError):
            theirs.encode(seq, intervals)


class TestProteinTokenizerParity:
    def test_vocab_identical(self):
        ref_prot_path = (
            reference_root() / "src" / "protein_lm" / "tokenizer.py"
        )
        namespace: dict = {}
        exec(ref_prot_path.read_text(), namespace)  # stdlib-only module
        theirs = namespace["ProteinTokenizer"]()
        ours = RepoProtein()
        assert len(ours.vocab) == len(theirs.vocab) == 28
        assert list(ours.vocab) == list(theirs.vocab)
        assert ours.token_to_id == theirs.token_to_id
        seq = "MKTAYIAKQRZ*"  # Z/* are unknowns → X on both sides
        assert ours.encode_sequence(seq) == theirs.encode_sequence(seq)
        conds = list(ours.condition_tokens.values())
        assert ours.encode_conditions(conds) == theirs.encode_conditions(conds)
        assert (ours.bos_token_id, ours.eos_token_id, ours.pad_token_id) == (
            theirs.bos_token_id, theirs.eos_token_id, theirs.pad_token_id)
