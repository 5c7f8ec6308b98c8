"""Tokenizer layer: fixed, versioned vocabularies for DNA and protein.

Vocabulary contracts match the reference bit-for-bit (token → id) so frozen
datasets, itos files, and embedding rows are interchangeable:

- codon:   68 tokens  (reference ``src/codonlm/codon_tokenize.py:29-44``)
- hybrid:  74 tokens  (reference ``src/codonlm/hybrid_tokenizer.py:19-42``)
- protein: 28 tokens  (reference ``src/protein_lm/tokenizer.py:3-38``)

Unlike the reference's per-character Python loops, encoders here are
numpy-vectorized: DNA bytes → base codes → codon ids in O(1) numpy ops, so
dataset building keeps up with the TPU input pipeline.
"""

from genomics_lm_tpu.tokenizers.codon import (  # noqa: F401
    ALIASES,
    CODONS,
    IUPAC_DNA_BASES,
    SPECIALS,
    STOP_CODONS,
    STOP_IDS,
    VOCAB,
    AmbiguousCodonError,
    CDSTokenizationResult,
    TokenizedCDSFragment,
    itos,
    stoi,
    to_ids,
    tokenize_cds_fragments,
)
from genomics_lm_tpu.tokenizers.hybrid import HybridTokenizer  # noqa: F401
from genomics_lm_tpu.tokenizers.kmer import kmer_tokenize  # noqa: F401
from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer  # noqa: F401
