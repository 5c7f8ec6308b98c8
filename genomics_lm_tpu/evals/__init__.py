"""Evaluation layer: metrics, probes, baselines, extraction, interpretability.

Parity targets: ``src/classifiers/`` (probe metrics with bootstrap CIs,
linear/k-mer/MLP probes), ``src/eval/`` (diversity, motifs, aggregation,
visualization), ``scripts/eval_ppl_baselines.py`` (Markov baselines with
<SEP> history reset), ``scripts/extract_embeddings.py`` (pooled canonical
causal states with provenance), ``src/codonlm/score_mutations.py``.
"""
