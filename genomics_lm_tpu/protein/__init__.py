"""Protein-critic training stack: datasets, trainers, EBM, Langevin sampler.

Parity targets (reference ``src/protein_lm/``): MultiTaskProteinDataset +
length-bucketed batching, the LM / classifier / multi-task / EBM / MLP-heads
trainers, the latent Langevin sampler, and critic scoring for
generation guidance.
"""
