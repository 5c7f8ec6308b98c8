"""genomics_lm_tpu — a TPU-native codon language-model framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
``AvishaiBarnoy/genomics-lm`` reference (a single-device PyTorch/MPS research
framework): codon/hybrid/protein tokenizers, a leakage-audited data pipeline,
compact causal codon GPTs (RoPE/SwiGLU/GQA, segment-masked packed attention,
multi-offset + termination auxiliary heads), a resumable contract-driven
training engine, constrained CDS generation, a protein-critic stack, and
downstream probes — running data-parallel over TPU device meshes with a Pallas
flash-attention kernel on the hot path.

Layer map (mirrors reference SURVEY.md §1; see each subpackage docstring for
file-level parity citations into the reference):

- ``tokenizers``  — codon (68), hybrid (74), k-mer, protein (28) vocabularies
- ``data``        — lossless packing, packed datasets, manifests, leakage audit
- ``models``      — functional JAX model definitions (codon GPT, protein stack)
- ``ops``         — Pallas kernels + XLA reference ops (attention, losses)
- ``parallel``    — mesh construction and sharding rules (DP + ZeRO-1)
- ``training``    — engine, run lifecycle, checkpoints, optimizers, trainers
- ``generation``  — KV-cached decoding, constrained/critic-guided generation
- ``protein``     — protein-critic trainers, EBM, Langevin sampler
- ``evals``       — metrics, probes, Markov baselines, embedding extraction
"""

__version__ = "0.1.0"
