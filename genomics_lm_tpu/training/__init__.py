"""Training layer: runtime services, run lifecycle, engine, and trainers.

Layer boundaries mirror the reference (SURVEY.md §1): ``runtime`` (L0 —
timers, atomic checkpoint IO, crash logging) and ``lifecycle`` (L1 — run-dir
ownership, locking, resume validation, RNG capture) sit below the
model-agnostic ``engine`` (L2) and the codon/protein trainers (L3).
"""
