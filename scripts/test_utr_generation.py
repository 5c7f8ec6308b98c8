#!/usr/bin/env python3
"""Test whether generation past the stop codon produces 3'UTR-like
termination structure (reference test_utr_generation.py — hairpin/poly-T
scores of post-stop continuations vs in-CDS continuations)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--n_samples", type=int, default=8)
    ap.add_argument("--prefix_codons", type=int, default=10)
    ap.add_argument("--utr_codons", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.playground import dna_to_context_ids, make_decoder
    from genomics_lm_tpu.evals.termination_motifs import (
        gc_fraction,
        hairpin_score,
        max_poly_t_run,
    )
    from genomics_lm_tpu.generation.decode import sample_token

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)
    rng = np.random.default_rng(args.seed)

    def continue_tokens(ids: list[int], n_tokens: int) -> str:
        ids = list(ids)
        out = []
        for _ in range(n_tokens):
            logits = decoder.next_logits(ids)
            tok = sample_token(np.asarray(logits), 1.0, 0, rng)
            ids.append(int(tok))
            text = itos[int(tok)]
            if len(text) == 3 and "<" not in text:
                out.append(text)
        return "".join(out)

    # prefix inside a CDS vs the same prefix terminated by a stop codon
    in_cds, post_stop = [], []
    for i in range(args.n_samples):
        body = "".join(
            rng.choice(["GCA", "AAA", "CTG", "GAT", "TCC", "CGT"])
            for _ in range(args.prefix_codons - 1)
        )
        prefix = "ATG" + body
        in_cds.append(continue_tokens(dna_to_context_ids(prefix, stoi),
                                      args.utr_codons))
        post_stop.append(continue_tokens(dna_to_context_ids(prefix + "TAA", stoi),
                                         args.utr_codons))

    def score(seqs):
        rows = [{"hairpin": hairpin_score(s), "poly_t": max_poly_t_run(s),
                 "gc": gc_fraction(s)} for s in seqs if s]
        return {k: float(np.mean([r[k] for r in rows])) if rows else None
                for k in ("hairpin", "poly_t", "gc")}

    report = {
        "n_samples": args.n_samples,
        "in_cds_continuation": score(in_cds),
        "post_stop_continuation": score(post_stop),
    }
    if report["in_cds_continuation"]["hairpin"] is not None and \
            report["post_stop_continuation"]["hairpin"] is not None:
        report["utr_hairpin_uplift"] = (
            report["post_stop_continuation"]["hairpin"]
            - report["in_cds_continuation"]["hairpin"]
        )
        report["utr_poly_t_uplift"] = (
            report["post_stop_continuation"]["poly_t"]
            - report["in_cds_continuation"]["poly_t"]
        )
    out = Path(args.out) if args.out else run_dir / "scores" / "utr_generation.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
