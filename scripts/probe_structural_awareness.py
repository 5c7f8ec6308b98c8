#!/usr/bin/env python3
"""Probe hidden states for extended DNA-shape awareness
(reference probe_structural_awareness.py — heuristic pentamer shape params
MGW/Roll/EP plus ProT/HelT/Slide regressed from LM hidden states).

The 3 core parameters reuse genomics_lm_tpu.models.biophysics
(get_theoretical_shape); the extended trio is computed here with the same
window-rule style so the probe covers bend, twist, and slide conformations.
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def extended_shape(dna: str) -> dict[str, list[float]]:
    """ProT / HelT / Slide heuristics (same pentamer-window style as the
    core table: A-tracts → high negative propeller twist, GC steps → higher
    helical twist and positive slide)."""
    prot, helt, slide = [], [], []
    for i in range(len(dna)):
        window = dna[max(0, i - 2) : min(len(dna), i + 3)]
        if "AAAA" in window or "TTTT" in window:
            p, h, s = -15.0, 34.0, -0.8
        elif "GC" in window or "CG" in window:
            p, h, s = -5.0, 36.0, 0.5
        elif "GG" in window or "CC" in window:
            p, h, s = -7.0, 35.0, 0.2
        else:
            p, h, s = -10.0, 34.5, -0.2
        prot.append(p)
        helt.append(h)
        slide.append(s)
    return {"ProT": prot, "HelT": helt, "Slide": slide}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--n_sequences", type=int, default=48)
    ap.add_argument("--seq_len_codons", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from sklearn.linear_model import Ridge
    from sklearn.model_selection import train_test_split

    from genomics_lm_tpu.evals.playground import load_codon_model
    from genomics_lm_tpu.models import codon_gpt
    from genomics_lm_tpu.models.biophysics import get_theoretical_shape
    from genomics_lm_tpu.tokenizers.codon import stoi

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)

    rng = np.random.default_rng(args.seed)
    L = args.seq_len_codons
    motifs = ["AAAA", "GGGG", "CCCC", "TTTT", "GGCC", ""]
    feats, targets = [], {k: [] for k in ("MGW", "Roll", "EP", "ProT", "HelT", "Slide")}
    for _ in range(args.n_sequences):
        base = list(rng.choice(list("ACGT"), 3 * L))
        for _ in range(max(1, L // 4)):
            m = motifs[rng.integers(len(motifs))]
            if m:
                pos = int(rng.integers(0, 3 * L - len(m)))
                base[pos : pos + len(m)] = list(m)
        dna = "".join(base)
        ids = [1] + [stoi[dna[i : i + 3]] for i in range(0, 3 * L, 3)]
        hidden = np.asarray(
            codon_gpt.forward_hidden(params, cfg, jnp.asarray([ids], jnp.int32)),
            dtype=np.float32,
        )[0][1:]
        feats.append(hidden)
        shapes = {**get_theoretical_shape(dna), **extended_shape(dna)}
        for name, values in shapes.items():
            per_codon = np.asarray(values, np.float64).reshape(L, 3).mean(axis=1)
            targets[name].append(per_codon)

    X = np.concatenate(feats)
    report = {}
    for name, rows in targets.items():
        y = np.concatenate(rows)
        if float(y.std()) < 1e-9:
            report[name] = {"r2": None, "note": "constant target"}
            continue
        X_tr, X_te, y_tr, y_te = train_test_split(X, y, test_size=0.25,
                                                  random_state=args.seed)
        model = Ridge(alpha=1.0)
        model.fit(X_tr, y_tr)
        pred = model.predict(X_te)
        ss_res = float(((y_te - pred) ** 2).sum())
        ss_tot = float(((y_te - y_te.mean()) ** 2).sum())
        report[name] = {"r2": 1.0 - ss_res / ss_tot}

    r2s = [v["r2"] for v in report.values() if v.get("r2") is not None]
    summary = {"params": report,
               "mean_r2": float(np.mean(r2s)) if r2s else None,
               "n_tokens": int(X.shape[0])}
    out = Path(args.out) if args.out else run_dir / "scores" / "structural_awareness.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
