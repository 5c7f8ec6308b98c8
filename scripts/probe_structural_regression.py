#!/usr/bin/env python3
"""DNA-shape structural regression probe (reference probe_structural_regression).

Regress per-codon theoretical shape features (MGW/Roll/EP) from the model's
per-position hidden states with ridge regression; report per-feature R² and
Spearman ρ — the reference's structural-awareness protocol.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--n_sequences", type=int, default=64)
    ap.add_argument("--seq_len_codons", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from scipy import stats
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

    L = min(args.seq_len_codons, cfg.block_size - 1)
    features, targets = [], []
    for _ in range(args.n_sequences):
        dna = "".join(rng.choice(list("ACGT"), 3 * L))
        ids = [1] + [stoi[dna[i : i + 3]] for i in range(0, 3 * L, 3)]
        hidden = np.asarray(
            codon_gpt.forward_hidden(params, cfg, jnp.asarray([ids], jnp.int32)),
            dtype=np.float32,
        )[0]
        shapes = get_theoretical_shape(dna)
        per_nt = np.stack([shapes["MGW"], shapes["Roll"], shapes["EP"]], axis=-1)
        per_codon = per_nt.reshape(L, 3, 3).mean(axis=1)
        features.append(hidden[1:])  # positions of the codons (skip BOS)
        targets.append(per_codon)
    X = np.concatenate(features)
    Y = np.concatenate(targets)

    X_tr, X_te, Y_tr, Y_te = train_test_split(X, Y, test_size=0.25, random_state=args.seed)
    report = {}
    r2s, rhos = [], []
    for i, name in enumerate(("MGW", "Roll", "EP")):
        model = Ridge(alpha=1.0)
        model.fit(X_tr, Y_tr[:, i])
        pred = model.predict(X_te)
        ss_res = float(((Y_te[:, i] - pred) ** 2).sum())
        ss_tot = float(((Y_te[:, i] - Y_te[:, i].mean()) ** 2).sum())
        r2 = 1.0 - ss_res / max(ss_tot, 1e-12)
        rho = float(stats.spearmanr(pred, Y_te[:, i]).statistic)
        report[name] = {"r2": r2, "spearman_rho": rho}
        r2s.append(r2)
        rhos.append(rho)
    report["avg"] = {"r2": float(np.mean(r2s)), "spearman_rho": float(np.mean(rhos))}
    out = Path(args.out) if args.out else run_dir / "scores" / "structural_regression.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
