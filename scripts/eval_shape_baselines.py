#!/usr/bin/env python3
"""DNA-shape regression baselines (reference eval_shape_baselines.py).

Compare the LM-hidden-state shape probe against one-hot and k-mer-frequency
baselines on the theoretical shape targets.
"""

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
    ap.add_argument("run_id", nargs="?", default=None,
                    help="optional run for the LM-feature column")
    ap.add_argument("--n_sequences", type=int, default=64)
    ap.add_argument("--seq_len_codons", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="outputs/probes/shape_baselines.json")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np
    from scipy import stats
    from sklearn.linear_model import Ridge
    from sklearn.model_selection import train_test_split

    from genomics_lm_tpu.models.biophysics import get_theoretical_shape, one_hot_dna

    rng = np.random.default_rng(args.seed)
    L = args.seq_len_codons
    onehots, kmers, targets, dnas = [], [], [], []
    # Motif-biased sampling so the heuristic shape targets (AAAA / GGGG /
    # GC-step pentamer rules) actually vary across positions.
    motifs = ["AAAA", "GGGG", "CCCC", "GGCC", "TTTT", ""]
    for _ in range(args.n_sequences):
        base = list(rng.choice(list("ACGT"), 3 * L))
        for _ in range(max(1, L // 4)):
            m = motifs[rng.integers(len(motifs))]
            if m:
                pos = int(rng.integers(0, 3 * L - len(m)))
                base[pos : pos + len(m)] = list(m)
        dna = "".join(base)
        dnas.append(dna)
        oh = one_hot_dna(dna).reshape(L, 12)  # codon-local one-hot
        onehots.append(oh)
        counts = np.zeros((L, 16), np.float32)  # dinucleotide counts per codon
        for c in range(L):
            tri = dna[3 * c : 3 * c + 3]
            for j in range(2):
                di = tri[j : j + 2]
                counts[c, "ACGT".index(di[0]) * 4 + "ACGT".index(di[1])] += 1
        kmers.append(counts)
        shapes = get_theoretical_shape(dna)
        nt = np.stack([shapes["MGW"], shapes["Roll"], shapes["EP"]], axis=-1)
        targets.append(nt.reshape(L, 3, 3).mean(axis=1))
    Y = np.concatenate(targets)

    feature_sets = {
        "onehot_codon": np.concatenate(onehots),
        "dinucleotide_counts": np.concatenate(kmers),
    }
    if args.run_id:
        import jax.numpy as jnp

        from genomics_lm_tpu.evals.playground import load_codon_model
        from genomics_lm_tpu.models import codon_gpt
        from genomics_lm_tpu.tokenizers.codon import stoi

        run_dir = resolve_run_dir(args.run_id, args.run_root)
        params, cfg, _, _ = load_codon_model(run_dir)
        cfg = cfg.replace(dropout=0.0)
        feats = []
        for dna in dnas:
            ids = [1] + [stoi[dna[i : i + 3]] for i in range(0, 3 * L, 3)]
            hidden = np.asarray(
                codon_gpt.forward_hidden(params, cfg, jnp.asarray([ids], jnp.int32)),
                dtype=np.float32,
            )[0]
            feats.append(hidden[1:])
        feature_sets["lm_hidden"] = np.concatenate(feats)

    report = {}
    for name, X in feature_sets.items():
        X_tr, X_te, Y_tr, Y_te = train_test_split(
            X, Y, test_size=0.25, random_state=args.seed
        )
        r2s, rhos = [], []
        for i in range(3):
            if float(Y_te[:, i].std()) < 1e-9:  # constant target: R2 undefined
                continue
            model = Ridge(alpha=1.0)
            model.fit(X_tr, Y_tr[:, i])
            pred = model.predict(X_te)
            ss_res = float(((Y_te[:, i] - pred) ** 2).sum())
            ss_tot = float(((Y_te[:, i] - Y_te[:, i].mean()) ** 2).sum())
            r2s.append(1.0 - ss_res / ss_tot)
            rhos.append(float(stats.spearmanr(pred, Y_te[:, i]).statistic))
        report[name] = {"avg_r2": float(np.mean(r2s)) if r2s else None,
                        "avg_spearman": float(np.mean(rhos)) if rhos else None,
                        "n_target_dims_used": len(r2s)}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
