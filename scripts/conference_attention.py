#!/usr/bin/env python3
"""Publication attention figure (reference conference_attention.py).

Per-layer mean attention heatmaps for a probe CDS, as one multi-panel
figure in ``conference/figures/``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--dna", default="ATGAAACCCGGGTTTGATCTGTAA")
    ap.add_argument("--out_dir", default="conference/figures")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.evals.playground import dna_to_context_ids, load_codon_model
    from genomics_lm_tpu.models import codon_gpt

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, itos, stoi = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)
    ids = dna_to_context_ids(args.dna, stoi)
    maps = codon_gpt.attention_maps(params, cfg, jnp.asarray([ids], jnp.int32))
    tokens = [itos[i] for i in ids]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_layers = len(maps)
    cols = min(4, n_layers)
    rows = -(-n_layers // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 3.0 * rows))
    axes = np.atleast_1d(axes).ravel()
    for layer, (m, ax) in enumerate(zip(maps, axes)):
        im = ax.imshow(np.asarray(m[0]).mean(axis=0), cmap="viridis")
        ax.set_title(f"layer {layer}", fontsize=9)
        if len(tokens) <= 16:
            ax.set_xticks(range(len(tokens)))
            ax.set_xticklabels(tokens, rotation=90, fontsize=5)
            ax.set_yticks(range(len(tokens)))
            ax.set_yticklabels(tokens, fontsize=5)
        else:
            ax.set_xticks([])
            ax.set_yticks([])
    for ax in axes[n_layers:]:
        ax.axis("off")
    fig.colorbar(im, ax=list(axes[:n_layers]), shrink=0.7)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{run_dir.name}_attention.png"
    plt.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    print(f"[conference] figure → {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
