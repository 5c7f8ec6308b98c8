#!/usr/bin/env python3
"""Plot a run's prefix-generation evaluation (reference plot_eval_prefix.py)."""

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
    ap.add_argument("--summary", default=None,
                    help="generation_prefix.json (default: run scores dir)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    path = Path(args.summary) if args.summary else (
        run_dir / "scores" / "generation_prefix.json"
    )
    payload = json.loads(path.read_text())
    results = payload.get("results", [])
    if not results:
        raise SystemExit(f"no per-sample results in {path}")

    lengths = np.asarray([r["generated_codons"] for r in results])
    stops = np.asarray([bool(r["had_terminal_stop"]) for r in results])
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.4))
    ax1.hist(lengths, bins=min(20, max(3, len(set(lengths.tolist())))))
    ax1.set_xlabel("generated codons")
    ax1.set_ylabel("count")
    ax1.set_title("Generated length distribution")
    ax2.bar(["terminal stop", "no stop"], [int(stops.sum()), int((~stops).sum())])
    ax2.set_title(
        f"Terminal stop rate = {payload['summary']['terminal_stop_rate']:.2f}"
    )
    fig.suptitle(run_dir.name, fontsize=9)
    fig.tight_layout()
    out = Path(args.out) if args.out else run_dir / "charts" / "generation_prefix.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print(json.dumps({"plot": str(out), "n": len(results)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
