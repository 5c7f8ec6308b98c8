#!/usr/bin/env python3
"""Compare two codon generators under the same critic
(reference compare_generators.py — baseline vs fine-tuned design loops)."""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: E402


def design_loop(run_id: str, out_dir: Path, args) -> dict:
    cmd = [
        sys.executable, str(REPO_ROOT / "scripts" / "generative_design_loop.py"),
        run_id, "--n_candidates", str(args.n_sequences),
        "--target_codons", str(args.target_codons),
        "--seed", str(args.seed), "--out_dir", str(out_dir),
        "--run_root", args.run_root,
    ]
    if args.critic_ckpt:
        cmd += ["--critic_ckpt", args.critic_ckpt]
    print(f"[compare] {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True)
    return json.loads((out_dir / "summary.json").read_text())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline_dir", required=True)
    ap.add_argument("--finetuned_dir", required=True)
    ap.add_argument("--critic_ckpt", default=None)
    ap.add_argument("--n_sequences", type=int, default=8)
    ap.add_argument("--target_codons", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out_dir", default="outputs/reports/generator_comparison")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    out_dir = Path(args.out_dir)
    base = design_loop(args.baseline_dir, out_dir / "baseline", args)
    fine = design_loop(args.finetuned_dir, out_dir / "finetuned", args)

    deltas = {
        k: (fine[k] - base[k])
        for k in base
        if isinstance(base.get(k), (int, float)) and isinstance(fine.get(k), (int, float))
    }
    report = {"baseline": base, "finetuned": fine, "deltas": deltas}
    (out_dir / "comparison.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
