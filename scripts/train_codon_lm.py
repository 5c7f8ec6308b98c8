#!/usr/bin/env python3
"""CLI front-end for the codon-LM trainer.

Parity: reference ``src/codonlm/train_codon_lm.py`` — argparse wrapper
merging the YAML config's ``data:`` sub-map into the flat namespace, with
path/run-id/resume/transfer/wall-time overrides.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _shared  # noqa: F401,E402  (repo bootstrap + JAX_PLATFORMS env restore)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train a TPU-native codon LM")
    ap.add_argument("--config", required=True)
    ap.add_argument("--run_id", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--transfer_from", default=None)
    ap.add_argument("--train_npz", nargs="*", default=None)
    ap.add_argument("--val_npz", nargs="*", default=None)
    ap.add_argument("--test_npz", nargs="*", default=None)
    ap.add_argument("--save_epochs", action="store_true")
    ap.add_argument("--max_time_minutes", type=float, default=None)
    ap.add_argument("--run_root", default="runs")
    ap.add_argument("--mesh_devices", type=int, default=None,
                    help="total mesh device count (default: all local devices)")
    ap.add_argument("--tensor_parallel", type=int, default=None,
                    help="model-axis size; devices form a (data, model) mesh "
                         "with Megatron-style weight sharding")
    ap.add_argument("--pipeline_stages", type=int, default=None,
                    help="pipe-axis size; devices form a (data, pipe) mesh "
                         "with GPipe depth sharding (plain CE objective only)")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.training.config import load_yaml_config
    from genomics_lm_tpu.training.loop import run_training

    cfg = load_yaml_config(args.config)
    if args.run_id:
        cfg["run_id"] = args.run_id
    if args.train_npz:
        cfg["train_npz"] = args.train_npz
    if args.val_npz:
        cfg["val_npz"] = args.val_npz
    if args.test_npz:
        cfg["test_npz"] = args.test_npz
    if args.save_epochs:
        cfg["save_epochs"] = True
    if args.max_time_minutes is not None:
        cfg["max_time_minutes"] = args.max_time_minutes
    if args.transfer_from:
        cfg["transfer_from"] = args.transfer_from

    mesh = None
    n_mesh = args.mesh_devices or cfg.get("mesh_devices")
    tp = int(args.tensor_parallel or cfg.get("tensor_parallel") or 1)
    pp = int(args.pipeline_stages or cfg.get("pipeline_stages") or 1)
    if n_mesh or tp > 1 or pp > 1:
        from genomics_lm_tpu.parallel.mesh import make_mesh

        if tp > 1 and pp > 1:
            # all three axes on one mesh: DP outermost, then TP inside
            # each pipeline stage (Megatron splits under GSPMD), GPipe
            # depth over pipe
            mesh = make_mesh(
                int(n_mesh) if n_mesh else None,
                axes={"data": -1, "model": tp, "pipe": pp},
            )
        elif tp > 1:
            mesh = make_mesh(
                int(n_mesh) if n_mesh else None,
                axes={"data": -1, "model": tp},
            )
        elif pp > 1:
            mesh = make_mesh(
                int(n_mesh) if n_mesh else None,
                axes={"data": -1, "pipe": pp},
            )
        else:
            mesh = make_mesh(int(n_mesh))

    meta = run_training(
        cfg,
        config_path=args.config,
        resume=args.resume,
        transfer_from=cfg.get("transfer_from"),
        run_root=args.run_root,
        mesh=mesh,
    )
    # a preempted run saved its checkpoint; exit with the conventional
    # 128+signum so supervisors see the termination cause
    if meta and meta.get("preempted_by_signal"):
        return 128 + int(meta["preempted_by_signal"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
