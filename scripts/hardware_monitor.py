#!/usr/bin/env python3
"""Heartbeat monitor: host RSS, device HBM, and curves.csv growth.

Parity: reference ``scripts/hardware_monitor.py`` (vm_stat RAM polling) —
Linux/TPU-native: /proc/meminfo + jax device memory stats.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def meminfo() -> dict:
    out = {}
    try:
        for line in Path("/proc/meminfo").read_text().splitlines():
            key, _, rest = line.partition(":")
            if key in {"MemTotal", "MemAvailable"}:
                out[key] = int(rest.split()[0]) * 1024
    except OSError:
        pass
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default=None, help="watch this run's curves.csv")
    ap.add_argument("--interval", type=float, default=30.0)
    ap.add_argument("--iterations", type=int, default=0, help="0 = forever")
    ap.add_argument("--device", action="store_true", help="also poll device HBM")
    args = ap.parse_args(argv)

    curves = Path(args.run_dir) / "scores" / "curves.csv" if args.run_dir else None
    i = 0
    while True:
        info = meminfo()
        line = (
            f"[monitor] mem_available={info.get('MemAvailable', 0) / 1e9:.2f}GB"
            f"/{info.get('MemTotal', 0) / 1e9:.2f}GB"
        )
        if args.device:
            from genomics_lm_tpu.training.runtime import device_memory_stats

            stats = device_memory_stats()
            if stats.get("bytes_in_use") is not None:
                line += f" hbm={stats.get('bytes_in_use', 0) / 1e9:.2f}GB"
        if curves and curves.exists():
            rows = curves.read_text().count("\n")
            line += f" curve_rows={rows}"
        print(line, flush=True)
        i += 1
        if args.iterations and i >= args.iterations:
            return 0
        time.sleep(args.interval)


if __name__ == "__main__":
    raise SystemExit(main())
