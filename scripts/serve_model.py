#!/usr/bin/env python3
"""Serve a trained codon LM over HTTP with continuous batching.

    python scripts/serve_model.py --run runs/<id> [--port 8000] \
        [--slots 64] [--max_seq_len 256] [--kv_quant] [--int8_weights]

Endpoints (see genomics_lm_tpu/serving/server.py):
    POST /generate  {"dna": "ATG...", "max_new_tokens": 64,
                     "temperature": 0.8, "stop_ids": [2], "stream": false}
                    — or "prompt": [token ids] instead of "dna"
    GET  /stats     scheduler snapshot
    GET  /health    liveness

Reference analog: ``scripts/query_model.py`` (one request at a time,
full re-forward per token); this is the production serving path.
"""

from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True, help="run directory (or checkpoint)")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint name inside the run (default best/last)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--max_seq_len", type=int, default=None)
    ap.add_argument("--steps_per_sync", type=int, default=16)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--int8_weights", action="store_true")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="exact speculative decoding with K bigram-drafted "
                         "tokens per verify round; the draft table is fitted "
                         "to the run's training dataset (or --draft_npz)")
    ap.add_argument("--draft_npz", default=None,
                    help="packed NPZ to fit the bigram draft table on "
                         "(default: the run's train_npz from its config)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.playground import load_codon_model
    from genomics_lm_tpu.serving import InferenceServer, ServingEngine

    params, cfg, _, _ = load_codon_model(args.run, args.checkpoint)
    if args.int8_weights:
        from genomics_lm_tpu.ops.quant import quantize_params

        params = quantize_params(params)
    spec_kw = {}
    if args.speculative:
        import numpy as np
        import yaml

        from genomics_lm_tpu.serving import fit_bigram_table

        npz_path = args.draft_npz
        if npz_path is None:
            run_cfg = _Path(args.run) / "checkpoints" / "config.yaml"
            if not run_cfg.exists():
                raise SystemExit(
                    "--speculative needs a corpus for the draft table: pass "
                    "--draft_npz or serve a run whose checkpoints/config.yaml "
                    "records train_npz")
            npz_path = yaml.safe_load(run_cfg.read_text()).get("train_npz")
            if not npz_path or not _Path(str(npz_path).split(",")[0]).exists():
                raise SystemExit(
                    f"train_npz from the run config is unavailable "
                    f"({npz_path!r}); pass --draft_npz")
            npz_path = str(npz_path).split(",")[0]
        X = np.load(npz_path)["X"]
        spec_kw = {
            "speculative_k": args.speculative,
            "draft_table": fit_bigram_table(X, cfg.vocab_size,
                                            exclude_ids=(0,)),
        }
        print(f"[serve] speculative K={args.speculative}, draft table "
              f"fitted on {npz_path}")
    engine = ServingEngine(
        params, cfg, slots=args.slots, max_seq_len=args.max_seq_len,
        kv_quant=args.kv_quant, steps_per_sync=args.steps_per_sync,
        seed=args.seed, **spec_kw,
    )
    server = InferenceServer(engine, host=args.host, port=args.port)
    server.start()
    host, port = server.address
    print(f"[serve] listening on http://{host}:{port} "
          f"(slots={args.slots}, kv_quant={args.kv_quant})", flush=True)
    try:
        server._http_thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
