#!/usr/bin/env python3
"""Verify attention-saliency contrast on known active-site motifs
(reference verify_saliency_contrast.py — tRNA-synthetase YIHIG/KMSKS check).

Loads a multitask protein-critic checkpoint with attention pooling and
reports the ratio of mean pooling-attention mass on active-site motif
residues vs the rest of the sequence.
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

# tRNA synthetase with conserved YIHIG and KMSKS active-site motifs
# (same probe sequence family as the reference verification script).
DEFAULT_SEQ = (
    "MITLYNTLTRQKEVFKPIEPGKVKMYVCGPTVYNYIHIGNARPAINYDVVRRYFEYQGYNVEYVSNFTDVDDK"
    "LIKRSQELNQSVPEIAEKYIAAFHEDVGALNVRKATSNPRVMDHMDDIIQFIKDLVDQGYAYESGGDVYFRTR"
    "KFEGYGKLSHQSIDDLKVGARIDAGEHKEDALDFTLWKKAKPGEISWDSPFGEGRPGWHIECSVMAFHELGPT"
    "IDIHAGGSDLQFPHHENEIAQSEAHNHAPFANYWMHNGFINIDNEKMSKSLGNFILVHDIIKEVDPDVLRFFM"
    "ISVHYRSPINYNLELVESARSGLERIRNSYQLIEERAQIATNIENQQTYIDQIDAILNRFETVMNDDFNTANA"
    "ITAWYDLAKLANKYVLENTTSTEVIDKFKAVYQIFSDVLGVPLKSKNADELLDEDVEKLIEERNEARKNKDFA"
    "RADEIRDMLKSQNIILEDTPQGVRFKRG"
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="multitask critic checkpoint (.npz)")
    ap.add_argument("--sequence", default=DEFAULT_SEQ)
    ap.add_argument("--motifs", default="YIHIG,KMSKS")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.models.protein import (
        ProteinClassifierConfig,
        multitask_forward,
    )
    from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    tokenizer = ProteinTokenizer()
    payload = load_checkpoint(args.ckpt)
    ccfg = payload.get("cfg", {})
    cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(ccfg.get("n_layer", 4)), n_head=int(ccfg.get("n_head", 4)),
        n_embd=int(ccfg.get("n_embd", 256)),
        block_size=int(ccfg.get("block_size", 512)),
        dropout=0.0, pooling=str(ccfg.get("pooling", "attention")),
        bidirectional=bool(ccfg.get("bidirectional", True)),
    )
    if cfg.pooling != "attention":
        raise SystemExit("contrast verification requires an attention-pooled critic")
    params = jax.tree.map(jnp.asarray, payload["model"])

    seq = args.sequence
    motifs = [m for m in args.motifs.split(",") if m]
    active = []
    found = {}
    for motif in motifs:
        idx = seq.find(motif)
        found[motif] = idx
        if idx >= 0:
            active.extend(range(idx + 1, idx + 1 + len(motif)))  # +1 for BOS

    ids = (
        [tokenizer.bos_token_id]
        + tokenizer.encode_sequence(seq)[: cfg.block_size - 2]
        + [tokenizer.eos_token_id]
    )
    out = multitask_forward(params, cfg, jnp.asarray([ids], jnp.int32))
    attn = np.asarray(out["attention_weights"])[0]
    non_active = [i for i in range(1, len(seq) + 1)
                  if i not in set(active) and i < len(attn)]
    active = [i for i in active if i < len(attn)]

    mean_active = float(attn[active].mean()) if active else float("nan")
    mean_rest = float(attn[non_active].mean()) if non_active else float("nan")
    ratio = mean_active / mean_rest if mean_rest else float("nan")
    order = np.argsort(-attn)
    top = [{"position": int(i) - 1, "residue": seq[int(i) - 1]
            if 0 < int(i) <= len(seq) else "?",
            "weight": float(attn[int(i)])} for i in order[:10]]

    report = {
        "motif_indices": found,
        "mean_active_attention": mean_active,
        "mean_other_attention": mean_rest,
        "contrast_ratio": ratio,
        "status": "SUCCESS" if ratio >= args.threshold else "WEAK",
        "threshold": args.threshold,
        "top_residues": top,
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
