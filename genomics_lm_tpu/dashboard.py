"""Dashboard data layer: headlessly-testable page functions.

Parity: reference ``scripts/web_dashboard.py`` (Streamlit UI: run browser,
live curves, model playground, attention heatmaps, embeddings/saliency
tabs). Following the reference's own test strategy — dashboard pages tested
as plain functions (``tests/test_dashboard_*.py``) — all data assembly lives
here with no UI dependency; ``scripts/web_dashboard.py`` renders these
payloads with Streamlit when it is installed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from genomics_lm_tpu.evals.aggregator import load_all_runs, load_run, summary_rows


def run_browser_data(runs_root: str | Path = "runs") -> dict:
    """Run table + per-run summary for the browser page."""
    runs = load_all_runs(runs_root)
    return {"runs": runs, "table": summary_rows(runs)}


def run_details_data(run_dir: str | Path) -> dict:
    """Curves, meta, checkpoints, and artifacts for one run."""
    run = load_run(run_dir)
    curves = run.get("curves") or []
    series = {}
    if curves:
        for key in curves[0]:
            try:
                series[key] = [float(r[key]) for r in curves]
            except (TypeError, ValueError):
                continue
    return {"run": run, "series": series}


def playground_next_codon(run_dir: str | Path, dna: str, top_k: int = 10) -> dict:
    """Next-codon distribution for the playground tab."""
    from genomics_lm_tpu.evals.playground import (
        dna_to_context_ids,
        make_decoder,
        query_next_codon,
    )

    decoder, itos, stoi = make_decoder(run_dir)
    ids = dna_to_context_ids(dna, stoi)
    return {
        "prompt": dna,
        "context_tokens": [itos[i] for i in ids],
        "next": query_next_codon(decoder, ids, itos, top_k=top_k),
    }


def playground_generate(run_dir: str | Path, dna: str, *, target_codons: int = 16,
                        hard_cap: int = 48, seed: int = 0) -> dict:
    """Constrained generation (with ReD log) for the playground tab."""
    from genomics_lm_tpu.evals.playground import dna_to_context_ids, make_decoder
    from genomics_lm_tpu.generation import constrained as gen

    decoder, itos, stoi = make_decoder(run_dir)
    ids = dna_to_context_ids(dna, stoi)
    out_ids, info = gen.generate_cds_red(
        decoder, ids, stoi, itos, target_codons=target_codons,
        hard_cap=hard_cap, rng=np.random.default_rng(seed),
    )
    dna_out = "".join(itos[t] for t in out_ids if len(itos[t]) == 3 and "<" not in itos[t])
    return {"dna": dna_out, "ids": out_ids, "info": info}


def attention_data(run_dir: str | Path, dna: str, layer: int = -1) -> dict:
    """Per-head attention maps for a prompt (attention tab)."""
    import jax.numpy as jnp

    from genomics_lm_tpu.evals.playground import dna_to_context_ids, load_codon_model
    from genomics_lm_tpu.models import codon_gpt

    params, cfg, itos, stoi = load_codon_model(run_dir)
    ids = dna_to_context_ids(dna, stoi)
    maps = codon_gpt.attention_maps(
        params, cfg.replace(dropout=0.0), jnp.asarray([ids], jnp.int32)
    )
    attn = np.asarray(maps[layer][0])  # (H, T, T)
    return {
        "tokens": [itos[i] for i in ids],
        "n_layers": len(maps),
        "attention": attn,
    }


def embeddings_data(run_dir: str | Path, sequences: list[str]) -> dict:
    """Pooled embeddings + 2-D PCA coordinates (embeddings tab)."""
    from genomics_lm_tpu.evals.embeddings import extract_embeddings, ids_from_dna
    from genomics_lm_tpu.evals.playground import load_codon_model

    params, cfg, _, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)
    rows = np.stack([ids_from_dna(s, cfg.block_size) for s in sequences])
    X = extract_embeddings(params, cfg, rows)
    coords = None
    if len(sequences) >= 2:
        from sklearn.decomposition import PCA

        coords = PCA(n_components=min(2, X.shape[1])).fit_transform(
            np.asarray(X, np.float64)
        )
    return {"embeddings": X, "pca": coords}


def saliency_data(run_dir: str | Path, dna: str) -> dict:
    """Input-embedding gradient saliency per context position (saliency tab)."""
    import jax
    import jax.numpy as jnp

    from genomics_lm_tpu.evals.playground import dna_to_context_ids, load_codon_model
    from genomics_lm_tpu.models import codon_gpt

    params, cfg, itos, stoi = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)
    ids = dna_to_context_ids(dna, stoi)
    idx = jnp.asarray([ids], jnp.int32)

    def target_logprob(emb_override):
        # forward with substituted input embeddings; saliency of the
        # last-position top prediction w.r.t. each context embedding
        hidden = emb_override
        from genomics_lm_tpu.models.codon_gpt import _layer_norm, _run_blocks, _lm_logits
        from genomics_lm_tpu.ops.masks import segment_ids_from_tokens

        seg = segment_ids_from_tokens(idx, cfg.sep_id) if cfg.sep_id is not None else None
        h, _ = _run_blocks(params, cfg, hidden, segment_ids=seg,
                           attention_window=None, train=False, rng=None)
        logits = _lm_logits(params, cfg, _layer_norm(params["ln_f"], h))
        last = logits[0, -1]
        return last[jnp.argmax(last)]

    emb = params["tok_emb"][idx]
    if not cfg.use_rope:
        emb = emb + params["pos_emb"][: idx.shape[1]][None]
    grads = jax.grad(target_logprob)(emb)
    saliency = np.asarray(jnp.linalg.norm(grads[0], axis=-1))
    return {"tokens": [itos[i] for i in ids], "saliency": saliency}


def shape_profile_data(dna: str) -> dict:
    """Per-base heuristic DNAshape profile for the playground tab.

    Parity: reference ``scripts/web_dashboard.py:15-50``
    (``get_theoretical_shape`` pentamer heuristics: minor groove width,
    roll/bendability, electrostatic potential)."""
    from genomics_lm_tpu.models.biophysics import get_theoretical_shape

    seq = dna.strip().upper()
    profile = get_theoretical_shape(seq)
    return {
        "positions": list(range(len(seq))),
        "bases": list(seq),
        **profile,
    }


def shape_comparison_data(wild_type: str, variant: str) -> dict:
    """Aligned WT-vs-variant DNAshape profiles (synonymous-shift explorer).

    Parity: the reference playground's "3D DNAshape Physical Profile
    Comparison" (``web_dashboard.py:899-915``) — per-parameter paired series
    plus the mean absolute per-base deltas."""
    wt = shape_profile_data(wild_type)
    var = shape_profile_data(variant)
    n = min(len(wt["bases"]), len(var["bases"]))
    deltas = {}
    for param in ("MGW", "Roll", "EP"):
        a = np.asarray(wt[param][:n])
        b = np.asarray(var[param][:n])
        deltas[f"mean_abs_delta_{param}"] = float(np.abs(a - b).mean()) if n else 0.0
    gc = lambda s: (s.count("G") + s.count("C")) / len(s) if s else 0.0  # noqa: E731
    return {
        "wild_type": wt,
        "variant": var,
        "aligned_length": n,
        "gc_wild_type": gc("".join(wt["bases"])),
        "gc_variant": gc("".join(var["bases"])),
        **deltas,
    }


__all__ = [
    "attention_data",
    "embeddings_data",
    "playground_generate",
    "playground_next_codon",
    "run_browser_data",
    "run_details_data",
    "saliency_data",
    "shape_comparison_data",
    "shape_profile_data",
]
