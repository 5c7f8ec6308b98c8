"""Biophysics shape encoder: one-hot nucleotides → codon-aligned DNA shape.

Parity: reference ``src/codonlm/biophysics.py`` — a lightweight 1D CNN
(4→32 conv k=5 same-pad, GELU, 32→d_shape conv k=3 stride-3) compressing
(B, 3L, 4) one-hot DNA to (B, L, d_shape) codon-aligned shape features
(MGW/Roll/EP), plus the synthetic training-data generator driven by the
heuristic pentamer shape tables (``scripts/probe_structural_awareness.py``
``get_theoretical_shape``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

BASE_TO_IDX = {"A": 0, "C": 1, "G": 2, "T": 3}


def get_theoretical_shape(dna_seq: str) -> dict[str, list[float]]:
    """Heuristic DNAshape parameters (pentamer-window approximations)."""
    mgw, roll, ep = [], [], []
    for i in range(len(dna_seq)):
        window = dna_seq[max(0, i - 2) : min(len(dna_seq), i + 3)]
        if "AAAA" in window:
            m_val = 3.5
        elif "GGGG" in window or "CCCC" in window:
            m_val = 5.8
        else:
            m_val = 4.5
        if "GC" in window or "CG" in window:
            r_val = 5.0
        elif "AA" in window or "TT" in window:
            r_val = 0.0
        else:
            r_val = 2.5
        if "AAAA" in window:
            e_val = -10.0
        elif "GGCC" in window:
            e_val = -2.0
        else:
            e_val = -5.0
        mgw.append(m_val)
        roll.append(r_val)
        ep.append(e_val)
    return {"MGW": mgw, "Roll": roll, "EP": ep}


def init_encoder(rng: jax.Array, d_shape: int = 3) -> dict:
    """Conv weights (torch-default uniform init)."""
    k1, k2 = jax.random.split(rng)
    # conv1: (out=32, in=4, k=5); conv2: (out=d_shape, in=32, k=3)
    b1 = 1.0 / math.sqrt(4 * 5)
    b2 = 1.0 / math.sqrt(32 * 3)
    return {
        "conv1": {
            "w": jax.random.uniform(k1, (32, 4, 5), jnp.float32, -b1, b1),
            "b": jnp.zeros((32,), jnp.float32),
        },
        "conv2": {
            "w": jax.random.uniform(k2, (d_shape, 32, 3), jnp.float32, -b2, b2),
            "b": jnp.zeros((d_shape,), jnp.float32),
        },
    }


def encode(params: dict, one_hot: jnp.ndarray) -> jnp.ndarray:
    """(B, 3L, 4) one-hot nucleotides → (B, L, d_shape) codon shapes."""
    x = one_hot.transpose(0, 2, 1)  # (B, 4, 3L) — channels-first conv
    x = jax.lax.conv_general_dilated(
        x, params["conv1"]["w"], window_strides=(1,), padding=((2, 2),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv1"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, params["conv2"]["w"], window_strides=(3,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv2"]["b"][None, :, None]
    return x.transpose(0, 2, 1)  # (B, L, d_shape)


def one_hot_dna(seq: str) -> np.ndarray:
    out = np.zeros((len(seq), 4), np.float32)
    for i, base in enumerate(seq.upper()):
        idx = BASE_TO_IDX.get(base)
        if idx is not None:
            out[i, idx] = 1.0
    return out


def generate_shape_training_data(
    num_samples: int = 5000, seq_len_codons: int = 50, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Random DNA + codon-averaged theoretical shape targets (ref parity)."""
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    seq_len_nt = 3 * seq_len_codons
    one_hots, targets = [], []
    for _ in range(num_samples):
        seq = "".join(rng.choice(bases, seq_len_nt))
        one_hots.append(one_hot_dna(seq))
        shapes = get_theoretical_shape(seq)
        nt_shapes = np.stack(
            [shapes["MGW"], shapes["Roll"], shapes["EP"]], axis=-1
        ).astype(np.float32)
        targets.append(nt_shapes.reshape(seq_len_codons, 3, 3).mean(axis=1))
    return np.stack(one_hots), np.stack(targets)


def train_encoder(
    *, num_samples: int = 2000, seq_len_codons: int = 32, epochs: int = 5,
    batch_size: int = 64, lr: float = 1e-3, seed: int = 0,
) -> tuple[dict, list[float]]:
    """Fit the encoder to the synthetic shape targets (MSE, AdamW)."""
    import optax

    X, Y = generate_shape_training_data(num_samples, seq_len_codons, seed)
    params = init_encoder(jax.random.PRNGKey(seed))
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            return jnp.mean((encode(p, xb) - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for _ in range(epochs):
        order = rng.permutation(len(X))
        epoch_sum, n = 0.0, 0
        for start in range(0, len(order), batch_size):
            rows = order[start : start + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(X[rows]), jnp.asarray(Y[rows])
            )
            epoch_sum += float(loss)
            n += 1
        losses.append(epoch_sum / max(n, 1))
    return params, losses


def shape_lookup_table() -> np.ndarray:
    """(vocab, 3, 4) one-hot LUT: token id → its 3 nucleotide one-hots.

    Used by the shape-guided trainer to turn token batches into encoder
    input without host round-trips (ref ``loop.py`` lookup_table path).
    """
    from genomics_lm_tpu.tokenizers.codon import CODONS, CODON_BASE_ID, VOCAB

    table = np.zeros((len(VOCAB), 3, 4), np.float32)
    for i, codon in enumerate(CODONS):
        for pos, base in enumerate(codon):
            table[CODON_BASE_ID + i, pos, BASE_TO_IDX[base]] = 1.0
    return table


__all__ = [
    "encode",
    "generate_shape_training_data",
    "get_theoretical_shape",
    "init_encoder",
    "one_hot_dna",
    "shape_lookup_table",
    "train_encoder",
]
