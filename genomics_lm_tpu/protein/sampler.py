"""Latent Langevin dynamics sampler for EBM-guided protein design.

Parity: reference ``src/protein_lm/sampler.py`` — continuous optimization in
the critic's token-embedding space:

    z ← z − lr·∇_z[E(latent(z)) + λ·softmin-distance(z, AA embeddings)] + ε

followed by projection of each residue position to the nearest amino-acid
embedding. The gradient is ``jax.grad`` through the frozen critic backbone +
EBM (the reference uses ``torch.autograd.grad``); the whole step is jitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.models.protein import (
    ProteinClassifierConfig,
    ebm_energy,
    extract_latent,
)


def latent_langevin_sample(
    ebm_params: dict,
    critic_params: dict,
    critic_cfg: ProteinClassifierConfig,
    tokenizer,
    initial_seq: str,
    *,
    steps: int = 50,
    lr: float = 0.05,
    noise_std: float = 0.01,
    lambda_reg: float = 0.0,
    temperature_reg: float = 1.0,
    normalize_grad: bool = False,
    seed: int = 0,
) -> tuple[str, list[float]]:
    """Optimize ``initial_seq`` in latent space; returns (sequence, energies)."""
    tokens = (
        [tokenizer.bos_token_id]
        + tokenizer.encode_sequence(initial_seq)
        + [tokenizer.eos_token_id]
    )
    ids = jnp.asarray([tokens], jnp.int32)
    emb_matrix = critic_params["backbone"]["token_embedding"]
    z = emb_matrix[ids[0]][None, :, :]  # (1, T, D)
    aa_indices = jnp.asarray(
        [tokenizer.token_to_id[aa] for aa in tokenizer.amino_acids], jnp.int32
    )
    aa_embeds = emb_matrix[aa_indices]  # (V_aa, D)

    def loss_fn(z):
        latent = extract_latent(critic_params, critic_cfg, ids, inputs_embeds=z)
        energy = ebm_energy(ebm_params, latent)
        loss = jnp.sum(energy)
        if lambda_reg > 0.0:
            z_valid = z[:, 1:-1]
            z_sq = jnp.sum(z_valid**2, axis=-1, keepdims=True)
            aa_sq = jnp.sum(aa_embeds**2, axis=-1)[None, None, :]
            dots = z_valid @ aa_embeds.T
            dists_sq = z_sq + aa_sq - 2.0 * dots
            soft_min = -temperature_reg * jax.scipy.special.logsumexp(
                -dists_sq / temperature_reg, axis=-1
            )
            loss = loss + lambda_reg * jnp.mean(soft_min)
        return loss, energy

    @jax.jit
    def langevin_step(z, key):
        (_, energy), grad = jax.value_and_grad(loss_fn, has_aux=True)(z)
        if normalize_grad:
            grad = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-8)
        noise = noise_std * jax.random.normal(key, z.shape)
        return z - lr * grad - noise, energy

    key = jax.random.PRNGKey(seed)
    energy_history: list[float] = []
    for _ in range(int(steps)):
        key, sub = jax.random.split(key)
        z, energy = langevin_step(z, sub)
        energy_history.append(float(energy[0]))

    # project interior positions to nearest amino-acid embedding
    z_np = np.asarray(z[0])
    aa_np = np.asarray(aa_embeds)
    optimized = []
    for pos in range(1, z_np.shape[0] - 1):
        dists = np.linalg.norm(aa_np - z_np[pos], axis=1)
        optimized.append(int(aa_indices[int(np.argmin(dists))]))
    return tokenizer.decode_sequence(optimized), energy_history


__all__ = ["latent_langevin_sample"]
