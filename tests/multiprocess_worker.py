"""Worker for the 2-process jax.distributed CPU test (spawned by
tests/test_multiprocess.py). Each process owns one CPU device; together they
form a 2-device global mesh running one data-parallel train step over a
globally-sharded batch. The resulting metrics and a parameter checksum are
written as JSON for the parent test to compare across processes and against
a single-process reference run.

Usage: python multiprocess_worker.py <process_id> <num_processes> <port> <out_json>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # one device per process, no virtual mesh

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid, nprocs, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )

    from genomics_lm_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
        strict=True,  # a pod worker must never degrade to single-host
    )
    assert jax.device_count() == nprocs, jax.devices()
    assert jax.process_count() == nprocs

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genomics_lm_tpu.models import codon_gpt
    from genomics_lm_tpu.models.config import CodonGPTConfig
    from genomics_lm_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from genomics_lm_tpu.parallel.sharding import replicated
    from genomics_lm_tpu.training.train_step import LossConfig, make_train_step

    cfg = CodonGPTConfig(
        vocab_size=68, block_size=16, n_layer=1, n_head=2, n_embd=16,
        dropout=0.0,
    )
    params = codon_gpt.init(jax.random.key(0), cfg)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(cfg, LossConfig(), tx)

    # deterministic global batch; every process builds the same one
    rng = np.random.default_rng(7)
    G, B, T = 1, 8, 16
    host_batch = {
        "x": rng.integers(4, 68, (G, B, T)).astype(np.int32),
        "y": rng.integers(4, 68, (G, B, T)).astype(np.int32),
    }

    mesh = make_mesh()
    rep = replicated(mesh)
    batch_sharding = NamedSharding(mesh, P(None, DATA_AXIS))

    # build the global sharded batch from per-process local shards
    def to_global(arr):
        local = np.array_split(arr, nprocs, axis=1)[pid]
        return jax.make_array_from_process_local_data(batch_sharding, local)

    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    batch = {k: to_global(v) for k, v in host_batch.items()}

    new_params, _, metrics = step(
        params, opt_state, batch, jax.random.key(1), jnp.asarray(1.0)
    )

    # parameter checksum must agree bit-for-bit across processes
    checksum = float(
        sum(jnp.sum(jnp.abs(leaf)).item() for leaf in jax.tree.leaves(new_params))
    )
    record = {
        "process_id": pid,
        "num_processes": jax.process_count(),
        "devices": jax.device_count(),
        "total_loss_sum": float(metrics["total_loss_sum"]),
        "nonpad_tokens": int(metrics["nonpad_tokens"]),
        "applied": bool(metrics["applied"]),
        "param_checksum": checksum,
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
