"""Worker for the pod-topology distributed test (spawned by
tests/test_multiprocess.py): N processes × M virtual CPU devices each, global
mesh ``(data=N, pipe=M)`` — the data axis crosses the process boundary (the
DCN analog) while the pipe axis stays inside each process (the ICI analog),
i.e. the layout the flagship PP config describes
(configs/stage2.6_large_12L8H_d512_pp4.yaml). Runs the production PP×DP
group step with ZeRO-1 stage-moment sharding over real process boundaries
and writes metrics + a merged-parameter checksum for the parent to compare
against a single-process run of the same global mesh.

Usage: python pod_worker.py <process_id> <num_processes> <local_devices>
                            <port> <out_json>
(single-process reference: num_processes=1 with local_devices = N×M)
"""

import json
import os
import sys

LOCAL_DEVICES = int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DP = 2
PP = 4


def main() -> int:
    pid, nprocs, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[4], sys.argv[5],
    )

    from genomics_lm_tpu.parallel.mesh import initialize_distributed

    if nprocs > 1:
        initialize_distributed(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=pid,
            strict=True,  # a pod worker must never degrade to single-host
        )
    assert jax.device_count() == DP * PP, jax.devices()
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from genomics_lm_tpu.models import codon_gpt
    from genomics_lm_tpu.models.config import CodonGPTConfig
    from genomics_lm_tpu.parallel.pipeline import (
        make_pipeline_group_step,
        split_stage_params,
        stage_opt_state_sharding,
        stage_param_sharding,
    )

    # Global device list is ordered by process index, so reshape(DP, PP)
    # puts each process's local devices on one 'data' row: crossing 'data'
    # crosses processes, traversing 'pipe' stays on-host.
    grid = np.asarray(jax.devices()).reshape(DP, PP)
    mesh = Mesh(grid, ("data", "pipe"))
    if nprocs > 1:
        for row in range(DP):
            owners = {d.process_index for d in grid[row]}
            assert owners == {row}, (
                f"pipe row {row} spans processes {owners}; expected only {row}"
            )

    cfg = CodonGPTConfig(vocab_size=68, block_size=16, n_layer=PP,
                         n_head=2, n_embd=16, dropout=0.0)
    params = codon_gpt.init(jax.random.key(0), cfg)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    staged = split_stage_params(params, PP)
    param_shardings = stage_param_sharding(mesh, staged)
    opt_shardings = stage_opt_state_sharding(
        mesh, split_stage_params(opt_state, PP), zero1=True)
    params = jax.device_put(staged, param_shardings)
    opt_state = jax.device_put(split_stage_params(opt_state, PP), opt_shardings)

    # ZeRO-1 across the process boundary: block moments must shard over
    # BOTH mesh axes (pipe for the stage dim, data for the first divisible
    # dim), so no process replicates the other process's moment shard.
    moment_leaf = next(
        leaf for leaf in jax.tree.leaves(opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 2
        and "data" in (leaf.sharding.spec or ())
    )
    zero1_spec = tuple(str(s) for s in moment_leaf.sharding.spec)
    assert "pipe" in zero1_spec and "data" in zero1_spec, zero1_spec

    step = make_pipeline_group_step(cfg, tx, mesh, opt_shardings=opt_shardings)

    # deterministic global batch; every process builds the same host copy
    rng = np.random.default_rng(7)
    G, B, T = 2, 8, 16
    batch_sharding = NamedSharding(mesh, P(None, "data", None))

    def to_global(arr):
        if nprocs == 1:
            return jax.device_put(jnp.asarray(arr), batch_sharding)
        local = np.array_split(arr, nprocs, axis=1)[pid]
        return jax.make_array_from_process_local_data(batch_sharding, local)

    losses = []
    metrics = None
    for i in range(3):
        host_batch = {
            "x": rng.integers(4, 68, (G, B, T)).astype(np.int32),
            "y": rng.integers(4, 68, (G, B, T)).astype(np.int32),
        }
        batch = {k: to_global(v) for k, v in host_batch.items()}
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.key(1), jnp.asarray(1.0))
        losses.append(float(metrics["total_loss_sum"]))

    # block params are pipe-sharded (on-host) and data-replicated, so every
    # process can materialize the full model for the checksum
    checksum = float(sum(
        jnp.sum(jnp.abs(leaf)).item() for leaf in jax.tree.leaves(params)))

    record = {
        "process_id": pid,
        "num_processes": jax.process_count(),
        "devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh_shape": {k: int(v) for k, v in mesh.shape.items()},
        "zero1_moment_spec": list(zero1_spec),
        "losses": losses,
        "nonpad_tokens": int(metrics["nonpad_tokens"]),
        "applied": bool(metrics["applied"]),
        "param_checksum": checksum,
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
