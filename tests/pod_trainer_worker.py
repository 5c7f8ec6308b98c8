"""Production-trainer worker for the pod-topology test: each of N processes
owns M virtual CPU devices; ``run_training`` runs over the global
``(data=N, pipe=M)`` mesh — data crossing the process boundary, pipeline
stages inside each process — for one epoch, then RESUMES for a second.
Per-host loader shards are assembled into global batches inside the trainer
(training/loop.py ``put_batch``), so every logged metric is a global value
and each host writes an identical run directory (its own ``run_root``,
modeling per-host local disk).

Usage: python pod_trainer_worker.py <pid> <nprocs> <local_devices> <port>
                                    <workdir> <out_json> [mode]

``mode`` defaults to "epochs" (1 epoch + resume for a 2nd). Mode
"preempt" trains with an unreachable epoch target; the PARENT sends
SIGTERM to process 0 only — the per-group trigger consensus must stop
BOTH processes at the same group boundary with a preemption checkpoint,
after which each worker resumes its own checkpoint to a clean 1-epoch
completion. Mode "dp" builds a PURE data-parallel mesh (data=8 over both
processes' devices, n_dp > n_hosts): each host's loader shard covers 4
device shards, and a ragged final validation batch exercises the
shard-multiple PAD padding.
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
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, workdir, out_path = sys.argv[4], sys.argv[5], sys.argv[6]

    from genomics_lm_tpu.parallel.mesh import initialize_distributed

    if nprocs > 1:
        initialize_distributed(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=pid,
            strict=True,  # a pod worker must never degrade to single-host
        )
    assert jax.device_count() == DP * PP

    import numpy as np
    from jax.sharding import Mesh

    from genomics_lm_tpu.tokenizers.codon import write_itos
    from genomics_lm_tpu.training.loop import run_training

    mode = sys.argv[7] if len(sys.argv) > 7 else "epochs"
    if mode == "dp":
        # PURE data parallelism: all 8 devices on one data axis, so
        # n_dp (8) exceeds n_hosts (2) — each host's loader shard covers
        # 4 device shards of every global batch
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    else:
        grid = np.asarray(jax.devices()).reshape(DP, PP)
        mesh = Mesh(grid, ("data", "pipe"))

    # same fixture on every host (content-addressed by seed)
    ws = os.path.join(workdir, f"shared_{mode}")
    os.makedirs(ws, exist_ok=True)
    rng = np.random.default_rng(11)
    # dp mode: 10 val rows → the second val batch has 2 rows, exercising
    # the equal-host-shard PAD padding to the per-host device multiple
    for name, n in [("train", 32), ("val", 10 if mode == "dp" else 8)]:
        path = os.path.join(ws, f"{name}.npz")
        if pid == 0 and not os.path.exists(path):
            X = rng.integers(4, 68, (n, 16)).astype(np.int32)
            Y = np.roll(X, -1, axis=1)
            Y[:, -1] = 0
            np.savez(path + ".tmp.npz", X=X, Y=Y)
            os.replace(path + ".tmp.npz", path)
        else:
            rng.integers(4, 68, (n, 16))  # keep the stream aligned
            np.roll(np.zeros(1), 0)
    itos = os.path.join(ws, "itos.txt")
    if pid == 0:
        write_itos(itos)
    if nprocs > 1:
        # barrier: wait for process 0 to finish writing the fixture
        import time
        for _ in range(600):
            if all(os.path.exists(os.path.join(ws, f)) for f in
                   ("train.npz", "val.npz", "itos.txt")):
                break
            time.sleep(0.1)

    cfg = dict(
        train_npz=os.path.join(ws, "train.npz"),
        val_npz=os.path.join(ws, "val.npz"),
        block_size=16,
        n_layer=PP,
        n_head=2,
        n_embd=16,
        dropout=0.0,
        batch_size=4,
        grad_accum_steps=2,
        lr=1e-3,
        min_lr=1e-4,
        warmup_steps=2,
        epochs=1,
        seed=1337,
        run_id="pod-run",
        early_stop_patience=0,
        # ZeRO-1: AdamW moments shard over the data axis ACROSS the
        # process boundary (stage-sharded too under PP); checkpoint save
        # gathers them collectively (checkpoints._host_materialize)
        shard_optimizer_state=True,
    )
    if mode == "dp":
        cfg["batch_size"] = 8  # must divide over n_dp=8
    run_root = os.path.join(
        workdir, f"host{pid}_{mode}" if nprocs > 1 else f"single_{mode}")
    last = os.path.join(run_root, "pod-run", "checkpoints", "last.npz")

    if mode == "preempt":
        from genomics_lm_tpu.training.checkpoints import load_checkpoint_meta

        # unreachable target; the parent preempts process 0 mid-training
        meta1 = run_training(dict(cfg, epochs=10000), run_root=run_root,
                             mesh=mesh)
        ckpt_meta = load_checkpoint_meta(last)
        reason = ckpt_meta.get("checkpoint_reason")
        # resume the preempted run to a clean one-more-epoch completion
        # (target derived from the checkpoint — the signal may land after
        # any number of completed epochs)
        target = int(ckpt_meta.get("epoch", 0)) + 1
        meta2 = run_training(dict(cfg, epochs=target), run_root=run_root,
                             mesh=mesh, resume=last)
        record = {
            "process_id": pid,
            "num_processes": jax.process_count(),
            "preempt_status": meta1["status"],
            "preempted_by_signal": meta1.get("preempted_by_signal"),
            "checkpoint_reason": reason,
            "resume_status": meta2["status"],
            "resume_val_loss": meta2["last_val_loss"],
            "curves": open(os.path.join(
                run_root, "pod-run", "scores", "curves.csv")).read(),
        }
        with open(out_path, "w") as fh:
            json.dump(record, fh)
        return 0

    meta1 = run_training(dict(cfg), run_root=run_root, mesh=mesh)

    # resume for one more epoch from this host's own checkpoint
    cfg2 = dict(cfg, epochs=2)
    meta2 = run_training(cfg2, run_root=run_root, mesh=mesh, resume=last)

    curves = open(os.path.join(run_root, "pod-run", "scores", "curves.csv")).read()
    record = {
        "process_id": pid,
        "num_processes": jax.process_count(),
        "mesh_shape": {k: int(v) for k, v in mesh.shape.items()},
        "epoch1": {"status": meta1["status"],
                   "last_val_loss": meta1["last_val_loss"],
                   "last_train_loss": meta1["last_train_loss"]},
        "epoch2": {"status": meta2["status"],
                   "last_val_loss": meta2["last_val_loss"],
                   "last_train_loss": meta2["last_train_loss"],
                   "last_epoch": meta2["last_epoch"]},
        "curves": curves,
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
