"""Multi-process distributed bring-up, actually brought up (SURVEY §4
"multi-node without a cluster"): two real OS processes join through a
loopback coordinator (gloo collectives on CPU), form a 2-device global
mesh, and run one data-parallel train step over a globally-sharded batch.
Plus mesh-size-change resume: optimizer state saved under an 8-device
ZeRO-1 sharding restores onto a 4-device mesh with identical next-step
metrics vs an unsharded run.

TestPodTopology exercises the real pod shape: 2 processes × 4 virtual
devices each under a global (data=2, pipe=4) mesh — data crossing the
process boundary, pipe inside each process — for both the raw PP×DP
group step (with ZeRO-1 moments sharded across the boundary) and a full
production-trainer epoch + resume.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy cross-framework / multi-process suite

REPO = Path(__file__).resolve().parent.parent


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestBringUpFailure:
    """A misconfigured coordinator must never silently degrade to
    single-host (VERDICT r4 weak #5): strict=True raises, default warns
    loudly and returns False."""

    # a process_id outside num_processes is the config-error class that
    # jax.distributed.initialize raises (ValueError) — the class the old
    # bare `except: pass` swallowed. Transport-level failures (dead
    # coordinator) abort the process via the coordination service's own
    # fatal handler, which is already loud.
    SCRIPT = (
        "import logging, sys\n"
        "logging.basicConfig(level=logging.WARNING)\n"
        "from genomics_lm_tpu.parallel.mesh import initialize_distributed\n"
        "ok = initialize_distributed(\n"
        "    coordinator_address='127.0.0.1:{port}', num_processes=2,\n"
        "    process_id=7, strict={strict}, initialization_timeout=2)\n"
        "print('RESULT', ok)\n"
    )

    def _run(self, *, strict: bool):
        return subprocess.run(
            [sys.executable, "-c",
             self.SCRIPT.format(port=free_port(), strict=strict)],
            capture_output=True, text=True, timeout=240,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)},
        )

    def test_strict_raises_on_bad_coordinator(self):
        proc = self._run(strict=True)
        assert proc.returncode != 0
        assert "distributed bring-up failed" in proc.stderr

    def test_default_warns_and_degrades(self):
        proc = self._run(strict=False)
        assert proc.returncode == 0, proc.stderr[-1500:]
        assert "RESULT False" in proc.stdout
        assert "bring-up FAILED" in proc.stderr  # the loud warning


class TestTwoProcessDistributed:
    def test_dp_step_across_processes(self, tmp_path):
        port = free_port()
        nprocs = 2
        outs = [tmp_path / f"worker{i}.json" for i in range(nprocs)]
        procs = [
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multiprocess_worker.py"),
                 str(i), str(nprocs), str(port), str(outs[i])],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                     "PYTHONPATH": str(REPO)},
            )
            for i in range(nprocs)
        ]
        for p in procs:
            try:
                _, err = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multi-process workers timed out")
            assert p.returncode == 0, err[-2000:]

        records = [json.loads(o.read_text()) for o in outs]
        for r in records:
            assert r["num_processes"] == nprocs
            assert r["devices"] == nprocs
            assert r["applied"] is True
        # both processes computed the same global step
        assert records[0]["total_loss_sum"] == records[1]["total_loss_sum"]
        assert records[0]["param_checksum"] == records[1]["param_checksum"]
        assert records[0]["nonpad_tokens"] == records[1]["nonpad_tokens"]

        # cross-check against a single-process run of the same global batch
        single = subprocess.run(
            [sys.executable, str(REPO / "tests" / "multiprocess_worker.py"),
             "0", "1", str(free_port()), str(tmp_path / "single.json")],
            capture_output=True, text=True, timeout=300,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "PYTHONPATH": str(REPO)},
        )
        assert single.returncode == 0, single.stderr[-2000:]
        ref = json.loads((tmp_path / "single.json").read_text())
        np.testing.assert_allclose(
            records[0]["total_loss_sum"], ref["total_loss_sum"], rtol=1e-5
        )
        np.testing.assert_allclose(
            records[0]["param_checksum"], ref["param_checksum"], rtol=1e-5
        )


class TestPodTopology:
    """N procs × M devices each (VERDICT r3 directive 7): the global mesh is
    (data=2, pipe=4) — the data axis crosses the process boundary (DCN
    analog), pipeline stages stay inside each process (ICI analog) — i.e.
    the layout the flagship PP config describes
    (configs/stage2.6_large_12L8H_d512_pp4.yaml)."""

    ENV = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "PYTHONPATH": str(REPO)}

    def _spawn(self, script, extra, outs, port, nprocs=2, local=4,
               timeout=420):
        procs = [
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / script),
                 str(i), str(nprocs), str(local), str(port),
                 *extra, str(outs[i])],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=self.ENV,
            )
            for i in range(nprocs)
        ]
        for p in procs:
            try:
                _, err = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail(f"{script} workers timed out")
            assert p.returncode == 0, err[-3000:]
        return [json.loads(o.read_text()) for o in outs]

    def test_pp_dp_step_parity_across_processes(self, tmp_path):
        outs = [tmp_path / f"w{i}.json" for i in range(2)]
        records = self._spawn("pod_worker.py", [], outs, free_port())
        for r in records:
            assert r["mesh_shape"] == {"data": 2, "pipe": 4}
            assert r["local_devices"] == 4 and r["devices"] == 8
            assert r["applied"] is True
            # ZeRO-1 moments shard over BOTH axes across the process boundary
            assert "pipe" in r["zero1_moment_spec"]
            assert "data" in r["zero1_moment_spec"]
        assert records[0]["losses"] == records[1]["losses"]
        np.testing.assert_allclose(
            records[0]["param_checksum"], records[1]["param_checksum"],
            rtol=1e-6,
        )

        # parity vs ONE process owning the same 8-device global mesh
        single_out = tmp_path / "single.json"
        single = subprocess.run(
            [sys.executable, str(REPO / "tests" / "pod_worker.py"),
             "0", "1", "8", str(free_port()), str(single_out)],
            capture_output=True, text=True, timeout=420, env=self.ENV,
        )
        assert single.returncode == 0, single.stderr[-3000:]
        ref = json.loads(single_out.read_text())
        np.testing.assert_allclose(records[0]["losses"], ref["losses"],
                                   rtol=1e-5)
        np.testing.assert_allclose(
            records[0]["param_checksum"], ref["param_checksum"], rtol=1e-5
        )

    def test_production_trainer_epoch_and_resume(self, tmp_path):
        outs = [tmp_path / f"t{i}.json" for i in range(2)]
        records = self._spawn(
            "pod_trainer_worker.py", [str(tmp_path)], outs, free_port(),
            timeout=600,
        )
        for r in records:
            assert r["mesh_shape"] == {"data": 2, "pipe": 4}
            assert r["epoch1"]["status"] == "completed"
            assert r["epoch2"]["status"] == "completed"
            assert r["epoch2"]["last_epoch"] == 2
        # every host logs the same global metrics and writes identical curves
        assert records[0]["curves"] == records[1]["curves"]
        assert records[0]["epoch2"] == records[1]["epoch2"]

        # and the whole 2-process run matches ONE process on the same mesh
        single_out = tmp_path / "tsingle.json"
        single = subprocess.run(
            [sys.executable, str(REPO / "tests" / "pod_trainer_worker.py"),
             "0", "1", "8", str(free_port()), str(tmp_path / "sgl"),
             str(single_out)],
            capture_output=True, text=True, timeout=600, env=self.ENV,
        )
        assert single.returncode == 0, single.stderr[-3000:]
        ref = json.loads(single_out.read_text())
        assert records[0]["curves"] == ref["curves"]
        np.testing.assert_allclose(
            records[0]["epoch2"]["last_val_loss"],
            ref["epoch2"]["last_val_loss"], rtol=1e-6,
        )
        np.testing.assert_allclose(
            records[0]["epoch2"]["last_train_loss"],
            ref["epoch2"]["last_train_loss"], rtol=1e-6,
        )


class TestPureDataParallelPod:
    """Pure-DP pod: data=8 over 2 processes × 4 devices (n_dp > n_hosts) —
    each host's loader shard covers 4 device shards per global batch, the
    10-row val set leaves a ragged 2-row final batch (exercising the
    shard-multiple PAD padding), and ZeRO-1 moments shard across the
    process boundary on the data axis alone."""

    ENV = {"PATH": "/usr/bin:/bin", "HOME": "/root", "PYTHONPATH": str(REPO)}

    def _run(self, args, out, timeout=600):
        res = subprocess.run(
            [sys.executable, str(REPO / "tests" / "pod_trainer_worker.py"),
             *args, str(out), "dp"],
            capture_output=True, text=True, timeout=timeout, env=self.ENV)
        assert res.returncode == 0, res.stderr[-3000:]
        return json.loads(out.read_text())

    def test_trainer_epoch_and_resume_dp8(self, tmp_path):
        port = free_port()
        outs = [tmp_path / f"d{i}.json" for i in range(2)]
        procs = [
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "pod_trainer_worker.py"),
                 str(i), "2", "4", str(port), str(tmp_path), str(outs[i]),
                 "dp"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=self.ENV,
            )
            for i in range(2)
        ]
        for p in procs:
            try:
                _, err = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("dp-pod workers timed out")
            assert p.returncode == 0, err[-3000:]
        records = [json.loads(o.read_text()) for o in outs]
        for r in records:
            assert r["mesh_shape"] == {"data": 8}
            assert r["epoch1"]["status"] == "completed"
            assert r["epoch2"]["status"] == "completed"
        assert records[0]["curves"] == records[1]["curves"]

        # vs one process owning the same 8-device data mesh: the host
        # split permutes rows across shards, so reductions reassociate —
        # numerically equal curves, not byte-identical ones
        ref = self._run(["0", "1", "8", str(free_port()), str(tmp_path)],
                        tmp_path / "dsingle.json")

        def rows(curves):
            lines = [ln for ln in curves.splitlines() if ln.strip()]
            return np.array([
                [float(v) for v in ln.split(",")] for ln in lines[1:]
            ])

        np.testing.assert_allclose(rows(records[0]["curves"]),
                                   rows(ref["curves"]), rtol=1e-4)


class TestPodPreemption:
    """SIGTERM lands on ONE process of a 2-process pod; the per-group
    trigger consensus (training/loop.py) must stop BOTH processes at the
    same group boundary with a preemption checkpoint — per-host-asymmetric
    stops would deadlock the pod's collectives. Both hosts then resume
    their own checkpoint to identical clean completions."""

    def test_sigterm_on_one_host_stops_both_and_resumes(self, tmp_path):
        import os
        import threading
        import time

        env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
               "PYTHONPATH": str(REPO), "PYTHONUNBUFFERED": "1"}
        port = free_port()
        outs = [tmp_path / f"p{i}.json" for i in range(2)]
        procs = [
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "pod_trainer_worker.py"),
                 str(i), "2", "4", str(port), str(tmp_path), str(outs[i]),
                 "preempt"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )
            for i in range(2)
        ]

        # watch process 0's stdout (this thread OWNS that stream — the
        # join below, not communicate(), drains it); signal shortly after
        # training starts
        started = threading.Event()
        captured = []

        def watch():
            for line in procs[0].stdout:
                captured.append(line)
                if "[train] starting:" in line:
                    started.set()

        watcher = threading.Thread(target=watch, daemon=True)
        watcher.start()
        try:
            if not started.wait(timeout=240):
                pytest.fail(
                    "trainer never started: " + "".join(captured)[-2000:])
            time.sleep(3.0)  # let the first group(s) compile/commit
            os.kill(procs[0].pid, __import__("signal").SIGTERM)

            try:
                procs[0].wait(timeout=420)
                _, err1 = procs[1].communicate(timeout=420)
            except subprocess.TimeoutExpired:
                pytest.fail("pod did not stop after single-host SIGTERM "
                            "(trigger consensus failed)")
            watcher.join(timeout=30)
            err0 = procs[0].stderr.read()
            assert procs[0].returncode == 0, err0[-3000:]
            assert procs[1].returncode == 0, err1[-3000:]
        finally:
            for q in procs:
                if q.poll() is None:
                    q.kill()

        records = [json.loads(o.read_text()) for o in outs]
        for r in records:
            assert r["preempt_status"] == "stopped"
            assert r["checkpoint_reason"] == "preempted"
            assert r["resume_status"] == "completed"
        # only host 0 received the signal; host 1 stopped via consensus
        assert records[0]["preempted_by_signal"] is not None
        assert records[1]["preempted_by_signal"] is None
        # both resumed to identical global metrics and curves
        assert records[0]["curves"] == records[1]["curves"]
        np.testing.assert_allclose(
            records[0]["resume_val_loss"], records[1]["resume_val_loss"],
            rtol=0,
        )


class TestMeshSizeChangeResume:
    def _run_steps(self, mesh, params, opt_state, step, batches, key):
        import jax
        import jax.numpy as jnp

        from genomics_lm_tpu.parallel.sharding import (
            batch_sharding,
            replicated,
            zero1_opt_state_sharding,
        )

        rep = replicated(mesh)
        bs = batch_sharding(mesh, batch_axis_index=1)
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(
            opt_state, zero1_opt_state_sharding(opt_state, mesh)
        )
        metrics = None
        for batch in batches:
            sharded = {k: jax.device_put(jnp.asarray(v), bs) for k, v in batch.items()}
            params, opt_state, metrics = step(
                params, opt_state, sharded, key, jnp.asarray(1.0)
            )
        return params, opt_state, metrics

    def test_zero1_state_restores_across_mesh_sizes(self):
        import jax
        import jax.numpy as jnp
        import optax
        from jax.sharding import Mesh

        from genomics_lm_tpu.models import codon_gpt
        from genomics_lm_tpu.models.config import CodonGPTConfig
        from genomics_lm_tpu.parallel.mesh import make_mesh
        from genomics_lm_tpu.training.train_step import LossConfig, make_train_step

        assert jax.device_count() >= 8

        cfg = CodonGPTConfig(vocab_size=68, block_size=16, n_layer=1,
                             n_head=2, n_embd=16, dropout=0.0)
        params0 = codon_gpt.init(jax.random.key(0), cfg)
        tx = optax.adamw(1e-3)
        step = make_train_step(cfg, LossConfig(), tx)
        key = jax.random.key(1)

        rng = np.random.default_rng(3)
        mk = lambda: {  # noqa: E731
            "x": rng.integers(4, 68, (1, 8, 16)).astype(np.int32),
            "y": rng.integers(4, 68, (1, 8, 16)).astype(np.int32),
        }
        warm = [mk() for _ in range(2)]
        probe = [mk()]

        # phase 1: warm up under the 8-device mesh with ZeRO-1 moments
        mesh8 = make_mesh()
        p8, o8, _ = self._run_steps(mesh8, params0, tx.init(params0), step,
                                    warm, key)

        # "save": host-materialize the sharded state (what checkpoints store)
        saved_params = jax.tree.map(np.asarray, p8)
        saved_opt = jax.tree.map(np.asarray, o8)

        # phase 2a: restore onto a 4-device mesh and take the probe step
        mesh4 = Mesh(np.asarray(jax.devices()[:4]), ("data",))
        _, _, m4 = self._run_steps(
            mesh4,
            jax.tree.map(jnp.asarray, saved_params),
            jax.tree.map(jnp.asarray, saved_opt),
            step, probe, key,
        )

        # phase 2b: same restore, no mesh at all (single device)
        p1 = jax.tree.map(jnp.asarray, saved_params)
        o1 = jax.tree.map(jnp.asarray, saved_opt)
        batch1 = {k: jnp.asarray(v) for k, v in probe[0].items()}
        _, _, m1 = step(p1, o1, batch1, key, jnp.asarray(1.0))

        np.testing.assert_allclose(
            float(m4["total_loss_sum"]), float(m1["total_loss_sum"]), rtol=1e-5
        )
        assert int(m4["nonpad_tokens"]) == int(m1["nonpad_tokens"])
        assert bool(m4["applied"]) and bool(m1["applied"])
