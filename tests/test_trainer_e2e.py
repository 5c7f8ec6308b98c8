"""End-to-end trainer tests on synthetic fixtures (reference §4 pattern).

Mirrors the reference's subprocess-E2E strategy in-process: tiny NPZ packs +
itos fabricated into tmp_path, full ``run_training`` runs, asserting
checkpoint files, meta status, resume behavior, and failure safeguards.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from genomics_lm_tpu.tokenizers.codon import write_itos
from genomics_lm_tpu.training.lifecycle import RunLifecycleError
from genomics_lm_tpu.training.loop import NonfiniteGroupLimitError, run_training
from genomics_lm_tpu.training import checkpoints as ckpt_lib


def make_fixture(tmp_path, n_train=32, n_val=8, block=16, dynamic=False):
    rng = np.random.default_rng(0)
    for name, n in [("train", n_train), ("val", n_val)]:
        if dynamic:
            lengths = rng.integers(4, block + 1, n).astype(np.int32)
            X = rng.integers(4, 68, int(lengths.sum())).astype(np.int32)
            np.savez(tmp_path / f"{name}.npz", X=X, lengths=lengths)
        else:
            X = rng.integers(4, 68, (n, block)).astype(np.int32)
            Y = np.roll(X, -1, axis=1)
            Y[:, -1] = 0
            np.savez(tmp_path / f"{name}.npz", X=X, Y=Y)
    write_itos(tmp_path / "itos.txt")


def base_cfg(tmp_path, **kw):
    cfg = dict(
        train_npz=str(tmp_path / "train.npz"),
        val_npz=str(tmp_path / "val.npz"),
        block_size=16,
        n_layer=1,
        n_head=2,
        n_embd=16,
        dropout=0.0,
        batch_size=8,
        grad_accum_steps=2,
        lr=1e-3,
        min_lr=1e-4,
        warmup_steps=2,
        epochs=2,
        seed=1337,
        run_id="t-run",
        early_stop_patience=0,
    )
    cfg.update(kw)
    return cfg


class TestEndToEnd:
    def test_train_completes_with_artifacts(self, tmp_path):
        make_fixture(tmp_path)
        meta = run_training(base_cfg(tmp_path), run_root=str(tmp_path / "runs"))
        assert meta["status"] == "completed"
        run_dir = tmp_path / "runs" / "t-run"
        for f in (
            "checkpoints/last.npz", "checkpoints/best.npz", "checkpoints/meta.json",
            "scores/curves.csv", "scores/metrics.json", "itos.txt",
            "vocabulary.json", "run_complete.json",
        ):
            assert (run_dir / f).exists(), f
        curves = (run_dir / "scores" / "curves.csv").read_text().strip().splitlines()
        assert len(curves) == 3  # header + 2 epochs
        payload = ckpt_lib.load_checkpoint(run_dir / "checkpoints" / "last.npz")
        assert payload["run_progress"]["completed_epochs"] == 2
        # 32 windows / batch 8 = 4 microbatches/epoch; gacc 2 → 2 steps/epoch
        assert payload["step"] == 4
        meta_json = json.loads((run_dir / "checkpoints" / "meta.json").read_text())
        assert meta_json["status"] == "completed"

    def test_dynamic_dataset_trains(self, tmp_path):
        make_fixture(tmp_path, dynamic=True)
        meta = run_training(
            base_cfg(tmp_path, run_id="dyn-run", bucket_batching=True),
            run_root=str(tmp_path / "runs"),
        )
        assert meta["status"] == "completed"

    def test_resume_continues(self, tmp_path):
        make_fixture(tmp_path)
        run_training(base_cfg(tmp_path), run_root=str(tmp_path / "runs"))
        last = tmp_path / "runs" / "t-run" / "checkpoints" / "last.npz"
        # completed run: resuming with a higher epoch target continues
        meta = run_training(
            base_cfg(tmp_path, epochs=3),
            resume=str(last),
            run_root=str(tmp_path / "runs"),
        )
        assert meta["status"] == "completed"
        payload = ckpt_lib.load_checkpoint(last)
        assert payload["run_progress"]["completed_epochs"] == 3
        curves = (tmp_path / "runs" / "t-run" / "scores" / "curves.csv").read_text()
        assert len(curves.strip().splitlines()) == 4

    def test_resume_without_higher_target_fails(self, tmp_path):
        make_fixture(tmp_path)
        run_training(base_cfg(tmp_path), run_root=str(tmp_path / "runs"))
        last = tmp_path / "runs" / "t-run" / "checkpoints" / "last.npz"
        with pytest.raises(RunLifecycleError):
            run_training(
                base_cfg(tmp_path, epochs=2),
                resume=str(last),
                run_root=str(tmp_path / "runs"),
            )

    def test_serial_run_dirs(self, tmp_path):
        make_fixture(tmp_path)
        run_training(base_cfg(tmp_path, epochs=1), run_root=str(tmp_path / "runs"))
        run_training(base_cfg(tmp_path, epochs=1), run_root=str(tmp_path / "runs"))
        assert (tmp_path / "runs" / "t-run").exists()
        assert (tmp_path / "runs" / "t-run-r002").exists()

    def test_wall_time_stops_gracefully(self, tmp_path):
        make_fixture(tmp_path, n_train=256)
        meta = run_training(
            base_cfg(tmp_path, run_id="wt-run", epochs=50, max_time_minutes=1e-4),
            run_root=str(tmp_path / "runs"),
        )
        assert meta["status"] == "stopped"
        payload = ckpt_lib.load_checkpoint(
            tmp_path / "runs" / "wt-run" / "checkpoints" / "last.npz"
        )
        assert payload["checkpoint_reason"] == "wall_time"

    def test_nonfinite_group_limit(self, tmp_path):
        make_fixture(tmp_path)
        # lr large enough to blow params to NaN after the first update
        cfg = base_cfg(
            tmp_path, run_id="nf-run", lr=1e30, warmup_steps=0, epochs=3,
            max_nonfinite_accumulation_groups=0,
        )
        with pytest.raises(NonfiniteGroupLimitError):
            run_training(cfg, run_root=str(tmp_path / "runs"))
        payload = ckpt_lib.load_checkpoint(
            tmp_path / "runs" / "nf-run" / "checkpoints" / "last.npz"
        )
        assert payload["checkpoint_reason"] == "nonfinite_group_limit"
        meta = json.loads(
            (tmp_path / "runs" / "nf-run" / "checkpoints" / "meta.json").read_text()
        )
        assert meta["status"] == "failed"
        assert meta["accumulation_health"]["aborted_groups"] >= 1

    def test_transfer_from(self, tmp_path):
        make_fixture(tmp_path)
        run_training(base_cfg(tmp_path, epochs=1), run_root=str(tmp_path / "runs"))
        last = tmp_path / "runs" / "t-run" / "checkpoints" / "last.npz"
        meta = run_training(
            base_cfg(tmp_path, run_id="xfer-run", epochs=1),
            transfer_from=str(last),
            run_root=str(tmp_path / "runs"),
        )
        assert meta["status"] == "completed"
        vocab_json = json.loads(
            (tmp_path / "runs" / "xfer-run" / "vocabulary.json").read_text()
        )
        assert vocab_json["legacy_adaptation"] is True

    def test_plateau_scheduler(self, tmp_path):
        make_fixture(tmp_path)
        meta = run_training(
            base_cfg(tmp_path, run_id="plateau-run", scheduler="plateau",
                     plateau_patience=0, epochs=3),
            run_root=str(tmp_path / "runs"),
        )
        assert meta["status"] == "completed"

    def test_aux_losses_train(self, tmp_path):
        make_fixture(tmp_path)
        meta = run_training(
            base_cfg(
                tmp_path, run_id="aux-run", epochs=1,
                termination_aux=True, termination_loss_enabled=True,
                multi_offset_targets=[2, 3], multi_offset_weights={2: 0.5, 3: 0.25},
            ),
            run_root=str(tmp_path / "runs"),
        )
        assert meta["status"] == "completed"
        assert meta["last_train_term_loss"] is not None
        curves = (
            tmp_path / "runs" / "aux-run" / "scores" / "curves.csv"
        ).read_text().splitlines()
        assert "train_offset_2" in curves[0] and "train_term_loss" in curves[0]


class TestPreemption:
    """SIGTERM rides the checkpoint contract instead of losing the epoch."""

    def test_graceful_preemption_defers_then_hard_exits(self):
        import signal as _signal

        from genomics_lm_tpu.training.runtime import (
            GracefulPreemption,
            PreemptionRequested,
        )

        chained = []
        prior = _signal.signal(_signal.SIGTERM, lambda s, f: chained.append(s))
        try:
            gp = GracefulPreemption().install()
            gp.check()  # no signal yet: no-op
            os.kill(os.getpid(), _signal.SIGTERM)
            # first signal is consumed: flag set, nothing chained
            assert gp.requested and gp.signum == int(_signal.SIGTERM)
            assert chained == []
            with pytest.raises(PreemptionRequested):
                gp.check()
            # second signal falls through to the prior handler (hard path)
            os.kill(os.getpid(), _signal.SIGTERM)
            assert chained == [int(_signal.SIGTERM)]
            gp.uninstall()
        finally:
            _signal.signal(_signal.SIGTERM, prior)

    def test_sigterm_saves_preemption_checkpoint_and_resumes(self, tmp_path):
        import signal as _signal
        import subprocess
        import sys
        import time

        make_fixture(tmp_path, n_train=256)
        cfg = base_cfg(tmp_path, run_id="pre-run", epochs=200)
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text("\n".join(f"{k}: {v}" for k, v in cfg.items()))
        repo = Path(__file__).resolve().parent.parent
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out_path = tmp_path / "train.out"
        with out_path.open("w") as out:
            proc = subprocess.Popen(
                [sys.executable, "-u", str(repo / "scripts" / "train_codon_lm.py"),
                 "--config", str(cfg_path), "--run_root", str(tmp_path / "runs")],
                stdout=out, stderr=subprocess.STDOUT, env=env, cwd=tmp_path,
            )
        try:
            deadline = time.time() + 180
            started = False
            while time.time() < deadline:
                text = out_path.read_text()
                # printed after the preemption handler is installed
                if "[train] starting:" in text:
                    started = True
                    break
                if proc.poll() is not None:
                    raise AssertionError(f"trainer exited early:\n{text}")
                time.sleep(0.2)
            assert started, "trainer never reached the training loop"
            proc.send_signal(_signal.SIGTERM)
            rc = proc.wait(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert rc == 128 + int(_signal.SIGTERM), out_path.read_text()[-2000:]

        run_dir = tmp_path / "runs" / "pre-run"
        payload = ckpt_lib.load_checkpoint(run_dir / "checkpoints" / "last.npz")
        assert payload["checkpoint_reason"] == "preempted"
        meta = json.loads((run_dir / "checkpoints" / "meta.json").read_text())
        assert meta["status"] == "stopped"
        assert meta["preempted_by_signal"] == int(_signal.SIGTERM)

        # resume losslessly: continue from the preempted checkpoint to a
        # 1-epoch target and finish clean
        resumed = run_training(
            base_cfg(tmp_path, run_id="pre-run", epochs=1),
            resume=str(run_dir / "checkpoints" / "last.npz"),
            run_root=str(tmp_path / "runs"),
        )
        assert resumed["status"] == "completed"
        payload2 = ckpt_lib.load_checkpoint(run_dir / "checkpoints" / "last.npz")
        assert payload2["run_progress"]["completed_epochs"] == 1
        curves = (run_dir / "scores" / "curves.csv").read_text().strip().splitlines()
        assert len(curves) == 2  # header + exactly one epoch row, no replays


class TestCheckpointStore:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        payload = {
            "model": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "bf16": jnp.ones((4,), jnp.bfloat16),
            "nested": {"t": (1, "two", None, [3.5, True])},
            "step": 7,
        }
        path = tmp_path / "c.npz"
        ckpt_lib.save_checkpoint(payload, path)
        out = ckpt_lib.load_checkpoint(path)
        np.testing.assert_array_equal(out["model"]["w"], payload["model"]["w"])
        assert out["nested"]["t"] == (1, "two", None, [3.5, True])
        assert out["step"] == 7
        assert np.asarray(out["bf16"]).dtype == jnp.bfloat16.dtype
        meta = ckpt_lib.load_checkpoint_meta(path)
        assert meta["step"] == 7
        arr = ckpt_lib.checkpoint_array(path, "model/w")
        np.testing.assert_array_equal(arr, payload["model"]["w"])


class TestOOMSafeguard:
    def test_oom_downscales_config_and_stops(self, tmp_path, monkeypatch):
        import yaml

        from genomics_lm_tpu.training import loop as loop_mod

        make_fixture(tmp_path)
        cfg = base_cfg(tmp_path, run_id="oom-run")
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        real_make = loop_mod.make_train_step

        def exploding_make(*args, **kwargs):
            step = real_make(*args, **kwargs)

            def boom(*a, **k):
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory allocating 99999999 bytes"
                )

            return boom

        monkeypatch.setattr(loop_mod, "make_train_step", exploding_make)
        meta = run_training(cfg, config_path=str(cfg_path),
                            run_root=str(tmp_path / "runs"))
        assert meta["status"] == "stopped"
        rewritten = yaml.safe_load(cfg_path.read_text())
        assert rewritten["batch_size"] == cfg["batch_size"] // 2
        assert rewritten["grad_accum_steps"] == cfg["grad_accum_steps"] * 2

    def test_oom_patterns(self):
        from genomics_lm_tpu.training.loop import _is_oom_error

        assert _is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: while running"))
        assert not _is_oom_error(ValueError("shape mismatch"))


class TestAsyncCheckpointing:
    def test_async_run_produces_loadable_checkpoints(self, tmp_path):
        from genomics_lm_tpu.training.checkpoints import load_checkpoint

        make_fixture(tmp_path)
        meta = run_training(
            base_cfg(tmp_path, run_id="async-run", async_checkpointing=True),
            run_root=str(tmp_path / "runs"),
        )
        assert meta["status"] == "completed"
        ckpt_dir = tmp_path / "runs" / "async-run" / "checkpoints"
        payload = load_checkpoint(ckpt_dir / "last.npz")
        assert payload["run_progress"]["completed_epochs"] == 2
        assert (ckpt_dir / "best.npz").exists()

    def test_async_checkpointer_orders_writes(self, tmp_path):
        import numpy as np

        from genomics_lm_tpu.training.checkpoints import (
            AsyncCheckpointer,
            load_checkpoint,
        )

        path = tmp_path / "c.npz"
        with AsyncCheckpointer() as ck:
            for i in range(5):
                ck.save({"step": np.asarray(i), "w": np.full(4, i, np.float32)},
                        path)
        final = load_checkpoint(path)
        assert int(final["step"]) == 4

    def test_async_checkpointer_surfaces_writer_errors(self, tmp_path):
        import numpy as np
        import pytest as _pytest

        from genomics_lm_tpu.training.checkpoints import AsyncCheckpointer

        ck = AsyncCheckpointer()
        ck.save({"x": np.zeros(2)}, tmp_path / "nodir" / "a" / "c.npz")
        # atomic_write mkdirs parents, so force a real failure: unwritable dir
        bad = tmp_path / "file_not_dir"
        bad.write_text("occupied")
        ck.save({"x": np.zeros(2)}, bad / "c.npz")
        with _pytest.raises(Exception):
            ck.wait()
        ck.close()
