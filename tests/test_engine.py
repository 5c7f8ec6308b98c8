"""Model-agnostic engine with fake tasks (reference §4 protocol pattern)."""

import numpy as np
import pytest

import jax.numpy as jnp

from genomics_lm_tpu.training.engine import (
    AccumulatedGradsStrategy,
    EngineState,
    MetricValue,
    NonFiniteStepError,
    StepOutput,
    TrainingCallback,
    TrainingCheckpoint,
    TrainingEngine,
    TrainingTask,
)
from genomics_lm_tpu.training.runtime import WallTimer


class LinearTask:
    """1-param linear model; injectable nonfinite batches (ref pattern)."""

    def __init__(self, n_batches=8, nonfinite_at=None, lr=0.1):
        self.w = 2.0
        self.lr = lr
        self.n_batches = n_batches
        self.nonfinite_at = set(nonfinite_at or ())
        self.seen = []

    def train_batches(self, epoch):
        for i in range(self.n_batches):
            yield (epoch, i)

    def training_step(self, batch):
        _, i = batch
        self.seen.append(i)
        if i in self.nonfinite_at:
            return StepOutput(loss=float("nan"), grads=jnp.asarray([float("nan")]))
        # loss = (w - 1)^2 → grad = 2(w - 1)
        return StepOutput(
            loss=(self.w - 1.0) ** 2, grads=jnp.asarray([2.0 * (self.w - 1.0)])
        )

    def apply_updates(self, grads):
        self.w -= self.lr * float(grads[0])

    def val_batches(self):
        yield "a"
        yield "b"

    def validation_step(self, batch):
        return {"val_loss": MetricValue((self.w - 1.0) ** 2, weight=1.0)}

    def state_dict(self):
        return {"w": self.w}

    def load_state_dict(self, state):
        self.w = float(state["w"])


class ExpireAfterFirstGroup(WallTimer):
    def __init__(self, group_size):
        super().__init__(None)
        self.calls = 0
        self.group_size = group_size

    def expired(self):
        self.calls += 1
        return self.calls > self.group_size


class EventRecorder:
    def __init__(self):
        self.events = []

    def on_event(self, name, payload):
        self.events.append((name, payload))


def make_engine(task, **kw):
    strategy = AccumulatedGradsStrategy(task.apply_updates,
                                        grad_clip=kw.pop("grad_clip", None))
    return TrainingEngine(task, strategy, **kw)


class TestEngine:
    def test_protocols_runtime_checkable(self):
        task = LinearTask()
        assert isinstance(task, TrainingTask)
        assert isinstance(EventRecorder(), TrainingCallback)

    def test_converges_and_emits_events(self):
        task = LinearTask(n_batches=8)
        recorder = EventRecorder()
        engine = make_engine(task, group_size=2, max_epochs=3, callbacks=[recorder])
        history = engine.fit()
        assert len(history) == 3
        assert abs(task.w - 1.0) < abs(2.0 - 1.0)  # moved toward optimum
        names = [n for n, _ in recorder.events]
        assert names.count("epoch_completed") == 3
        assert names.count("validation_completed") == 3
        assert names.count("group_committed") == 12  # 4 groups × 3 epochs
        assert engine.state.optimizer_step == 12

    def test_nonfinite_group_aborts_and_skips(self):
        task = LinearTask(n_batches=6, nonfinite_at={2})
        recorder = EventRecorder()
        engine = make_engine(task, group_size=3, max_epochs=1, callbacks=[recorder])
        engine.fit()
        aborted = [p for n, p in recorder.events if n == "group_aborted"]
        assert len(aborted) == 1
        assert aborted[0]["discarded"] == 2  # finite microbatches 0,1 discarded
        # second group (3,4,5) still commits
        assert engine.state.optimizer_step == 1

    def test_nonfinite_limit_raises(self):
        task = LinearTask(n_batches=4, nonfinite_at={0})
        engine = make_engine(task, group_size=2, max_epochs=1, max_aborted_groups=0)
        with pytest.raises(NonFiniteStepError):
            engine.fit()

    def test_wall_time_stops_and_saves(self):
        saved = []
        task = LinearTask(n_batches=10)
        engine = make_engine(
            task, group_size=2, max_epochs=5,
            wall_timer=ExpireAfterFirstGroup(group_size=2),
            save_fn=saved.append,
        )
        engine.fit()
        assert saved, "wall-time stop must save a checkpoint"
        assert saved[-1]["metadata"]["reason"] == "wall_time"
        assert saved[-1]["contract_version"] == 1

    def test_checkpoint_roundtrip_and_resume(self):
        saved = []
        task = LinearTask(n_batches=4)
        engine = make_engine(task, group_size=2, max_epochs=2, save_fn=saved.append)
        engine.fit()
        payload = saved[-1]

        task2 = LinearTask(n_batches=4)
        engine2 = make_engine(task2, group_size=2, max_epochs=4)
        engine2.restore(payload)
        assert engine2.state.completed_epochs == 2
        assert task2.w == pytest.approx(task.w)
        engine2.fit()
        assert engine2.state.completed_epochs == 4

    def test_contract_version_check(self):
        with pytest.raises(ValueError, match="contract version"):
            TrainingCheckpoint.from_payload({"contract_version": 99, "engine": {}})

    def test_mid_epoch_resume_skips_microbatches(self):
        task = LinearTask(n_batches=6)
        engine = make_engine(task, group_size=2, max_epochs=1)
        engine.state.microbatch = 4  # resume inside epoch 1
        engine.fit()
        assert task.seen == [4, 5]

    def test_weighted_validation(self):
        class WeightedTask(LinearTask):
            def val_batches(self):
                yield 1.0
                yield 2.0

            def validation_step(self, batch):
                return {"val_loss": MetricValue(batch, weight=batch)}

        task = WeightedTask(n_batches=2)
        engine = make_engine(task, group_size=1, max_epochs=1)
        history = engine.fit()
        # weighted mean of (1 w1, 2 w2) = 5/3
        assert history[0]["val_loss"] == pytest.approx(5 / 3)

    def test_grad_clip(self):
        task = LinearTask(n_batches=1, lr=1.0)
        engine = make_engine(task, group_size=1, max_epochs=1, grad_clip=0.5)
        engine.fit()
        # unclipped grad = 2.0; clipped to 0.5 → w = 2.0 - 0.5
        assert task.w == pytest.approx(1.5)
