"""Model-agnostic training engine: Task / Strategy / Callback protocols.

Parity layer L2 (reference ``src/training/{contracts,engine,strategies}.py``):
the protocols make the engine testable without real models — fake tasks
inject NaN batches, fake wall timers expire on demand, recorder callbacks
assert event streams (reference ``tests/test_training_engine.py``).

- ``EngineState``: completed_epochs / current_epoch / microbatch /
  optimizer_step.
- ``TrainingCheckpoint``: versioned namespaced envelope
  ``{engine, task, strategy, rng, metadata}`` with a contract-version check.
- ``TrainingTask``: yields batches and computes (loss, grads) — in JAX the
  task returns gradients directly instead of calling ``backward``.
- ``AccumulatedGradsStrategy``: accumulation groups with actual-size
  averaging, finite-grad gating, grad clipping, optax stepping.
- ``TrainingEngine.fit``: epoch loop, group commits, nonfinite-group abort
  and skip-to-group-end, mid-epoch resume via iterator fast-forward,
  periodic/wall-time checkpointing, weighted validation averaging, events
  (``group_committed``, ``epoch_completed``, ``validation_completed``,
  ``checkpoint_saved``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.training.runtime import PeriodicCheckpointPolicy, WallTimer

TRAINING_CONTRACT_VERSION = 1


@dataclass
class EngineState:
    completed_epochs: int = 0
    current_epoch: int = 0
    microbatch: int = 0
    optimizer_step: int = 0

    def to_dict(self) -> dict:
        return {
            "completed_epochs": self.completed_epochs,
            "current_epoch": self.current_epoch,
            "microbatch": self.microbatch,
            "optimizer_step": self.optimizer_step,
        }

    @classmethod
    def from_dict(cls, payload: dict) -> "EngineState":
        return cls(**{k: int(payload.get(k, 0)) for k in (
            "completed_epochs", "current_epoch", "microbatch", "optimizer_step",
        )})


@dataclass
class TrainingCheckpoint:
    """Versioned namespaced checkpoint envelope (contracts.py:54-105)."""

    engine: dict
    task: Any
    strategy: Any
    rng: Any = None
    metadata: dict = field(default_factory=dict)
    version: int = TRAINING_CONTRACT_VERSION

    def to_payload(self) -> dict:
        return {
            "contract_version": self.version,
            "engine": self.engine,
            "task": self.task,
            "strategy": self.strategy,
            "rng": self.rng,
            "metadata": self.metadata,
            "run_progress": {
                "completed_epochs": self.engine.get("completed_epochs", 0),
                "current_epoch": self.engine.get("current_epoch", 0),
                "microbatch": self.engine.get("microbatch", 0),
                "optimizer_step": self.engine.get("optimizer_step", 0),
            },
        }

    @classmethod
    def from_payload(cls, payload: dict) -> "TrainingCheckpoint":
        version = int(payload.get("contract_version", -1))
        if version != TRAINING_CONTRACT_VERSION:
            raise ValueError(
                f"unsupported training checkpoint contract version {version}; "
                f"expected {TRAINING_CONTRACT_VERSION}"
            )
        return cls(
            engine=dict(payload["engine"]),
            task=payload.get("task"),
            strategy=payload.get("strategy"),
            rng=payload.get("rng"),
            metadata=dict(payload.get("metadata", {})),
        )


@dataclass
class StepOutput:
    loss: float
    grads: Any
    metrics: dict = field(default_factory=dict)


@dataclass
class MetricValue:
    """Weighted metric for correct cross-batch averaging (contracts.py)."""

    value: float
    weight: float = 1.0


@runtime_checkable
class TrainingTask(Protocol):
    def train_batches(self, epoch: int) -> Iterable[Any]: ...

    def training_step(self, batch) -> StepOutput: ...

    def val_batches(self) -> Iterable[Any]: ...

    def validation_step(self, batch) -> dict: ...

    def state_dict(self) -> Any: ...

    def load_state_dict(self, state) -> None: ...


@runtime_checkable
class UpdateStrategy(Protocol):
    def begin_group(self) -> None: ...

    def process_microbatch(self, task: TrainingTask, batch) -> StepOutput: ...

    def commit_group(self, task: TrainingTask) -> bool: ...

    def abort_group(self) -> int: ...

    def state_dict(self) -> Any: ...

    def load_state_dict(self, state) -> None: ...


@runtime_checkable
class TrainingCallback(Protocol):
    def on_event(self, name: str, payload: dict) -> None: ...


class NonFiniteStepError(RuntimeError):
    """Raised by strategies when a microbatch produces a nonfinite loss."""


class AccumulatedGradsStrategy:
    """Gradient accumulation with actual-size averaging and finite gating.

    The task computes gradients (JAX has no implicit backward); this
    strategy accumulates them across the group, averages by the number of
    processed microbatches, checks finiteness, clips, and applies the optax
    transformation through the task's ``apply_updates``.
    """

    def __init__(self, apply_updates, *, grad_clip: float | None = None):
        self._apply_updates = apply_updates
        self.grad_clip = grad_clip
        self._grads = None
        self._count = 0
        self.committed_steps = 0

    def begin_group(self) -> None:
        self._grads = None
        self._count = 0

    def process_microbatch(self, task: TrainingTask, batch) -> StepOutput:
        out = task.training_step(batch)
        if not np.isfinite(out.loss):
            raise NonFiniteStepError(f"nonfinite loss {out.loss}")
        self._grads = (
            out.grads
            if self._grads is None
            else jax.tree.map(jnp.add, self._grads, out.grads)
        )
        self._count += 1
        return out

    def commit_group(self, task: TrainingTask) -> bool:
        if self._count == 0:
            return False
        grads = jax.tree.map(lambda g: g / self._count, self._grads)
        finite = all(
            bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads)
        )
        if not finite:
            self.abort_group()
            return False
        if self.grad_clip is not None:
            norm = jnp.sqrt(
                sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
            )
            scale = jnp.minimum(1.0, self.grad_clip / jnp.maximum(norm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        self._apply_updates(grads)
        self.committed_steps += 1
        self.begin_group()
        return True

    def abort_group(self) -> int:
        discarded = self._count
        self.begin_group()
        return discarded

    def state_dict(self) -> dict:
        return {"committed_steps": self.committed_steps}

    def load_state_dict(self, state) -> None:
        self.committed_steps = int((state or {}).get("committed_steps", 0))


class TrainingEngine:
    """Epoch/group loop over protocol-typed task + strategy (engine.py)."""

    def __init__(
        self,
        task: TrainingTask,
        strategy: UpdateStrategy,
        *,
        group_size: int = 1,
        max_epochs: int = 1,
        wall_timer: WallTimer | None = None,
        checkpoint_policy: PeriodicCheckpointPolicy | None = None,
        save_fn=None,
        callbacks: list[TrainingCallback] | None = None,
        max_aborted_groups: int = -1,
    ):
        self.task = task
        self.strategy = strategy
        self.group_size = max(1, int(group_size))
        self.max_epochs = int(max_epochs)
        self.wall_timer = wall_timer or WallTimer(None)
        self.checkpoint_policy = checkpoint_policy
        self.save_fn = save_fn
        self.callbacks = list(callbacks or [])
        self.max_aborted_groups = max_aborted_groups
        self.state = EngineState()
        self.aborted_groups = 0
        self.history: list[dict] = []

    def _emit(self, name: str, payload: dict) -> None:
        for callback in self.callbacks:
            callback.on_event(name, payload)

    def _save(self, reason: str) -> None:
        if self.save_fn is None:
            return
        checkpoint = TrainingCheckpoint(
            engine=self.state.to_dict(),
            task=self.task.state_dict(),
            strategy=self.strategy.state_dict(),
            metadata={"reason": reason},
        )
        self.save_fn(checkpoint.to_payload())
        self._emit("checkpoint_saved", {"reason": reason})

    def restore(self, payload: dict) -> None:
        checkpoint = TrainingCheckpoint.from_payload(payload)
        self.state = EngineState.from_dict(checkpoint.engine)
        self.task.load_state_dict(checkpoint.task)
        self.strategy.load_state_dict(checkpoint.strategy)

    def _validate(self) -> dict:
        sums: dict[str, float] = {}
        weights: dict[str, float] = {}
        for batch in self.task.val_batches():
            metrics = self.task.validation_step(batch)
            for key, metric in metrics.items():
                if isinstance(metric, MetricValue):
                    value, weight = metric.value, metric.weight
                else:
                    value, weight = float(metric), 1.0
                sums[key] = sums.get(key, 0.0) + value * weight
                weights[key] = weights.get(key, 0.0) + weight
        return {k: sums[k] / max(weights[k], 1e-12) for k in sums}

    def fit(self) -> list[dict]:
        stop = False
        for epoch in range(self.state.completed_epochs, self.max_epochs):
            self.state.current_epoch = epoch + 1
            skip = self.state.microbatch if epoch == self.state.completed_epochs else 0
            self.state.microbatch = 0
            self.strategy.begin_group()
            in_group = 0
            skip_to_group_end = False
            epoch_loss_sum, epoch_loss_n = 0.0, 0

            for index, batch in enumerate(self.task.train_batches(epoch + 1)):
                if index < skip:
                    continue
                self.state.microbatch = index + 1
                if not skip_to_group_end:
                    try:
                        out = self.strategy.process_microbatch(self.task, batch)
                        epoch_loss_sum += out.loss
                        epoch_loss_n += 1
                        in_group += 1
                    except NonFiniteStepError:
                        discarded = self.strategy.abort_group()
                        self.aborted_groups += 1
                        self._emit("group_aborted", {
                            "epoch": epoch + 1,
                            "microbatch": index + 1,
                            "discarded": discarded,
                        })
                        if (
                            self.max_aborted_groups >= 0
                            and self.aborted_groups > self.max_aborted_groups
                        ):
                            self._save("nonfinite_group_limit")
                            raise
                        skip_to_group_end = True
                if (index + 1) % self.group_size == 0:
                    if not skip_to_group_end:
                        committed = self.strategy.commit_group(self.task)
                        if committed:
                            self.state.optimizer_step += 1
                            self._emit("group_committed", {
                                "epoch": epoch + 1,
                                "optimizer_step": self.state.optimizer_step,
                            })
                            if self.checkpoint_policy and self.checkpoint_policy.should_save(
                                self.state.optimizer_step
                            ):
                                self._save("periodic")
                                self.checkpoint_policy.mark_saved(self.state.optimizer_step)
                    skip_to_group_end = False
                    in_group = 0
                    self.strategy.begin_group()
                if self.wall_timer.expired():
                    self._save("wall_time")
                    stop = True
                    break
            if not stop and in_group and not skip_to_group_end:
                if self.strategy.commit_group(self.task):
                    self.state.optimizer_step += 1
                    self._emit("group_committed", {
                        "epoch": epoch + 1,
                        "optimizer_step": self.state.optimizer_step,
                    })
            if stop:
                break

            val_metrics = self._validate()
            self._emit("validation_completed", {"epoch": epoch + 1, **val_metrics})
            self.state.completed_epochs = epoch + 1
            self.state.microbatch = 0
            record = {
                "epoch": epoch + 1,
                "train_loss": epoch_loss_sum / max(epoch_loss_n, 1),
                **val_metrics,
            }
            self.history.append(record)
            self._emit("epoch_completed", record)
            self._save("epoch")
        return self.history


__all__ = [
    "AccumulatedGradsStrategy",
    "EngineState",
    "MetricValue",
    "NonFiniteStepError",
    "StepOutput",
    "TrainingCallback",
    "TrainingCheckpoint",
    "TrainingEngine",
    "TrainingTask",
    "TRAINING_CONTRACT_VERSION",
    "UpdateStrategy",
]
