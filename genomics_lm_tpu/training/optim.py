"""Optimizers and LR schedules (optax), mirroring the reference trainer.

Semantics parity with ``src/codonlm/training/loop.py:653-795``:

- warmup resolved from ``warmup_steps`` XOR ``warmup_fraction``
  (``resolve_warmup_steps``, ref ``loop.py:70-87``),
- cosine schedule ``min_lr_ratio + (1-r)·cos`` with linear warmup using the
  exact reference lambda (``loop.py:774-782``), stepped per *optimizer* step,
- plateau mode as a host-side ``ReduceLROnPlateau`` whose scale multiplies
  the compiled update (torch semantics: scaling group lr scales the decoupled
  weight-decay step too),
- two parameter groups: fast (``shape_proj``/``offset_projs``/
  ``termination_head``, weight-decay 0, ``lr_embedding``) vs base
  (``weight_decay`` default 0.05) — ref ``loop.py:681-718``,
- ``freeze_backbone``: only aux heads trainable (ref ``loop.py:655-667``),
- AdamW (torch defaults) or Adafactor.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

FAST_GROUP_MARKERS = ("shape_proj", "offset_projs", "termination_head")


def resolve_warmup_steps(cfg: dict, total_steps: int) -> int:
    """Fixed or scheduler-relative warmup without ambiguous precedence."""
    if total_steps <= 0:
        raise ValueError("scheduler_total_steps must be positive")
    fraction = cfg.get("warmup_fraction")
    if fraction is None:
        steps = int(cfg.get("warmup_steps", 200))
        if steps < 0:
            raise ValueError("warmup_steps must be non-negative")
        return steps
    if "warmup_steps" in cfg:
        raise ValueError("configure only one of warmup_steps or warmup_fraction")
    fraction = float(fraction)
    if not 0.0 <= fraction < 1.0:
        raise ValueError("warmup_fraction must be in [0, 1)")
    if fraction == 0.0:
        return 0
    return max(1, int(round(total_steps * fraction)))


def cosine_lr_lambda(warmup_steps: int, total_steps: int, min_lr_ratio: float) -> Callable:
    """The reference cosine-with-warmup multiplier (loop.py:774-782)."""
    warmup = max(1, warmup_steps)

    def lr_lambda(step_idx):
        warm = (step_idx + 1.0) / warmup
        progress = (step_idx - warmup) / max(1, total_steps - warmup)
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        decay = min_lr_ratio + (1 - min_lr_ratio) * cosine
        return jnp.where(step_idx < warmup, warm, decay)

    return lr_lambda


@dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau (mode=min, factor 0.5) with warmup.

    Parity: torch scheduler created at ``loop.py:786-792`` plus the manual
    linear warmup scaling applied in plateau mode (``loop.py:1151-1155``).
    ``scale()`` is multiplied into the compiled optimizer update.
    """

    base_lr: float
    min_lr: float = 1e-5
    factor: float = 0.5
    patience: int = 2
    warmup_steps: int = 0
    best: float = field(default=float("inf"))
    num_bad_epochs: int = 0
    current_scale: float = 1.0

    def scale(self, step: int) -> float:
        s = self.current_scale
        if self.warmup_steps > 0 and step < self.warmup_steps:
            s *= float(step + 1) / max(1, self.warmup_steps)
        return s

    def step_metric(self, metric: float) -> None:
        if metric < self.best:
            self.best = metric
            self.num_bad_epochs = 0
            return
        self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            floor = self.min_lr / self.base_lr if self.base_lr > 0 else 0.0
            self.current_scale = max(self.current_scale * self.factor, floor)
            self.num_bad_epochs = 0

    def state_dict(self) -> dict[str, Any]:
        return {
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "current_scale": self.current_scale,
        }

    def load_state_dict(self, state: dict[str, Any]) -> None:
        self.best = float(state.get("best", float("inf")))
        self.num_bad_epochs = int(state.get("num_bad_epochs", 0))
        self.current_scale = float(state.get("current_scale", 1.0))


def param_group_labels(
    params: dict,
    *,
    freeze_backbone: bool = False,
    unfreeze_encoder: bool = False,
    lora_only: bool = False,
) -> dict:
    """Label each leaf 'fast' | 'base' | 'frozen' by its tree path.

    The shape encoder trains in the base group only when explicitly
    unfrozen (reference ``loop.py:670-695``); otherwise it stays frozen.
    LoRA adapter leaves (``training/lora.py``) get their own no-weight-decay
    ``lora`` group so they train at ``lora_lr`` (default: cfg ``lr``) even
    when ``lr_embedding`` retunes the aux-head fast group; the frozen
    ``lora_scale`` alpha/r leaf never trains. ``lora_only`` additionally
    freezes every non-adapter leaf outside the aux-head fast group (the
    standard frozen-backbone LoRA recipe).
    """

    def label_path(path: str) -> str:
        if "lora_scale" in path:
            return "frozen"
        if "lora_" in path:
            return "lora"
        if "shape_encoder" in path:
            return "base" if (unfreeze_encoder and not freeze_backbone) else "frozen"
        fast = any(marker in path for marker in FAST_GROUP_MARKERS)
        if freeze_backbone or lora_only:
            return "fast" if fast else "frozen"
        return "fast" if fast else "base"

    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in node.items()}
        return label_path(prefix)

    return walk(params)


@dataclass
class OptimizerBundle:
    tx: optax.GradientTransformation
    labels: dict
    schedule_name: str  # "cosine" | "plateau"
    total_steps: int
    warmup_steps: int
    plateau: PlateauScheduler | None


def build_optimizer(cfg: dict, params: dict, total_steps: int) -> OptimizerBundle:
    """Build the full gradient transformation from a flat run config."""
    base_lr = float(cfg.get("lr", 5e-6))
    lr_embed = float(cfg.get("lr_embedding", base_lr))
    weight_decay = float(cfg.get("weight_decay", 0.05))
    min_lr = float(cfg.get("min_lr", 1e-5))
    freeze_backbone = bool(cfg.get("freeze_backbone", False))
    grad_clip = cfg.get("grad_clip")
    optimizer_name = str(cfg.get("optimizer", "adamw")).lower()

    scheduler_name = str(cfg.get("scheduler", "cosine")).lower()
    if scheduler_name not in {"cosine", "plateau"}:
        scheduler_name = "cosine"
    warmup_steps = resolve_warmup_steps(cfg, total_steps)

    lora_lr = float(cfg.get("lora_lr", base_lr))

    if scheduler_name == "cosine":
        min_lr_ratio = (min_lr / base_lr) if base_lr > 0 else 0.0
        mult = cosine_lr_lambda(warmup_steps, total_steps, min_lr_ratio)
        base_schedule = lambda step: base_lr * mult(step)  # noqa: E731
        fast_schedule = lambda step: lr_embed * mult(step)  # noqa: E731
        lora_schedule = lambda step: lora_lr * mult(step)  # noqa: E731
        plateau = None
    else:
        # plateau: host-side scale handles decay + warmup; schedules constant
        base_schedule = base_lr
        fast_schedule = lr_embed
        lora_schedule = lora_lr
        plateau = PlateauScheduler(
            base_lr=base_lr,
            min_lr=min_lr,
            patience=int(cfg.get("plateau_patience", 2)),
            warmup_steps=warmup_steps,
        )

    def make_tx(schedule, wd):
        if optimizer_name == "adafactor":
            return optax.adafactor(
                learning_rate=schedule, multiply_by_parameter_scale=False
            )
        return optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=wd,
        )

    transforms = {
        "fast": make_tx(fast_schedule, 0.0),
        "base": make_tx(base_schedule, weight_decay),
        "lora": make_tx(lora_schedule, 0.0),
        "frozen": optax.set_to_zero(),
    }
    labels = param_group_labels(
        params,
        freeze_backbone=freeze_backbone,
        unfreeze_encoder=bool(cfg.get("unfreeze_encoder", False)),
        lora_only=bool(cfg.get("lora_only", bool(cfg.get("lora_rank")))),
    )
    tx = optax.multi_transform(transforms, labels)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    return OptimizerBundle(
        tx=tx,
        labels=labels,
        schedule_name=scheduler_name,
        total_steps=total_steps,
        warmup_steps=warmup_steps,
        plateau=plateau,
    )


def resolve_epochs(cfg: dict, n_params: int, tokens_per_epoch: float) -> int:
    """``epochs: auto`` via the tokens-per-param heuristic (loop.py:745-759)."""
    epochs_cfg = cfg.get("epochs", 5)
    if isinstance(epochs_cfg, str) and epochs_cfg.strip().lower() == "auto":
        tokens_per_param = float(cfg.get("tokens_per_param", 20.0))
        tokens_target = max(1.0, tokens_per_param * float(n_params))
        per_epoch = max(1.0, float(tokens_per_epoch))
        est = int(math.ceil(tokens_target / per_epoch))
        est = max(
            int(cfg.get("epochs_min", 1)),
            min(est, int(cfg.get("epochs_max", max(1, est)))),
        )
        return est
    return int(epochs_cfg)


__all__ = [
    "FAST_GROUP_MARKERS",
    "OptimizerBundle",
    "PlateauScheduler",
    "build_optimizer",
    "cosine_lr_lambda",
    "param_group_labels",
    "resolve_epochs",
    "resolve_warmup_steps",
]
