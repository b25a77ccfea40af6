"""Optimizers and per-epoch learning-rate schedulers.

Optimizers reproduce torch semantics (reference train.py:88-101):

* Adam: torch's L2-style ``weight_decay`` adds ``wd * param`` to the gradient
  *before* the Adam moments (not decoupled AdamW), so the chain is
  add_decayed_weights -> scale_by_adam; defaults b1=0.9, b2=0.999, eps=1e-8.
* SGD: grad (+ wd * param) -> momentum buffer -> step.

The learning rate is NOT baked into the optax chain: it enters the jitted
train step as a traced scalar, so host-side schedulers (including the
loss-dependent ReduceLROnPlateau) never trigger recompilation.

Schedulers step once per epoch exactly like the reference (train.py:246-250):

* ``StepLR(step_size=patience, gamma=factor)``
* ``ReduceLROnPlateau(mode='min', patience, factor)`` stepped with the mean
  train loss
* ``CosineAnnealingLR(T_max=patience, eta_min=lr_min)``
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import optax


def build_optimizer(cfg) -> optax.GradientTransformation:
    """LR-less update chain; the step multiplies by -lr (see train_lib).

    Cached per (w_decay, optim, momentum): optax transformations are pure
    (state lives in opt_state), and returning the SAME instance for the same
    config lets the train-step cache in train_lib key on it — the sweep
    harness builds one optimizer per grid cell and would otherwise defeat
    that cache."""
    return _cached_optimizer(float(cfg.w_decay), cfg.optim, float(cfg.momentum))


@functools.lru_cache(maxsize=16)
def _cached_optimizer(w_decay: float, optim: str,
                      momentum: float) -> optax.GradientTransformation:
    parts = []
    if w_decay:
        parts.append(optax.add_decayed_weights(w_decay))
    if optim == "Adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif optim == "SGD":
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False))
    else:
        raise ValueError(f"unknown optimizer {optim!r} (expected 'Adam' or 'SGD')")
    return optax.chain(*parts) if parts else optax.identity()


class LRScheduler:
    """Base: ``lr`` property + per-epoch ``step(metric)`` (torch-style)."""

    def __init__(self, lr0: float):
        self.lr0 = lr0
        self._lr = lr0
        self.last_epoch = 0

    @property
    def lr(self) -> float:
        return self._lr

    def step(self, metric: Optional[float] = None) -> None:
        self.last_epoch += 1
        self._update(metric)

    def _update(self, metric):
        pass

    def state_dict(self) -> dict:
        return {"lr": self._lr, "last_epoch": self.last_epoch}

    def load_state_dict(self, d: dict) -> None:
        self._lr = float(d["lr"])
        self.last_epoch = int(d["last_epoch"])


class ConstantLR(LRScheduler):
    pass


class StepLR(LRScheduler):
    """lr = lr0 * gamma^(last_epoch // step_size) (torch StepLR)."""

    def __init__(self, lr0: float, step_size: int, gamma: float = 0.5):
        super().__init__(lr0)
        self.step_size = step_size
        self.gamma = gamma

    def _update(self, metric):
        self._lr = self.lr0 * self.gamma ** (self.last_epoch // self.step_size)


class CosineAnnealingLR(LRScheduler):
    """lr = eta_min + (lr0 - eta_min) * (1 + cos(pi * t / T_max)) / 2."""

    def __init__(self, lr0: float, T_max: int, eta_min: float = 0.0):
        super().__init__(lr0)
        self.T_max = T_max
        self.eta_min = eta_min

    def _update(self, metric):
        t = self.last_epoch
        self._lr = self.eta_min + (self.lr0 - self.eta_min) * (
            1 + math.cos(math.pi * t / self.T_max)
        ) / 2


class ReduceLROnPlateau(LRScheduler):
    """mode='min': multiply lr by ``factor`` after ``patience`` epochs without
    improvement (torch semantics incl. the 1e-4 relative threshold)."""

    def __init__(self, lr0: float, patience: int = 10, factor: float = 0.5,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        super().__init__(lr0)
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = math.inf
        self.num_bad_epochs = 0

    def _update(self, metric):
        if metric is None:
            raise ValueError("ReduceLROnPlateau.step requires the epoch metric")
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self._lr = max(self._lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0

    def state_dict(self) -> dict:
        d = super().state_dict()
        d.update(best=self.best, num_bad_epochs=self.num_bad_epochs)
        return d

    def load_state_dict(self, d: dict) -> None:
        super().load_state_dict(d)
        self.best = float(d.get("best", math.inf))
        self.num_bad_epochs = int(d.get("num_bad_epochs", 0))


def build_scheduler(cfg) -> LRScheduler:
    """Factory matching reference train.py:96-101."""
    if cfg.lr_sche is None:
        return ConstantLR(cfg.lr)
    if cfg.lr_sche == "StepLR":
        return StepLR(cfg.lr, step_size=cfg.patience, gamma=cfg.factor)
    if cfg.lr_sche == "ReduceLR":
        return ReduceLROnPlateau(cfg.lr, patience=cfg.patience, factor=cfg.factor)
    if cfg.lr_sche == "CosineAnnealingLR":
        return CosineAnnealingLR(cfg.lr, T_max=cfg.patience, eta_min=cfg.lr_min)
    raise ValueError(f"unknown lr_sche {cfg.lr_sche!r}")
