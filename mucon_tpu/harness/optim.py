"""Optimizers, schedulers, and partitioned gradient clipping.

Reference semantics (src/mucon/trainers.py:18-56, 133-146):

* SGD(momentum, coupled weight decay) or Adam(amsgrad, coupled wd) — torch
  couples weight decay into the gradient BEFORE momentum, so the optax
  chain is clip -> add_decayed_weights -> sgd/amsgrad;
* gradient clipping by global norm at 100.0, applied SEPARATELY to the
  encoder and decoder parameter groups (clip_grad_norm_separate), or
  jointly, or per-parameter;
* schedulers: none / MultiStepLR(milestones=[70], gamma=0.1) /
  ReduceLROnPlateau(max, factor=0.1, patience=20) — epoch-granular, driven
  host-side via optax.inject_hyperparams so the jitted step never retraces.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def clip_by_global_norm_partitioned(
    max_norm: float, labels
) -> optax.GradientTransformation:
    """Clip each labeled partition of the grad tree to max_norm separately.

    `labels` is a pytree of strings congruent with the gradients; each
    distinct label forms one clipping group (reference clips 'encode' and
    'decode' groups apart, trainers.py:136-138).
    """
    label_leaves = set(jax.tree.leaves(labels))

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        norms: Dict[str, jnp.ndarray] = {}
        for lab in sorted(label_leaves):
            sq = jax.tree.map(
                lambda g, l: jnp.sum(g.astype(jnp.float32) ** 2)
                if l == lab
                else jnp.zeros(()),
                updates,
                labels,
            )
            norms[lab] = jnp.sqrt(sum(jax.tree.leaves(sq)))

        def scale(g, l):
            norm = norms[l]
            factor = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * factor

        return jax.tree.map(scale, updates, labels), state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_per_parameter(max_norm: float) -> optax.GradientTransformation:
    """torch clip_grad_norm_ applied to every parameter individually
    (trainers.py:141-143)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(g):
            norm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
            return g * jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))

        return jax.tree.map(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def torch_adam_amsgrad(
    learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam(amsgrad=True) with torch's exact formulation.

    optax.amsgrad maxes the bias-CORRECTED second moment; torch maxes the
    raw one and bias-corrects afterwards — the trajectories diverge from
    step 2.  The reference trains with torch semantics (trainers.py:31-34),
    so we reproduce them (verified step-for-step in tests/test_optim.py).
    """

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return {"count": jnp.zeros((), jnp.int32), "m": zeros(), "v": zeros(),
                "vmax": zeros()}

    def update_fn(updates, state, params=None):
        count = state["count"] + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)
        m = jax.tree.map(lambda mu, g: b1 * mu + (1 - b1) * g, state["m"], updates)
        v = jax.tree.map(lambda nu, g: b2 * nu + (1 - b2) * g * g, state["v"], updates)
        vmax = jax.tree.map(jnp.maximum, state["vmax"], v)

        def step(mu, vm):
            denom = jnp.sqrt(vm) / jnp.sqrt(b2c) + eps
            return -(learning_rate / b1c) * mu / denom

        out = jax.tree.map(step, m, vmax)
        return out, {"count": count, "m": m, "v": v, "vmax": vmax}

    return optax.GradientTransformation(init_fn, update_fn)


def create_optimizer(cfg, partition_labels) -> optax.GradientTransformation:
    """Build the full update chain; learning rate injected as a hyperparam
    so host-side schedulers can set it per epoch without retracing."""
    wd = cfg.trainer.weight_decay
    name = cfg.trainer.optimizer

    chain = []
    if cfg.trainer.clip_grad_norm:
        max_norm = cfg.trainer.clip_grad_norm_value
        if cfg.trainer.clip_grad_norm_separate:
            chain.append(clip_by_global_norm_partitioned(max_norm, partition_labels))
        elif cfg.trainer.clip_grad_norm_every_param:
            chain.append(clip_per_parameter(max_norm))
        else:
            chain.append(optax.clip_by_global_norm(max_norm))

    if wd:
        chain.append(optax.add_decayed_weights(wd))

    def make(learning_rate):
        if name == "SGD":
            inner = optax.sgd(learning_rate, momentum=cfg.trainer.momentum or None)
        elif name == "Adam":
            inner = torch_adam_amsgrad(learning_rate)
        else:
            raise Exception("Invalid optimizer name (%s)" % name)
        return optax.chain(*chain, inner)

    return optax.inject_hyperparams(make)(learning_rate=cfg.trainer.learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place on the optimizer state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


class Scheduler:
    """Epoch-granular scheduler protocol: call step(...) after each epoch,
    read .lr before the next one."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.lr = base_lr

    def step(self, **kwargs) -> None:
        raise NotImplementedError

    def state_dict(self) -> dict:
        return {"lr": self.lr}

    def load_state_dict(self, d: dict) -> None:
        self.lr = d["lr"]


class MultiStepScheduler(Scheduler):
    """torch MultiStepLR: lr *= gamma at each milestone epoch."""

    def __init__(self, base_lr: float, milestones, gamma: float):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma
        self.epoch = 0

    def step(self, **kwargs) -> None:
        self.epoch += 1
        if self.epoch in self.milestones:
            self.lr *= self.gamma

    def state_dict(self):
        return {"lr": self.lr, "epoch": self.epoch}

    def load_state_dict(self, d):
        self.lr, self.epoch = d["lr"], d["epoch"]


class PlateauScheduler(Scheduler):
    """torch ReduceLROnPlateau (mode max/min, factor, patience)."""

    def __init__(self, base_lr, mode="max", factor=0.1, patience=20, verbose=False):
        super().__init__(base_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.verbose = verbose
        self.best: Optional[float] = None
        self.num_bad = 0

    def step(self, metrics: float = None, **kwargs) -> None:
        if metrics is None:
            return
        better = self.best is None or (
            metrics > self.best if self.mode == "max" else metrics < self.best
        )
        if better:
            self.best = metrics
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
                if self.verbose:
                    print(f"[plateau] reducing lr to {self.lr}")

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d):
        self.lr, self.best, self.num_bad = d["lr"], d["best"], d["num_bad"]


def create_scheduler(cfg) -> Optional[Scheduler]:
    """Reference factory (trainers.py:39-56)."""
    name = cfg.trainer.scheduler.name
    base_lr = cfg.trainer.learning_rate
    if name == "none":
        return None
    if name == "plateau":
        p = cfg.trainer.scheduler.plateau
        return PlateauScheduler(
            base_lr, mode=p.mode, factor=p.factor, patience=p.patience,
            verbose=p.verbose,
        )
    if name == "step":
        s = cfg.trainer.scheduler.step
        return MultiStepScheduler(base_lr, s.milestones, s.gamma)
    raise Exception("Invalid scheduler name (%s)" % name)
