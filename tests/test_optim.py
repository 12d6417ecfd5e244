"""Optimizer/scheduler parity vs torch (training-dynamics evidence)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.harness.optim import (
    MultiStepScheduler,
    PlateauScheduler,
    clip_by_global_norm_partitioned,
    create_optimizer,
    create_scheduler,
    set_learning_rate,
)

torch = pytest.importorskip("torch")


def _run_torch(opt_name, params0, grads, lr, wd, momentum=0.0, steps=3):
    ps = [torch.nn.Parameter(torch.tensor(p.copy())) for p in params0]
    if opt_name == "SGD":
        opt = torch.optim.SGD(ps, lr=lr, weight_decay=wd, momentum=momentum)
    else:
        opt = torch.optim.Adam(ps, lr=lr, weight_decay=wd, amsgrad=True)
    for s in range(steps):
        opt.zero_grad()
        for p, g in zip(ps, grads[s]):
            p.grad = torch.tensor(g.copy())
        opt.step()
    return [p.detach().numpy() for p in ps]


def _run_ours(opt_name, params0, grads, lr, wd, momentum=0.0, steps=3):
    cfg = get_cfg_defaults()
    cfg.trainer.optimizer = opt_name
    cfg.trainer.learning_rate = lr
    cfg.trainer.weight_decay = wd
    cfg.trainer.momentum = momentum
    cfg.trainer.clip_grad_norm = False  # pure optimizer comparison
    params = {"a": jnp.asarray(params0[0]), "b": jnp.asarray(params0[1])}
    labels = {"a": "encode", "b": "decode"}
    tx = create_optimizer(cfg, labels)
    state = tx.init(params)
    for s in range(steps):
        g = {"a": jnp.asarray(grads[s][0]), "b": jnp.asarray(grads[s][1])}
        updates, state = tx.update(g, state, params)
        import optax

        params = optax.apply_updates(params, updates)
    return [np.asarray(params["a"]), np.asarray(params["b"])]


@pytest.mark.parametrize(
    "opt_name,momentum", [("SGD", 0.0), ("SGD", 0.9), ("Adam", 0.0)]
)
def test_optimizer_matches_torch(opt_name, momentum):
    rng = np.random.RandomState(0)
    params0 = [rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
    grads = [
        [rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
        for _ in range(3)
    ]
    ours = _run_ours(opt_name, params0, grads, lr=0.01, wd=0.005, momentum=momentum)
    ref = _run_torch(opt_name, params0, grads, lr=0.01, wd=0.005, momentum=momentum)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)


def test_partitioned_clip_matches_torch_groups():
    """clip_grad_norm_ applied separately per group (trainers.py:136-138)."""
    rng = np.random.RandomState(1)
    g_enc = rng.randn(6, 6).astype(np.float32) * 50
    g_dec = rng.randn(8).astype(np.float32) * 50
    max_norm = 10.0

    grads = {"enc": jnp.asarray(g_enc), "dec": jnp.asarray(g_dec)}
    labels = {"enc": "encode", "dec": "decode"}
    tx = clip_by_global_norm_partitioned(max_norm, labels)
    out, _ = tx.update(grads, tx.init(grads))

    t_enc = torch.nn.Parameter(torch.zeros(6, 6))
    t_enc.grad = torch.tensor(g_enc.copy())
    t_dec = torch.nn.Parameter(torch.zeros(8))
    t_dec.grad = torch.tensor(g_dec.copy())
    torch.nn.utils.clip_grad_norm_([t_enc], max_norm)
    torch.nn.utils.clip_grad_norm_([t_dec], max_norm)

    np.testing.assert_allclose(np.asarray(out["enc"]), t_enc.grad.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["dec"]), t_dec.grad.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_multistep_scheduler_matches_torch():
    sched = MultiStepScheduler(0.01, milestones=[3, 5], gamma=0.1)
    lrs = []
    for _ in range(6):
        lrs.append(sched.lr)
        sched.step()

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.01)
    ref = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[3, 5], gamma=0.1)
    ref_lrs = []
    for _ in range(6):
        ref_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        ref.step()
    np.testing.assert_allclose(lrs, ref_lrs, rtol=1e-8)


def test_plateau_scheduler_reduces():
    sched = PlateauScheduler(0.1, mode="max", factor=0.5, patience=1)
    # improving -> no change
    sched.step(metrics=0.1)
    sched.step(metrics=0.2)
    assert sched.lr == 0.1
    # stuck beyond patience -> reduce
    sched.step(metrics=0.1)
    sched.step(metrics=0.1)
    assert sched.lr == pytest.approx(0.05)


def test_set_learning_rate_roundtrip():
    cfg = get_cfg_defaults()
    tx = create_optimizer(cfg, {"a": "encode"})
    state = tx.init({"a": jnp.zeros(3)})
    state = set_learning_rate(state, 0.123)
    assert float(state.hyperparams["learning_rate"]) == pytest.approx(0.123)
    assert create_scheduler(cfg).lr == cfg.trainer.learning_rate
