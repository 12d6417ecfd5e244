"""Fused mucon-loss Pallas kernel (ops/mucon_loss_pallas.py): value and
gradient parity vs the XLA path, end-to-end wiring through compute_loss,
and a torch oracle pinning the in-place overlap-widening quirk
(reference masks.py:61-62 + models.py:460-464)."""

import numpy as np
import pytest

pytestmark = pytest.mark.interpret  # CPU interpret-mode kernel oracle tier (slow)
import jax
import jax.numpy as jnp

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.models.losses import (
    loss_static_config,
    mucon_loss_video,
)
from mucon_tpu.ops.mucon_loss_pallas import (
    _flint_batch_xla,
    mucon_flint_fused,
    mucon_flint_pallas,
)

B, S, T, M = 4, 30, 256, 48


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    return dict(
        lr=jnp.asarray(rng.randn(B, S).astype(np.float32)),
        seg=jnp.asarray(rng.randn(B, T, M).astype(np.float32)),
        tgt=jnp.asarray(rng.randint(0, M, size=(B, S)).astype(np.int32)),
        nlen=jnp.asarray([3, 7, 1, 30], jnp.int32),
        tval=jnp.asarray([256, 100, 37, 200], jnp.int32),
    )


@pytest.mark.parametrize("overlap", [0.0, 0.3])
@pytest.mark.parametrize("weighted", [False, True])
def test_kernel_matches_loss_video(data, overlap, weighted):
    """Kernel values == vmapped mucon_loss_video (the production XLA path)."""
    cfg = get_cfg_defaults()
    cfg.model.loss.mucon.overlap = overlap
    if weighted:
        cfg.model.loss.mucon_weight_background = True
        cfg.model.loss.mucon_weight_background_value = 0.25
    cs = loss_static_config(cfg)
    from functools import partial

    ref = jax.vmap(partial(mucon_loss_video, cs))(
        data["lr"], data["seg"], data["tgt"], data["nlen"], data["tval"]
    )
    w = (
        jnp.ones((M,), jnp.float32).at[0].set(0.25) if weighted else None
    )
    ker = mucon_flint_pallas(
        data["lr"], data["seg"], data["tgt"], data["nlen"], data["tval"],
        overlap, w, interpret=jax.default_backend() == "cpu",
    )
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("overlap", [0.0, 0.3])
def test_fused_grads_match_xla(data, overlap):
    w1 = jnp.ones((M,), jnp.float32)
    interp = jax.default_backend() == "cpu"

    def fused(lr, seg):
        return jnp.sum(mucon_flint_fused(
            lr, seg, data["tgt"], data["nlen"], data["tval"],
            overlap, False, interp, w1,
        ))

    def xla(lr, seg):
        return jnp.sum(_flint_batch_xla(
            lr, seg, data["tgt"], data["nlen"], data["tval"], overlap, None
        ))

    g1 = jax.grad(fused, argnums=(0, 1))(data["lr"], data["seg"])
    g2 = jax.grad(xla, argnums=(0, 1))(data["lr"], data["seg"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_compute_loss_wiring(data):
    """compute_loss with tpu.use_pallas_loss on == off (flint/box)."""
    from mucon_tpu.models.losses import compute_loss
    from mucon_tpu.models.outputs import MuConForwardOut

    rng = np.random.RandomState(1)
    n_steps = data["nlen"] + 1
    fwd = MuConForwardOut(
        transcript=jnp.asarray(rng.randn(B, S + 1, M + 1).astype(np.float32)),
        lengths=jnp.asarray(np.asarray(data["lr"])),
        segmentation=data["seg"],
        tokens=jnp.zeros((B, S + 1), jnp.int32),
        n_steps=n_steps,
        tz_lengths=data["tval"] // 16,
    )
    tf_target = jnp.asarray(rng.randint(0, M, size=(B, S + 1)).astype(np.int32))

    losses = {}
    for flag in (False, True):
        cfg = get_cfg_defaults()
        cfg.tpu.use_pallas_loss = flag
        cs = loss_static_config(cfg)
        losses[flag] = compute_loss(
            cs, fwd, tf_target, data["tgt"], data["nlen"], data["tval"],
            teacher_forcing=True,
        )
    np.testing.assert_allclose(
        float(losses[True].main), float(losses[False].main), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(losses[True].mucon_loss), float(losses[False].mucon_loss),
        rtol=1e-6,
    )


def test_overlap_inplace_widen_matches_torch():
    """The reference's create_masks widens L *in place*, so the flint window
    divides by the widened lengths; pin that against a torch oracle that
    reproduces the in-place behavior (overlap != 0)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    from tests.test_masks import torch_stn_masks

    rng = np.random.RandomState(2)
    T_, M_, N_ = 120, 7, 4
    overlap = 0.25
    seg = rng.randn(T_, M_).astype(np.float32)
    raw = rng.randn(N_).astype(np.float32)
    target = rng.randint(0, M_, size=N_)

    seg_t = torch.tensor(seg)
    abs_len = T_ * TF.softmax(torch.tensor(raw), dim=0)
    masks = torch.tensor(torch_stn_masks(T_, abs_len.numpy(), overlap, "box"))
    widened = abs_len * (1.0 + 2 * overlap)  # the in-place mutation
    preds = []
    for i in range(N_):
        w = (masks[i].unsqueeze(1) * seg_t).sum(0) / widened[i]
        preds.append(TF.log_softmax(w, dim=0))
    oracle = TF.nll_loss(
        torch.stack(preds), torch.tensor(target), reduction="mean"
    ).item()

    cfg = get_cfg_defaults()
    cfg.model.loss.mucon.overlap = overlap
    cs = loss_static_config(cfg)
    n_max = 9
    pad = lambda a, n: np.pad(a, (0, n - a.shape[0]))
    ours = float(
        mucon_loss_video(
            cs,
            jnp.asarray(pad(raw, n_max + 1)),
            jnp.asarray(np.pad(seg, ((0, 40), (0, 0)))),
            jnp.asarray(pad(target, n_max).astype(np.int32)),
            jnp.asarray(N_, jnp.int32),
            jnp.asarray(T_, jnp.int32),
        )
    )
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-5)
