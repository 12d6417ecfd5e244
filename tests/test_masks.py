"""Golden-parity tests for the closed-form masks against a torch STN oracle.

The oracle reproduces the reference's affine_grid/grid_sample pipeline
(torch>=1.3 needs align_corners=True to match torch-1.1 behavior).  This is
an independent oracle, not copied code: it builds theta from the documented
normalization formulas and lets torch do the warp.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mucon_tpu.models.masks import (
    TEMPLATE_WIDTH,
    create_masks,
    project_lengths_softmax,
    template_values,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def torch_stn_masks(T, L, overlap=0.0, template="box"):
    L = torch.tensor(np.asarray(L, np.float32))
    B = L.shape[0]

    tmpl = torch.tensor(template_values(template)).repeat(B, 1).view(B, 1, -1)

    pis = torch.cumsum(L, 0) - L
    L = L * (1.0 + 2 * overlap)
    pis = pis - L * (overlap / 2)

    s = T / L
    x = (pis + L / 2 - T / 2) / (-(L / 2))

    theta = torch.zeros(B, 2, 3)
    theta[:, 0, 0] = s
    theta[:, 0, 2] = x
    theta[:, 1, 1] = s

    grid = TF.affine_grid(theta, torch.Size((B, 1, 1, T)), align_corners=True)
    out = TF.grid_sample(
        tmpl.view(B, 1, 1, TEMPLATE_WIDTH), grid, align_corners=True
    )
    return out.view(B, T).numpy()


@pytest.mark.parametrize("template", ["box", "gaussian", "trapezoid"])
@pytest.mark.parametrize("overlap", [0.0, 0.25])
def test_masks_match_torch_stn(template, overlap):
    rng = np.random.RandomState(7)
    T = 240
    for _ in range(4):
        raw = rng.randn(6).astype(np.float32)
        L = T * np.exp(raw) / np.exp(raw).sum()
        ours = np.asarray(create_masks(T, L, overlap=overlap, template=template))
        ref = torch_stn_masks(T, L, overlap=overlap, template=template)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_box_masks_partition_time():
    # with the box template and no overlap, masks tile the video: inner
    # frames of each segment are ~1 and segments sum to ~1 everywhere
    T = 160
    L = np.array([40.0, 80.0, 40.0], np.float32)
    m = np.asarray(create_masks(T, L))
    assert m.shape == (3, T)
    assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6
    # frame 60 is deep inside segment 1
    assert m[1, 60] > 0.99
    assert m[0, 60] < 0.01 and m[2, 60] < 0.01


def test_project_lengths_softmax():
    L = jnp.array([0.0, 0.0, 0.0])
    out = project_lengths_softmax(90, L)
    np.testing.assert_allclose(np.asarray(out), [30.0, 30.0, 30.0], rtol=1e-6)

    # padded variant: padded entries get zero length
    L = jnp.array([1.0, 1.0, 5.0])
    valid = jnp.array([True, True, False])
    out = np.asarray(project_lengths_softmax(100, L, valid))
    np.testing.assert_allclose(out[:2], [50.0, 50.0], rtol=1e-5)
    assert out[2] == 0.0


def test_masks_differentiable():
    T = 96

    def loss(raw):
        lens = project_lengths_softmax(T, raw)
        m = create_masks(T, lens)
        return jnp.sum(m[0] * jnp.arange(T))

    g = jax.grad(loss)(jnp.array([0.5, -0.2, 0.1]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0
