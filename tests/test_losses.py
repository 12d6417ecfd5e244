"""Golden-value loss tests vs independent torch oracles.

Each oracle recomputes the documented objective from scratch with torch
(STN masks included), then the padded JAX implementation must match on the
same inputs — including when the video is embedded in a larger padded
batch slot."""

import numpy as np
import pytest
import jax.numpy as jnp

from mucon_tpu.models.losses import (
    length_loss_video,
    mucon_loss_video,
    smoothing_loss_video,
    transcript_loss_video,
    loss_static_config,
)
from mucon_tpu.config import get_cfg_defaults
from tests.test_masks import torch_stn_masks

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def _cfg_static(**over):
    cfg = get_cfg_defaults()
    for k, v in over.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return loss_static_config(cfg)


def _pad(a, n, axis=0):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n - a.shape[axis])
    return np.pad(a, pad)


@pytest.mark.parametrize("template", ["box", "gaussian"])
@pytest.mark.parametrize("mtype", ["flint", "arithmetic"])
def test_mucon_loss_matches_torch_oracle(mtype, template):
    rng = np.random.RandomState(0)
    T, M, N = 120, 7, 4
    T_PAD, N_MAX = 160, 9
    seg = rng.randn(T, M).astype(np.float32)
    raw_lengths = rng.randn(N).astype(np.float32)
    target = rng.randint(0, M, size=N)

    # ---- torch oracle (models.py:414-523 semantics, independent impl) ----
    seg_t = torch.tensor(seg)
    abs_len = T * TF.softmax(torch.tensor(raw_lengths), dim=0)
    masks = torch.tensor(torch_stn_masks(T, abs_len.numpy(), 0.0, template))
    tgt_t = torch.tensor(target)
    if mtype == "flint":
        preds = []
        for i in range(N):
            w = (masks[i].unsqueeze(1) * seg_t).sum(0) / abs_len[i]
            preds.append(TF.log_softmax(w, dim=0))
        oracle = TF.nll_loss(torch.stack(preds), tgt_t, reduction="mean").item()
    else:
        total = 0.0
        for i in range(N):
            ce = TF.cross_entropy(
                seg_t, tgt_t[i].repeat(T), reduction="none"
            )
            total += (ce * masks[i]).sum()
        oracle = (total / T).item()

    # ---- padded JAX implementation ----
    cfg_static = _cfg_static(
        **{"model.loss.mucon.type": mtype, "model.loss.mucon.template": template}
    )
    ours = float(
        mucon_loss_video(
            cfg_static,
            jnp.asarray(_pad(raw_lengths, N_MAX + 1)),
            jnp.asarray(_pad(seg, T_PAD)),
            jnp.asarray(_pad(target, N_MAX)),
            jnp.asarray(N),
            jnp.asarray(T),
        )
    )
    assert ours == pytest.approx(oracle, rel=2e-4)


def test_smoothing_loss_matches_torch():
    rng = np.random.RandomState(1)
    T, M = 50, 6
    seg = (5 * rng.randn(T, M)).astype(np.float32)
    x = TF.log_softmax(torch.tensor(seg), dim=1)
    vals = TF.mse_loss(x[1:, :], x[:-1, :].detach())
    oracle = torch.clamp(vals, 0, 16).item()

    cfg_static = _cfg_static()
    ours = float(
        smoothing_loss_video(cfg_static, jnp.asarray(_pad(seg, 64)), jnp.asarray(T))
    )
    assert ours == pytest.approx(oracle, rel=1e-4)


def test_transcript_loss_matches_torch():
    rng = np.random.RandomState(2)
    S, M, N = 10, 7, 4  # N+1 = 5 valid steps
    logits = rng.randn(S, M + 1).astype(np.float32)
    lp = TF.log_softmax(torch.tensor(logits), dim=1)
    tf_target = rng.randint(0, M + 1, size=S)
    oracle = TF.nll_loss(
        lp[: N + 1], torch.tensor(tf_target[: N + 1]), reduction="sum"
    ).item()

    cfg_static = _cfg_static()
    ours = float(
        transcript_loss_video(
            cfg_static,
            jnp.asarray(lp.numpy()),
            jnp.asarray(tf_target),
            jnp.asarray(N + 1),
        )
    )
    assert ours == pytest.approx(oracle, rel=1e-5)

    # weighted background variant (models.py:551-565)
    cfg_static = _cfg_static(
        **{
            "model.loss.transcript_weight_background": True,
            "model.loss.transcript_weight_background_value": 0.5,
        }
    )
    w = torch.ones(M + 1)
    w[0] = 0.5
    oracle_w = TF.nll_loss(
        lp[: N + 1], torch.tensor(tf_target[: N + 1]), weight=w, reduction="sum"
    ).item()
    ours_w = float(
        transcript_loss_video(
            cfg_static,
            jnp.asarray(lp.numpy()),
            jnp.asarray(tf_target),
            jnp.asarray(N + 1),
        )
    )
    assert ours_w == pytest.approx(oracle_w, rel=1e-5)


def test_length_loss_hinge():
    raw = np.array([0.5, 3.0, -2.5, 9.0], np.float32)  # last is padding
    # width 2: relu(x-2)+relu(-2-x) per step -> [0, 1, 0.5] over 3 valid
    out = float(length_loss_video(2.0, jnp.asarray(raw), jnp.asarray(3)))
    assert out == pytest.approx(1.5)
