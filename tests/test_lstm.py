"""LSTM parity against torch nn.LSTM (weights copied across)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mucon_tpu.models.lstm import MaskedBiLSTM

torch = pytest.importorskip("torch")


def _copy_torch_lstm_params(tl, bidirectional):
    def grab(suffix):
        w_ih = getattr(tl, f"weight_ih_l0{suffix}").detach().numpy().T
        w_hh = getattr(tl, f"weight_hh_l0{suffix}").detach().numpy().T
        b_ih = getattr(tl, f"bias_ih_l0{suffix}").detach().numpy()
        b_hh = getattr(tl, f"bias_hh_l0{suffix}").detach().numpy()
        return dict(w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh)

    params = {"fwd": grab("")}
    if bidirectional:
        params["bwd"] = grab("_reverse")
    return params


@pytest.mark.parametrize("bidirectional", [False, True])
def test_masked_bilstm_matches_torch(bidirectional):
    rng = np.random.RandomState(0)
    B, T, I, H = 3, 12, 6, 5
    lengths = np.array([12, 7, 1])
    xs = rng.randn(B, T, I).astype(np.float32)

    tl = torch.nn.LSTM(I, H, batch_first=True, bidirectional=bidirectional)
    mod = MaskedBiLSTM(input_size=I, hidden_size=H, bidirectional=bidirectional)
    params = _copy_torch_lstm_params(tl, bidirectional)
    params = jax.tree.map(jnp.asarray, params)

    out, (h, c) = mod.apply(
        {"params": params}, jnp.asarray(xs), jnp.asarray(lengths)
    )
    out, h, c = np.asarray(out), np.asarray(h), np.asarray(c)

    for i in range(B):
        L = lengths[i]
        with torch.no_grad():
            t_out, (t_h, t_c) = tl(torch.tensor(xs[i : i + 1, :L]))
        t_out = t_out[0].numpy()
        # h_n flattened forward-then-backward, matching view(1, -1)
        t_h = t_h.transpose(0, 1).reshape(1, -1)[0].numpy()
        t_c = t_c.transpose(0, 1).reshape(1, -1)[0].numpy()
        np.testing.assert_allclose(out[i, :L], t_out, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(h[i], t_h, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(c[i], t_c, rtol=1e-5, atol=1e-5)
        # padded outputs are exactly zero
        assert np.all(out[i, L:] == 0)
