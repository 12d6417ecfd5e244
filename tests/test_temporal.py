"""Temporal backbone parity vs a torch oracle + padding invariance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import masked_group_norm
from mucon_tpu.models.temporal import WaveNetBlock, pool2_time, shift_time

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402


class TorchWaveNetOracle(tnn.Module):
    """Independent torch implementation of the documented architecture
    (dilated conv3 -> relu -> 1x1 -> residual; pool after given layers)."""

    def __init__(self, cin, cout, stages, pooling_layers):
        super().__init__()
        self.first = tnn.Conv1d(cin, cout, 1)
        self.last = tnn.Conv1d(cout, cout, 1)
        self.dilated = tnn.ModuleList(
            tnn.Conv1d(cout, cout, 3, dilation=d, padding=d) for d in stages
        )
        self.pointwise = tnn.ModuleList(
            tnn.Conv1d(cout, cout, 1) for _ in stages
        )
        self.pooling_layers = pooling_layers

    def forward(self, x):  # x: [1 x C x T]
        x = TF.relu(self.first(x))
        for i in range(len(self.dilated)):
            y = TF.relu(self.dilated[i](x))
            y = self.pointwise[i](y)
            x = y + x
            if i in self.pooling_layers:
                x = TF.max_pool1d(x, kernel_size=2)
        x = TF.relu(x)
        return self.last(x)


def _params_from_torch(oracle, stages):
    def conv1x1(c):
        return dict(
            kernel=jnp.asarray(c.weight.detach().numpy()[:, :, 0].T),
            bias=jnp.asarray(c.bias.detach().numpy()),
        )

    def conv3(c):
        w = c.weight.detach().numpy()  # [Cout, Cin, 3]
        return dict(
            kernel=jnp.asarray(np.transpose(w, (2, 1, 0))),
            bias=jnp.asarray(c.bias.detach().numpy()),
        )

    params = {"Conv1x1_0": conv1x1(oracle.first), "Conv1x1_1": conv1x1(oracle.last)}
    for i in range(len(stages)):
        params[f"WaveNetLayer_{i}"] = {
            "DilatedConv3_0": conv3(oracle.dilated[i]),
            "Conv1x1_0": conv1x1(oracle.pointwise[i]),
        }
    return params


def test_wavenet_matches_torch_oracle():
    rng = np.random.RandomState(0)
    cin, cout = 6, 8
    stages = [1, 2, 4]
    pooling_layers = [1]
    B, T = 2, 44
    lengths = np.array([44, 29])
    xs = rng.randn(B, T, cin).astype(np.float32)

    oracle = TorchWaveNetOracle(cin, cout, stages, pooling_layers)
    mod = WaveNetBlock(
        in_channels=cin,
        stages=tuple(stages),
        out_dims=cout,
        pooling_layers=tuple(pooling_layers),
        dropout_rate=0.0,
    )
    params = _params_from_torch(oracle, stages)
    out, out_len = mod.apply(
        {"params": params},
        jnp.asarray(xs),
        jnp.asarray(lengths),
        False,
    )
    out = np.asarray(out)

    for i in range(B):
        L = int(lengths[i])
        with torch.no_grad():
            t_out = oracle(torch.tensor(xs[i : i + 1, :L].transpose(0, 2, 1)))
        t_out = t_out[0].numpy().T  # [T' x C]
        L2 = t_out.shape[0]
        assert int(out_len[i]) == L2
        np.testing.assert_allclose(out[i, :L2], t_out, rtol=1e-4, atol=1e-5)
        assert np.all(out[i, L2:] == 0)


def test_shift_time():
    x = jnp.arange(5, dtype=jnp.float32).reshape(1, 5, 1)
    np.testing.assert_array_equal(
        np.asarray(shift_time(x, 2))[0, :, 0], [2, 3, 4, 0, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(shift_time(x, -2))[0, :, 0], [0, 0, 0, 1, 2]
    )


def test_pool2_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 7, 3).astype(np.float32)
    ours = np.asarray(pool2_time(jnp.asarray(x), "max"))
    ref = TF.max_pool1d(torch.tensor(x.transpose(0, 2, 1)), 2).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref)
    ours = np.asarray(pool2_time(jnp.asarray(x), "sum"))
    ref = (TF.avg_pool1d(torch.tensor(x.transpose(0, 2, 1)), 2) * 2).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_masked_group_norm_matches_torch():
    rng = np.random.RandomState(2)
    B, T, C, G = 2, 10, 8, 4
    lengths = np.array([10, 6])
    x = rng.randn(B, T, C).astype(np.float32)
    scale = rng.rand(C).astype(np.float32) + 0.5
    bias = rng.randn(C).astype(np.float32)

    ours = np.asarray(
        masked_group_norm(
            jnp.asarray(x), jnp.asarray(lengths), G, jnp.asarray(scale), jnp.asarray(bias)
        )
    )
    gn = tnn.GroupNorm(G, C)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(scale))
        gn.bias.copy_(torch.tensor(bias))
    for i in range(B):
        L = int(lengths[i])
        with torch.no_grad():
            ref = gn(torch.tensor(x[i : i + 1, :L].transpose(0, 2, 1)))
        ref = ref[0].numpy().T
        np.testing.assert_allclose(ours[i, :L], ref, rtol=2e-4, atol=1e-5)


class TorchMSTCNOracle(tnn.Module):
    """Independent torch implementation of the MS-TCN++ first stage
    (dual-dilation conv pair -> fusion 1x1 -> relu -> +residual, pools)."""

    def __init__(self, cin, fmaps, cout, num_layers, pooling_layers):
        super().__init__()
        self.inp = tnn.Conv1d(cin, fmaps, 1)
        self.d1 = tnn.ModuleList(
            tnn.Conv1d(fmaps, fmaps, 3, padding=2 ** (num_layers - 1 - i),
                       dilation=2 ** (num_layers - 1 - i))
            for i in range(num_layers)
        )
        self.d2 = tnn.ModuleList(
            tnn.Conv1d(fmaps, fmaps, 3, padding=2 ** i, dilation=2 ** i)
            for i in range(num_layers)
        )
        self.fuse = tnn.ModuleList(
            tnn.Conv1d(2 * fmaps, fmaps, 1) for _ in range(num_layers)
        )
        self.out = tnn.Conv1d(fmaps, cout, 1)
        self.pooling_layers = pooling_layers
        self.num_layers = num_layers

    def forward(self, x):
        f = self.inp(x)
        for i in range(self.num_layers):
            y = self.fuse[i](torch.cat([self.d1[i](f), self.d2[i](f)], 1))
            f = TF.relu(y) + f
            if i in self.pooling_layers:
                f = TF.max_pool1d(f, kernel_size=2)
        return self.out(f)


def test_mstcnpp_matches_torch_oracle():
    from mucon_tpu.models.temporal import MSTCNPPFirstStage

    rng = np.random.RandomState(3)
    cin, fmaps, num_layers = 6, 8, 3
    pooling_layers = (1,)
    B, T = 2, 40
    lengths = np.array([40, 27])
    xs = rng.randn(B, T, cin).astype(np.float32)

    oracle = TorchMSTCNOracle(cin, fmaps, fmaps, num_layers, pooling_layers)

    def conv1x1(c):
        return dict(kernel=jnp.asarray(c.weight.detach().numpy()[:, :, 0].T),
                    bias=jnp.asarray(c.bias.detach().numpy()))

    def conv3(c):
        w = c.weight.detach().numpy()
        return dict(kernel=jnp.asarray(np.transpose(w, (2, 1, 0))),
                    bias=jnp.asarray(c.bias.detach().numpy()))

    params = {"Conv1x1_0": conv1x1(oracle.inp),
              "Conv1x1_4": conv1x1(oracle.out)}
    for i in range(num_layers):
        params[f"DilatedConv3_{2 * i}"] = conv3(oracle.d1[i])
        params[f"DilatedConv3_{2 * i + 1}"] = conv3(oracle.d2[i])
        params[f"Conv1x1_{i + 1}"] = conv1x1(oracle.fuse[i])

    mod = MSTCNPPFirstStage(
        input_dim=cin, num_layers=num_layers, num_f_maps=fmaps,
        output_dim=fmaps, pooling_layers=pooling_layers, dropout_rate=0.0,
    )
    out, out_len = mod.apply({"params": params}, jnp.asarray(xs),
                             jnp.asarray(lengths), False)
    out = np.asarray(out)

    for i in range(B):
        L = int(lengths[i])
        with torch.no_grad():
            ref = oracle(torch.tensor(xs[i:i + 1, :L].transpose(0, 2, 1)))
        ref = ref[0].numpy().T
        L2 = ref.shape[0]
        assert int(out_len[i]) == L2
        np.testing.assert_allclose(out[i, :L2], ref, rtol=1e-4, atol=1e-5)
        assert np.all(out[i, L2:] == 0)
