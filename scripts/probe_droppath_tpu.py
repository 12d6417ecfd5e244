"""Isolate the f32+dropout fwd compile blowup to its minimal trigger.

One-layer T=2048 whole-batch fwd program (the v3 chunk shape), compiled
fresh in three flavors:
  nodrop   : conv3+relu+1x1+residual (known-fast baseline)
  inputmask: same + y * mask_input   (the v3 dropout path)
  iotamask : same + y * mask computed in-kernel from iota (no extra input)

If iotamask is fast but inputmask is slow -> the INPUT block triggers it
(fix: in-kernel PRNG).  If both are slow -> the multiply in the layer
body triggers it (fix: apply dropout in XLA between programs for big-T
layers).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_droppath_tpu.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.wavenet_pallas_v2 import _bt_mask, _matmul_bt, _shift_batch

B, T, C, D = 8, 2048, 128, 1


def kernel(flavor, len_ref, *refs):
    pos = 0
    x_ref = refs[pos]; pos += 1
    w3_ref = refs[pos]; pos += 1
    b3_ref = refs[pos]; pos += 1
    w1_ref = refs[pos]; pos += 1
    b1_ref = refs[pos]; pos += 1
    m_ref = None
    if flavor == "inputmask":
        m_ref = refs[pos]; pos += 1
    xout_ref = refs[pos]; pos += 1
    xs_ref = refs[pos]; pos += 1
    hs_ref = refs[pos]; pos += 1

    lengths = jnp.stack([len_ref[b] for b in range(B)])
    mask = _bt_mask(B, T, lengths)
    x = x_ref[:] * mask
    xs_ref[:] = x
    z = (
        _matmul_bt(_shift_batch(x, -D), w3_ref[0])
        + _matmul_bt(x, w3_ref[1])
        + _matmul_bt(_shift_batch(x, D), w3_ref[2])
        + b3_ref[:][None, None, :]
    )
    h = jnp.maximum(z, 0.0)
    hs_ref[:] = h
    y = _matmul_bt(h, w1_ref[:]) + b1_ref[:][None, None, :]
    if flavor == "inputmask":
        y = y * m_ref[:]
    elif flavor == "iotamask":
        ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        m = jnp.where((ids % 4) != 0, 1.3333334, 0.0)[:, :, None]
        y = y * m
    xout_ref[:] = (y + x) * mask


def bspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda g, *_, _nd=nd: (0,) * _nd)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    ln = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w3 = jnp.asarray(rng.randn(3, C, C).astype(np.float32)) * 0.05
    b3 = jnp.asarray(rng.randn(C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.05
    b1 = jnp.asarray(rng.randn(C).astype(np.float32))
    m = jnp.asarray((rng.rand(B, T, C) > 0.25).astype(np.float32)) / 0.75

    for flavor in ("nodrop", "iotamask", "inputmask"):
        in_arrays = [x, w3, b3, w1, b1]
        in_specs = [bspec((B, T, C)), bspec((3, C, C)), bspec((C,)),
                    bspec((C, C)), bspec((C,))]
        if flavor == "inputmask":
            in_arrays.append(m)
            in_specs.append(bspec((B, T, C)))
        out_shapes = [jax.ShapeDtypeStruct((B, T, C), jnp.float32)] * 3
        out_specs = [bspec((B, T, C))] * 3
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=in_specs, out_specs=out_specs,
        )
        f = jax.jit(lambda *a, flavor=flavor, gs=grid_spec, os=out_shapes:
                    pl.pallas_call(
                        partial(kernel, flavor),
                        grid_spec=gs,
                        out_shape=os,
                        compiler_params=pltpu.CompilerParams(
                            vmem_limit_bytes=110 * 1024 * 1024),
                    )(ln, *a))
        t0 = time.time()
        try:
            out = jax.block_until_ready(f(*in_arrays))
            print(f"{flavor}: compile {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{flavor}: FAILED {type(e).__name__} {str(e)[:120]} "
                  f"({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
