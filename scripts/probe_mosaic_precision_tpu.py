"""What does an f32 dot actually do on the MXU — in XLA vs inside a
Mosaic (Pallas) kernel?

Round-4 finding (scripts/probe_inproj_tpu.py): XLA's DEFAULT matmul
precision truncates f32 operands to single-pass bf16 on the MXU, which
made the in-projection dtype lever vanish.  The open question this
probe answers: do the Pallas kernels' `jnp.dot(..., preferred_element_
type=f32)` calls ALSO truncate (nothing to do), or does Mosaic emit a
multi-pass f32 dot (in which case precision=DEFAULT inside the kernels
is an untapped ~3x on their MXU portion — and the kernels are silently
MORE precise than the XLA paths they were parity-tested against)?

Method: f32 operands drawn so bf16 truncation error is visible
(uniform mantissas), f64 matmul on the host as ground truth; compare
max relative error of
  - XLA jit dot, precision DEFAULT
  - XLA jit dot, precision HIGHEST
  - Pallas kernel dot (as the v2/v3 kernels write it)
  - Pallas kernel dot, explicit precision=HIGHEST
  - Pallas kernel dot, explicit precision=DEFAULT
Single-pass bf16 shows ~1e-3 rel error; true f32 (or 3-pass bf16x3)
shows ~1e-7.  Also times a [16384x512]@[512x512] dot K=64 deep inside
one kernel per variant (scalar-readback sync) to see the pass count in
wall-clock.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_mosaic_precision_tpu.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 512, 512, 512
TM, TK, TN = 16384, 512, 512
REPS = 64


def _dot_kernel(precision, a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(
        a_ref[:], b_ref[:],
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _dot_kernel_plain(a_ref, b_ref, o_ref):
    # exactly as ops/wavenet_pallas_v2._matmul_bt writes it
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)


def pallas_dot(a, b, precision="as-written"):
    kern = (_dot_kernel_plain if precision == "as-written"
            else partial(_dot_kernel, precision))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]), jnp.float32),
    )(a, b)


def _timed_kernel(precision, a_ref, b_ref, o_ref):
    def body(i, acc):
        if precision == "as-written":
            y = jnp.dot(a_ref[:], b_ref[:],
                        preferred_element_type=jnp.float32)
        else:
            y = jnp.dot(a_ref[:], b_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision)
        # consume the FULL product: reducing only one row would let the
        # compiler legally narrow the dot and invalidate the TFLOP/s
        # figure computed from the full 2*TM*TK*TN flop count (ADVICE r4)
        return acc + jnp.sum(y, axis=0)
    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((TN,), jnp.float32))


def timed_dot(precision):
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(TM, TK).astype(np.float32))
    b = jnp.asarray(rng.randn(TK, TN).astype(np.float32))
    f = jax.jit(lambda a, b: pl.pallas_call(
        partial(_timed_kernel, precision),
        out_shape=jax.ShapeDtypeStruct((TN,), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(a, b))
    out = f(a, b)
    float(out[0])  # warm + sync
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = f(a, b)
        float(out[0])
        best = min(best, (time.time() - t0) / REPS * 1e3)
    gflop = 2 * TM * TK * TN / 1e9
    return best, gflop / best * 1e3 / 1e3  # ms, TFLOP/s


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    a = rng.uniform(0.5, 2.0, size=(M, K)).astype(np.float32)
    b = rng.uniform(-1.0, 1.0, size=(K, N)).astype(np.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(ref).max()
    ja, jb = jnp.asarray(a), jnp.asarray(b)

    def err(y):
        return float(np.abs(np.asarray(y, np.float64) - ref).max() / scale)

    # reference error levels
    abf = np.asarray(a).astype(jnp.bfloat16).astype(np.float64)
    bbf = np.asarray(b).astype(jnp.bfloat16).astype(np.float64)
    print(f"bf16-truncated-operand floor: {err(abf @ bbf):8.2e}")
    print(f"f32-rounded floor:            {err((ref).astype(np.float32)):8.2e}")

    for name, fn in [
        ("xla DEFAULT", jax.jit(lambda x, y: jnp.dot(
            x, y, precision=jax.lax.Precision.DEFAULT))),
        ("xla HIGHEST", jax.jit(lambda x, y: jnp.dot(
            x, y, precision=jax.lax.Precision.HIGHEST))),
        ("pallas as-written", jax.jit(lambda x, y: pallas_dot(x, y))),
        ("pallas DEFAULT", jax.jit(lambda x, y: pallas_dot(
            x, y, jax.lax.Precision.DEFAULT))),
        ("pallas HIGHEST", jax.jit(lambda x, y: pallas_dot(
            x, y, jax.lax.Precision.HIGHEST))),
    ]:
        try:
            e = err(fn(ja, jb))
            print(f"{name:20s} max rel err {e:8.2e}", flush=True)
        except Exception as ex:  # noqa: BLE001 — probe reports and moves on
            print(f"{name:20s} FAILED: {type(ex).__name__}: {ex}", flush=True)

    print(f"\ntimed [{TM}x{TK}]@[{TK}x{TN}] x{REPS} in one kernel:")
    for prec in ["as-written", jax.lax.Precision.DEFAULT,
                 jax.lax.Precision.HIGHEST]:
        try:
            ms, tflops = timed_dot(prec)
            print(f"  {str(prec):20s} {ms:7.3f} ms/dot  {tflops:6.1f} TFLOP/s",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"  {str(prec):20s} FAILED: {type(ex).__name__}: {ex}",
                  flush=True)


if __name__ == "__main__":
    main()
