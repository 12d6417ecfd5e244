"""Interleaved A/B: fused MSTCN++ stage kernel vs the XLA stage on hw.

Flagship-analog shape (B=8, T=2048, C=128, 11 dual-dilation layers,
pooling after layers {1,2,4,8} -> 16x downsample), eval forward only
(the kernel's role).  Chained R dependent applications per timed call,
scalar-readback sync.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_mstcnpp_kernel_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("PROBE_B", "8"))
T = int(os.environ.get("PROBE_T", "2048"))
C = int(os.environ.get("PROBE_C", "128"))
L = int(os.environ.get("PROBE_L", "11"))
R = int(os.environ.get("PROBE_R", "20"))
TRIALS = int(os.environ.get("PROBE_TRIALS", "5"))
POOLING = (1, 2, 4, 8)


def main():
    from mucon_tpu.models.temporal import MSTCNPPFirstStage
    from mucon_tpu.ops.mstcnpp_pallas import (
        mstcnpp_stack_pallas_sliced,
        pack_mstcnpp_params,
        plan_mstcnpp_slices,
    )

    print(f"devices: {jax.devices()}")
    print(f"B={B} T={T} C={C} L={L} pooling={POOLING} "
          f"slices={plan_mstcnpp_slices(B, T, C)}")

    rng = np.random.RandomState(0)
    lengths = jnp.asarray(
        rng.randint(3 * T // 4, T + 1, size=B).astype(np.int32)
    )
    xs = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)

    stage = MSTCNPPFirstStage(
        input_dim=C, num_layers=L, num_f_maps=C, output_dim=C,
        pooling_layers=POOLING,
    )
    variables = stage.init(jax.random.PRNGKey(0), xs, lengths, False)
    params = variables["params"]

    w_in = params["Conv1x1_0"]["kernel"]
    b_in = params["Conv1x1_0"]["bias"]
    m = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    x_proj = (xs @ w_in + b_in) * m[:, :, None]
    packed = pack_mstcnpp_params(params, L)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    def run_kernel(x_proj, lengths):
        def body(s, _):
            out, _ = mstcnpp_stack_pallas_sliced(
                x_proj + s * 1e-12, lengths, *packed,
                num_layers=L, pooling_layers=POOLING, interpret=interp,
            )
            return jnp.sum(out), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
        return s

    @jax.jit
    def run_xla(xs, lengths):
        def body(s, _):
            out, _ = stage.apply(
                {"params": params}, xs + s * 1e-12, lengths, False
            )
            return jnp.sum(out), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
        return s

    variants = {"pallas": (run_kernel, (x_proj, lengths)),
                "xla": (run_xla, (xs, lengths))}
    vals = {k: float(f(*a)) for k, (f, a) in variants.items()}
    print("chained checksums:", vals)
    assert abs(vals["pallas"] - vals["xla"]) <= 1e-3 * max(
        1.0, abs(vals["xla"])), vals

    times = {k: [] for k in variants}
    for _ in range(TRIALS):
        for k, (f, a) in variants.items():
            t0 = time.perf_counter()
            float(f(*a))
            times[k].append((time.perf_counter() - t0) * 1e3 / R)
    for k, ts in times.items():
        print(f"{k}: best {min(ts):.3f} ms/call  all "
              + " ".join(f"{t:.3f}" for t in ts))


if __name__ == "__main__":
    main()
