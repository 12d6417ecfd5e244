"""Interleaved A/B: fused-BiLSTM Pallas kernel vs the XLA scan (VERDICT
r2 #8 — the bounded roofline-tail experiment on the sequential scans).

Flagship encoder shape: Tz = 128 (T=2048 after 16x pooling), B = 8,
H = 128.  Each timed call chains R dependent applications of the
recurrence inside one jit (scan with a scalar feedback) so device loop
time dominates dispatch; sync is a scalar readback (the only trustworthy
completion signal over the axon tunnel — CLAUDE.md session 9).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_lstm_kernel_tpu.py
Env: PROBE_B / PROBE_T / PROBE_H, PROBE_R (chain length), PROBE_TRIALS.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("PROBE_B", "8"))
T = int(os.environ.get("PROBE_T", "128"))
H = int(os.environ.get("PROBE_H", "128"))
R = int(os.environ.get("PROBE_R", "100"))
TRIALS = int(os.environ.get("PROBE_TRIALS", "5"))


def main():
    from mucon_tpu.ops.lstm_pallas import (
        bilstm_recurrence_pallas,
        bilstm_recurrence_xla,
        bilstm_vmem_bytes,
    )

    print(f"devices: {jax.devices()}")
    print(f"shape: T={T} B={B} H={H}, chain R={R}, "
          f"kernel VMEM {bilstm_vmem_bytes(T, B, H) / 2**20:.1f} MB")

    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(T, 2, B, 4 * H).astype(np.float32) * 0.3)
    lengths = rng.randint(T // 2, T + 1, size=B)
    m = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)
    )
    whh = jnp.asarray(rng.randn(2, H, 4 * H).astype(np.float32) * 0.08)

    interp = jax.default_backend() == "cpu"

    def chained(fn, **kw):
        @jax.jit
        def run(xp, m, whh):
            def body(s, _):
                outs, h, c = fn(xp + s * 1e-12, m, whh, **kw)
                return jnp.sum(h) + jnp.sum(outs[-1]), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
            return s

        return run

    variants = {
        "pallas": chained(bilstm_recurrence_pallas, interpret=interp),
        "xla_u1": chained(bilstm_recurrence_xla, unroll=1),
        "xla_u8": chained(bilstm_recurrence_xla, unroll=8),
    }

    # parity first (same chained program => identical math expected to fp)
    vals = {k: float(v(xp, m, whh)) for k, v in variants.items()}
    print("chained checksums:", vals)
    ref = vals["xla_u1"]
    for k, v in vals.items():
        assert abs(v - ref) <= 1e-3 * max(1.0, abs(ref)), (k, v, ref)

    times = {k: [] for k in variants}
    for trial in range(TRIALS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            float(fn(xp, m, whh))  # scalar readback sync
            times[k].append((time.perf_counter() - t0) * 1e3 / R)
    for k, ts in times.items():
        print(f"{k}: best {min(ts):.4f} ms/call  all "
              + " ".join(f"{t:.4f}" for t in ts))


if __name__ == "__main__":
    main()
