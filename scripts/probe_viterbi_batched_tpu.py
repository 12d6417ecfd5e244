"""Interleaved A/B: per-video-grid vs whole-batch dense Viterbi DP kernels.

The round-5 eval xplane decomposition put the per-video-grid DP kernel at
3.07 ms/batch (B=128, Tpad=2560) — ~29% of the fused eval program and its
single biggest op.  `dense_viterbi_pallas_batched` flattens the batch into
the sublane dim so the K-step sequential chain does [B*N]-row vector work
per step instead of B serialized [N x L]-tile programs.

Methodology (CLAUDE.md session 18): REPS kernel calls chained inside one
jit (inputs perturbed per-iteration to defeat CSE), ONE scalar readback,
arms interleaved across trials.  Also verifies score/best_l/traceback-
position parity between the arms on hw, and times one fused-eval
device-bound round at the bench shape with the new routing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_viterbi_batched_tpu.py
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
REPS = 4 if SMALL else int(os.environ.get("PROBE_REPS", "100"))
TRIALS = 5
# bench eval shape: EVAL_B=128, Tpad=2560, S=30, n_max=30, max_len=2000
B, T, M, S = (4, 300, 10, 30) if SMALL else (128, 2560, 48, 30)
MAX_LEN = 2000
N_MAX = 30


def make_tables():
    from mucon_tpu.ops.viterbi import viterbi_precompute

    rng = np.random.RandomState(0)
    log_probs = np.log(
        rng.dirichlet(np.ones(M), size=(B, T)).astype(np.float64) + 1e-8
    ).astype(np.float32)
    t_valid = rng.randint(T // 2, T + 1, size=B).astype(np.int32)
    transcripts = rng.randint(0, M, size=(B, N_MAX)).astype(np.int32)
    n_valid = rng.randint(2, 9, size=B).astype(np.int32)
    lambdas = rng.uniform(20, 200, size=(B, M)).astype(np.float32)

    pre = jax.jit(jax.vmap(
        partial(viterbi_precompute, frame_sampling=S, max_len=MAX_LEN,
                l_max=MAX_LEN // S)
    ))
    W, pois, k_valid = pre(
        jnp.asarray(log_probs), jnp.asarray(t_valid),
        jnp.asarray(transcripts), jnp.asarray(lambdas)
    )
    return (jax.device_put(W), jax.device_put(pois),
            jax.device_put(k_valid), jnp.asarray(n_valid))


def build_arm(fn, W, pois, kv, nv, interp):
    @jax.jit
    def chained(W, pois, kv, nv):
        def body(acc, i):
            # per-iteration perturbation defeats CSE across the chain;
            # 1e-6 on log-probs does not change the work shape
            s, bl, _ = fn(W + i * 1e-6, pois, kv, nv,
                          frame_sampling=S, max_len=MAX_LEN,
                          interpret=interp)
            return acc + jnp.sum(s) + jnp.sum(bl.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return acc

    def run():
        t0 = time.perf_counter()
        chk = float(chained(W, pois, kv, nv))  # scalar readback sync
        return (time.perf_counter() - t0) / REPS * 1e3, chk

    return run


def main():
    from mucon_tpu.ops.viterbi import traceback_positions_device
    from mucon_tpu.ops.viterbi_pallas import (
        dense_viterbi_pallas, dense_viterbi_pallas_batched,
        viterbi_batched_vmem_bytes,
    )

    print("devices:", jax.devices(), flush=True)
    W, pois, kv, nv = make_tables()
    K, L = W.shape[1], pois.shape[2]
    print(f"shape: B={B} K={K} N={N_MAX} L={L} "
          f"batched_vmem={viterbi_batched_vmem_bytes(B, K, N_MAX, L)>>20} MiB",
          flush=True)

    # hw parity vs the XLA SCAN ground truth: the batched kernel's
    # min-reduce argmax + XLA finalize reproduce first-index ties exactly;
    # the grid kernel's in-kernel Mosaic argmax picks LAST on exact ties
    # (documented benign class), so vs grid only scores are asserted.
    from mucon_tpu.ops.viterbi import _dense_viterbi_from_tables

    interp = jax.default_backend() == "cpu"
    scan_fn = jax.jit(jax.vmap(partial(
        _dense_viterbi_from_tables, frame_sampling=S, max_len=MAX_LEN,
        n_max=N_MAX, l_max=MAX_LEN // S,
    )))
    s_score, s_bestl, s_bps, _ = scan_fn(W, pois, kv, nv)
    a = dense_viterbi_pallas(W, pois, kv, nv, frame_sampling=S,
                             max_len=MAX_LEN, interpret=interp)
    b = dense_viterbi_pallas_batched(W, pois, kv, nv, frame_sampling=S,
                                     max_len=MAX_LEN, interpret=interp)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(s_score),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(s_score),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(s_bestl))
    pos_b = traceback_positions_device(b[2], kv, nv, b[1])
    pos_s = traceback_positions_device(s_bps, kv, nv, s_bestl)
    np.testing.assert_array_equal(np.asarray(pos_b), np.asarray(pos_s))
    ties = int(np.sum(np.asarray(a[1]) != np.asarray(b[1])))
    print(f"parity OK (batched == scan: best_l, positions; "
          f"grid tie-class diffs: {ties})", flush=True)

    arms = {}
    for name, fn in [("grid", dense_viterbi_pallas),
                     ("batched", dense_viterbi_pallas_batched)]:
        run = build_arm(fn, W, pois, kv, nv, interp)
        t0 = time.time()
        run()  # compile + warm
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        arms[name] = run

    best = {n: float("inf") for n in arms}
    for trial in range(TRIALS):
        for n, run in arms.items():
            ms, _ = run()
            best[n] = min(best[n], ms)
            print(f"trial {trial} {n:8s}: {ms:7.3f} ms/call", flush=True)

    print("\nBEST (interleaved best-of-%d, %d chained reps):" % (TRIALS, REPS))
    for n in arms:
        print(f"  {n:8s}: {best[n]:7.3f} ms/call")
    print(f"  speedup: {best['grid']/best['batched']:.2f}x")


if __name__ == "__main__":
    main()
