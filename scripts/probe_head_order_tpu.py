"""Interleaved same-process A/B: framewise-head order on the full step.

Round-5 xprof decomposition (docs/ROOFLINE.md) attributed ~0.25 ms of
the ~2.9 ms flagship step to the y-head's 16x nearest upsample of the
128-channel encoder output: a data-dependent gather forward (0.109
ms/iter, kCustom) + its scatter-add transpose backward (0.140 ms/iter),
plus the head weight-grad contraction at full T.  The fix commutes the
positionwise 1x1 conv with the index-selection (bitwise-identical
forward, tests/test_model.py::test_head_order_commutes) so the gather/
scatter move M=48 logits instead of C=128 features and the conv+wgrad
run at Tz = T/16.

Both arms compile in ONE process (cross-process variance on this rig is
+-10%) via the trace-time toggle mucon.models.mucon._UPSAMPLE_BEFORE_HEAD.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_head_order_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 5 if SMALL else int(os.environ.get("PROBE_K", "30"))
TRIALS = 5
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
DROP = 0.25


def make_batch():
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target

    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        t = int(rng.randint(T // 2, T + 1))
        tr = rng.randint(0, M, size=int(rng.randint(3, 12))).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(t, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    return collate_padded(samples, n_max=30, pad_multiple=T)


def build_step(upsample_first, batch):
    import mucon_tpu.models.mucon as mucon_mod
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model, batch_to_arrays
    from mucon_tpu.harness.optim import create_optimizer

    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = DROP
    cfg.model.ft.last_dropout_rate = DROP
    cfg.model.fs.decoder.embedding_dropout = DROP
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    arrays = jax.device_put(batch_to_arrays(batch))
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    opt_state = tx.init(params)

    def loss_main(p, arrays, rng):
        fwd = model.forward(p, arrays, rng=rng, train=True,
                            teacher_forcing=True)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    @jax.jit
    def step_k_a(p, o, key, arrays):
        def body(carry, k):
            p, o = carry
            g = jax.grad(loss_main)(p, arrays, jax.random.fold_in(key, k))
            updates, o = tx.update(g, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(K))
        return p, o, jax.tree.leaves(p)[0].sum()

    # trace (and remote-compile) with the toggle pinned, then restore
    mucon_mod._UPSAMPLE_BEFORE_HEAD = upsample_first
    try:
        lowered = step_k_a.lower(params, opt_state, jax.random.PRNGKey(7),
                                 arrays)
        compiled = lowered.compile()
    finally:
        mucon_mod._UPSAMPLE_BEFORE_HEAD = False

    def step_k(p, o, key):
        p, o, chk = compiled(p, o, key, arrays)
        float(chk)  # scalar readback = real completion
        return p, o

    return step_k, params, opt_state


def main():
    print("devices:", jax.devices(), f"B={B} T={T} K={K}", flush=True)
    batch = make_batch()
    arms = {}
    for name, upfirst in (("conv-first (fast)", False),
                          ("upsample-first (ref)", True)):
        t0 = time.time()
        step_k, params, opt_state = build_step(upfirst, batch)
        step_k(params, opt_state, jax.random.PRNGKey(7))
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        arms[name] = (step_k, params, opt_state)

    best = {n: float("inf") for n in arms}
    for trial in range(TRIALS):
        for n, (step_k, params, opt_state) in arms.items():
            t0 = time.time()
            step_k(params, opt_state, jax.random.PRNGKey(7))
            ms = (time.time() - t0) / K * 1e3
            best[n] = min(best[n], ms)
            print(f"trial {trial} {n}: {ms:7.3f} ms/iter", flush=True)

    print(f"\nBEST (interleaved best-of-{TRIALS}):")
    for n, v in best.items():
        print(f"  {n}: {v:7.3f} ms/iter")


if __name__ == "__main__":
    main()
