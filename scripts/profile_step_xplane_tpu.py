"""Per-op decomposition of the flagship train step from a real device
trace (jax.profiler xplane), replacing subtractive attribution.

Runs the default-config flagship step (v3 encoder + decoder chain +
BiLSTM chain kernels, dropout .25, B=8, T=2048), captures K iterations
under jax.profiler.trace, then parses the xplane protobuf and prints
the device-plane ops ranked by total self-time — the ground truth for
where the ~3 ms goes (encoder programs vs sweeps vs chain kernels vs
XLA glue vs threefry masks vs optimizer).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_step_xplane_tpu.py
Env: PROFILE_DIR (default /tmp/xplane_step), PROBE_K iterations (20).
"""

import glob
import os
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 5 if SMALL else int(os.environ.get("PROBE_K", "20"))
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
DROP = 0.25
OUT = os.environ.get("PROFILE_DIR", "/tmp/xplane_step")
# iterations that land in the trace window: K per-call dispatches, or
# 2 chained calls x K scanned steps each (PROFILE_CHAINED=1)
N_ITERS = 2 * K if os.environ.get("PROFILE_CHAINED") == "1" else K


def build():
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import create_model, batch_to_arrays
    from mucon_tpu.harness.optim import create_optimizer

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
    batch = collate_padded(samples, n_max=30, pad_multiple=T)

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

    if os.environ.get("PROFILE_CHAINED") == "1":
        # K steps chained in ONE program (lax.scan) — the bench's
        # sustained regime.  The per-call mode below dispatches each
        # step over the tunnel, which inserts ~10 ms inter-step gaps in
        # the trace and makes intra-step device idle unattributable
        # (measured round 5: per-call span 14.7 ms/iter vs 2.95
        # sustained).  In this mode the trace shows steps back-to-back,
        # so gaps between XLA-Ops events are REAL device idle.
        @jax.jit
        def step(p, o, key, arrays):
            def body(carry, k):
                p, o = carry
                g = jax.grad(loss_main)(p, arrays,
                                        jax.random.fold_in(key, k))
                updates, o = tx.update(g, o, p)
                return (optax.apply_updates(p, updates), o), None

            (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(K))
            return p, o, jax.tree.leaves(p)[0].sum()

        return step, params, opt_state, arrays

    @jax.jit
    def step(p, o, key, arrays):
        g = jax.grad(loss_main)(p, arrays, key)
        updates, o = tx.update(g, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, jax.tree.leaves(p)[0].sum()

    return step, params, opt_state, arrays


def summarize(logdir, top=40):
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("NO xplane.pb found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    print("parsing", path, flush=True)
    data = ProfileData.from_file(path)

    for plane in data.planes:
        pname = plane.name
        is_device = any(s in pname for s in ("TPU", "tpu", "device", "Axon"))
        by_line = defaultdict(float)
        by_op = defaultdict(float)
        for line in plane.lines:
            lname = line.name
            for ev in line.events:
                ms = ev.duration_ns / 1e6
                by_line[lname] += ms
                by_op[(lname, ev.name)] += ms
        if not by_line:
            continue
        print(f"\n=== plane: {pname} ===")
        for lname, ms in sorted(by_line.items(), key=lambda kv: -kv[1])[:8]:
            print(f"  line {lname}: {ms:9.3f} ms total")
        if not is_device:
            continue
        busiest = max(by_line, key=lambda k: by_line[k])
        print(f"\n  top ops on '{busiest}' (total {by_line[busiest]:.3f}"
              f" ms over {N_ITERS} iters):")
        ops = [(n, ms) for (l, n), ms in by_op.items() if l == busiest]
        for name, ms in sorted(ops, key=lambda kv: -kv[1])[:top]:
            print(f"    {ms:9.3f} ms  {ms / N_ITERS:7.3f} ms/iter  {name[:110]}")


def main():
    print("devices:", jax.devices(), f"B={B} T={T} K={K}", flush=True)
    import logging
    logging.basicConfig(level=logging.INFO)
    step, params, opt_state, arrays = build()
    t0 = time.time()
    p, o, chk = step(params, opt_state, jax.random.PRNGKey(7), arrays)
    float(chk)
    print(f"compiled+warm in {time.time() - t0:.0f}s", flush=True)

    os.makedirs(OUT, exist_ok=True)
    chained = os.environ.get("PROFILE_CHAINED") == "1"
    with jax.profiler.trace(OUT):
        if chained:
            # one dispatch = K chained steps; two calls so the trace
            # has a clean interior window
            for k in range(2):
                p, o, chk = step(p, o, jax.random.fold_in(
                    jax.random.PRNGKey(8), k), arrays)
                float(chk)
        else:
            for k in range(K):
                p, o, chk = step(p, o, jax.random.fold_in(
                    jax.random.PRNGKey(8), k), arrays)
            float(chk)  # sync inside the trace window
    print("trace captured", flush=True)
    summarize(OUT)


if __name__ == "__main__":
    main()
