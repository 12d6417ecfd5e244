"""Cost of dropout-mask generation in the v3 trainable-kernel step.

The fwd generates XLA-threefry uniforms for every layer activation
([B x t x C], ~8.1M values/step at the flagship shape) and feeds them to
the kernel as inputs. Threefry is ~20 VPU ops per word, so the mask
stream is a suspected few-hundred-us slice of the ~1.4 ms encoder fwd.

Arms (K-chained jits, scalar-readback sync, best-of-3):
  masks_tf   : current threefry masks (_make_masks)
  masks_rbg  : same shapes via the unsafe_rbg PRNG (hardware RNG path,
               much cheaper per word on TPU)
  enc_drop   : kernel fwd with dropout .25 (mask gen + feed + kernel)
  enc_nodrop : kernel fwd with dropout 0 (no masks at all)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_mask_rng_tpu.py
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 5 if SMALL else 50
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)


def timed(label, fn, *args):
    out = fn(*args)
    float(out)  # compile + scalar-readback sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(fn(*args))
        best = min(best, (time.time() - t0) / K * 1e3)
    print(f"{label:11s}: {best:7.3f} ms/iter (K={K}, best-of-3)", flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.ops.wavenet_train_pallas_v3 import _make_masks, _plan

    cfg = get_cfg_defaults()
    stages = tuple(cfg.model.ft.stages)
    pooling_layers = tuple(cfg.model.ft.pooling_layers)
    if SMALL:
        stages, pooling_layers = (1, 2, 4), (0, 1)
    C = 16 if SMALL else cfg.model.ft.hidden_size
    t_ins, *_ = _plan(stages, pooling_layers, T)
    n_vals = sum(B * t * C for t in t_ins)
    print(f"mask values/step: {n_vals/1e6:.1f}M over {len(t_ins)} layers",
          flush=True)

    @jax.jit
    def masks_tf_k(seed0):
        def body(c, k):
            ms = _make_masks(seed0 + k, 0.25, t_ins, B, C)
            return c + sum(m[0, 0, 0] for m in ms), None
        return jax.lax.scan(body, 0.0, jnp.arange(K))[0]

    @jax.jit
    def masks_rbg_k(seed0):
        def body(c, k):
            key = jax.random.wrap_key_data(
                jnp.tile((seed0 + k).astype(jnp.uint32), 4),
                impl="unsafe_rbg",
            )
            tot = 0.0
            for i, t in enumerate(t_ins):
                u = jax.random.uniform(jax.random.fold_in(key, i), (B, t, C))
                m = (u >= 0.25).astype(jnp.float32) / 0.75
                tot = tot + m[0, 0, 0]
            return c + tot, None
        return jax.lax.scan(body, 0.0, jnp.arange(K))[0]

    t_tf = timed("masks_tf", masks_tf_k, jnp.int32(7))
    t_rbg = timed("masks_rbg", masks_rbg_k, jnp.int32(7))
    print(f"mask-gen speedup rbg vs threefry: {t_tf / t_rbg:.2f}x", flush=True)

    # whole encoder fwd with and without dropout (kernel path)
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import create_model

    def build(drop):
        c2 = get_cfg_defaults()
        if SMALL:
            c2.model.ft.stages = list(stages)
            c2.model.ft.pooling_layers = list(pooling_layers)
            c2.model.ft.hidden_size = C
            c2.model.ft.last_gn_num_groups = 4
            c2.model.fs.encoder.hidden_size = C
            c2.model.fs.decoder.hidden_size = C
        c2.model.ft.dropout_rate = drop
        c2.model.ft.last_dropout_rate = drop
        c2.model.fs.decoder.embedding_dropout = drop
        return create_model(c2, num_classes=M, max_decoding_steps=31,
                            input_feature_size=D)

    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        t = int(rng.randint(T // 2, T + 1))
        tr = rng.randint(0, M, size=5).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(t, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=T)

    for label, drop in (("enc_drop", 0.25), ("enc_nodrop", 0.0)):
        model = build(drop)
        from mucon_tpu.models import batch_to_arrays

        arrays = jax.device_put(batch_to_arrays(batch))
        params = model.init_params(jax.random.PRNGKey(0), batch)

        @partial(jax.jit, static_argnums=())
        def enc_k(p, key, arrays):
            def body(c, k):
                z, _ = model._encode_pallas_train(
                    p, arrays, jax.random.fold_in(key, k)
                )
                assert z is not None, "kernel path did not engage"
                return c + z.sum(), None
            return jax.lax.scan(body, 0.0, jnp.arange(K))[0]

        timed(label, enc_k, params, jax.random.PRNGKey(3), arrays)


if __name__ == "__main__":
    main()
