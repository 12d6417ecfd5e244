"""bf16 compile probe on the real TPU.

CLAUDE.md round-1 limitation: bf16 forward jit of even a small WaveNetBlock
hung the remote XLA compiler (>18 min). Re-run this after any tunnel /
toolchain change; if it passes, escalate to the full train step and then
consider flipping tpu.compute_dtype.

Stages (each printed as it completes):
  1. tiny bf16 matmul jit
  2. small WaveNetBlock bf16 forward
  3. full-size encoder bf16 forward (11 layers, C=128, T=2048)
  4. full train step bf16 (tiny shapes)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def stage(name):
    print(f"[{time.strftime('%H:%M:%S')}] {name}", flush=True)


def main():
    stage(f"devices: {jax.devices()}")

    # 1. tiny bf16 matmul
    a = jnp.ones((128, 128), jnp.bfloat16)
    f = jax.jit(lambda x: (x @ x).astype(jnp.float32).sum())
    t0 = time.time()
    print("matmul:", float(f(a)), f"({time.time()-t0:.1f}s)", flush=True)

    # 2. small WaveNetBlock bf16 forward
    from mucon_tpu.models.temporal import WaveNetBlock

    rng = np.random.RandomState(0)
    for label, stages, pools, C, T in [
        ("small-block", (1, 2, 4), (0, 1), 32, 128),
        ("full-block", (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024),
         (1, 2, 4, 8), 128, 2048),
    ]:
        stage(f"{label} bf16 forward ...")
        block = WaveNetBlock(
            in_channels=C, stages=stages, out_dims=C, pooling_layers=pools,
            dropout_rate=0.0, dtype=jnp.bfloat16,
        )
        x = jnp.asarray(rng.randn(2, T, C).astype(np.float32))
        ln = jnp.asarray([T, T // 2], jnp.int32)
        variables = block.init(jax.random.PRNGKey(0), x, ln, False)
        g = jax.jit(lambda v, x, l: block.apply(v, x, l, False)[0].astype(jnp.float32).sum())
        t0 = time.time()
        val = float(g(variables, x, ln))
        stage(f"{label}: {val:.3f} ({time.time()-t0:.1f}s)")

    # 4. full train step bf16 on tiny shapes via graft dryrun-style build
    stage("tiny bf16 train step ...")
    import __graft_entry__ as ge

    cfg, model = ge._build(
        {
            "model.ft.stages": [1, 2, 4],
            "model.ft.pooling_layers": [0, 1],
            "model.ft.hidden_size": 16,
            "model.ft.last_gn_num_groups": 4,
            "model.fs.encoder.hidden_size": 16,
            "model.fs.decoder.hidden_size": 16,
            "tpu.compute_dtype": "bfloat16",
        },
        num_classes=6,
        feat_dim=16,
    )
    import optax

    from mucon_tpu.harness.optim import create_optimizer
    from mucon_tpu.models import batch_to_arrays
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target

    samples = []
    for i in range(2):
        T = 48
        tr = rng.randint(0, 6, size=3).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(T, 16).astype(np.float32),
            gt_label=rng.randint(0, 6, size=T).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=7),
            transcript_tf_target=create_tf_target(tr, eos_i=6),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=16)
    arrays = batch_to_arrays(batch)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    opt_state = tx.init(params)
    @jax.jit
    def step(params, opt_state, rng, arrays):
        def loss_fn(p):
            fwd = model.forward(p, arrays, rng=rng, train=True, teacher_forcing=True)
            loss = model.loss(fwd, arrays, teacher_forcing=True)
            return loss.main, loss

        grads, loss = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1), arrays)
    stage(f"train step loss={float(loss.main):.4f} ({time.time()-t0:.1f}s)")
    stage("ALL BF16 STAGES PASSED")


if __name__ == "__main__":
    main()
