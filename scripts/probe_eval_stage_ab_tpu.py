"""Decompose the fused eval program at bench shapes: forward vs dense
Viterbi DP vs the on-device traceback walk.

Session-11 context: the end-to-end eval probe read the DEVICE program at
43 ms (B=128, T 1500-2100, pad 512) while session 5 measured the fused
program at 12.15 ms (fixed T=2048).  Which stage grew?  Three programs,
each returning a single SCALAR checksum (scalar readback is the only
trustworthy sync on this rig; a scalar output also removes d2h wire from
the timing):

  F : forward only (encoder + decoder + heads)
  D : forward + Poisson prep + dense Viterbi DP
  W : D + traceback_positions_device walk

Interleaved best-of-REPS; DP cost = D - F, walk cost = W - D.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_eval_stage_ab_tpu.py
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = 4 if SMALL else 128
T_MIN, T_MAX = (256, 512) if SMALL else (1500, 2100)
PAD = 512
M, D, N_TR = (6, 16, 4) if SMALL else (48, 2048, 6)
REPS = 2 if SMALL else 5
FS = 10 if SMALL else 30
MAX_LEN = 2000


def main():
    print("devices:", jax.devices(), flush=True)
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data.batching import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.ops.viterbi import (
        traceback_positions_device,
        viterbi_precompute,
    )
    from mucon_tpu.ops.viterbi_pallas import dense_viterbi_pallas

    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16

    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        T = int(rng.randint(T_MIN, T_MAX + 1))
        tr = rng.randint(0, M, size=N_TR).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(T, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=T).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"ev{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=PAD)
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = jax.device_put(batch_to_arrays(batch))

    use_pallas_vit = jax.default_backend() != "cpu"
    l_max = MAX_LEN // FS

    def fwd_and_prep(params, arrays):
        fwd = model.forward(params, arrays, train=False,
                            teacher_forcing=False)
        seg_lp = jax.nn.log_softmax(fwd.segmentation, axis=-1)
        n_max = arrays["transcript"].shape[1]
        steps = jnp.arange(fwd.lengths.shape[1])
        n_dec = jnp.maximum(fwd.n_steps - 1, 1)
        toks = fwd.tokens[:, :n_max]
        trs = jnp.where(toks >= M, 0, toks)
        trs = jnp.where(steps[None, :n_max] < n_dec[:, None], trs, 0)
        len_valid = steps[None, :] < n_dec[:, None]
        logits = jnp.where(len_valid, fwd.lengths, -jnp.inf)
        rel = jax.nn.softmax(logits, axis=1)
        tr_1hot = jax.nn.one_hot(trs, M) * len_valid[:, :n_max, None]
        lam_sum = jnp.einsum("bs,bsm->bm", rel[:, :n_max], tr_1hot)
        lam = lam_sum * arrays["num_frames"].astype(jnp.float32)[:, None]
        count = jnp.sum(tr_1hot, axis=1)
        lam = lam / jnp.maximum(count, 1.0)
        lam = jnp.where(lam == 0.0, 1.0, lam)
        return seg_lp, trs, n_dec, lam

    def run_dp(seg_lp, trs, n_dec, lam, num_frames):
        W, pois, k_valid = jax.vmap(
            partial(viterbi_precompute, frame_sampling=FS,
                    max_len=MAX_LEN, l_max=l_max)
        )(seg_lp, num_frames, trs, lam)
        score, best_l, bps = dense_viterbi_pallas(
            W, pois, k_valid, n_dec,
            frame_sampling=FS, max_len=MAX_LEN,
            interpret=not use_pallas_vit,
        )
        return score, best_l, bps, k_valid

    @jax.jit
    def prog_f(params, arrays):
        seg_lp, trs, n_dec, lam = fwd_and_prep(params, arrays)
        return (jnp.sum(seg_lp) + jnp.sum(trs) + jnp.sum(lam)
                + jnp.sum(n_dec)).astype(jnp.float32)

    @jax.jit
    def prog_d(params, arrays):
        seg_lp, trs, n_dec, lam = fwd_and_prep(params, arrays)
        score, best_l, bps, k_valid = run_dp(
            seg_lp, trs, n_dec, lam, arrays["num_frames"])
        return (jnp.sum(score) + jnp.sum(best_l) + jnp.sum(bps)
                + jnp.sum(k_valid)).astype(jnp.float32)

    @jax.jit
    def prog_w(params, arrays):
        seg_lp, trs, n_dec, lam = fwd_and_prep(params, arrays)
        score, best_l, bps, k_valid = run_dp(
            seg_lp, trs, n_dec, lam, arrays["num_frames"])
        pos = traceback_positions_device(bps, k_valid, n_dec, best_l)
        return (jnp.sum(score) + jnp.sum(pos)).astype(jnp.float32)

    progs = {"F fwd+prep": prog_f, "D +viterbi DP": prog_d,
             "W +device walk": prog_w}
    # compile all first
    for name, p in progs.items():
        t0 = time.perf_counter()
        float(p(params, arrays))
        print(f"compiled {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    best = {name: float("inf") for name in progs}
    for _ in range(REPS):
        for name, p in progs.items():  # interleaved
            t0 = time.perf_counter()
            float(p(params, arrays))
            best[name] = min(best[name], time.perf_counter() - t0)

    ms = {name: v * 1e3 for name, v in best.items()}
    for name, v in ms.items():
        print(f"{name:16s}: {v:8.2f} ms", flush=True)
    print(f"DP cost (D-F)   : {ms['D +viterbi DP'] - ms['F fwd+prep']:8.2f} ms")
    print(f"walk cost (W-D) : {ms['W +device walk'] - ms['D +viterbi DP']:8.2f} ms")


if __name__ == "__main__":
    main()
