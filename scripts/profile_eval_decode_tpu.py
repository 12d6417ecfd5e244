"""Component-level profile of the fused eval program on real TPU.

Round-1 TODO / VERDICT weak #5: after the BiLSTM one-scan fusion and the
B=128 batch amortization, is the 31-step free-decode scan still the
bottleneck of evaluation?  This script times each stage of the fused eval
program (ops/eval_fused.py) as an isolated jitted program at bench shapes
and prints a breakdown table:

    stack    in-projection + WaveNet dilated stack + GN/ReLU (XLA at
             B=128: the fused kernels' VMEM gate falls back past 32 MB)
    bilstm   MaskedBiLSTM over z + decoder-init projections
    decoder  the 31-step free-decode loop (DecoderCell, lax.scan)
    fc_head  16x nearest upsample + 1x1 conv framewise head
    viterbi  dense Viterbi prep + DP scan (frame_sampling 30)
    forward  full model.forward (free decode) for cross-checking
    fused    the production build_fused_eval program (end to end)

Timing: enqueue K calls, force with one scalar readback (TPU executes
launches in order); best of 3 trials (CLAUDE.md: single trials swing with
compile-service load).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_eval_decode_tpu.py [B]
"""

import os
import sys
import time
from functools import partial

import numpy as np

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = int(sys.argv[1]) if len(sys.argv) > 1 else (4 if SMALL else 128)
T, D, M = (128, 16, 6) if SMALL else (2048, 2048, 48)
S_DEC = 31
FRAME_SAMPLING = 30
K = 3 if SMALL else 10


def timeit(label, fn, force):
    """fn() enqueues one call; force(out) -> scalar readback."""
    t0 = time.time()
    out = fn()
    force(out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(K):
            out = fn()
        force(out)
        best = min(best, (time.time() - t0) / K * 1e3)
    print(f"{label:10s} {best:9.2f} ms   (compile+first {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model
    from mucon_tpu.models.model import batch_to_arrays
    from mucon_tpu.models.layers import time_mask
    from mucon_tpu.models.lstm import MaskedBiLSTM
    from mucon_tpu.models.mucon import DecoderCell, GroupNormMasked, TorchDense
    from mucon_tpu.models.temporal import Conv1x1, WaveNetBlock
    from mucon_tpu.ops.eval_fused import build_fused_eval
    from mucon_tpu.ops.viterbi import _dense_viterbi_scan
    from scripts.bench_train_step_tpu import make_batch
    import scripts.bench_train_step_tpu as btst

    btst.B, btst.T, btst.D, btst.M = B, T, D, M

    print(f"devices: {jax.devices()}  B={B} T={T} D={D} M={M}", flush=True)

    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
    model = create_model(cfg, num_classes=M, max_decoding_steps=S_DEC,
                         input_feature_size=D)
    batch, _ = make_batch()
    arrays = jax.device_put(batch_to_arrays(batch))
    params = jax.device_put(model.init_params(jax.random.PRNGKey(0), batch))

    H = cfg.model.ft.hidden_size
    HS = cfg.model.fs.encoder.hidden_size
    net = model.net

    # ---- stage programs --------------------------------------------------
    ft_mod = WaveNetBlock(
        in_channels=D, stages=tuple(cfg.model.ft.stages), out_dims=H,
        pooling=cfg.model.ft.pooling,
        pooling_layers=tuple(cfg.model.ft.pooling_layers),
        pooling_type=cfg.model.ft.pooling_type,
        dropout_rate=cfg.model.ft.dropout_rate,
        leaky=cfg.model.ft.leaky_relu,
    )
    gn_mod = GroupNormMasked(cfg.model.ft.last_gn_num_groups, H)

    @jax.jit
    def run_stack(p, feats, frames):
        z, tz = ft_mod.apply({"params": p["ft"]}, feats, frames, False)
        z = gn_mod.apply({"params": p["ft_last_gn"]}, z, tz)
        z = jax.nn.relu(z)
        return z * time_mask(z.shape[1], tz, z.dtype)[:, :, None], tz

    z0, tz0 = jax.device_put(run_stack(params, arrays["feats"],
                                       arrays["num_frames"]))

    lstm_mod = MaskedBiLSTM(input_size=H, hidden_size=HS, bidirectional=True)

    @jax.jit
    def run_bilstm(p, z, tz):
        enc_out, (h_n, c_n) = lstm_mod.apply(
            {"params": p["fs_encoder_lstm"]}, z, tz
        )
        h0 = TorchDense(2 * HS, HS).apply(
            {"params": p["fs_encoder_hidden_out"]}, h_n
        )
        c0 = TorchDense(2 * HS, HS).apply(
            {"params": p["fs_encoder_cn_out"]}, c_n
        )
        return enc_out, h0, c0

    enc_out0, h00, c00 = jax.device_put(run_bilstm(params, z0, tz0))

    cell = DecoderCell(hidden=cfg.model.fs.decoder.hidden_size,
                       enc_out_dim=2 * HS, num_classes=M,
                       embed_dropout=0.0, train=False, free_decode=True)

    @jax.jit
    def run_decoder(p, enc_out, h0, c0, tz):
        attn_pre = enc_out @ p["fs_decoder_attention_W1"]
        tz_mask = time_mask(enc_out.shape[1], tz)
        sos = jnp.full((enc_out.shape[0],), M + 1, jnp.int32)

        def step(carry, _):
            carry, out = cell.apply({"params": p["decoder"]}, carry,
                                    sos, enc_out, attn_pre, tz_mask)
            return carry, out

        _, (lp, ln, tok) = jax.lax.scan(step, (h0, c0, sos), None,
                                        length=S_DEC)
        return lp, ln, tok

    fc_mod = Conv1x1(H, M)

    @jax.jit
    def run_fc(p, z, tz, frames):
        from mucon_tpu.models.layers import interpolate_nearest_time

        z_up = interpolate_nearest_time(z, tz, T, frames)
        return fc_mod.apply({"params": p["conv_classifier"]}, z_up)

    rng = np.random.RandomState(1)
    seg_lp = jax.device_put(jnp.asarray(
        np.log(1e-6 + rng.rand(B, T, M).astype(np.float32))))
    n_max = int(arrays["transcript"].shape[1])
    trs = jax.device_put(jnp.asarray(
        rng.randint(0, M, size=(B, n_max)).astype(np.int32)))
    n_dec = jax.device_put(jnp.asarray(
        rng.randint(3, min(12, n_max), size=(B,)).astype(np.int32)))
    lam = jax.device_put(jnp.asarray(
        (20 + 100 * rng.rand(B, M)).astype(np.float32)))
    max_len = 400 if SMALL else 2000
    fs = 10 if SMALL else FRAME_SAMPLING

    vit = jax.jit(jax.vmap(partial(
        _dense_viterbi_scan, frame_sampling=fs, max_len=max_len,
        n_max=n_max, l_max=max_len // fs)))

    fwd = jax.jit(partial(model.forward, train=False, teacher_forcing=False))
    fused = build_fused_eval(model, teacher_forcing=False,
                             frame_sampling=fs, max_len=max_len)

    # ---- measure ---------------------------------------------------------
    sync = lambda x: float(jnp.sum(x))
    res = {}
    res["stack"] = timeit("stack", lambda: run_stack(
        params, arrays["feats"], arrays["num_frames"]),
        lambda o: sync(o[0]))
    res["bilstm"] = timeit("bilstm", lambda: run_bilstm(params, z0, tz0),
                           lambda o: sync(o[0]))
    res["decoder"] = timeit("decoder", lambda: run_decoder(
        params, enc_out0, h00, c00, tz0), lambda o: sync(o[0]))
    res["fc_head"] = timeit("fc_head", lambda: run_fc(
        params, z0, tz0, arrays["num_frames"]), sync)
    res["viterbi"] = timeit("viterbi", lambda: vit(
        seg_lp, arrays["num_frames"], trs, n_dec, lam),
        lambda o: sync(o[0]))
    res["forward"] = timeit("forward", lambda: fwd(params, arrays),
                            lambda o: sync(o.segmentation))
    res["fused"] = timeit("fused", lambda: fused(params, arrays),
                          lambda o: sync(o["vit_score"]))

    parts = ["stack", "bilstm", "decoder", "fc_head", "viterbi"]
    tot = sum(res[p] for p in parts)
    print("\n---- breakdown ----", flush=True)
    for p in parts:
        print(f"{p:10s} {res[p]:9.2f} ms  {100 * res[p] / tot:5.1f}% of "
              f"stage sum", flush=True)
    print(f"stage sum  {tot:9.2f} ms   vs fused end-to-end "
          f"{res['fused']:.2f} ms (XLA cross-stage fusion + one dispatch)",
          flush=True)
    print(f"forward-only {res['forward']:.2f} ms; fused adds viterbi "
          f"prep+DP: {res['fused'] - res['forward']:+.2f} ms", flush=True)
    print(f"eval throughput (fused): {B / res['fused'] * 1e3:.0f} videos/s",
          flush=True)


if __name__ == "__main__":
    main()
