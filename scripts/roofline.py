"""Analytic speed-of-light model for the flagship MuCon train/eval step.

Pure arithmetic (no jax): counts MXU MACs and minimum HBM traffic for the
default config shapes, converts to time at v5e peak rates, and compares to
the measured step times recorded in CLAUDE.md / docs.  The point is to
know how far each measured number sits from the hardware ceiling and
which regime (FLOP vs bandwidth) each stage is in.

v5e (one chip): 197 TFLOP/s bf16, ~49 TFLOP/s f32 (MXU), 819 GB/s HBM.
Run: python scripts/roofline.py  (prints a markdown table)
"""

V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0
V5E_HBM_GBS = 819.0


def wavenet_layer_T(T, stages, pooling_layers):
    """Per-layer input length: pool-by-2 AFTER each layer index in
    pooling_layers (models/temporal.py; reference temporal.py:77-147)."""
    Ts = []
    t = T
    for i in range(len(stages)):
        Ts.append(t)
        if i in pooling_layers:
            t //= 2
    return Ts, t


def encoder_macs(B, T, D, C, M, stages, pooling_layers):
    Ts, t_out = wavenet_layer_T(T, stages, pooling_layers)
    in_proj = B * T * D * C
    # each WaveNet layer: dilated conv3 (3*C*C) + 1x1 (C*C) per frame
    stack = sum(B * t * (3 * C * C + C * C) for t in Ts)
    out_proj = B * t_out * C * C  # Conv1x1 out-projection
    y_head = B * T * C * M  # framewise head on the UN-pooled sequence
    return {
        "in_proj(2048->128)": in_proj,
        "wavenet_stack(11 layers)": stack,
        "out_proj": out_proj,
        "framewise_head": y_head,
    }, t_out


def decoder_macs(B, Tz, C, N, M):
    # BiLSTM over Tz: 2 dirs x 4 gates x (C*C input + C*C recurrent)
    bilstm = B * Tz * 2 * 4 * (C * C + C * C)
    # attention-LSTM decode, N+1 steps: LSTM cell (4*(2C in + C rec)*C)
    # + attention scores (Tz*C) + context (Tz*C) + class/len heads
    att_lstm = B * (N + 1) * (4 * (2 * C + C) * C + 2 * Tz * C + C * (M + 2))
    return {"bilstm_encoder": bilstm, "attention_decoder": att_lstm}


def hbm_bytes_min(B, T, D, C, dtype_bytes=4):
    """Minimum HBM traffic for the encoder fwd: read features once, write
    pooled activations once; weights are KBs (negligible).  The fused
    Pallas stack keeps all intermediates in VMEM, so this is its floor."""
    feats = B * T * D * dtype_bytes
    x_proj = B * T * C * dtype_bytes  # write of the projected input
    z_out = B * (T // 16) * C * dtype_bytes
    return feats + x_proj + z_out


def fmt_flops(macs):
    return macs * 2 / 1e9  # GFLOP


def main():
    B, T, D, C, M, N = 8, 2048, 2048, 128, 48, 6
    stages = list(range(11))
    pooling = [1, 2, 4, 8]

    enc, t_out = encoder_macs(B, T, D, C, M, stages, pooling)
    dec = decoder_macs(B, t_out, C, N, M)

    total_macs = sum(enc.values()) + sum(dec.values())
    fwd_gflop = fmt_flops(total_macs)
    # train step ~= fwd + 2x fwd FLOPs for bwd (dgrad + wgrad)
    step_gflop = 3 * fwd_gflop

    t_f32_ms = step_gflop / V5E_F32_TFLOPS  # GFLOP / (TFLOP/s) = ms
    t_bf16_ms = step_gflop / V5E_BF16_TFLOPS
    hbm_ms = hbm_bytes_min(B, T, D, C) * 3 / V5E_HBM_GBS / 1e6  # fwd+bwd reread

    print(f"## Roofline — flagship train step (B={B}, T={T}, D={D}, C={C})\n")
    print("| component | GFLOP (fwd) |")
    print("|---|---|")
    for k, v in {**enc, **dec}.items():
        print(f"| {k} | {fmt_flops(v):.2f} |")
    print(f"| **total fwd** | **{fwd_gflop:.2f}** |")
    print()
    print(f"- train step (3x fwd FLOPs): {step_gflop:.1f} GFLOP")
    print(f"- MXU floor: f32 {t_f32_ms:.2f} ms, bf16 {t_bf16_ms:.2f} ms")
    print(f"- HBM floor (features in/out x3): {hbm_ms:.3f} ms")
    print(f"- measured: XLA f32 11.15 ms, Pallas v3 f32 5.79 ms, bf16 8.34 ms (XLA, dropout)")
    print(f"- Pallas f32 step = {t_f32_ms / 5.79 * 100:.0f}% of the f32 MXU roofline")


if __name__ == "__main__":
    main()
