"""Fused device-side evaluation program: forward + Viterbi prep + dense DP.

The naive eval path pulls each video's [T x M] log-probs to the host
(predict), re-derives the Poisson means there, and pushes the matrix back
for decoding.  This program keeps everything on device in ONE jitted call:

    forward (free or teacher-forced decode)
    -> log_softmax framewise logits, argmax labels
    -> s-head transcript + masked-softmax relative lengths
    -> per-class Poisson means via the one-hot averaging trick
       (reference evaluators.py:152-168, vectorized as a scatter-add)
    -> batched dense Viterbi scan (mucon_tpu/ops/viterbi.py)

    -> batched backpointer walk (traceback_positions_device)

Only small tensors reach the host, packed as TWO leaves (the axon d2h
pays a per-array roundtrip): argmax labels [B x T] (int8) plus one f32
block carrying tokens, lengths, scores and the per-window transcript
positions [B x K] — the backpointer table itself never leaves the
device.  `unpack_eval_wire` restores the flat per-key dict exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def build_fused_eval(model, teacher_forcing: bool, frame_sampling: int,
                     max_len: int = 2000, use_pallas_viterbi: bool = False,
                     use_pallas_forward: bool = True, mesh=None):
    """Returns a jitted fn(params, arrays) -> dict of host-ready outputs.

    `use_pallas_forward=False` forces the XLA forward (needed when the
    inputs are sharded over a seq/model mesh — the fused single-device
    kernels don't partition; GSPMD shards the XLA graph instead).

    `mesh` (data-only) wraps the WHOLE program in shard_map over the
    "data" axis: every batch-local stage — fused forward kernels, Viterbi
    DP, pointer walk, wire packing — runs per shard on its local videos,
    so the mesh path keeps the benchmarked kernels (VERDICT r2 #1)."""
    S = frame_sampling

    def run(params, arrays):
        fwd = model.forward(
            params, arrays, train=False, teacher_forcing=teacher_forcing,
            use_pallas=None if use_pallas_forward else False,
        )
        B, T, M = fwd.segmentation.shape
        # Everything downstream consumes PER-POSITION transforms of the
        # framewise logits, and the full-T logits are a nearest UPSAMPLE
        # of the Tz-level head output — argmax, log_softmax, and window
        # sums all commute with the index selection.  So the program
        # works at Tz and never materializes [B x T x M] on device: the
        # round-5 xplane decomposition measured the full-T path
        # (kCustom gather 1.92 ms + layout copy 0.22 + log_softmax 0.10
        # at B=128/Tpad=2560) at ~16% of the fused program; XLA
        # dead-code-eliminates fwd.segmentation from this jit.  y_argmax
        # is EXACT (argmax-at-Tz then index-gather); Viterbi W tables
        # match the full-T sums to f32 reassociation (~1e-6) — see
        # ops/viterbi.py::viterbi_precompute_z.
        from mucon_tpu.models.layers import nearest_upsample_indices

        seg_lp_z = jax.nn.log_softmax(fwd.segmentation_z, axis=-1)
        up_idx = nearest_upsample_indices(
            fwd.tz_lengths, T, arrays["num_frames"]
        )  # [B x T] monotone (consumed by the window-sum counts only)
        # y labels ship at Tz: the full-T label tensor is a pure index
        # selection that costs 1.9-3.3 ms/batch of kCustom row-DMA on
        # device (measured both ways, round-5 xplane) but is a trivial
        # take_along_axis on HOST — and the y wire shrinks 16x.
        # unpack_eval_wire performs the host upsample (same f32 floor
        # arithmetic, bit-exact labels).
        y_z = jnp.argmax(seg_lp_z, axis=-1).astype(jnp.int32)  # [B x Tz]

        n_max = arrays["transcript"].shape[1]
        steps = jnp.arange(fwd.lengths.shape[1])

        if teacher_forcing:
            # alignment mode: GT transcript, lengths over the first N steps
            trs = arrays["transcript"]
            n_dec = arrays["transcript_len"]
        else:
            # free decode: EOS-dropped predicted transcript
            n_dec = jnp.maximum(fwd.n_steps - 1, 1)
            toks = fwd.tokens[:, :n_max]
            trs = jnp.where(toks >= M, 0, toks)
        trs = jnp.where(steps[None, :n_max] < n_dec[:, None], trs, 0)

        # relative lengths: softmax over the first n_dec raw scalars
        len_valid = steps[None, :] < n_dec[:, None]
        logits = jnp.where(len_valid, fwd.lengths, -jnp.inf)
        rel = jax.nn.softmax(logits, axis=1)  # [B x S_steps]

        # per-class Poisson means, one-hot averaging (evaluators.py:152-168)
        tr_1hot = jax.nn.one_hot(trs, M) * len_valid[:, :n_max, None]
        lam_sum = jnp.einsum("bs,bsm->bm", rel[:, :n_max], tr_1hot)
        lam = lam_sum * arrays["num_frames"].astype(jnp.float32)[:, None]
        count = jnp.sum(tr_1hot, axis=1)
        lam = lam / jnp.maximum(count, 1.0)
        lam = jnp.where(lam == 0.0, 1.0, lam)

        l_max = max_len // S
        from mucon_tpu.ops.viterbi import viterbi_precompute_z

        W, pois, k_valid = jax.vmap(
            partial(
                viterbi_precompute_z,
                frame_sampling=S,
                max_len=max_len,
                l_max=l_max,
            )
        )(seg_lp_z, up_idx, arrays["num_frames"], trs, lam)

        if use_pallas_viterbi:
            from mucon_tpu.ops.viterbi_pallas import (
                dense_viterbi_pallas,
                dense_viterbi_pallas_batched,
                viterbi_batched_vmem_bytes,
            )

            from mucon_tpu.models.routing import log_route

            Bv, Kv, Nv = W.shape
            # whole-batch program (one K-step chain of [B*N]-wide vector
            # work) when its footprint fits VMEM; per-video grid otherwise
            vmem = viterbi_batched_vmem_bytes(Bv, Kv, Nv, l_max)
            if vmem <= 14 << 20:
                vit_fn = dense_viterbi_pallas_batched
                log_route(
                    f"viterbi DP B={Bv} K={Kv} N={Nv}: whole-batch Pallas "
                    f"program ({vmem >> 20} MB VMEM)"
                )
            else:
                vit_fn = dense_viterbi_pallas
                log_route(
                    f"viterbi DP B={Bv} K={Kv} N={Nv}: per-video grid "
                    f"kernel (batched footprint {vmem >> 20} MB > 14 MB)"
                )
            score, best_l, bps = vit_fn(
                W, pois, k_valid, n_dec,
                frame_sampling=S, max_len=max_len,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            from mucon_tpu.ops.viterbi import _dense_viterbi_from_tables

            decode = jax.vmap(
                partial(
                    _dense_viterbi_from_tables,
                    frame_sampling=S,
                    max_len=max_len,
                    n_max=n_max,
                    l_max=l_max,
                )
            )
            score, best_l, bps, k_valid = decode(W, pois, k_valid, n_dec)

        # on-device pointer walk: ship [B x K] positions (~43 KB at
        # B=128) instead of the [B x K-1 x n_max] backpointer table
        # (~1.3 MB) — the largest d2h cost of the eval batch
        from mucon_tpu.ops.viterbi import traceback_positions_device

        vit_pos = traceback_positions_device(bps, k_valid, n_dec, best_l)

        # int8 labels halve-and-half the y wire (M < 128 always here)
        y_wire = y_z.astype(jnp.int8) if M < 128 else y_z

        # pack everything else into ONE f32 block: the axon-tunnel d2h
        # pays a per-ARRAY roundtrip, so 10 leaves -> 2 leaves is a
        # measured ~2 ms/batch win (scripts/probe_eval_async_tpu.py);
        # f32 is exact for every packed int here (all < 2^24)
        parts = dict(
            tokens=fwd.tokens,
            n_steps=fwd.n_steps,
            rel_lengths=rel,
            n_dec=n_dec,
            transcripts=trs,
            vit_score=score,
            vit_best_l=best_l,
            vit_pos=vit_pos,
            vit_k_valid=k_valid,
            tz_len=fwd.tz_lengths,
        )
        wire = jnp.concatenate(
            [
                parts[k].astype(jnp.float32).reshape(B, -1)
                for k in WIRE_KEYS
            ],
            axis=1,
        )
        return dict(y_argmax=y_wire, wire=wire)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mucon_tpu.parallel.mesh import batch_specs, mesh_is_data_only

        assert mesh_is_data_only(mesh), dict(mesh.shape)
        # built lazily per arrays-key-set: the int8 quantized wire adds a
        # feats_scale leaf and shard_map in_specs must match the pytree
        built = {}

        def _build(array_keys):
            specs = {k: batch_specs()[k] for k in array_keys}
            sharded_run = jax.shard_map(
                run,
                mesh=mesh,
                in_specs=(P(), specs),
                out_specs={"y_argmax": P("data"), "wire": P("data")},
                check_vma=False,  # pallas_call carries no varying-axis rule
            )
            return jax.jit(
                sharded_run,
                in_shardings=(
                    NamedSharding(mesh, P()),
                    {k: NamedSharding(mesh, s) for k, s in specs.items()},
                ),
            )

        def call(params, arrays):
            key = frozenset(arrays)
            if key not in built:
                built[key] = _build(sorted(arrays))
            return built[key](params, arrays)

        return call

    return jax.jit(run)


# fixed wire layout: (key, trailing width as a fn of (n_steps_dim, n_max,
# K)); K (the window count of vit_pos) is derived from the total width
WIRE_KEYS = (
    "tokens",
    "n_steps",
    "rel_lengths",
    "n_dec",
    "transcripts",
    "vit_score",
    "vit_best_l",
    "vit_pos",
    "vit_k_valid",
    "tz_len",
)
_INT_KEYS = {
    "tokens", "n_steps", "n_dec", "transcripts", "vit_best_l",
    "vit_pos", "vit_k_valid", "tz_len",
}


def upsample_labels_host(y_z, tz_len, num_frames, t_full: int):
    """Host (numpy) nearest upsample of Tz-level label rows to t_full —
    the same floor(t * src/dst) f32 arithmetic as
    models/layers.py::nearest_upsample_indices, so labels are bit-exact
    vs a device-side upsample."""
    import numpy as np

    y_z = np.asarray(y_z)
    tz_len = np.asarray(tz_len).astype(np.int32)
    scale = tz_len.astype(np.float32) / np.maximum(
        np.asarray(num_frames).astype(np.float32), 1.0
    )
    t_ids = np.arange(t_full, dtype=np.float32)
    idx = np.floor(t_ids[None, :] * scale[:, None]).astype(np.int32)
    idx = np.clip(idx, 0, np.maximum(tz_len - 1, 0)[:, None])
    return np.take_along_axis(y_z, idx, axis=1)


def unpack_eval_wire(out: dict, n_steps_dim: int, n_max: int,
                     num_frames=None, t_full: int | None = None) -> dict:
    """Host-side inverse of the wire packing in `build_fused_eval`.

    `out` is the device_get result {y_argmax [B,Tz], wire [B,W]}; returns
    the flat per-key dict the consumers index (ints restored exactly —
    every packed integer is < 2^24).  `n_steps_dim` is the model's
    max_decoding_steps, `n_max` the transcript pad width.

    The y labels travel at the encoder's Tz resolution (the full-T
    tensor is a pure index selection — expensive on device, trivial
    here); pass `num_frames [B]` and `t_full` (the padded frame count)
    to get the full-T `y_argmax` — bit-exact vs the old device-side
    upsample."""
    import numpy as np

    wire = np.asarray(out["wire"])
    W = wire.shape[1]
    fixed = {
        "tokens": n_steps_dim,
        "n_steps": 1,
        "rel_lengths": n_steps_dim,
        "n_dec": 1,
        "transcripts": n_max,
        "vit_score": 1,
        "vit_best_l": 1,
        "vit_k_valid": 1,
        "tz_len": 1,
    }
    widths = [
        fixed[k] if k in fixed else W - sum(fixed.values())
        for k in WIRE_KEYS
    ]
    assert all(w >= 1 for w in widths), (W, widths)
    cols = np.split(wire, np.cumsum(widths)[:-1], axis=1)
    res = {"y_argmax_z": np.asarray(out["y_argmax"])}
    for k, c in zip(WIRE_KEYS, cols):
        if k in ("n_steps", "n_dec", "vit_score", "vit_best_l",
                 "vit_k_valid", "tz_len"):
            c = c[:, 0]
        res[k] = c.astype(np.int64) if k in _INT_KEYS else c
    if num_frames is not None:
        if t_full is None:
            raise ValueError("pass t_full with num_frames")
        res["y_argmax"] = upsample_labels_host(
            res["y_argmax_z"], res["tz_len"], num_frames, t_full
        )
    return res
