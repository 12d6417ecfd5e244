"""Explicit sequence-parallel halo exchange for dilated temporal convs.

`parallel/mesh.py` shards the time axis and lets GSPMD insert the halo
collectives automatically.  This module is the EXPLICIT version of the same
primitive (SURVEY.md §2.12): under `shard_map`, each shard exchanges only
the `dilation` boundary frames with its ring neighbors via
`jax.lax.ppermute` — a kernel-3 dilated conv needs exactly one left halo
and one right halo per layer, never a full all-gather.  Useful when manual
scheduling beats the compiler (very long sequences, many chips) and as the
building block for hand-fused sequence-parallel kernels.

Requires halo <= local shard length (dilation d over S shards of T frames:
d <= T/S), which holds for the production shapes (d <= 1024, T >= 10k,
S <= 8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _ring_perm(axis_name: str, direction: int):
    n = jax.lax.axis_size(axis_name)
    # non-cyclic neighbor exchange: missing links produce zeros, which is
    # exactly the zero padding a SAME conv expects at sequence ends
    if direction > 0:
        return [(i, i + 1) for i in range(n - 1)]
    return [(i + 1, i) for i in range(n - 1)]


def halo_shift(x_local, offset: int, axis_name: str = "seq"):
    """Per-shard equivalent of `shift_time` (out[t] = x[t + offset]) with
    boundary rows fetched from ring neighbors.

    x_local: [B x T_local x C] block of a time-sharded array.
    """
    if offset == 0:
        return x_local
    B, T, C = x_local.shape
    d = abs(offset)
    assert d <= T, f"halo {d} exceeds local shard length {T}"
    if offset > 0:
        # need the FIRST d rows of the NEXT shard appended at our end;
        # every shard sends its first rows backward (src i+1 -> dst i)
        halo = jax.lax.ppermute(
            x_local[:, :d], axis_name, _ring_perm(axis_name, -1)
        )
        return jnp.concatenate([x_local[:, d:], halo], axis=1)
    # offset < 0: need the LAST d rows of the PREVIOUS shard prepended
    halo = jax.lax.ppermute(
        x_local[:, -d:], axis_name, _ring_perm(axis_name, +1)
    )
    return jnp.concatenate([halo, x_local[:, :-d]], axis=1)


def dilated_conv3_sp(x_local, w, b, dilation: int, axis_name: str = "seq"):
    """Kernel-3 dilated conv on a time-sharded input (inside shard_map).

    w: [3 x C_in x C_out], b: [C_out] — same packed layout as
    models/temporal.DilatedConv3 and the Pallas kernel.
    """
    y = (
        halo_shift(x_local, -dilation, axis_name) @ w[0]
        + x_local @ w[1]
        + halo_shift(x_local, dilation, axis_name) @ w[2]
    )
    return y + b[None, None, :]


def make_sp_dilated_conv(mesh: Mesh, dilation: int, axis_name: str = "seq"):
    """shard_map-wrapped dilated conv: [B x T x C] time-sharded in and out."""
    spec = P(None, axis_name, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, P(None, None, None), P(None)),
        out_specs=spec,
    )
    def conv(x, w, b):
        return dilated_conv3_sp(x, w, b, dilation, axis_name)

    return conv
