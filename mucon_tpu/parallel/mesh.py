"""Device mesh + sharded training step (the scale-out path).

The reference is strictly single-device batch-1 (SURVEY.md §2.12); this
module is the new capability: SPMD data parallelism and sequence (context)
parallelism over a `jax.sharding.Mesh` with axes:

* "data" — videos of the padded batch; gradients all-reduce over ICI
  automatically (params are replicated, loss is a mean over the sharded
  batch, XLA inserts the psum);
* "seq"  — the time axis of the frame features; the dilated-conv encoder's
  halo exchanges are inserted by GSPMD from the sharding annotations
  (pad/shift ops over a sharded axis lower to collective-permutes), which
  is the idiomatic TPU replacement for hand-written NCCL halo code.

Everything is driven by `jax.jit` with NamedShardings — one program, any
mesh shape, including 1x1 (single chip).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


logger = logging.getLogger("mucon_tpu.kernel_routing")


def mesh_is_data_only(mesh: Mesh) -> bool:
    """True when only the "data" axis is sharded (seq == model == 1) — the
    regime where the batch-local fused Pallas programs compose with the
    mesh via shard_map (each shard runs the kernel on its local batch)."""
    return (
        mesh.shape.get("seq", 1) == 1 and mesh.shape.get("model", 1) == 1
    )


def make_mesh(
    n_data: int = -1, n_seq: int = 1, n_model: int = 1, devices=None
) -> Mesh:
    """Mesh with ("data", "seq", "model") axes. n_data=-1 uses all
    remaining devices.  The "model" axis is the tensor-parallel axis
    (param_specs shards the conv-stack channels over it); it defaults to 1
    and is a pure pass-through then."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_data == -1:
        assert n % (n_seq * n_model) == 0, (n, n_seq, n_model)
        n_data = n // (n_seq * n_model)
    assert n_data * n_seq * n_model <= n, (n_data, n_seq, n_model, n)
    grid = devices[: n_data * n_seq * n_model].reshape(n_data, n_seq, n_model)
    return Mesh(grid, ("data", "seq", "model"))


def mesh_from_config(cfg, devices=None) -> Mesh:
    n_model = int(getattr(cfg.tpu.mesh, "model", 1))
    return make_mesh(
        cfg.tpu.mesh.data, cfg.tpu.mesh.seq, n_model, devices=devices
    )


def param_specs(params):
    """Tensor-parallel PartitionSpecs for the parameter tree.

    The conv stack ("ft") carries essentially all parameter FLOPs (the
    2048->128 in-projection plus 11 dilated C x C layers over every
    frame); its channel (last) axis is sharded over the mesh's "model"
    axis — column-parallel in the Megatron sense, with GSPMD inserting
    the boundary collectives from the annotations alone.  The decoder /
    LSTM / head parameters stay replicated: at hidden size 128 a sharded
    recurrent scan would pay a collective per step for no MXU win.  New
    capability vs the single-device reference (SURVEY.md §2.12 TP row).
    """

    def spec_for(path, leaf):
        top = getattr(path[0], "key", None)
        if top == "ft" and leaf.ndim >= 1:
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """Commit the parameter tree to the mesh: ft channels model-sharded
    (param_specs), everything else replicated.  Re-initializing the
    optimizer from the committed tree makes its state inherit the same
    layout."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs
    )


def batch_specs() -> dict:
    """PartitionSpecs for the PaddedBatch array dict."""
    return dict(
        feats=P("data", "seq", None),
        feats_scale=P("data", "seq"),  # int8 wire (quantize_feats_int8)
        num_frames=P("data"),
        gt_label=P("data", "seq"),
        transcript=P("data", None),
        transcript_len=P("data"),
        tf_input=P("data", None),
        tf_target=P("data", None),
        absolute_lengths=P("data", None),
        fully_supervised=P("data"),
    )


def shard_batch_arrays(mesh: Mesh, arrays: dict) -> dict:
    """device_put the host batch dict with data/seq shardings."""
    specs = batch_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in arrays.items()
    }


def pad_batch_to_multiple(arrays: dict, multiple: int) -> dict:
    """Pad the batch (video) axis to a mesh-divisible size with dummy
    videos (num_frames=16 so downsampling never hits 0).  NOTE: the batch
    loss is a mean over videos, so dummy videos DO dilute it — use this
    only for inference/eval shapes.  Training instead keeps divisible
    remainder batches and drops (with a warning) only non-divisible ones
    (SimpleTrainer passes batch_divisor=n_data to the loader)."""
    b = arrays["num_frames"].shape[0]
    target = -(-b // multiple) * multiple
    if target == b:
        return arrays
    pad = target - b

    def pad_arr(v):
        widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        return np.pad(np.asarray(v), widths)

    out = {k: pad_arr(v) for k, v in arrays.items()}
    out["num_frames"][b:] = 16
    out["transcript_len"][b:] = 1
    return out


def _make_shardmap_grad_fn(
    model, mesh: Mesh, teacher_forcing: bool, array_keys
):
    """Per-shard grad computation over the "data" axis: each shard runs the
    normal single-device forward (INCLUDING the fused Pallas kernels — the
    round-2 mesh path forced XLA) on its local batch, then pmean-combines
    grads and the loss tree over ICI.  The batch loss is a mean over videos
    (losses.py:214), so the pmean of equal-size shard means equals the
    global mean."""
    specs = batch_specs()
    specs = {k: specs[k] for k in array_keys}

    def local_grads(params, rng, arrays):
        # decorrelate dropout across data shards; with dropout off this is
        # trace-only and the step matches the unsharded math exactly
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(p):
            fwd = model.forward(
                p, arrays, rng=rng, train=True,
                teacher_forcing=teacher_forcing,
            )
            loss = model.loss(fwd, arrays, teacher_forcing=teacher_forcing)
            return loss.main, loss

        grads, loss = jax.grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        return grads, loss

    return jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), {k: specs[k] for k in specs}),
        out_specs=(P(), P()),
        check_vma=False,  # pallas_call carries no varying-axis rule
    )


def make_sharded_train_step(
    model,
    tx,
    mesh: Mesh,
    teacher_forcing: bool = True,
):
    """jitted (params, opt_state, rng, arrays) -> (params, opt_state, loss)
    with params replicated and batches sharded over (data, seq).

    Two regimes (VERDICT r2 #1 — the mesh path must keep the kernels):

    * data-only mesh + kernels enabled -> shard_map over "data": every
      shard invokes the benchmarked fused Pallas programs on its local
      batch, grads pmean over ICI;
    * seq/model sharding (or kernels off) -> GSPMD: XLA partitions the
      un-fused stack from the sharding annotations (halo exchanges and
      channel collectives inserted automatically).

    The jitted step is built lazily per arrays-key-set: the batch dict's
    keys depend on the wire format (the int8 quantized wire adds a
    `feats_scale` leaf), and jit in_shardings / shard_map in_specs must
    match the pytree exactly.
    """
    repl = NamedSharding(mesh, P())
    shardmap = mesh_is_data_only(mesh) and model.kernels_active(train=True)
    logger.info(
        "sharded train step: shard_map over data axis "
        f"(n_data={mesh.shape['data']}), per-shard Pallas kernels active"
        if shardmap
        else "sharded train step: GSPMD (mesh "
        f"{dict(mesh.shape)}), XLA-partitioned forward"
    )
    built = {}

    def _build(array_keys):
        arr_shardings = {
            k: NamedSharding(mesh, batch_specs()[k]) for k in array_keys
        }

        if shardmap:
            grad_fn = _make_shardmap_grad_fn(
                model, mesh, teacher_forcing, array_keys
            )

            @partial(
                jax.jit,
                donate_argnums=(0, 1),
                in_shardings=(None, None, repl, arr_shardings),
                out_shardings=(None, None, None),
            )
            def step(params, opt_state, rng, arrays):
                grads, loss = grad_fn(params, rng, arrays)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            return step

        @partial(
            jax.jit,
            donate_argnums=(0, 1),
            in_shardings=(None, None, repl, arr_shardings),
            out_shardings=(None, None, None),
        )
        def step(params, opt_state, rng, arrays):
            def loss_fn(p):
                # use_pallas=False: the fused kernels are single-device
                # programs; under GSPMD the XLA stack shards/halo-exchanges
                # automatically
                fwd = model.forward(
                    p, arrays, rng=rng, train=True,
                    teacher_forcing=teacher_forcing, use_pallas=False,
                )
                loss = model.loss(fwd, arrays, teacher_forcing=teacher_forcing)
                return loss.main, loss

            grads, loss = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def step(params, opt_state, rng, arrays):
        key = frozenset(arrays)
        if key not in built:
            built[key] = _build(sorted(arrays))
        return built[key](params, opt_state, rng, arrays)

    return step


def make_sharded_grad_step(
    model,
    mesh: Mesh,
    teacher_forcing: bool,
    accumulate_grad_every: int,
):
    """jitted (params, acc, rng, arrays) -> (acc, loss) with sharded batches
    — the gradient-accumulation counterpart of make_sharded_train_step.
    Built lazily per arrays-key-set (see make_sharded_train_step)."""
    repl = NamedSharding(mesh, P())
    k = float(accumulate_grad_every)
    shardmap = mesh_is_data_only(mesh) and model.kernels_active(train=True)
    if shardmap:
        logger.info(
            "sharded grad step: shard_map over data axis "
            f"(n_data={mesh.shape['data']}), per-shard Pallas kernels active"
        )
    built = {}

    def _build(array_keys):
        arr_shardings = {
            k2: NamedSharding(mesh, batch_specs()[k2]) for k2 in array_keys
        }

        if shardmap:
            grad_fn = _make_shardmap_grad_fn(
                model, mesh, teacher_forcing, array_keys
            )

            @partial(
                jax.jit,
                donate_argnums=(1,),
                in_shardings=(None, None, repl, arr_shardings),
            )
            def grad_step(params, acc, rng, arrays):
                grads, loss = grad_fn(params, rng, arrays)
                acc = jax.tree.map(
                    lambda a, g: a + g / k, acc, grads
                )
                return acc, loss

            return grad_step

        @partial(
            jax.jit,
            donate_argnums=(1,),
            in_shardings=(None, None, repl, arr_shardings),
        )
        def grad_step(params, acc, rng, arrays):
            def loss_fn(p):
                fwd = model.forward(
                    p, arrays, rng=rng, train=True,
                    teacher_forcing=teacher_forcing, use_pallas=False,
                )
                loss = model.loss(fwd, arrays, teacher_forcing=teacher_forcing)
                return loss.main / k, loss

            grads, loss = jax.grad(loss_fn, has_aux=True)(params)
            acc = jax.tree.map(jnp.add, acc, grads)
            return acc, loss

        return grad_step

    def grad_step(params, acc, rng, arrays):
        key = frozenset(arrays)
        if key not in built:
            built[key] = _build(sorted(arrays))
        return built[key](params, acc, rng, arrays)

    return grad_step


def make_sharded_forward(model, mesh: Mesh, teacher_forcing: bool = False):
    """jitted sharded inference forward (for evaluation at scale).
    Built lazily per arrays-key-set (see make_sharded_train_step)."""
    built = {}

    def _build(array_keys):
        arr_shardings = {
            k: NamedSharding(mesh, batch_specs()[k]) for k in array_keys
        }

        @partial(jax.jit, in_shardings=(None, arr_shardings))
        def fwd(params, arrays):
            return model.forward(
                params, arrays, train=False, teacher_forcing=teacher_forcing,
                use_pallas=False,
            )

        return fwd

    def fwd(params, arrays):
        key = frozenset(arrays)
        if key not in built:
            built[key] = _build(sorted(arrays))
        return built[key](params, arrays)

    return fwd
