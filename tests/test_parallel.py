"""Sharded-path tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import collate_padded
from mucon_tpu.harness.optim import create_optimizer
from mucon_tpu.models import batch_to_arrays, create_model
from mucon_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    pad_batch_to_multiple,
    shard_batch_arrays,
    shard_params,
)
from tests.test_model import M, D, NMAX, make_sample, small_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    rng = np.random.RandomState(0)
    samples = [make_sample(rng, 48 + 16 * i, 3, f"v{i}") for i in range(8)]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=64)
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (2, 2, 2), (4, 1, 2)])
def test_sharded_train_step_runs(setup, shape):
    cfg, model, params, batch = setup
    mesh = make_mesh(*shape)
    tx = create_optimizer(cfg, model.param_partition(params))
    before = jax.tree.map(np.asarray, params)  # snapshot (step donates)
    params_in = jax.tree.map(jnp.array, params)
    if mesh.shape["model"] > 1:
        params_in = shard_params(mesh, params_in)
    opt_state = tx.init(params_in)
    step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
    arrays = shard_batch_arrays(mesh, batch_to_arrays(batch))
    new_params, opt_state, loss = step(
        params_in, opt_state, jax.random.PRNGKey(1), arrays
    )
    assert np.isfinite(float(loss.main))
    # params actually moved
    delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(before))
    )
    assert delta > 0


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_dp_sp_matches_single_device(setup):
    """Sharding must not change the math: loss on a (2,2) mesh == loss on
    a (1,1) mesh to float tolerance."""
    cfg, model, params, batch = setup
    arrays = batch_to_arrays(batch)

    def loss_on(mesh_shape):
        mesh = make_mesh(*mesh_shape)
        tx = create_optimizer(cfg, model.param_partition(params))
        params_in = jax.tree.map(jnp.array, params)  # fresh (step donates)
        if mesh.shape["model"] > 1:
            params_in = shard_params(mesh, params_in)
        opt_state = tx.init(params_in)
        step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
        sharded = shard_batch_arrays(mesh, arrays)
        # same rng key -> same dropout pattern regardless of mesh
        _, _, loss = step(params_in, opt_state, jax.random.PRNGKey(7), sharded)
        return float(loss.main)

    l_single = loss_on((1, 1))
    l_dp = loss_on((4, 1))
    l_dpsp = loss_on((2, 2))
    l_tp = loss_on((2, 1, 4))
    l_dpsptp = loss_on((2, 2, 2))
    assert l_dp == pytest.approx(l_single, rel=2e-4)
    assert l_dpsp == pytest.approx(l_single, rel=2e-4)
    assert l_tp == pytest.approx(l_single, rel=2e-4)
    assert l_dpsptp == pytest.approx(l_single, rel=2e-4)


@pytest.mark.interpret
def test_shardmap_kernel_train_matches_single(setup):
    """VERDICT r2 #1: a data-only mesh must keep the fused Pallas kernels.
    With use_pallas(_train)=True forced (interpret mode on CPU) the
    shard_map step must produce the same loss and updated params as the
    unsharded kernel step (dropout off -> the per-shard rng fold_in is
    trace-only)."""
    cfg0, model0, params, batch = setup
    cfg = cfg0.clone()
    cfg.tpu.use_pallas = True
    cfg.tpu.use_pallas_train = True
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout_rate = 0.0
    cfg.model.fs.decoder.embedding_dropout = 0.0
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    assert model.kernels_active(train=True)
    arrays = batch_to_arrays(batch)
    tx = create_optimizer(cfg, model.param_partition(params))

    # unsharded reference step, same kernel path
    def single_step(p, rng, arr):
        def loss_fn(q):
            fwd = model.forward(q, arr, rng=rng, train=True,
                                teacher_forcing=True)
            loss = model.loss(fwd, arr, teacher_forcing=True)
            return loss.main, loss

        grads, loss = jax.grad(loss_fn, has_aux=True)(p)
        import optax

        updates, _ = tx.update(grads, tx.init(p), p)
        return optax.apply_updates(p, updates), loss

    p_single, l_single = single_step(
        jax.tree.map(jnp.array, params), jax.random.PRNGKey(3), arrays
    )

    mesh = make_mesh(4, 1)
    step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
    params_in = jax.tree.map(jnp.array, params)
    opt_state = tx.init(params_in)
    p_mesh, _, l_mesh = step(
        params_in, opt_state, jax.random.PRNGKey(3),
        shard_batch_arrays(mesh, arrays),
    )

    assert float(l_mesh.main) == pytest.approx(float(l_single.main), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_mesh), jax.tree.leaves(p_single)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        )


@pytest.mark.interpret
def test_shardmap_kernel_eval_matches_single(tmp_path):
    """Sharded fused eval on a data-only mesh with kernels forced
    (shard_map + interpret-mode Pallas) == single-device kernel eval."""
    import dataclasses
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import MuConEvaluator

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path / "data")
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 220
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.tpu.batch_size = 2
    cfg.tpu.pad_multiple = 64
    cfg.tpu.use_pallas = True
    cfg.evaluator.viterbi.frame_sampling = 10

    test_db = handel_dataset(cfg, train=False)
    model = create_model(cfg, test_db.get_num_classes(),
                         test_db.max_transcript_length + 1, test_db.feat_dim)
    params = model.init_params(jax.random.PRNGKey(0))

    results = {}
    for mode in ("single", "mesh"):
        c = cfg.clone()
        c.tpu.mesh.enable = mode == "mesh"
        c.tpu.mesh.data = 2
        ev = MuConEvaluator(cfg=c, test_db=test_db, model=model)
        ev.viterbi_mode(True)
        assert (ev._eval_mesh() is not None) == (mode == "mesh")
        results[mode] = dataclasses.asdict(ev.evaluate(params))

    for k, sv in results["single"].items():
        mv = results["mesh"][k]
        if isinstance(sv, tuple):
            for a, b in zip(sv, mv):
                assert a == pytest.approx(b, abs=1e-4), k
        else:
            assert sv == pytest.approx(mv, abs=1e-4), k


def test_pad_batch_to_multiple():
    rng = np.random.RandomState(0)
    samples = [make_sample(rng, 48, 3, f"v{i}") for i in range(3)]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)
    arrays = {k: np.asarray(v) for k, v in batch_to_arrays(batch).items()}
    padded = pad_batch_to_multiple(arrays, 4)
    assert padded["feats"].shape[0] == 4
    assert padded["num_frames"][3] == 16
    assert padded["transcript_len"][3] == 1


def test_halo_exchange_conv_matches_unsharded():
    """Explicit shard_map halo-exchange dilated conv == unsharded conv."""
    from mucon_tpu.models.temporal import shift_time
    from mucon_tpu.parallel.halo import make_sp_dilated_conv

    rng = np.random.RandomState(0)
    B, T, C = 2, 64, 8
    for dilation in (1, 3, 8):
        x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        w = jnp.asarray(rng.randn(3, C, C).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C).astype(np.float32))

        ref = (
            shift_time(x, -dilation) @ w[0]
            + x @ w[1]
            + shift_time(x, dilation) @ w[2]
            + b[None, None, :]
        )

        mesh = make_mesh(2, 4)  # 4-way sequence parallel
        conv = make_sp_dilated_conv(mesh, dilation)
        out = conv(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_trainer_mesh_integration(tmp_path):
    """SimpleTrainer with tpu.mesh.enable trains on the virtual mesh and
    produces the same first-step loss as the single-device trainer (same
    seed => same batch composition and rng stream)."""
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import SimpleTrainer

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path / "data")
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 260
    cfg.trainer.root = str(tmp_path / "runs")
    cfg.trainer.num_epochs = 1
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout_rate = 0.0
    cfg.model.fs.decoder.embedding_dropout = 0.0
    cfg.tpu.batch_size = 2  # 6 train videos -> 3 full batches, no remainder
    cfg.tpu.pad_multiple = 64

    train_db = handel_dataset(cfg, train=True)
    model = create_model(cfg, train_db.get_num_classes(),
                         train_db.max_transcript_length + 1, train_db.feat_dim)

    import json

    losses = {}
    for mode in ("single", "mesh"):
        c = cfg.clone()
        c.tpu.mesh.enable = mode == "mesh"
        c.tpu.mesh.data = 2
        t = SimpleTrainer(c, f"mesh_{mode}", train_db, model)
        assert (t.mesh is not None) == (mode == "mesh")
        t.train()
        events = [
            json.loads(l)
            for l in open(t.run_folder / "events.jsonl")
            if json.loads(l)["kind"] == "train"
        ]
        losses[mode] = events[0]["main"]

    assert losses["mesh"] == pytest.approx(losses["single"], rel=1e-5)


def test_trainer_mesh_rejects_bad_batch_size(tmp_path):
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import SimpleTrainer

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path / "data")
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 200
    cfg.trainer.root = str(tmp_path / "runs")
    cfg.tpu.mesh.enable = True
    cfg.tpu.mesh.data = 2
    cfg.tpu.batch_size = 3  # not divisible by n_data=2

    train_db = handel_dataset(cfg, train=True)
    model = create_model(cfg, train_db.get_num_classes(),
                         train_db.max_transcript_length + 1, train_db.feat_dim)
    with pytest.raises(ValueError, match="multiple of the mesh data axis"):
        SimpleTrainer(cfg, "mesh_bad", train_db, model)


def test_evaluator_mesh_matches_single_device(tmp_path):
    """Sharded fused eval (with dummy-video padding for mesh divisibility)
    must produce the same 24-field result as the single-device evaluator."""
    import dataclasses
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import MuConEvaluator

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path / "data")
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 260
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.tpu.batch_size = 4  # test split has 2 videos -> dummy padding to 4
    cfg.tpu.pad_multiple = 64
    cfg.evaluator.viterbi.frame_sampling = 10

    test_db = handel_dataset(cfg, train=False)
    model = create_model(cfg, test_db.get_num_classes(),
                         test_db.max_transcript_length + 1, test_db.feat_dim)
    params = model.init_params(jax.random.PRNGKey(0))

    results = {}
    for mode in ("single", "mesh"):
        c = cfg.clone()
        c.tpu.mesh.enable = mode == "mesh"
        c.tpu.mesh.data = 4
        ev = MuConEvaluator(cfg=c, test_db=test_db, model=model)
        ev.viterbi_mode(True)
        assert (ev._eval_mesh() is not None) == (mode == "mesh")
        results[mode] = dataclasses.asdict(ev.evaluate(params))

    for k, sv in results["single"].items():
        mv = results["mesh"][k]
        if isinstance(sv, tuple):
            for a, b in zip(sv, mv):
                assert a == pytest.approx(b, abs=1e-4), k
        else:
            assert sv == pytest.approx(mv, abs=1e-4), k


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_trainer_mesh_grad_accumulation(tmp_path):
    """Grad accumulation under a mesh == grad accumulation single-device."""
    import json
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import SimpleTrainer

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path / "data")
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 260
    cfg.trainer.root = str(tmp_path / "runs")
    cfg.trainer.num_epochs = 1
    cfg.trainer.accumulate_grad_every = 2
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout_rate = 0.0
    cfg.model.fs.decoder.embedding_dropout = 0.0
    cfg.tpu.batch_size = 2
    cfg.tpu.pad_multiple = 64

    train_db = handel_dataset(cfg, train=True)
    model = create_model(cfg, train_db.get_num_classes(),
                         train_db.max_transcript_length + 1, train_db.feat_dim)

    finals = {}
    for mode in ("single", "mesh"):
        c = cfg.clone()
        c.tpu.mesh.enable = mode == "mesh"
        c.tpu.mesh.data = 2
        t = SimpleTrainer(c, f"accmesh_{mode}", train_db, model)
        t.train()
        finals[mode] = [np.asarray(x) for x in jax.tree.leaves(t.params)]

    for a, b in zip(finals["single"], finals["mesh"]):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_tp_checkpoint_roundtrip(tmp_path):
    """VERDICT r2 #7: save under a 2x2x2 mesh with model-sharded ft params
    + optimizer state, restore onto a fresh trainer, and check (a) the
    restored leaves carry the SAME mesh layout as before (not a silently
    re-picked replicated one), (b) bit-equality with what was saved, and
    (c) one more step runs on the restored state."""
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import SimpleTrainer

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path / "data")
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 260
    cfg.trainer.root = str(tmp_path / "runs")
    cfg.trainer.num_epochs = 1
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.tpu.batch_size = 2
    cfg.tpu.pad_multiple = 64
    cfg.tpu.mesh.enable = True
    cfg.tpu.mesh.data = 2
    cfg.tpu.mesh.seq = 2
    cfg.tpu.mesh.model = 2

    train_db = handel_dataset(cfg, train=True)
    model = create_model(cfg, train_db.get_num_classes(),
                         train_db.max_transcript_length + 1, train_db.feat_dim)

    t1 = SimpleTrainer(cfg, "tp_ckpt", train_db, model)
    assert t1.mesh is not None and t1.mesh.shape["model"] == 2
    t1.train()
    t1.save_training()
    t1.wait_for_save()
    run, epoch = t1.latest_checkpoint()
    saved = jax.tree.map(np.asarray, jax.device_get(t1.params))
    saved_opt = jax.tree.map(np.asarray, jax.device_get(t1.opt_state))

    def model_axis_sharded(tree):
        leaves = [
            l for l in jax.tree.leaves(tree["ft"])
            if isinstance(l, jax.Array) and l.ndim >= 1
        ]
        assert leaves
        for l in leaves:
            assert "model" in tuple(l.sharding.spec), l.sharding

    model_axis_sharded(t1.params)

    t2 = SimpleTrainer(cfg, "tp_ckpt", train_db, model)
    t2.load_training(run, epoch)

    # (a) layouts re-committed, not replicated
    model_axis_sharded(t2.params)
    # (b) bit-equal round trip (params AND optimizer state)
    for a, b in zip(jax.tree.leaves(t2.params), jax.tree.leaves(saved)):
        np.testing.assert_array_equal(np.asarray(a), b)
    for a, b in zip(jax.tree.leaves(t2.opt_state), jax.tree.leaves(saved_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # (c) the restored state trains one more epoch
    t2._train_one_epoch()


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_full_depth_seq_parallel_matches_single():
    """Full-DEPTH stack (all 11 dilations 1..1024 with the 16x pooling
    ladder) under seq sharding == single device (VERDICT r2 #3).  At
    T=2048 with n_seq=2 the per-layer regimes sweep d < T_local (early
    layers), d == T_local exactly (layer 8: d=128, pooled T=256, local
    128), and d > T_global (layers 9-11: d=256..1024 vs pooled T=128) —
    every halo-exchange pattern GSPMD must emit for this model."""
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.data.general_dataset import Sample

    M_, D_ = 5, 8
    cfg = get_cfg_defaults()  # full 11-stage dilation ladder
    cfg.model.ft.hidden_size = 32
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout_rate = 0.0
    cfg.model.fs.decoder.embedding_dropout = 0.0
    assert cfg.model.ft.stages[-1] == 1024

    rng = np.random.RandomState(0)
    samples = []
    for i in range(2):
        T = 2048 - 100 * i
        transcript = rng.randint(0, M_, 4).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(T, D_).astype(np.float32),
            gt_label=rng.randint(0, M_, T).astype(np.int64),
            transcript=transcript,
            transcript_tf_input=create_tf_input(transcript, sos_i=M_ + 1),
            transcript_tf_target=create_tf_target(transcript, eos_i=M_),
            video_name=f"deep{i}",
        ))
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=2048)
    model = create_model(cfg, num_classes=M_, max_decoding_steps=NMAX + 1,
                         input_feature_size=D_)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)

    def loss_on(mesh_shape):
        mesh = make_mesh(*mesh_shape)
        tx = create_optimizer(cfg, model.param_partition(params))
        params_in = jax.tree.map(jnp.array, params)
        opt_state = tx.init(params_in)
        step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
        _, _, loss = step(params_in, opt_state, jax.random.PRNGKey(7),
                          shard_batch_arrays(mesh, arrays))
        return float(loss.main)

    assert loss_on((2, 2)) == pytest.approx(loss_on((1, 1)), rel=2e-4)


def test_long_sequence_seq_parallel_step():
    """North-star capability (SURVEY.md §2.12): a >10k-frame video trains
    with the time axis sharded across the mesh's seq dimension."""
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.data.general_dataset import Sample

    T = 12288  # > 10k frames
    M_, D_ = 5, 8
    cfg = small_cfg()

    rng = np.random.RandomState(0)
    transcript = rng.randint(0, M_, 4).astype(np.int64)
    sample = Sample(
        feats=rng.randn(T - 100, D_).astype(np.float32),
        gt_label=rng.randint(0, M_, T - 100).astype(np.int64),
        transcript=transcript,
        transcript_tf_input=create_tf_input(transcript, sos_i=M_ + 1),
        transcript_tf_target=create_tf_target(transcript, eos_i=M_),
        video_name="long",
    )
    batch = collate_padded([sample], n_max=NMAX, pad_multiple=2048)
    assert batch.feats.shape[1] >= 12288

    model = create_model(cfg, num_classes=M_, max_decoding_steps=NMAX + 1,
                         input_feature_size=D_)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    opt_state = tx.init(params)

    mesh = make_mesh(1, 8)  # all devices on the sequence axis
    step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
    arrays = shard_batch_arrays(mesh, batch_to_arrays(batch))
    _, _, loss = step(params, opt_state, jax.random.PRNGKey(1), arrays)
    assert np.isfinite(float(loss.main))


# ---------------------------------------------------------------------------
# Multi-host surface (parallel/multihost.py).  Single-process runs must be
# bitwise-identical to the mesh.py path — that is the contract that lets the
# whole trainer stack run unchanged on a multihost mesh.
# ---------------------------------------------------------------------------


def test_multihost_single_process_noop_and_mesh_equality():
    from mucon_tpu.parallel import (
        init_distributed,
        is_coordinator,
        make_multihost_mesh,
        process_batch_slice,
    )

    assert init_distributed() == (0, 1)  # no env, no args -> no-op
    assert is_coordinator()
    for shape in [(8, 1, 1), (4, 2, 1), (2, 2, 2)]:
        mh = make_multihost_mesh(*shape)
        ref = make_mesh(*shape)
        assert mh.shape == ref.shape
        assert [d.id for d in mh.devices.flat] == [
            d.id for d in ref.devices.flat
        ]
    assert process_batch_slice(16, make_multihost_mesh(8)) == slice(0, 16)


@pytest.mark.parametrize("feats_dtype", [None, "int8"])
def test_multihost_batch_assembly_matches_device_put(setup, feats_dtype):
    """make_array_from_process_local_data with one process must equal the
    device_put path bitwise, for the f32 AND the quantized int8 wire."""
    from mucon_tpu.parallel import shard_batch_arrays_multihost

    cfg, model, params, batch = setup
    arrays = (
        batch_to_arrays(batch, feats_dtype=feats_dtype)
        if feats_dtype
        else batch_to_arrays(batch)
    )
    mesh = make_mesh(4, 2)
    a = shard_batch_arrays(mesh, arrays)
    b = shard_batch_arrays_multihost(mesh, arrays)
    assert set(a) == set(b)
    for k in a:
        assert a[k].shape == b[k].shape, k
        assert a[k].dtype == b[k].dtype, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_multihost_train_step_matches_mesh_path(setup):
    """A full sharded train step fed by the multihost batch assembly must
    produce the identical loss to the device_put-fed step."""
    from mucon_tpu.parallel import shard_batch_arrays_multihost

    cfg, model, params, batch = setup
    arrays = batch_to_arrays(batch)
    mesh = make_mesh(8, 1)
    tx = create_optimizer(cfg, model.param_partition(params))

    def run(shard_fn):
        params_in = jax.tree.map(jnp.array, params)
        opt_state = tx.init(params_in)
        step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
        _, _, loss = step(
            params_in, opt_state, jax.random.PRNGKey(7), shard_fn(mesh, arrays)
        )
        return float(loss.main)

    assert run(shard_batch_arrays) == run(shard_batch_arrays_multihost)


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_trainer_multihost_single_process_matches_mesh(tmp_path):
    """tpu.mesh.multihost on a single process must be byte-for-byte the
    plain mesh path: same mesh, same first-step loss, checkpoints written
    (this process IS the coordinator)."""
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import SimpleTrainer

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path / "data")
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 260
    cfg.trainer.root = str(tmp_path / "runs")
    cfg.trainer.num_epochs = 1
    cfg.trainer.save_every = 1
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout_rate = 0.0
    cfg.model.fs.decoder.embedding_dropout = 0.0
    cfg.tpu.batch_size = 2
    cfg.tpu.pad_multiple = 64

    train_db = handel_dataset(cfg, train=True)
    model = create_model(cfg, train_db.get_num_classes(),
                         train_db.max_transcript_length + 1, train_db.feat_dim)

    import json

    losses = {}
    for mode in ("mesh", "multihost"):
        c = cfg.clone()
        c.tpu.mesh.enable = True
        c.tpu.mesh.data = 2
        c.tpu.mesh.multihost = mode == "multihost"
        t = SimpleTrainer(c, f"mh_{mode}", train_db, model)
        assert t.mesh is not None and t.mesh.shape["data"] == 2
        t.train()
        t.wait_for_save()
        assert (t.run_folder / "checkpoints").exists()
        events = [
            json.loads(l)
            for l in open(t.run_folder / "events.jsonl")
            if json.loads(l)["kind"] == "train"
        ]
        losses[mode] = events[0]["main"]

    assert losses["multihost"] == losses["mesh"]


@pytest.mark.slow
def test_multihost_two_process_train_step(setup, tmp_path):
    """REAL multi-controller run: two OS processes join jax.distributed
    over localhost (4 virtual CPU devices each -> one 8-device global
    mesh, cross-process collectives over Gloo), each materializes only
    ITS rows of the global batch, and both run one sharded train step.

    Asserts the multi-process contract end-to-end without pod hardware:
    every process sees the identical replicated loss/params (the grad
    pmean crossed the process boundary), and the result matches the
    single-process 8-device mesh step run in THIS process to float
    tolerance (cross-process reduction order may differ)."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    cfg, model, params, batch = setup
    arrays = batch_to_arrays(batch)

    # single-process reference on the same 8-device data mesh
    mesh = make_mesh(8, 1)
    tx = create_optimizer(cfg, model.param_partition(params))
    params_in = jax.tree.map(jnp.array, params)
    opt_state = tx.init(params_in)
    step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
    ref_params, _, ref_loss = step(
        params_in, opt_state, jax.random.PRNGKey(7),
        shard_batch_arrays(mesh, arrays),
    )
    ref_loss = float(ref_loss.main)
    ref_checksum = float(sum(
        float(np.abs(np.asarray(l)).sum()) for l in jax.tree.leaves(ref_params)
    ))

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).resolve().parents[1]), env.get("PYTHONPATH", "")]
    )
    worker = str(Path(__file__).resolve().parent / "multihost_worker.py")
    outs = [str(tmp_path / f"mh_{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 8 and r["local_devices"] == 4
    assert results[0]["rows"] == [0, 4] and results[1]["rows"] == [4, 8]
    # both processes computed the identical replicated result
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["param_checksum"] == results[1]["param_checksum"]
    # and it is the single-process math (reduction order may differ)
    assert results[0]["loss"] == pytest.approx(ref_loss, rel=2e-4)
    assert results[0]["param_checksum"] == pytest.approx(ref_checksum, rel=2e-4)


def multihost_trainer_cfg(data_root, run_root):
    """Tiny-model multihost trainer config shared between the two-process
    worker (tests/multihost_worker.py) and the in-process reference run —
    both must build byte-identical configs for the comparison to mean
    anything."""
    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(data_root)
    # train_fraction .75 -> exactly 8 train videos = one full global batch
    cfg.dataset.synthetic.num_videos = 11
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 260
    cfg.trainer.root = str(run_root)
    cfg.trainer.num_epochs = 2
    cfg.trainer.save_every = 1
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout_rate = 0.0
    cfg.model.fs.decoder.embedding_dropout = 0.0
    cfg.tpu.batch_size = 8
    cfg.tpu.pad_multiple = 64
    cfg.tpu.mesh.enable = True
    cfg.tpu.mesh.data = 8
    cfg.tpu.mesh.multihost = True
    cfg.evaluator.viterbi.frame_sampling = 10  # videos are 100-260 frames
    return cfg


@pytest.mark.slow
def test_multihost_two_process_trainer(tmp_path):
    """Trainer-level multi-controller run: two OS processes (4 virtual CPU
    devices each) run a full 2-epoch SimpleTrainer with
    tpu.mesh.multihost=true over a SHARED synthetic dataset.  Pins the
    trainer integration the step-level test can't see: per-process
    batch-row slicing inside _make_arrays, seed-identical loader order
    across processes, replicated per-epoch losses, and coordinator-only
    checkpoint writes."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import SimpleTrainer

    data_root = tmp_path / "data"
    cfg = multihost_trainer_cfg(data_root, tmp_path / "runs_ref")
    # pre-generate the synthetic dataset so concurrent workers only read
    train_db = handel_dataset(cfg, train=True)

    # single-process reference (8 local devices; multihost=True with one
    # process is pinned identical to the plain mesh path elsewhere)
    model = create_model(cfg, train_db.get_num_classes(),
                         train_db.max_transcript_length + 1, train_db.feat_dim)
    t = SimpleTrainer(cfg, "mh2proc", train_db, model)
    t.train()
    t.wait_for_save()
    ref_losses = [
        json.loads(line)["main"]
        for line in open(t.run_folder / "events.jsonl")
        if json.loads(line)["kind"] == "epoch"
    ]
    assert len(ref_losses) == 2

    # single-process reference for the multihost EVALUATION comparison
    # (deterministic init params; the workers use the same key)
    import dataclasses

    from mucon_tpu.harness import MuConEvaluator

    test_db = handel_dataset(cfg, train=False)
    ev_model = create_model(cfg, test_db.get_num_classes(),
                            test_db.max_transcript_length + 1,
                            test_db.feat_dim)
    ev = MuConEvaluator(cfg=cfg, test_db=test_db, model=ev_model)
    ev.viterbi_mode(True)
    ref_eval = dataclasses.asdict(
        ev.evaluate(ev_model.init_params(jax.random.PRNGKey(0)))
    )

    # single-process resume reference: restore epoch 1, run one more epoch
    c2 = multihost_trainer_cfg(data_root, tmp_path / "runs_ref")
    c2.trainer.num_epochs = 3
    t2 = SimpleTrainer(c2, "mh2proc", train_db, model, run_number=50)
    assert t2.resume_latest(run="0")
    t2.train()
    t2.wait_for_save()
    ref_resumed = [
        json.loads(line)["main"]
        for line in open(t2.run_folder / "events.jsonl")
        if json.loads(line)["kind"] == "epoch"
    ]
    assert len(ref_resumed) == 1

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).resolve().parents[1]), env.get("PYTHONPATH", "")]
    )
    worker = str(Path(__file__).resolve().parent / "multihost_worker.py")
    outs = [str(tmp_path / f"mh_t{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), outs[i],
             "trainer", str(data_root), str(tmp_path / f"runs_p{i}"),
             str(tmp_path / "runs_p0")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    # replicated metrics: every process logged the identical loss series
    assert results[0]["train_losses"] == results[1]["train_losses"]
    assert len(results[0]["train_losses"]) == 2
    # and it is the single-process math to reduction-order tolerance
    for got, want in zip(results[0]["train_losses"], ref_losses):
        assert got == pytest.approx(want, rel=2e-4)
    # one writer per run: only the coordinator checkpoints
    assert len(results[0]["checkpoints"]) == 2
    assert results[1]["checkpoints"] == []
    # multihost evaluation: every process computed the identical full
    # 24-field result, matching the single-process reference
    assert results[0]["eval"] == results[1]["eval"]
    for k, want in ref_eval.items():
        got = results[0]["eval"][k]
        if isinstance(want, tuple):
            for a, b in zip(want, got):
                assert b == pytest.approx(a, abs=1e-4), k
        else:
            assert got == pytest.approx(want, abs=1e-4), k
    # multihost resume: both processes restored the coordinator's epoch-1
    # checkpoint onto the global mesh and trained one more epoch
    assert results[0]["resumed_losses"] == results[1]["resumed_losses"]
    assert len(results[0]["resumed_losses"]) == 1
    assert results[0]["resumed_losses"][0] == pytest.approx(
        ref_resumed[0], rel=2e-4
    )


@pytest.mark.slow
@pytest.mark.interpret
def test_full_depth_shardmap_pallas_matches_single():
    """VERDICT r3 #3: the FULL-DEPTH flagship (all 11 dilated stages,
    hidden 128, full 16x pooling ladder) through shard_map + the v3 train
    kernel (interpret mode on CPU) must match the unsharded kernel step —
    the exact composition the v5e-8 projection assumes.  T=512 keeps the
    interpret cost tractable while every dilation regime (d < T, d == T,
    d > T after pooling) crosses the kernel."""
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target

    n_cls, feat_dim = 48, 256
    cfg = get_cfg_defaults()  # full-depth defaults: stages 1..1024
    cfg.tpu.use_pallas = True
    cfg.tpu.use_pallas_train = True
    cfg.model.ft.dropout_rate = 0.0  # parity needs rng-free shards; the
    cfg.model.ft.last_dropout_rate = 0.0  # dropout path runs in the dryrun
    cfg.model.fs.decoder.embedding_dropout = 0.0

    rng = np.random.RandomState(0)
    samples = []
    for i in range(8):
        T = 512 - 16 * (i % 4)
        tr = rng.randint(0, n_cls, size=6).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(T, feat_dim).astype(np.float32),
            gt_label=rng.randint(0, n_cls, size=T).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=n_cls + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=n_cls),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=512)
    model = create_model(cfg, num_classes=n_cls, max_decoding_steps=31,
                         input_feature_size=feat_dim)
    assert model.kernels_active(train=True)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)
    tx = create_optimizer(cfg, model.param_partition(params))

    def single_step(p, rng_key, arr):
        def loss_fn(q):
            fwd = model.forward(q, arr, rng=rng_key, train=True,
                                teacher_forcing=True)
            loss = model.loss(fwd, arr, teacher_forcing=True)
            return loss.main, loss

        grads, loss = jax.grad(loss_fn, has_aux=True)(p)
        import optax

        updates, _ = tx.update(grads, tx.init(p), p)
        return optax.apply_updates(p, updates), loss

    p_single, l_single = single_step(
        jax.tree.map(jnp.array, params), jax.random.PRNGKey(3), arrays
    )

    mesh = make_mesh(8, 1)
    step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
    params_in = jax.tree.map(jnp.array, params)
    opt_state = tx.init(params_in)
    p_mesh, _, l_mesh = step(
        params_in, opt_state, jax.random.PRNGKey(3),
        shard_batch_arrays(mesh, arrays),
    )

    assert float(l_mesh.main) == pytest.approx(float(l_single.main), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_mesh), jax.tree.leaves(p_single)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        )
