"""Default config tree.

Option-for-option coverage of the reference schema
(`/root/reference/src/configs/mucon/default.py`, `src/core/config.py`) plus a
``tpu`` subtree for the TPU-native capabilities the reference does not have
(padded batching, bf16 compute, device mesh, Pallas kernel toggles).
"""

import os

from mucon_tpu.config.node import ConfigNode


def get_cfg_defaults() -> ConfigNode:
    _C = ConfigNode()
    _C.experiment_name = "mucon_default"

    # -- system (reference: src/core/config.py:16-18) ------------------------
    _C.system = ConfigNode()
    _C.system.device = "tpu"  # "tpu" | "cpu" — jax platform preference
    _C.system.num_workers = 2  # host-side prefetch threads
    _C.system.seed = 1

    # -- dataset (reference: src/core/config.py:5-12) -----------------------
    _C.dataset = ConfigNode()
    _C.dataset.root = os.path.expanduser("~/work/MuCon/datasets")
    _C.dataset.name = "breakfast"  # "breakfast" | "synthetic"
    _C.dataset.feat_name = "i3d"
    _C.dataset.mapping_file_name = "mapping.txt"
    _C.dataset.split = 1
    _C.dataset.mixed = ConfigNode()
    _C.dataset.mixed.full_supervision_percentage = 50.0
    # synthetic dataset knobs (used when dataset.name == "synthetic";
    # lets tests/benchmarks run without Breakfast on disk)
    _C.dataset.synthetic = ConfigNode()
    _C.dataset.synthetic.num_videos = 32
    _C.dataset.synthetic.num_classes = 48
    _C.dataset.synthetic.feat_dim = 2048
    _C.dataset.synthetic.min_len = 256
    _C.dataset.synthetic.max_len = 2048
    _C.dataset.synthetic.seed = 0
    _C.dataset.synthetic.train_fraction = 0.75  # split1 train share (e.g.
    # 1460/1712 = Breakfast split-1 proportions for full-scale timed runs)

    # -- trainer (reference: src/configs/mucon/default.py:13-38) ------------
    _C.trainer = ConfigNode()
    _C.trainer.root = os.path.expanduser("~/work/MuCon/root")
    _C.trainer.num_epochs = 150
    _C.trainer.clip_grad_norm = True
    _C.trainer.clip_grad_norm_separate = True  # encoder/decoder clipped apart
    _C.trainer.clip_grad_norm_every_param = False
    _C.trainer.clip_grad_norm_value = 100.0
    _C.trainer.optimizer = "SGD"  # "SGD" | "Adam" (amsgrad)
    _C.trainer.learning_rate = 0.01
    _C.trainer.momentum = 0.0
    _C.trainer.weight_decay = 0.005
    _C.trainer.accumulate_grad_every = 1
    _C.trainer.profile_epoch = -1  # jax.profiler-trace this epoch into the
    # run folder's profile/ dir (view with tensorboard); -1 disables
    _C.trainer.async_checkpoint = False  # serialize+write checkpoints on a
    # background thread (device snapshot stays synchronous)
    _C.trainer.keep_last_checkpoints = -1  # retention: delete all but the
    # newest K epoch checkpoints after each save (-1 keeps everything,
    # matching the reference's behavior)
    _C.trainer.scheduler = ConfigNode()
    _C.trainer.scheduler.name = "step"  # "none" | "plateau" | "step"
    _C.trainer.scheduler.plateau = ConfigNode()
    _C.trainer.scheduler.plateau.mode = "max"
    _C.trainer.scheduler.plateau.factor = 0.1
    _C.trainer.scheduler.plateau.verbose = True
    _C.trainer.scheduler.plateau.patience = 20
    _C.trainer.scheduler.step = ConfigNode()
    _C.trainer.scheduler.step.milestones = [70]
    _C.trainer.scheduler.step.gamma = 0.1
    _C.trainer.save_every = 5
    _C.trainer.eval_every = 1

    # -- evaluator (reference: src/configs/mucon/default.py:40-42) ----------
    _C.evaluator = ConfigNode()
    _C.evaluator.viterbi = ConfigNode()
    _C.evaluator.viterbi.multi_length = False
    _C.evaluator.viterbi.frame_sampling = 30
    # "device" = batched dense DP on TPU (fast path);
    # "host" = numpy hypothesis DP (reference-semantics oracle)
    _C.evaluator.viterbi.backend = "device"

    # -- model (reference: src/configs/mucon/default.py:44-117) -------------
    _C.model = ConfigNode()
    _C.model.teacher_forcing = True
    _C.model.name = "mucon"
    _C.model.first_gru_hidden_size = 128  # kept for schema parity (unused)

    _C.model.loss = ConfigNode()
    _C.model.loss.mul_mucon = 1.0
    _C.model.loss.mul_transcript = 1.0
    _C.model.loss.mul_smoothing = 0.1
    _C.model.loss.mul_length = 0.1
    _C.model.loss.length_width = 2.0
    _C.model.loss.transcript_average = False
    _C.model.loss.mucon_weight_background = False
    _C.model.loss.mucon_weight_background_value = 0.5
    _C.model.loss.mucon_weight_background_index = 0
    _C.model.loss.transcript_weight_background = False
    _C.model.loss.transcript_weight_background_value = 0.5
    _C.model.loss.transcript_weight_background_index = 0
    _C.model.loss.fully_supervised = ConfigNode()
    _C.model.loss.fully_supervised.mul_classification = 1.0
    _C.model.loss.fully_supervised.mul_supervised_length = 1.0
    _C.model.loss.smoothing = ConfigNode()
    _C.model.loss.smoothing.log_softmax_before = True
    _C.model.loss.smoothing.clamp = True
    _C.model.loss.smoothing.clamp_min = 0
    _C.model.loss.smoothing.clamp_max = 16
    _C.model.loss.mucon = ConfigNode()
    _C.model.loss.mucon.type = "flint"  # "flint" | "arithmetic"
    _C.model.loss.mucon.template = "box"  # "box" | "gaussian" | "trapezoid"
    _C.model.loss.mucon.overlap = 0.0

    _C.model.ft = ConfigNode()
    _C.model.ft.type = "wavenet"  # "wavenet" | "mstcnpp" | "noft"
    _C.model.ft.stages = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
    _C.model.ft.pooling = True
    _C.model.ft.pooling_type = "max"  # "max" | "sum" (avg*2)
    _C.model.ft.pooling_layers = [1, 2, 4, 8]
    _C.model.ft.hidden_size = 128
    _C.model.ft.dropout_rate = 0.25
    _C.model.ft.leaky_relu = False
    _C.model.ft.last_gn = True
    _C.model.ft.last_gn_num_groups = 32
    _C.model.ft.last_relu = True
    _C.model.ft.last_dropout = True
    _C.model.ft.last_dropout_rate = 0.25

    _C.model.fs = ConfigNode()
    _C.model.fs.jit_no_reverse = True  # schema parity (unused)
    _C.model.fs.encoder = ConfigNode()
    _C.model.fs.encoder.hidden_size = 128
    _C.model.fs.encoder.bidirectional = True
    _C.model.fs.encoder.dropout = 0.0
    _C.model.fs.decoder = ConfigNode()
    _C.model.fs.decoder.embedding_dim = 128
    _C.model.fs.decoder.embedding_dropout = 0.25
    _C.model.fs.decoder.hidden_size = 128
    _C.model.fs.decoder.num_layers = 1
    _C.model.fs.decoder.dropout = 0.0

    _C.model.fc = ConfigNode()

    # -- tpu-native knobs (new capability; no reference equivalent) ---------
    _C.tpu = ConfigNode()
    _C.tpu.batch_size = 1  # videos per device step (reference is fixed 1)
    _C.tpu.pad_multiple = 512  # time padding granularity (must be %16==0)
    _C.tpu.max_frames = 8192  # bucket ceiling for padded batches
    _C.tpu.compute_dtype = "float32"  # "float32" | "bfloat16"
    # device-resident feature cache: the dataset is static pre-extracted
    # features, so padded batches can live in HBM and skip all host->device
    # transfer after the first epoch (freezes batch composition per epoch)
    _C.tpu.cache_batches = False
    _C.tpu.cache_budget_gb = 0.0  # device-cache byte budget in GiB; 0 =
    # unlimited. Batches cache first-come-first-served until the budget is
    # spent, later ones stream each epoch; the trainer fills first and its
    # evaluators share the same budget (harness/cache.py)
    _C.tpu.compilation_cache_dir = ""  # JAX persistent compilation cache
    # directory ("" = off). Validated over the axon backend incl. Pallas
    # programs: a fresh process reloads executables from disk instead of
    # recompiling (11.2 s -> 0.65 s measured,
    # scripts/probe_compile_cache_tpu.py) — repeat runs at the same
    # config skip the compile-dominated first epoch.
    _C.tpu.cache_budget_eval_gb = 0.0  # slice of cache_budget_gb the TRAIN
    # cache may not consume, so the small-but-replayed eval set still
    # caches when the train set alone exceeds the budget (the trainer
    # fills first; without a reserve, every periodic eval re-streams the
    # test features — measured 620 s of a 2546 s Breakfast-scale run over
    # this rig's tunnel, docs/TIMED_RUN.md). 0 = plain FCFS.
    _C.tpu.eval_feats_transfer_dtype = "auto"  # eval feature wire format.
    # "auto" = bfloat16 on accelerator backends, float32 on CPU: on TPU
    # the bf16 wire is numerics-IDENTICAL to f32 (the in-projection
    # truncates dot operands to bf16 MXU passes either way — verified by
    # output-checksum equality of the whole fused eval program on v5e,
    # scripts/probe_eval_wire_dtype_tpu.py) and halves the dominant HBM
    # read: fused eval 12.14 -> 10.43 ms/batch at B=128 (round 5).
    # Explicit: "float32" (exact parity on any backend) | "bfloat16" |
    # "float16" (non-TPU consumers) | "int8" (quarter bytes, per-frame
    # symmetric quantization — models/model.py::quantize_feats_int8 —
    # when a cache budget is the binding constraint)
    _C.tpu.feats_transfer_dtype = "auto"  # training feature-transfer wire
    # format: "auto" (= compute dtype: bf16 when bf16, else f32) |
    # "float32" | "float16" | "bfloat16" | "int8". Halving the wire bytes
    # ~2x the h2d-bound first-epoch rate over the tunnel; "int8" quarters
    # wire AND device-cache bytes (lossy: elementwise error <= peak/254;
    # per-frame scales ride along as a tiny f32 leaf). The device upcasts
    # to the compute dtype. RECOMMENDED on TPU: "bfloat16" — halved
    # bytes at ZERO numerics cost (bit-identical loss trajectory to f32
    # on TPU, measured round 4: the in-projection matmul truncates its
    # operands to bf16 MXU passes either way; docs/STREAMING.md).
    # Eval's wire is tpu.eval_feats_transfer_dtype (default f32 parity).
    # CONVERGENCE-VALIDATED (round 4, v5e): the 500-epoch synthetic recipe
    # (scripts/convergence_synthetic_tpu.sh) with float16 and with int8
    # wires both reproduce the f32 run's final metrics (y_mof 0.960,
    # s_mof 0.409, vit_mof 0.444 > s_mof — the mutual-consistency
    # dynamic) while per-step losses differ in the 4th decimal, i.e. the
    # quantization perturbs the trajectory without changing where it
    # lands. Safe to enable when host->device bandwidth or device cache
    # bytes bound the run; keep f32 for strict reference parity.
    _C.tpu.use_pallas = "auto"  # fused Pallas kernels (eval path: v2 stack
    # encoder + in-kernel Viterbi DP — validated faster than XLA on v5e).
    # "auto" = on for accelerator backends, off on CPU; True forces the
    # kernels everywhere (CPU runs them in slow interpret mode).
    _C.tpu.use_pallas_train = "auto"  # trainable fused stack (custom VJP,
    # v2 whole-batch layout with chunked backward sweep): full train step
    # 1.9x faster than XLA on v5e. Same tri-state as use_pallas.
    _C.tpu.train_sweep_chunks = 3  # LEGACY (v2 kernel only): backward-sweep
    # program count. The current v3 trainable stack derives its chunking
    # from equal-T layer groups + the VMEM byte budget; this knob is kept
    # for config compatibility and the v2 parity tests.
    _C.tpu.kernel_mm_dtype = "auto"  # matmul OPERAND dtype inside the
    # Pallas stack kernels: "auto" | "float32" | "bfloat16". Measured on
    # v5e at the flagship shapes (B=8, T=2048, C=128): bf16 operand casts
    # inside the kernel are a 1.67x REGRESSION (9.89 vs 5.90 ms/step) —
    # per-matmul activation casts are VPU/VMEM work the tiny C=128 MXU
    # saving cannot repay. "auto" therefore keeps kernel matmuls f32 even
    # under tpu.compute_dtype=bfloat16 (the 2048->128 in-projection, a
    # genuinely MXU-bound matmul, still uses bf16 operands there).
    _C.tpu.in_proj_mm_dtype = "auto"  # OPERAND dtype of the D->H input
    # projection matmul (the [B*T x 2048] dot feeding the kernel stack —
    # 50% of forward FLOPs): "auto" | "float32" | "bfloat16". "auto"
    # follows tpu.compute_dtype (bf16 operands iff the model computes in
    # bf16). MEASURED on v5e (scripts/probe_inproj_tpu.py, flagship step,
    # 2x interleaved best-of-5/8): explicit bf16 operands AND/OR
    # bf16-RESIDENT features are perf-NEUTRAL (all arms within ~2%, no
    # consistent ordering across runs) and numerics-IDENTICAL (identical
    # 10-step loss trajectories) — XLA's TPU default matmul precision
    # already truncates f32 dot operands to bf16 MXU passes, so the
    # "f32-MXU-bound in-projection" lever does not exist. The knob stays
    # for explicit control under non-default jax matmul precision.
    _C.tpu.use_pallas_lstm = "auto"  # fused BiLSTM recurrence kernel
    # (ops/lstm_pallas.py) on EVAL/INFERENCE traces: the whole two-direction
    # masked recurrence runs as one Pallas program with weights and state
    # VMEM-resident. Measured on v5e (Tz=128, B=8, H=128, interleaved A/B,
    # scalar-readback sync): 0.32 vs 0.34 ms against the unroll-8 scan,
    # checksums identical. No VJP — training always uses the scan; f32 +
    # bidirectional + VMEM-fit required (B=128 eval falls back to the
    # scan by the VMEM gate). Same tri-state as use_pallas.
    _C.tpu.eval_single_shape = True  # pad EVERY eval batch to one
    # (batch_size, T_max) shape: dummy-video row padding for the
    # remainder batch, fixed T = the test set's longest video rounded to
    # pad_multiple. Eval device compute is tiny (~70 ms for 252
    # Breakfast-scale videos at the measured ~11 Mframes/s ceiling) but
    # each length-bucket shape compiles its OWN fused program — minutes
    # cold over the remote compile service (measured: the periodic-eval
    # phase of the timed run was dominated by these compiles, VERDICT r3
    # #4). One shape = one compile; padded rows/frames are masked and
    # sliced off (padding exactness is a tested framework invariant).
    # Fused device path only; the host-oracle backend keeps per-batch
    # bucket shapes.
    _C.tpu.use_pallas_lstm_train = "auto"  # custom-VJP variant of the
    # fused BiLSTM recurrence on TRAIN traces (ops/lstm_pallas.py
    # bilstm_recurrence_train: fwd stashes the cell trajectory, backward
    # runs the reverse (dh, dc) chain as one Pallas program and emits
    # per-step dgate vectors; the w_hh gradient contracts in XLA).
    # Measured on v5e at the flagship step (B=8, T=2048, dropout .25,
    # interleaved A/B, scalar-readback, both arms with the decoder chain
    # kernel): 3.038 vs 3.290 ms/iter best-of-5, kernel faster in 5/5
    # trials; loss trajectories track the scan to the 4th decimal
    # (scripts/probe_lstm_train_kernel_tpu.py). Same tri-state as
    # use_pallas; f32 + bidirectional + VMEM-gated like the eval kernel.
    _C.tpu.use_pallas_decoder = "auto"  # fused teacher-forced decoder
    # chain (ops/decoder_pallas.py): the whole S-step attention+LSTM
    # recurrence as ONE Pallas program (and its reverse (dh, dc) chain as
    # one more), with embedding/dropout/heads/weight-grad contractions in
    # XLA. TRAIN teacher-forced traces only; f32; requires encoder and
    # decoder hidden sizes equal; VMEM-gated with scan fallback. Measured
    # on v5e at the flagship step (B=8, T=2048, dropout .25, interleaved
    # A/B, scalar-readback sync, scripts/probe_decoder_kernel_tpu.py):
    # 3.007 vs 3.212 ms/iter best-of-5, kernel faster in 5/5 trials;
    # loss trajectories track the scan to the 4th decimal (independent
    # dropout streams). Same tri-state as use_pallas.
    _C.tpu.use_pallas_loss = False  # fused mucon ("flint", box template)
    # loss kernel: masks built in VMEM, never materialized to HBM
    # (ops/mucon_loss_pallas.py); exact-grad custom VJP
    _C.tpu.mesh = ConfigNode()
    _C.tpu.mesh.enable = False  # multi-device SPMD training (data/seq axes);
    # requires tpu.batch_size % n_data == 0 (remainder batches are dropped)
    _C.tpu.mesh.data = -1  # -1: all devices on the data axis
    _C.tpu.mesh.seq = 1  # sequence-parallel axis (halo-exchange conv)
    _C.tpu.mesh.model = 1  # tensor-parallel axis (conv-stack channels
    # sharded via parallel.mesh.param_specs; GSPMD inserts collectives)
    _C.tpu.mesh.multihost = False  # multi-process (multi-host) run: init
    # jax.distributed, build a DCN x ICI hybrid mesh (process dim on the
    # data axis), load per-process batch rows, gate run-folder writes on
    # process 0 (parallel/multihost.py). Single process: identical math.
    _C.tpu.scan_unroll = "auto"  # lax.scan/nn.scan unroll factor for the
    # sequential scans (BiLSTM encoder over Tz=T/16 steps, teacher-forced
    # decoder over S steps). They carry tiny [B x H] recurrences that
    # cannot fill the MXU, so at small batch their wall time is loop
    # overhead; unrolling trades compile time for fewer loop iterations.
    # Semantics unchanged (same per-step math in the same order; tested).
    # "auto" resolves PER TRACE: 8 when B <= 16 on accelerator backends
    # (measured crossover on v5e — B=8 step 3.42 vs 3.72 ms, B=16 tie,
    # B>=32 slightly negative; scripts/probe_unroll_ab_tpu.py), else 1;
    # always 1 on CPU. An int forces that factor.
    _C.tpu.remat = False  # jax.checkpoint the encoder stack
    _C.tpu.early_exit_decode = True  # free-decode eval stops once every
    # video emitted EOS (output-equivalent to the full-S scan)
    # device-side double buffering: issue device_put for batch k+1 while
    # batch k computes, hiding host->device latency behind the step
    # (0 disables; >=1 keeps that many batches in flight)
    _C.tpu.device_prefetch = 1
    _C.tpu.eval_pipeline_depth = 8  # max in-flight fused-eval output trees.
    # The evaluator dispatches ahead and consumes only outputs whose async
    # d2h copies have LANDED (is_ready), blocking solely at this cap —
    # measured 16.3 ms/batch vs 21.0 for the old fixed depth-3 at B=128 on
    # v5e (dispatch-only bound 15.4; scripts/probe_eval_async_tpu.py).
    # Each resident tree is ~0.4 MB at B=128.

    return _C
