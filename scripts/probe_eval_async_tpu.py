"""Can async d2h copies hide the tunnel roundtrip in the eval pipeline?

Session-11 finding: the fused eval program is 14.5 ms at bench shapes
(B=128, Tpad=2560, K-chained dispatch), but the double-buffered
dispatch-then-device_get loop reads ~50 ms/batch — each blocking
device_get pays a ~25-30 ms tunnel roundtrip that dispatch pipelining
cannot hide.  Three loops, same work:

  A: dispatch k+1, blocking device_get(k), host traceback   (old path)
  B: A + copy_to_host_async on k's output tree right after dispatching
     k+1 (the copy streams while we block on nothing)
  B3: B with pipeline depth 3
  C: N chained dispatches, one final sync, no consumption   (upper bound)

Measured 2026-08-18 (v5e, B=128, Tpad=2560, BEFORE the packed wire):
  A 48.95 ms/batch (2615 v/s), B 35.24 (3632), B3 28.13 (4551),
  packed-wire depth-3 26.06 (4912), C 17.60 (7275).
The packed 2-leaf wire + depth-3 async pipeline shipped in
eval_fused.py/evaluator.py as a result; this probe now runs on the
packed program.

Round-3 extension (depth-4/6, is_ready drain, grouped device_get),
measured 2026-08-19 (v5e, packed wire, N_BATCHES=16):
  A 41.71 (3069 v/s), B 29.73 (4306), B3 20.96 (6107), B4 19.26 (6647),
  B6 16.65 (7686), E is_ready 16.34 (7834), G grouped-x4 24.60 (5204),
  C dispatch-only 15.37 (8330).
The is_ready drain — consume only outputs whose async copies already
LANDED, block only at a depth cap — reaches 94% of the dispatch-only
bound and shipped as the evaluator/bench pipeline
(tpu.eval_pipeline_depth). Grouped device_get LOSES: batching the gets
serializes consume work behind one big blocking call.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_eval_async_tpu.py
"""

import os
import time
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = 4 if SMALL else 128
T_MIN, T_MAX = (256, 512) if SMALL else (1500, 2100)
PAD = 512
M, D, N_TR = (6, 16, 4) if SMALL else (48, 2048, 6)
N_BATCHES = 3 if SMALL else 16
ROUNDS = 1 if SMALL else 2


def main():
    print("devices:", jax.devices(), flush=True)
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data.batching import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.ops.eval_fused import build_fused_eval, unpack_eval_wire
    from mucon_tpu.ops.viterbi import positions_to_results

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
    fs = 10 if SMALL else 30
    fused = build_fused_eval(
        model, teacher_forcing=False, frame_sampling=fs,
        use_pallas_viterbi=jax.default_backend() != "cpu",
    )
    arrays = jax.device_put(batch_to_arrays(batch))

    out = fused(params, arrays)  # compile
    float(jnp.sum(out["wire"]))

    def consume(out):
        # num_frames/t_full: include the host-side y upsample so the
        # measured consume cost matches the evaluator's real work
        out = unpack_eval_wire(out, n_steps_dim=31, n_max=30,
                               num_frames=batch.num_frames,
                               t_full=int(batch.feats.shape[1]))
        positions_to_results(
            batch.num_frames, out["transcripts"], out["n_dec"],
            out["vit_score"], out["vit_pos"], out["vit_k_valid"], fs,
        )

    def loop_a():
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            pending.append(fused(params, arrays))
            if len(pending) > 1:
                consume(jax.device_get(pending.popleft()))
        while pending:
            consume(jax.device_get(pending.popleft()))
        return (time.perf_counter() - t0) / N_BATCHES * 1e3

    def start_async(tree):
        for leaf in jax.tree.leaves(tree):
            leaf.copy_to_host_async()

    def loop_b():
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            pending.append(fused(params, arrays))
            start_async(pending[-1])
            if len(pending) > 1:
                consume(jax.device_get(pending.popleft()))
        while pending:
            consume(jax.device_get(pending.popleft()))
        return (time.perf_counter() - t0) / N_BATCHES * 1e3

    def loop_b3():
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            pending.append(fused(params, arrays))
            start_async(pending[-1])
            if len(pending) > 2:
                consume(jax.device_get(pending.popleft()))
        while pending:
            consume(jax.device_get(pending.popleft()))
        return (time.perf_counter() - t0) / N_BATCHES * 1e3

    def make_depth(depth):
        def loop_bd():
            pending = deque()
            t0 = time.perf_counter()
            for _ in range(N_BATCHES):
                pending.append(fused(params, arrays))
                start_async(pending[-1])
                if len(pending) > depth - 1:
                    consume(jax.device_get(pending.popleft()))
            while pending:
                consume(jax.device_get(pending.popleft()))
            return (time.perf_counter() - t0) / N_BATCHES * 1e3
        return loop_bd

    def loop_ready():
        # unbounded depth: consume whatever has LANDED (is_ready) after
        # each dispatch; drain at the end.  Never blocks mid-stream.
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            pending.append(fused(params, arrays))
            start_async(pending[-1])
            while pending and all(
                    l.is_ready() for l in jax.tree.leaves(pending[0])):
                consume(jax.device_get(pending.popleft()))
        while pending:
            consume(jax.device_get(pending.popleft()))
        return (time.perf_counter() - t0) / N_BATCHES * 1e3

    def loop_group(g=4):
        # dispatch all with async copies; fetch in groups of g with ONE
        # device_get call per group (fewer sync roundtrips).
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            pending.append(fused(params, arrays))
            start_async(pending[-1])
            if len(pending) >= g + 2:
                grp = [pending.popleft() for _ in range(g)]
                for o in jax.device_get(grp):
                    consume(o)
        while pending:
            consume(jax.device_get(pending.popleft()))
        return (time.perf_counter() - t0) / N_BATCHES * 1e3

    def loop_c():
        t0 = time.perf_counter()
        last = None
        for _ in range(N_BATCHES):
            last = fused(params, arrays)
        float(jnp.sum(last["wire"]))
        return (time.perf_counter() - t0) / N_BATCHES * 1e3

    loops = {"A blocking-get pipeline": loop_a,
             "B + copy_to_host_async ": loop_b,
             "B3 async depth-3       ": loop_b3,
             "B4 async depth-4       ": make_depth(4),
             "B6 async depth-6       ": make_depth(6),
             "E is_ready unbounded   ": loop_ready,
             "G grouped-get x4       ": loop_group,
             "C dispatch-only bound  ": loop_c}
    best = {k: float("inf") for k in loops}
    for _ in range(ROUNDS):
        for name, fn in loops.items():  # interleaved
            best[name] = min(best[name], fn())
    for name, v in best.items():
        print(f"{name}: {v:8.2f} ms/batch ({B / v * 1e3:6.0f} videos/s)",
              flush=True)


if __name__ == "__main__":
    main()
