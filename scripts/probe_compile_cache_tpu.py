"""Does JAX's persistent compilation cache work over the axon backend?

If it does, repeat full-scale runs skip the remote-compile phase that
dominates the timed run's first epoch (937-1268 s measured —
docs/TIMED_RUN.md): the cache stores serialized executables keyed by HLO
fingerprint, so a SECOND process compiling the same program loads from
disk instead of hitting the shared compile service.

Protocol: run this script twice with the same CACHE_DIR.
  pass 1 (cold): compiles, populates the cache, prints the compile time.
  pass 2 (warm, fresh process): if the backend supports executable
  serialization, compile time collapses to deserialization.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_compile_cache_tpu.py /tmp/jaxcache
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_compile_cache_tpu.py /tmp/jaxcache
"""

import os
import sys
import time

import numpy as np


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxcache_probe"

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    print(f"devices: {jax.devices()}  cache_dir: {cache_dir}")
    pre = sorted(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else []
    print(f"cache entries before: {len(pre)}")

    # a moderately big, distinctive program (several matmul shapes + scan)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 512).astype(np.float32))
    ws = [jnp.asarray(rng.randn(512, 512).astype(np.float32) * 0.05)
          for _ in range(4)]

    @jax.jit
    def f(x, ws):
        def body(h, w):
            return jnp.tanh(h @ w + 0.1), jnp.sum(h)
        h, sums = jax.lax.scan(body, x, jnp.stack(ws))
        return jnp.sum(h) + jnp.sum(sums)

    t0 = time.perf_counter()
    v = float(f(x, ws))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(x, ws))
    t_run = time.perf_counter() - t0
    post = sorted(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else []
    print(f"value {v:.4f}  first-call {t_compile:.2f}s  "
          f"second-call {t_run*1e3:.1f}ms")
    print(f"cache entries after: {len(post)} "
          f"({'NEW entries written' if len(post) > len(pre) else 'no new entries'})")


if __name__ == "__main__":
    main()
