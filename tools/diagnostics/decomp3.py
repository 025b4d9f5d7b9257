"""Test: does live device memory / buffer count cause the per-op slowdown?"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import gc
import time
import numpy as np
import jax, jax.numpy as jnp


def stats(tag):
    d = jax.devices()[0]
    try:
        ms = d.memory_stats()
        print(f"[{tag}] bytes_in_use={ms.get('bytes_in_use')} peak={ms.get('peak_bytes_in_use')} num_allocs={ms.get('num_allocs')}", flush=True)
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)
    try:
        arrs = jax.live_arrays()
        tot = sum(a.nbytes for a in arrs)
        print(f"[{tag}] live_arrays: {len(arrs)}, {tot/1e6:.1f} MB", flush=True)
    except Exception as e:
        print(f"[{tag}] live_arrays unavailable: {e}", flush=True)


def synth_mv_rate(tag):
    n, K = 18157, 9
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.standard_normal((n, K)))
    col = jnp.asarray(rng.integers(0, n, size=(n, K)).astype(np.int64))
    r = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def mv(val, col, r):
        def body(_i, r):
            r_p = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
            y = jnp.sum(val * r_p[col], axis=1)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)
        return jax.lax.fori_loop(0, 200, body, r)

    out = mv(val, col, r); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = mv(val, col, r); jax.block_until_ready(out)
    t = time.perf_counter() - t0
    print(f"[{tag}] synth matvec: {t/200*1e3:.4f} ms/mv", flush=True)

    @jax.jit
    def triv(r):
        return r * 1.0000001
    out = triv(r); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = triv(r); jax.block_until_ready(out)
    print(f"[{tag}] trivial dispatch: {(time.perf_counter()-t0)/5*1e3:.3f} ms", flush=True)


stats("fresh")
synth_mv_rate("fresh")

# Allocate a big pile of device buffers mimicking prepare_simulation residue:
# many small/medium arrays.
pile = []
rng = np.random.default_rng(1)
for i in range(2000):
    pile.append(jnp.asarray(rng.standard_normal(int(rng.integers(1000, 50000)))))
jax.block_until_ready(pile[-1])
stats("after 2000 random buffers")
synth_mv_rate("after 2000 buffers")

big = [jnp.asarray(rng.standard_normal(25_000_000)) for _ in range(10)]  # 2 GB
jax.block_until_ready(big[-1])
stats("after +2GB")
synth_mv_rate("after +2GB")

del pile, big
gc.collect()
stats("after free")
synth_mv_rate("after free")
