"""Decisive A/B: does jax x64 mode (f64/int64) explain the 'degraded process'?

Fresh process, x64 ON (like porepy_tpu). Variants over (value dtype, index dtype).
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import time
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

n, K = 18157, 9
rng = np.random.default_rng(0)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


for vdt in (np.float32, np.float64):
    for idt in (np.int32, np.int64):
        val = jnp.asarray(rng.standard_normal((n, K)).astype(vdt))
        col = jnp.asarray(rng.integers(0, n, size=(n, K)).astype(idt))
        r = jnp.asarray(rng.standard_normal(n).astype(vdt))

        @jax.jit
        def mv(val, col, r):
            def body(_i, r):
                r_p = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
                y = jnp.sum(val * r_p[col], axis=1)
                return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)
            return jax.lax.fori_loop(0, 200, body, r)

        t = timeit(mv, val, col, r, reps=3)
        print(f"x64-mode matvec val={np.dtype(vdt).name} col={np.dtype(idt).name}: "
              f"{t / 200 * 1e3:.4f} ms/mv", flush=True)

        @jax.jit
        def triv(r):
            return r * 1.0000001

        print(f"  trivial dispatch ({np.dtype(vdt).name}): "
              f"{timeit(triv, r) * 1e3:.3f} ms", flush=True)
