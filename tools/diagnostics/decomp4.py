"""Test: does the number of loaded executables degrade dispatch/loop speed?"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial


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


synth_mv_rate("fresh")

x = jnp.ones(1024)
fns = []
for i in range(300):
    f = jax.jit(partial(lambda c, v: v * c + c, float(i + 2)))
    out = f(x)
    fns.append(f)
jax.block_until_ready(out)
synth_mv_rate("after 300 executables")

for i in range(700):
    f = jax.jit(partial(lambda c, v: v * c - c, float(i + 2)))
    out = f(x)
    fns.append(f)
jax.block_until_ready(out)
synth_mv_rate("after 1000 executables")

# Run a long stream of DISPATCHES (like discretization does) to see if
# dispatch history degrades the tunnel.
g = jax.jit(lambda v: v * 1.000001)
for i in range(5000):
    x = g(x)
jax.block_until_ready(x)
synth_mv_rate("after 5000 dispatches")
