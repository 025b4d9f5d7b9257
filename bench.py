"""Benchmark: assembly+solve wall-clock per Newton iteration.

Flagship case (BASELINE.md config 1 family): compressible single-phase TPFA
flow on a 3D Cartesian grid, whole-boundary Dirichlet. One full Newton
iteration = residual + matrix-free Jacobian + mixed-precision BiCGStab
solve + update, entirely on device (``porepy_tpu/parallel/structured_flow.py``).

Baseline: the reference framework's per-iteration scipy assembly + spsolve
on the identical problem, measured on this machine and recorded with
provenance in ``tools/ref_baselines.json``.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compilation cache: repeated bench runs skip the large first
# XLA compile (must be set before jax initializes its backends).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    import jax
    import jax.numpy as jnp

    import porepy_tpu  # noqa: F401  (enables x64)
    from porepy_tpu.parallel.structured_flow import build_structured_flow_kernel

    n = 32
    kernel, _ = build_structured_flow_kernel(
        (n, n, n),
        (1.0, 1.0, 1.0),
        permeability=1.0,
        porosity=0.1,
        viscosity=1e-3,
        compressibility=1e-6,
        rho_ref=1000.0,
        p_ref=1.0e5,
        dt=1.0,
        bc_pressure=lambda x, y, z: 1e5 + 1e4 * (1 - np.asarray(x)),
    )
    p_prev = jnp.full(kernel.shape, 2.0e5)
    step = jax.jit(lambda p, q: kernel.newton_step(p, q))

    # Warmup/compile.
    out = step(p_prev, p_prev)
    jax.block_until_ready(out)

    reps = 7
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(p_prev, p_prev)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ours_ms = float(np.median(times) * 1000.0)

    with open("tools/ref_baselines.json") as f:
        base = json.load(f)
    ref_ms = base["cases"]["tpfa_flow_3d_32cubed"]["total_s"] * 1000.0

    print(
        json.dumps(
            {
                "metric": "tpfa_flow_3d_32cubed_newton_iter_wall",
                "value": round(ours_ms, 2),
                "unit": "ms",
                "vs_baseline": round(ref_ms / ours_ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
