"""Microbenchmark SpMV formulations on TPU to find the fast form.

The ELL gather ``x_p[col]`` measures 1.4 ms for n=18k/nnz=90k — near-serial.
Candidates: flat gather, row-gather of a lane-broadcast operand (embedding
form), one-hot MXU matmul in column chunks, BCOO.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 18157))
AVG = 5


def bench(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def main():
    rng = np.random.default_rng(0)
    # Synthetic FV-like sparsity: 5-pt-ish random band + random long range.
    rows = np.repeat(np.arange(N), AVG)
    offs = rng.integers(-200, 200, size=rows.size)
    cols = np.clip(rows + offs, 0, N - 1)
    vals = rng.standard_normal(rows.size)

    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=N)
    K = int(counts.max())
    pos = np.arange(rows.size) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    ell_val = np.zeros((N, K), np.float32)
    ell_col = np.full((N, K), N, np.int32)
    ell_val[rows, pos] = vals
    ell_col[rows, pos] = cols

    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    ev = jnp.asarray(ell_val)
    ec = jnp.asarray(ell_col)

    @jax.jit
    def ell(x):
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        return jnp.sum(ev * x_p[ec], axis=1)

    print(f"n={N} nnz={rows.size} K={K}")
    print(f"ell gather (n,K):        {bench(ell, x):9.1f} us")

    # Transposed ELL: (K, n) layout, minor dim = n (128-lane friendly).
    evT = jnp.asarray(ell_val.T.copy())
    ecT = jnp.asarray(ell_col.T.copy())

    @jax.jit
    def ellT(x):
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        return jnp.sum(evT * x_p[ecT], axis=0)

    print(f"ellT gather (K,n):       {bench(ellT, x):9.1f} us")

    # Embedding form: broadcast x across 128 lanes, gather ROWS.
    @jax.jit
    def emb(x):
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        x2 = jnp.broadcast_to(x_p[:, None], (N + 1, 128))
        x2 = jax.lax.optimization_barrier(x2)
        g = jnp.take(x2, ec.reshape(-1), axis=0)[:, 0].reshape(N, K)
        return jnp.sum(ev * g, axis=1)

    print(f"embedding 128-lane:      {bench(emb, x):9.1f} us")

    # Embedding form, 8 lanes.
    @jax.jit
    def emb8(x):
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        x2 = jnp.broadcast_to(x_p[:, None], (N + 1, 8))
        x2 = jax.lax.optimization_barrier(x2)
        g = jnp.take(x2, ec.reshape(-1), axis=0)[:, 0].reshape(N, K)
        return jnp.sum(ev * g, axis=1)

    print(f"embedding 8-lane:        {bench(emb8, x):9.1f} us")

    # One-hot MXU: chunk columns by 512; per nnz one-hot against chunk.
    CH = 512
    nch = -(-(N + 1) // CH)
    chunk_of = (ell_col // CH).reshape(-1)
    loc = (ell_col % CH).reshape(-1)

    # Sort nnz by chunk, pad each chunk to equal length.
    order2 = np.argsort(chunk_of, kind="stable")
    cc = np.bincount(chunk_of, minlength=nch)
    P = int(cc.max())
    slot = np.arange(order2.size) - np.repeat(
        np.concatenate([[0], np.cumsum(cc)[:-1]]), cc
    )
    flat_val = ell_val.reshape(-1)[order2]
    flat_row = np.repeat(np.arange(N), K)[order2]
    vv = np.zeros((nch, P), np.float32)
    ll = np.zeros((nch, P), np.int32)
    rr = np.full((nch, P), N, np.int32)
    vv[chunk_of[order2], slot] = flat_val
    ll[chunk_of[order2], slot] = loc[order2]
    rr[chunk_of[order2], slot] = flat_row
    vvj, llj, rrj = jnp.asarray(vv), jnp.asarray(ll), jnp.asarray(rr)

    @jax.jit
    def onehot(x):
        x_p = jnp.concatenate(
            [x, jnp.zeros(nch * CH - N, x.dtype)]
        ).reshape(nch, CH)
        oh = jax.nn.one_hot(llj, CH, dtype=x.dtype)  # (nch, P, CH)
        g = jnp.einsum("cpk,ck->cp", oh, x_p)
        contrib = vvj * g
        return jax.ops.segment_sum(
            contrib.reshape(-1), rrj.reshape(-1), num_segments=N + 1
        )[:N]

    print(f"one-hot MXU (seg-sum):   {bench(onehot, x):9.1f} us")

    # BCOO
    from jax.experimental import sparse as jsparse

    A = jsparse.BCOO(
        (jnp.asarray(vals.astype(np.float32)),
         jnp.asarray(np.stack([rows, cols], 1).astype(np.int32))),
        shape=(N, N),
    )

    @jax.jit
    def bcoo(x):
        return A @ x

    print(f"BCOO matvec:             {bench(bcoo, x):9.1f} us")

    # Dense matmul reference at this size (memory bound ceiling check).
    if N <= 20000:
        Ad = jnp.asarray(
            np.zeros((2048, N), np.float32)
        )

        @jax.jit
        def dense(x):
            return Ad @ x

        print(f"dense (2048,n)@x matmul: {bench(dense, x):9.1f} us")


if __name__ == "__main__":
    main()
