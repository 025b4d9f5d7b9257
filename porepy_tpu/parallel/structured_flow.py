"""Dense stencil TPFA flow step for structured (Cartesian) grids.

Speed-of-light TPU formulation of the single-phase-flow Newton iteration on
tensor-product grids: pressure lives as an ``(nx, ny, nz)`` array, fluxes
are axis-wise slice differences (pure VPU elementwise work, no
gathers/scatters), and the linear solve is a matrix-free Krylov iteration
with mixed precision — the Jacobian action runs in f32 (native TPU speed),
wrapped in f64 iterative refinement so the Newton increment reaches f64
accuracy without paying f64-emulation cost per Krylov iteration.

This is the structured-grid fast path behind the benchmark config
"Tpfa single-phase flow, Cartesian" (BASELINE.md); the general unstructured
path is ``porepy_tpu/parallel/flow_step.py``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StructuredFlowKernel", "build_structured_flow_kernel"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StructuredFlowKernel:
    """Arrays for a 3D Cartesian compressible single-phase TPFA step.

    Transmissibility arrays are face-centered per axis and include the
    one-sided boundary transmissibilities; ``pbc_*`` hold Dirichlet values
    on the six sides (whole boundary Dirichlet).
    """

    tx: jax.Array  # (nx+1, ny, nz)
    ty: jax.Array  # (nx, ny+1, nz)
    tz: jax.Array  # (nx, ny, nz+1)
    pbc_x: jax.Array  # (2, ny, nz) west/east Dirichlet pressures
    pbc_y: jax.Array  # (2, nx, nz)
    pbc_z: jax.Array  # (2, nx, ny)
    pv: jax.Array  # (nx, ny, nz) pore volume

    rho_ref: jax.Array
    comp: jax.Array
    visc: jax.Array
    p_ref: jax.Array
    dt: jax.Array

    shape: tuple = dataclasses.field(metadata=dict(static=True))

    def density(self, p):
        return self.rho_ref * jnp.exp(self.comp * (p - self.p_ref))

    def _padded(self, p):
        """Pressure with Dirichlet ghost layers on all six sides."""
        pg = jnp.pad(p, 1)
        pg = pg.at[0, 1:-1, 1:-1].set(self.pbc_x[0].astype(p.dtype))
        pg = pg.at[-1, 1:-1, 1:-1].set(self.pbc_x[1].astype(p.dtype))
        pg = pg.at[1:-1, 0, 1:-1].set(self.pbc_y[0].astype(p.dtype))
        pg = pg.at[1:-1, -1, 1:-1].set(self.pbc_y[1].astype(p.dtype))
        pg = pg.at[1:-1, 1:-1, 0].set(self.pbc_z[0].astype(p.dtype))
        pg = pg.at[1:-1, 1:-1, -1].set(self.pbc_z[1].astype(p.dtype))
        return pg

    def residual(self, p, p_prev):
        """Mass-balance residual; all slice arithmetic, no gathers."""
        pg = self._padded(p)
        rho_g = self.density(pg)

        def axis_fluxes(t, axis):
            # Pressure drop across each face along `axis` of the padded
            # array restricted to the interior of the other axes.
            sl_in = [slice(1, -1)] * 3
            sl_lo = list(sl_in)
            sl_hi = list(sl_in)
            sl_lo[axis] = slice(0, -1)
            sl_hi[axis] = slice(1, None)
            dp = pg[tuple(sl_lo)] - pg[tuple(sl_hi)]
            q = t * dp
            # Upwind density from the padded density field.
            r_lo = rho_g[tuple(sl_lo)]
            r_hi = rho_g[tuple(sl_hi)]
            w = jnp.where(jax.lax.stop_gradient(q) >= 0, r_lo, r_hi) / self.visc
            return w * q

        fx = axis_fluxes(self.tx, 0)  # (nx+1, ny, nz)
        fy = axis_fluxes(self.ty, 1)
        fz = axis_fluxes(self.tz, 2)

        div = (
            (fx[:-1] - fx[1:])
            + (fy[:, :-1] - fy[:, 1:])
            + (fz[:, :, :-1] - fz[:, :, 1:])
        )
        accumulation = self.pv * (self.density(p) - self.density(p_prev)) / self.dt
        return accumulation - div

    # -- Newton step with mixed-precision Krylov -----------------------------

    def newton_step(
        self,
        p,
        p_prev,
        tol: float = 1e-9,
        inner_iter: int = 200,
        refine: int = 3,
    ):
        """One Newton iteration. The Jacobian action is linearized at ``p``
        (f64), then re-cast to f32 for the Krylov inner iterations;
        ``refine`` rounds of f64 iterative refinement recover f64 accuracy.
        """
        r64, jvp64 = jax.linearize(lambda q: self.residual(q, p_prev), p)
        rnorm = jnp.linalg.norm(r64)

        diag = self._jacobi_diagonal(p)
        diag32 = diag.astype(jnp.float32)

        kernel32 = self._as_dtype(jnp.float32)
        p32 = p.astype(jnp.float32)
        _, jvp32 = jax.linearize(lambda q: kernel32.residual(q, p32), p32)

        def solve32(rhs64):
            # Normalize (guards f32 underflow / Krylov breakdown on ~zero
            # right-hand sides) and sanitize non-finite outcomes.
            nrm = jnp.linalg.norm(rhs64)
            scale = jnp.where(nrm > 0, nrm, 1.0)
            rhs32 = (rhs64 / scale).astype(jnp.float32)
            x, _ = jax.scipy.sparse.linalg.bicgstab(
                jvp32,
                rhs32,
                M=lambda v: v / diag32,
                tol=1e-6,
                atol=0.0,
                maxiter=inner_iter,
            )
            x = jnp.where(jnp.isfinite(x), x, 0.0)
            return x.astype(jnp.float64) * scale

        # Iterative refinement in f64.
        dx = solve32(-r64)
        for _ in range(refine):
            rr = -r64 - jvp64(dx)
            dx = dx + solve32(rr)
        return p + dx, rnorm

    def newton_step_f64(self, p, p_prev, tol: float = 1e-9, maxiter: int = 400):
        r, jvp_fn = jax.linearize(lambda q: self.residual(q, p_prev), p)
        diag = self._jacobi_diagonal(p)
        dx, _ = jax.scipy.sparse.linalg.bicgstab(
            jvp_fn, -r, M=lambda v: v / diag, tol=tol, atol=0.0, maxiter=maxiter
        )
        return p + dx, jnp.linalg.norm(r)

    def _jacobi_diagonal(self, p):
        w = self.density(p) / self.visc
        diag = (
            self.tx[:-1] + self.tx[1:] + self.ty[:, :-1] + self.ty[:, 1:]
            + self.tz[:, :, :-1] + self.tz[:, :, 1:]
        ) * w
        diag = diag + self.pv * self.comp * self.density(p) / self.dt
        return diag

    def _as_dtype(self, dtype):
        def cast(x):
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return StructuredFlowKernel(
            tx=cast(self.tx),
            ty=cast(self.ty),
            tz=cast(self.tz),
            pbc_x=cast(self.pbc_x),
            pbc_y=cast(self.pbc_y),
            pbc_z=cast(self.pbc_z),
            pv=cast(self.pv),
            rho_ref=cast(self.rho_ref),
            comp=cast(self.comp),
            visc=cast(self.visc),
            p_ref=cast(self.p_ref),
            dt=cast(self.dt),
            shape=self.shape,
        )


def build_structured_flow_kernel(
    nx: tuple[int, int, int],
    physdims: tuple[float, float, float],
    permeability: float = 1.0,
    porosity: float = 0.1,
    viscosity: float = 1.0,
    compressibility: float = 1e-8,
    rho_ref: float = 1000.0,
    p_ref: float = 0.0,
    dt: float = 1.0,
    bc_pressure=None,
) -> tuple[StructuredFlowKernel, jax.Array]:
    """Build kernel arrays for a homogeneous Cartesian box, whole-boundary
    Dirichlet. ``bc_pressure(x, y, z)`` evaluates boundary pressures."""
    nx_, ny_, nz_ = nx
    lx, ly, lz = physdims
    dx, dy, dz = lx / nx_, ly / ny_, lz / nz_

    def t_axis(n, d, area, shape):
        t = np.full(shape, permeability * area / d)
        # One-sided boundary faces: half distance.
        t_b = permeability * area / (d / 2.0)
        t[0] = t_b
        t[-1] = t_b
        return t

    tx = t_axis(nx_, dx, dy * dz, (nx_ + 1, ny_, nz_))
    ty = np.moveaxis(
        t_axis(ny_, dy, dx * dz, (ny_ + 1, nx_, nz_)), 0, 1
    )
    tz = np.moveaxis(
        t_axis(nz_, dz, dx * dy, (nz_ + 1, nx_, ny_)), 0, 2
    )

    xc = (np.arange(nx_) + 0.5) * dx
    yc = (np.arange(ny_) + 0.5) * dy
    zc = (np.arange(nz_) + 0.5) * dz
    if bc_pressure is None:
        bc_pressure = lambda x, y, z: np.zeros(np.broadcast(x, y, z).shape)  # noqa: E731

    Y, Z = np.meshgrid(yc, zc, indexing="ij")
    pbc_x = np.stack(
        [bc_pressure(0.0 * Y, Y, Z), bc_pressure(lx + 0.0 * Y, Y, Z)]
    )
    X, Z2 = np.meshgrid(xc, zc, indexing="ij")
    pbc_y = np.stack(
        [bc_pressure(X, 0.0 * X, Z2), bc_pressure(X, ly + 0.0 * X, Z2)]
    )
    X3, Y3 = np.meshgrid(xc, yc, indexing="ij")
    pbc_z = np.stack(
        [bc_pressure(X3, Y3, 0.0 * X3), bc_pressure(X3, Y3, lz + 0.0 * X3)]
    )

    kernel = StructuredFlowKernel(
        tx=jnp.asarray(tx),
        ty=jnp.asarray(ty),
        tz=jnp.asarray(tz),
        pbc_x=jnp.asarray(pbc_x),
        pbc_y=jnp.asarray(pbc_y),
        pbc_z=jnp.asarray(pbc_z),
        pv=jnp.asarray(np.full((nx_, ny_, nz_), porosity * dx * dy * dz)),
        rho_ref=jnp.float64(rho_ref),
        comp=jnp.float64(compressibility),
        visc=jnp.float64(viscosity),
        p_ref=jnp.float64(p_ref),
        dt=jnp.float64(dt),
        shape=(nx_, ny_, nz_),
    )
    p0 = jnp.full((nx_, ny_, nz_), jnp.float64(p_ref))
    return kernel, p0
