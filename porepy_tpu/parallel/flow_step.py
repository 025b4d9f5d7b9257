"""Fully device-resident single-phase-flow Newton step.

This is the production fast path: the whole per-iteration kernel —
residual, matrix-free Jacobian (jvp), Krylov solve, update — is one jitted
function of static-shape arrays, with no host round-trips and no sparse
matrices. Cell- and face-arrays shard over a ``jax.sharding.Mesh`` ("cells"
axis); XLA/GSPMD inserts the halo collectives for cross-shard face gathers.

Physics covered (matching the model-layer SinglePhaseFlow): compressible
single-phase Darcy flow, TPFA fluxes with Dirichlet ghost values / Neumann
prescribed fluxes, upwinded density-mobility advection weight, backward
Euler. The model layer (operator DAG) produces the same numbers through the
general machinery; this kernel is the hand-fused equivalent used for
benchmarks and scale-out.

Reference counterpart: one Newton iteration of
``models/fluid_mass_balance.py`` SinglePhaseFlow = scipy assembly
(``equation_system.py:1579``) + direct solve
(``solution_strategy.py:830``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TpfaFlowKernel", "build_cart_flow_kernel"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TpfaFlowKernel:
    """Static-shape arrays for a compressible single-phase TPFA step."""

    # Face topology/coefficients
    lo: jax.Array  # int32 (nf,) cell behind the face (-1: boundary)
    hi: jax.Array  # int32 (nf,) cell in front (-1: boundary)
    t: jax.Array  # (nf,) transmissibilities (harmonic; one-sided on bdry)
    is_neu: jax.Array  # bool (nf,)
    bc_val: jax.Array  # (nf,) dirichlet pressure / neumann total flux

    # Cell data
    pv: jax.Array  # (nc,) pore volume = cell_volume * porosity

    # Fluid
    rho_ref: jax.Array  # scalar
    comp: jax.Array  # scalar compressibility
    visc: jax.Array  # scalar viscosity
    p_ref: jax.Array  # scalar reference pressure
    dt: jax.Array  # scalar time step

    num_cells: int = dataclasses.field(metadata=dict(static=True))
    num_faces: int = dataclasses.field(metadata=dict(static=True))

    # -- physics -------------------------------------------------------------

    def density(self, p):
        return self.rho_ref * jnp.exp(self.comp * (p - self.p_ref))

    def face_flux(self, p):
        """Darcy flux per face with Dirichlet ghost values; Neumann faces
        carry their prescribed flux."""
        p_lo = jnp.where(self.lo >= 0, p[jnp.clip(self.lo, 0)], self.bc_val)
        p_hi = jnp.where(self.hi >= 0, p[jnp.clip(self.hi, 0)], self.bc_val)
        q = self.t * (p_lo - p_hi)
        return jnp.where(self.is_neu, self.bc_val, q)

    def residual(self, p, p_prev):
        q = self.face_flux(p)
        # Upwinded advection weight rho/mu; on inflow boundaries use the
        # Dirichlet ghost density.
        rho = self.density(p)
        rho_lo = jnp.where(
            self.lo >= 0, rho[jnp.clip(self.lo, 0)], self.density(self.bc_val)
        )
        rho_hi = jnp.where(
            self.hi >= 0, rho[jnp.clip(self.hi, 0)], self.density(self.bc_val)
        )
        upstream = jax.lax.stop_gradient(q) >= 0
        w = jnp.where(upstream, rho_lo, rho_hi) / self.visc
        mass_flux = jnp.where(self.is_neu, q, w * q)

        # Divergence: signed scatter into the two neighbor cells.
        div = jnp.zeros(self.num_cells, dtype=p.dtype)
        div = div.at[jnp.clip(self.lo, 0)].add(
            jnp.where(self.lo >= 0, mass_flux, 0.0)
        )
        div = div.at[jnp.clip(self.hi, 0)].add(
            jnp.where(self.hi >= 0, -mass_flux, 0.0)
        )

        accumulation = self.pv * (self.density(p) - self.density(p_prev)) / self.dt
        return accumulation + div

    # -- Newton step ---------------------------------------------------------

    def newton_step(self, p, p_prev, tol: float = 1e-10, maxiter: int = 200):
        """One Newton iteration: matrix-free BiCGStab on the jvp-Jacobian.
        Returns (p_new, residual_norm_before)."""
        r, jvp_fn = jax.linearize(lambda pp: self.residual(pp, p_prev), p)
        diag = self._jacobi_diagonal(p, p_prev)

        nrm = jnp.linalg.norm(r)
        scale = jnp.where(nrm > 0, nrm, 1.0)
        dx, _ = jax.scipy.sparse.linalg.bicgstab(
            jvp_fn,
            -r / scale,
            M=lambda x: x / diag,
            tol=tol,
            atol=0.0,
            maxiter=maxiter,
        )
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * scale
        return p + dx, nrm

    def _jacobi_diagonal(self, p, p_prev):
        """Diagonal of the Jacobian via one extra jvp trick: accumulation
        part analytically + flux part approximated by transmissibility
        row-sums (exact for incompressible)."""
        w = self.density(p) / self.visc
        t_eff = jnp.where(self.is_neu, 0.0, self.t)
        diag = jnp.zeros(self.num_cells, dtype=p.dtype)
        contrib = t_eff * jnp.where(self.lo >= 0, 1.0, 0.0) + 0.0
        diag = diag.at[jnp.clip(self.lo, 0)].add(
            jnp.where(self.lo >= 0, t_eff, 0.0)
        )
        diag = diag.at[jnp.clip(self.hi, 0)].add(
            jnp.where(self.hi >= 0, t_eff, 0.0)
        )
        diag = diag * w
        diag = diag + self.pv * self.comp * self.density(p) / self.dt
        _ = contrib
        return jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)


def build_cart_flow_kernel(
    nx,
    physdims=None,
    permeability: float = 1.0,
    porosity: float = 0.1,
    viscosity: float = 1.0,
    compressibility: float = 1e-8,
    rho_ref: float = 1000.0,
    p_ref: float = 0.0,
    dt: float = 1.0,
    bc_pressure=None,
) -> tuple[TpfaFlowKernel, np.ndarray]:
    """Host-side setup: build the kernel arrays for a Cartesian grid with
    Dirichlet pressure on the whole boundary. Returns (kernel, p_init)."""
    import jax.numpy as jnp

    from porepy_tpu.grids.structured import CartGrid
    from porepy_tpu.numerics.fv.fv_mesh import BoundaryMasks, FvMesh
    from porepy_tpu.numerics.fv.tpfa import face_transmissibilities
    from porepy_tpu.params.bc import BoundaryCondition

    g = CartGrid(list(nx), physdims=physdims)
    g.compute_geometry()
    mesh = FvMesh.from_grid(g)
    bc = BoundaryCondition(g, g.get_boundary_faces(), "dir")
    bnd = BoundaryMasks.from_bc(bc)

    perm = jnp.asarray(permeability * np.ones(g.num_cells))
    t = face_transmissibilities(mesh, perm)

    cf = g.cell_faces_as_dense()
    bc_val = np.zeros(g.num_faces)
    bf = g.get_boundary_faces()
    if bc_pressure is None:
        bc_val[bf] = 0.0
    else:
        bc_val[bf] = bc_pressure(g.face_centers[:, bf])

    kernel = TpfaFlowKernel(
        lo=jnp.asarray(cf[0], dtype=jnp.int32),
        hi=jnp.asarray(cf[1], dtype=jnp.int32),
        t=jnp.asarray(t),
        is_neu=jnp.asarray(np.asarray(bnd.is_neu)),
        bc_val=jnp.asarray(bc_val),
        pv=jnp.asarray(g.cell_volumes * porosity),
        rho_ref=jnp.float64(rho_ref),
        comp=jnp.float64(compressibility),
        visc=jnp.float64(viscosity),
        p_ref=jnp.float64(p_ref),
        dt=jnp.float64(dt),
        num_cells=g.num_cells,
        num_faces=g.num_faces,
    )
    p0 = np.full(g.num_cells, p_ref, dtype=float)
    return kernel, p0


@partial(jax.jit, static_argnames=())
def jitted_newton_step(kernel: TpfaFlowKernel, p, p_prev):
    return kernel.newton_step(p, p_prev)
