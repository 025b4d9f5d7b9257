"""Two-point flux approximation (TPFA) for scalar elliptic equations.

TPU-first design
----------------
The discretization is a pure, differentiable jax function of the cell
permeability (:func:`face_transmissibilities`): half-face transmissibilities
are an elementwise expression over the half-face arrays of
:class:`~porepy_tpu.numerics.fv.fv_mesh.FvMesh`, the harmonic average a
``segment_sum``. Because the whole pipeline is jax, a solution-dependent
permeability differentiates through the discretization for free — the
reference needs a dedicated ``DifferentiableTpfa``
(``numerics/fv/tpfa.py:281``) for that.

Flux evaluation at runtime never materializes matrices:
:func:`apply_flux` is two gathers and a multiply. The scipy matrices the
reference stores (``flux``, ``bound_flux``, ``bound_pressure_cell/face``,
``vector_source``, ``bound_pressure_vector_source`` — see reference
``numerics/fv/tpfa.py:55-67``) are still produced by :meth:`Tpfa.discretize`
for API/golden parity and for host-side direct solvers.

Behavioral parity notes (reference ``numerics/fv/tpfa.py:32-280``):
- half transmissibility ``t_hf = (n·K·d) / |d|^2`` with ``n`` the
  outward area-weighted normal and ``d`` the face-center-to-cell-center
  vector; harmonic average over a face's half-faces.
- internal (fracture) boundary faces are forced Neumann.
- Neumann faces: ``t = 0``; ``bound_flux`` entry = ``sgn``; pressure trace
  uses ``-1/t_full`` face and unit cell contributions.
- Dirichlet faces: ``bound_flux`` entry = ``-t * sgn``; trace = boundary
  value.
- vector-source discretization: ``t * d * sgn`` per half-face
  (Starnoni et al. 2020).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from porepy_tpu.numerics.fv.fv_mesh import BoundaryMasks, FvMesh
from porepy_tpu.numerics.fv.fv_elliptic import FVElliptic
from porepy_tpu.utils import common_constants as cc

__all__ = [
    "Tpfa",
    "half_face_transmissibilities",
    "face_transmissibilities",
    "apply_flux",
]


def half_face_transmissibilities(mesh: FvMesh, perm: jax.Array) -> jax.Array:
    """Half-face transmissibilities ``(n·K·d)/|d|^2``.

    Parameters:
        mesh: FV mesh arrays.
        perm: cell permeability, shape ``(3, 3, num_cells)`` (full tensor)
            or ``(num_cells,)`` (isotropic).

    Returns:
        ``(num_half_faces,)`` array.
    """
    n = mesh.face_normals[:, mesh.fi] * mesh.sgn  # outward
    d = mesh.fc_cc()
    if perm.ndim == 1:
        nk = perm[mesh.ci] * n
    else:
        k_hf = perm[:, :, mesh.ci]
        nk = jnp.einsum("ijh,jh->ih", k_hf, n)
    t = jnp.sum(nk * d, axis=0)
    dist2 = jnp.sum(d * d, axis=0)
    return t / dist2


def face_transmissibilities(mesh: FvMesh, perm: jax.Array) -> jax.Array:
    """Harmonic-average face transmissibilities, shape ``(num_faces,)``."""
    t_hf = half_face_transmissibilities(mesh, perm)
    recip = jax.ops.segment_sum(1.0 / t_hf, mesh.fi, num_segments=mesh.num_faces)
    return 1.0 / recip


def effective_transmissibilities(
    mesh: FvMesh, perm: jax.Array, bnd: BoundaryMasks
) -> tuple[jax.Array, jax.Array]:
    """``(t, t_full)``: transmissibilities with Neumann faces zeroed, and the
    unmodified harmonic averages (used by pressure-trace reconstruction)."""
    t_full = face_transmissibilities(mesh, perm)
    t = jnp.where(bnd.is_neu, 0.0, t_full)
    return t, t_full


def apply_flux(
    mesh: FvMesh,
    t: jax.Array,
    p: jax.Array,
    bound_flux_coeff: Optional[jax.Array] = None,
    bc_values: Optional[jax.Array] = None,
) -> jax.Array:
    """Evaluate the face flux ``flux @ p (+ bound_flux @ bc_values)``
    directly from half-face arrays (no matrices).

    ``flux[f] = t[f] * sum_halffaces sgn * p[cell]``.
    """
    cell_part = jax.ops.segment_sum(
        mesh.sgn * p[mesh.ci], mesh.fi, num_segments=mesh.num_faces
    )
    flux = t * cell_part
    if bound_flux_coeff is not None and bc_values is not None:
        flux = flux + bound_flux_coeff * bc_values
    return flux


def boundary_flux_coefficients(
    mesh: FvMesh, t: jax.Array, bnd: BoundaryMasks
) -> jax.Array:
    """Diagonal of the ``bound_flux`` operator as a face array.

    Dirichlet: ``-t * sgn``; Neumann: ``sgn`` (sign of the single adjacent
    cell's ``cell_faces`` entry). Zero on interior faces.
    """
    # Scatter each half-face sign to its face; on interior faces the two
    # opposite signs cancel irrelevant since coefficient is zero there.
    sgn_face = jnp.zeros(mesh.num_faces).at[mesh.fi].set(mesh.sgn)
    coeff = jnp.where(
        bnd.is_dir, -t * sgn_face, jnp.where(bnd.is_neu, sgn_face, 0.0)
    )
    # Only boundary faces carry coefficients.
    n_adj = jax.ops.segment_sum(
        jnp.ones_like(mesh.sgn), mesh.fi, num_segments=mesh.num_faces
    )
    return jnp.where(n_adj == 1, coeff, 0.0)


class Tpfa(FVElliptic):
    """Two-point flux discretization with the reference's matrix contract.

    ``discretize(sd, data)`` fills ``data[pp.DISCRETIZATION_MATRICES][kw]``
    with scipy matrices identical (to fp rounding) to the reference
    implementation, computed from the jax core above.
    """

    def __init__(self, keyword: str) -> None:
        self.keyword = keyword
        self.flux_matrix_key = "flux"
        self.bound_flux_matrix_key = "bound_flux"
        self.bound_pressure_cell_matrix_key = "bound_pressure_cell"
        self.bound_pressure_face_matrix_key = "bound_pressure_face"
        self.vector_source_matrix_key = "vector_source"
        self.bound_pressure_vector_source_matrix_key = "bound_pressure_vector_source"

    def ndof(self, sd) -> int:
        return sd.num_cells

    def update_discretization(self, sd, data: dict) -> None:
        """TPFA's stencil is face-local and the vectorized discretization
        is O(nnz); a full recompute on the (possibly updated) grid is both
        exact and cheaper than bookkeeping a partial map (reference
        ``numerics/fv/tpfa.py`` routes through the generic partial-update
        machinery instead)."""
        self.discretize(sd, data)

    def discretize(self, sd, data: dict) -> None:
        param = data[cc.PARAMETERS][self.keyword]
        matrices = data[cc.DISCRETIZATION_MATRICES][self.keyword]
        vs_dim: int = param.get("ambient_dimension", sd.dim)

        if sd.dim == 0:
            matrices[self.flux_matrix_key] = sps.csr_matrix((0, sd.num_cells))
            matrices[self.bound_flux_matrix_key] = sps.csr_matrix((0, 0))
            matrices[self.bound_pressure_cell_matrix_key] = sps.csr_matrix(
                (0, sd.num_cells)
            )
            matrices[self.bound_pressure_face_matrix_key] = sps.csr_matrix((0, 0))
            matrices[self.vector_source_matrix_key] = sps.csr_matrix(
                (0, sd.num_cells * max(vs_dim, 1))
            )
            matrices[self.bound_pressure_vector_source_matrix_key] = sps.csr_matrix(
                (0, sd.num_cells * max(vs_dim, 1))
            )
            return

        k = param["second_order_tensor"]
        bc = param["bc"]

        mesh = FvMesh.from_grid(sd)
        bnd = BoundaryMasks.from_bc(bc)

        t, t_full = effective_transmissibilities(
            mesh, jnp.asarray(k.values), bnd
        )

        # Host-side assembly of the parity matrices.
        fi = np.asarray(mesh.fi)
        ci = np.asarray(mesh.ci)
        sgn = np.asarray(mesh.sgn)
        t_np = np.asarray(t)
        t_full_np = np.asarray(t_full)
        is_dir = np.asarray(bnd.is_dir)
        is_neu = np.asarray(bnd.is_neu)
        is_dir_raw = np.asarray(bnd.is_dir_raw)
        is_neu_raw = np.asarray(bnd.is_neu_raw)
        nf, nc = sd.num_faces, sd.num_cells

        flux = sps.coo_matrix(
            (t_np[fi] * sgn, (fi, ci)), shape=(nf, nc)
        ).tocsr()

        bndr_ind = sd.get_all_boundary_faces()
        sgn_face = np.zeros(nf)
        sgn_face[fi] = sgn  # boundary faces have one half-face
        t_b = np.where(is_dir, -t_np, np.where(is_neu, 1.0, 0.0))
        bound_flux = sps.coo_matrix(
            (t_b[bndr_ind] * sgn_face[bndr_ind], (bndr_ind, bndr_ind)),
            shape=(nf, nf),
        ).tocsr()

        matrices[self.flux_matrix_key] = flux
        matrices[self.bound_flux_matrix_key] = bound_flux

        # Pressure-trace reconstruction (raw dir/neu masks per reference
        # tpfa.py:235-246).
        v_cell = np.zeros(fi.size)
        v_cell[is_neu_raw[fi]] = 1.0
        v_face = np.zeros(nf)
        v_face[is_dir_raw] = 1.0
        v_face[is_neu_raw] = -1.0 / t_full_np[is_neu_raw]
        matrices[self.bound_pressure_cell_matrix_key] = sps.coo_matrix(
            (v_cell, (fi, ci)), shape=(nf, nc)
        ).tocsr()
        matrices[self.bound_pressure_face_matrix_key] = sps.dia_matrix(
            (v_face, 0), shape=(nf, nf)
        ).tocsr()

        # Vector source (gravity) discretization.
        fc_cc = np.asarray(mesh.fc_cc())
        vals = (t_np[fi] * fc_cc * sgn)[:vs_dim].ravel("F")
        rows = np.tile(fi, (vs_dim, 1)).ravel("F")
        cols = (ci[:, None] * vs_dim + np.arange(vs_dim)).ravel()
        matrices[self.vector_source_matrix_key] = sps.coo_matrix(
            (vals, (rows, cols)), shape=(nf, nc * vs_dim)
        ).tocsr()

        bp_vals = np.zeros((vs_dim, fi.size))
        neu_hf = is_neu_raw[fi]
        bp_vals[:, neu_hf] = fc_cc[:vs_dim, neu_hf]
        matrices[self.bound_pressure_vector_source_matrix_key] = sps.coo_matrix(
            (bp_vals.ravel("F"), (rows, cols)), shape=(nf, nc * vs_dim)
        ).tocsr()
