"""Device-resident finite-volume mesh data.

The TPU-first representation of a grid for finite-volume discretizations:
all topology is flattened to static-shape integer index arrays at setup,
geometry to dense float arrays — a frozen pytree of ``jax.Array``\\ s. Every
per-Newton-iteration computation (transmissibilities, fluxes, Jacobian
stencils) is a gather/segment reduction over these arrays; nothing ever
touches scipy at runtime.

Conceptual counterpart of what the reference framework recomputes from its
scipy CSC ``cell_faces`` matrix at each discretization call
(``/root/reference/src/porepy/numerics/fv/tpfa.py:113`` uses
``sparse_array_to_row_col_data(sd.cell_faces)``); here it is extracted once
and kept on device.

Half-face convention: entry ``k`` couples face ``fi[k]`` with adjacent cell
``ci[k]``; ``sgn[k]`` is +1 when the stored face normal points out of that
cell. Interior faces own two half-faces, boundary faces one. Deterministic
ordering (CSC order of the originating grid) makes segment reductions
reproducible, which the 1e-8 parity target requires.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

__all__ = ["FvMesh", "BoundaryMasks"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoundaryMasks:
    """Face-wise boundary-condition masks on device.

    ``is_dir``/``is_neu`` are the *effective* masks after internal
    (fracture) boundary faces have been forced to Neumann, matching the
    primal-FV convention (reference ``numerics/fv/tpfa.py:204-206``).
    ``is_dir_raw``/``is_neu_raw`` keep the user-assigned flags, which the
    pressure-trace reconstruction uses.
    """

    is_dir: jax.Array
    is_neu: jax.Array
    is_dir_raw: jax.Array
    is_neu_raw: jax.Array
    is_rob: jax.Array
    is_internal: jax.Array

    @staticmethod
    def from_bc(bc) -> "BoundaryMasks":
        is_internal = np.asarray(bc.is_internal, dtype=bool)
        is_dir_raw = np.asarray(bc.is_dir, dtype=bool)
        is_neu_raw = np.asarray(bc.is_neu, dtype=bool)
        return BoundaryMasks(
            is_dir=jnp.asarray(is_dir_raw & ~is_internal),
            is_neu=jnp.asarray(is_neu_raw | is_internal),
            is_dir_raw=jnp.asarray(is_dir_raw),
            is_neu_raw=jnp.asarray(is_neu_raw),
            is_rob=jnp.asarray(bc.is_rob, dtype=bool),
            is_internal=jnp.asarray(is_internal),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FvMesh:
    """Static-shape finite-volume view of a :class:`~porepy_tpu.grids.grid.Grid`.

    Data fields are device arrays; ``dim``/``num_cells``/``num_faces``/
    ``num_half_faces`` are static metadata (compile-time constants under
    ``jit``).
    """

    # Half-face topology (num_half_faces,)
    fi: jax.Array  # face index of each half-face
    ci: jax.Array  # cell index of each half-face
    sgn: jax.Array  # +-1.0: normal out of cell ci -> +1

    # Geometry
    face_normals: jax.Array  # (3, num_faces), area weighted
    face_centers: jax.Array  # (3, num_faces)
    face_areas: jax.Array  # (num_faces,)
    cell_centers: jax.Array  # (3, num_cells)
    cell_volumes: jax.Array  # (num_cells,)

    # Static metadata
    dim: int = dataclasses.field(metadata=dict(static=True))
    num_cells: int = dataclasses.field(metadata=dict(static=True))
    num_faces: int = dataclasses.field(metadata=dict(static=True))
    num_half_faces: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_grid(sd) -> "FvMesh":
        """Extract half-face arrays from a host grid (CSC order, i.e. sorted
        by cell then face within cell — identical traversal order to the
        reference's ``sparse_array_to_row_col_data``)."""
        cf: sps.csc_matrix = sd.cell_faces.tocsc()
        ci = np.repeat(np.arange(sd.num_cells), np.diff(cf.indptr))
        fi = cf.indices
        sgn = cf.data.astype(float)
        return FvMesh(
            fi=jnp.asarray(fi, dtype=jnp.int32),
            ci=jnp.asarray(ci, dtype=jnp.int32),
            sgn=jnp.asarray(sgn),
            face_normals=jnp.asarray(sd.face_normals),
            face_centers=jnp.asarray(sd.face_centers),
            face_areas=jnp.asarray(sd.face_areas),
            cell_centers=jnp.asarray(sd.cell_centers),
            cell_volumes=jnp.asarray(sd.cell_volumes),
            dim=int(sd.dim),
            num_cells=int(sd.num_cells),
            num_faces=int(sd.num_faces),
            num_half_faces=int(fi.size),
        )

    # -- derived quantities -------------------------------------------------

    def fc_cc(self) -> jax.Array:
        """(3, num_half_faces) distance vectors face-center minus
        cell-center per half-face."""
        return self.face_centers[:, self.fi] - self.cell_centers[:, self.ci]

    def divergence_apply(self, face_field: jax.Array) -> jax.Array:
        """Apply the divergence operator to a face field: per cell the
        signed sum over its faces. Input ``(num_faces,)`` or
        ``(..., num_faces)``; reduces the last axis to ``num_cells``."""
        contrib = self.sgn * face_field[..., self.fi]
        return _segment_sum_last(contrib, self.ci, self.num_cells)

    def boundary_faces(self) -> np.ndarray:
        """Host-side indices of faces with exactly one adjacent cell."""
        counts = np.bincount(np.asarray(self.fi), minlength=self.num_faces)
        return np.where(counts == 1)[0]


def _segment_sum_last(x: jax.Array, seg: jax.Array, num: int) -> jax.Array:
    moved = jnp.moveaxis(x, -1, 0)
    out = jax.ops.segment_sum(moved, seg, num_segments=num)
    return jnp.moveaxis(out, 0, -1)
