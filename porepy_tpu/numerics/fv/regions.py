"""Interaction-region topology shared by the multi-point FV kernels.

Builds, from a grid's incidence matrices, the flat index arrays describing
every vertex-centred interaction region: its subcells (cell, node) and
subfaces (face, node), local numberings, and boundary classification. Pure
integer numpy, computed once per grid; consumed by the batched MPFA/MPSA
assemblers (capability counterpart of the reference's ``SubcellTopology`` /
``ExcludeBoundaries`` pair in ``numerics/fv/_fvutils.py:21,765``, organised
per region instead of per global exclusion operator).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from porepy_tpu.utils.array_operations import expand_index_pointers

__all__ = ["RegionTopology", "build_regions"]


@dataclass
class RegionTopology:
    # Incidence triples (one per (cell, face, node)), sorted by (v, f, c).
    t_c: np.ndarray  # cell
    t_f: np.ndarray  # face
    t_v: np.ndarray  # node
    t_sgn: np.ndarray  # cell_faces sign of (f, c)
    t_r: np.ndarray  # region id
    t_sc: np.ndarray  # subcell id
    t_sf: np.ndarray  # subface id
    t_loc_cell: np.ndarray  # local cell index within region
    t_row: np.ndarray  # local (scalar) primary-equation row = subface index
    first_inc: np.ndarray  # bool: designated incidence of its subface

    # Subcells, sorted by region.
    sc_c: np.ndarray
    sc_start: np.ndarray  # region -> offset into sc arrays

    # Subfaces, sorted by region.
    sf_f: np.ndarray
    sf_v: np.ndarray  # node of the subface
    sf_r: np.ndarray
    sf_cnt: np.ndarray  # 1 or 2 incidences
    sf_start: np.ndarray
    sf_loc: np.ndarray
    sf_interior: np.ndarray
    sf_neu: np.ndarray
    sf_dir: np.ndarray
    sf_rob: np.ndarray
    sf_prow: np.ndarray  # continuity-row index (interior only, else -1)
    sf_bcol: np.ndarray  # boundary-column index (boundary only, else -1)
    bnd_idx: np.ndarray  # indices of boundary subfaces
    b_start: np.ndarray

    # Per-region counts.
    R: int
    nc_r: np.ndarray
    nsf_r: np.ndarray
    nint_r: np.ndarray
    nb_r: np.ndarray

    # Grid-level helpers.
    nnpf: np.ndarray  # nodes per face


def build_regions(sd, is_neu, is_dir, is_rob) -> RegionTopology:
    """Region topology with scalar per-face boundary classification.

    ``is_neu/is_dir/is_rob``: per-face masks (internal faces already folded
    into Neumann by the caller). For vector problems the caller refines the
    per-component classification afterwards.
    """
    nc, nf = sd.num_cells, sd.num_faces
    fn = sd.face_nodes.tocsc()
    cf = sd.cell_faces.tocsc()
    nnpf = np.diff(fn.indptr)

    cf_f = cf.indices
    cf_c = np.repeat(np.arange(nc), np.diff(cf.indptr))
    cf_sgn = np.asarray(cf.data, dtype=float)
    rep = nnpf[cf_f]
    t_c = np.repeat(cf_c, rep)
    t_f = np.repeat(cf_f, rep)
    t_sgn = np.repeat(cf_sgn, rep)
    t_v = fn.indices[expand_index_pointers(fn.indptr[cf_f], fn.indptr[cf_f + 1])]

    order = np.lexsort((t_c, t_f, t_v))
    t_c, t_f, t_sgn, t_v = t_c[order], t_f[order], t_sgn[order], t_v[order]

    sc_code = t_v.astype(np.int64) * nc + t_c
    sc_codes, t_sc = np.unique(sc_code, return_inverse=True)
    sc_v, sc_c = sc_codes // nc, sc_codes % nc
    sf_code = t_v.astype(np.int64) * nf + t_f
    sf_codes, t_sf = np.unique(sf_code, return_inverse=True)
    sf_v, sf_f = sf_codes // nf, sf_codes % nf
    n_sf_tot = sf_codes.size

    nodes, sc_r = np.unique(sc_v, return_inverse=True)
    R = nodes.size
    sf_r = np.searchsorted(nodes, sf_v)
    t_r = np.searchsorted(nodes, t_v)

    nc_r = np.bincount(sc_r, minlength=R)
    sc_start = np.concatenate([[0], np.cumsum(nc_r)])
    sc_loc = np.arange(sc_codes.size) - sc_start[sc_r]

    nsf_r = np.bincount(sf_r, minlength=R)
    sf_start = np.concatenate([[0], np.cumsum(nsf_r)])
    sf_loc = np.arange(n_sf_tot) - sf_start[sf_r]
    sf_cnt = np.bincount(t_sf, minlength=n_sf_tot)

    sf_interior = sf_cnt == 2
    sf_neu = ~sf_interior & is_neu[sf_f]
    sf_dir = ~sf_interior & is_dir[sf_f]
    sf_rob = ~sf_interior & is_rob[sf_f]
    if not np.all(sf_interior | sf_neu | sf_dir | sf_rob):
        raise ValueError("Boundary subfaces must be Dirichlet, Neumann or Robin")

    int_idx = np.flatnonzero(sf_interior)
    nint_r = np.bincount(sf_r[int_idx], minlength=R)
    int_start = np.concatenate([[0], np.cumsum(nint_r)])
    int_loc = np.arange(int_idx.size) - int_start[sf_r[int_idx]]
    sf_prow = np.full(n_sf_tot, -1, dtype=np.int64)
    sf_prow[int_idx] = nsf_r[sf_r[int_idx]] + int_loc

    bnd_idx = np.flatnonzero(~sf_interior)
    nb_r = np.bincount(sf_r[bnd_idx], minlength=R)
    b_start = np.concatenate([[0], np.cumsum(nb_r)])
    sf_bcol = np.full(n_sf_tot, -1, dtype=np.int64)
    sf_bcol[bnd_idx] = np.arange(bnd_idx.size) - b_start[sf_r[bnd_idx]]

    first_inc = np.zeros(t_f.size, dtype=bool)
    first_inc[np.unique(t_sf, return_index=True)[1]] = True

    return RegionTopology(
        t_c=t_c,
        t_f=t_f,
        t_v=t_v,
        t_sgn=t_sgn,
        t_r=t_r,
        t_sc=t_sc,
        t_sf=t_sf,
        t_loc_cell=sc_loc[t_sc],
        t_row=sf_loc[t_sf],
        first_inc=first_inc,
        sc_c=sc_c,
        sc_start=sc_start,
        sf_f=sf_f,
        sf_v=sf_v,
        sf_r=sf_r,
        sf_cnt=sf_cnt,
        sf_start=sf_start,
        sf_loc=sf_loc,
        sf_interior=sf_interior,
        sf_neu=sf_neu,
        sf_dir=sf_dir,
        sf_rob=sf_rob,
        sf_prow=sf_prow,
        sf_bcol=sf_bcol,
        bnd_idx=bnd_idx,
        b_start=b_start,
        R=R,
        nc_r=nc_r,
        nsf_r=nsf_r,
        nint_r=nint_r,
        nb_r=nb_r,
        nnpf=nnpf,
    )


def continuity_geometry(sd, rt: RegionTopology, eta: float, d: int):
    """Per-incidence subface normal share, continuity-point distance and
    subface weight. ``eta`` is forced to zero on boundary faces (reference
    ``_fvutils.compute_dist_face_cell:230``)."""
    w = 1.0 / rt.nnpf[rt.t_f]
    n_tilde = sd.face_normals[:d, rt.t_f] * w
    eta_vec = np.full(rt.t_f.size, float(eta))
    eta_vec[np.isin(rt.t_f, sd.get_all_boundary_faces())] = 0.0
    x_cont = sd.face_centers[:d, rt.t_f] + eta_vec * (
        sd.nodes[:d, rt.t_v] - sd.face_centers[:d, rt.t_f]
    )
    dist = x_cont - sd.cell_centers[:d, rt.t_c]
    return w, n_tilde, dist
