"""Wells as polylines embedded in 3d domains.

Behavioral counterpart of reference ``fracs/wells_3d.py``: a :class:`Well`
is a polyline, a :class:`WellNetwork3d` collects wells and can mesh them
into an existing mixed-dimensional grid (one 1d grid per sub-line between
fracture intersections, 0d grids at the intersections, interfaces wiring
everything together — reference ``wells_3d.py:325``). Module functions
compute well-fracture (reference ``wells_3d.py:508``) and well-matrix
(reference ``wells_3d.py:567``, codim-2 coupling via an ADTree search)
intersections.

All of this is host-side mesh construction: plain numpy/scipy, no device
work.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import scipy.sparse as sps

from porepy_tpu.geometry import distances
from porepy_tpu.geometry import intersections as isect_mod
from porepy_tpu.grids.mortar_grid import MortarGrid, MortarSides
from porepy_tpu.grids.point_grid import PointGrid
from porepy_tpu.grids.structured import TensorGrid
from porepy_tpu.utils import adtree, tags as tag_utils
from porepy_tpu.utils.array_operations import expand_index_pointers

__all__ = [
    "Well",
    "WellNetwork3d",
    "compute_well_fracture_intersections",
    "compute_well_rock_matrix_intersections",
]


class Well:
    """A single well: a polyline in 3d given by its points (3, num_points)."""

    dim = 1

    def __init__(self, points, index=None, tags=None) -> None:
        self.pts = np.asarray(points, dtype=float)
        self.orig_pts = self.pts.copy()
        self.tags: dict = dict(tags or {})
        self._index: int = -1 if index is None else int(index)

    @property
    def index(self) -> int:
        return self._index

    @index.setter
    def index(self, i: Optional[int] = None) -> None:
        self._index = -1 if i is None else i

    def num_points(self) -> int:
        return self.pts.shape[1]

    def num_segments(self) -> int:
        return self.num_points() - 1

    def segments(self) -> Iterator[tuple[tuple[int, int], np.ndarray]]:
        """Yield ((start index, end index), endpoint coordinates) per segment."""
        for i in range(self.num_segments()):
            yield (i, i + 1), self.pts[:, (i, i + 1)]

    def add_point(self, point: np.ndarray, ind: Optional[int] = None) -> None:
        if ind is None:
            self.pts = np.hstack((self.pts, point))
        else:
            self.pts = np.hstack((self.pts[:, :ind], point, self.pts[:, ind:]))

    def _mesh_size(self, segment_ind=None) -> Optional[float]:
        """Per-well/segment mesh size override; None defers to the network."""
        return None

    def copy(self) -> "Well":
        return Well(np.copy(self.pts), tags=self.tags.copy())

    def __repr__(self) -> str:
        return (
            f"Well(index={self.index}, segments={self.num_segments()})"
        )


class WellNetwork3d:
    """Collection of wells with meshing functionality."""

    def __init__(
        self,
        domain,
        wells: Optional[list[Well]] = None,
        tol: float = 1e-8,
        parameters: Optional[dict] = None,
    ) -> None:
        self.domain = domain
        self.well_dim: int = 1
        self.wells: list[Well] = wells if wells is not None else []
        for i, w in enumerate(self.wells):
            w.index = i
        self.parameters: dict = parameters if parameters is not None else {}
        self.tol = tol
        self.tags: dict = {}

    def add(self, well: Well) -> None:
        inds = [w.index for w in self.wells]
        well.index = (max(inds) + 1) if inds else 0
        self.wells.append(well)

    def _mesh_size(self, well: Well, segment_ind=None) -> float:
        size = well._mesh_size(segment_ind)
        if size is None:
            size = self.parameters["mesh_size"]
        return size

    def mesh(self, mdg) -> None:
        """Grid the wells and add them (plus 0d intersection grids and the
        connecting interfaces) to an existing md-grid.

        One 1d grid is made per sub-line between fracture intersections;
        kinks without an intersection are absorbed into a piecewise-linear
        grid. Requires ``tags['intersecting_fractures']`` on each well, as
        set by :func:`compute_well_fracture_intersections`.
        """
        well_num = 0
        for w in self.wells:
            tags_w = w.tags.get(
                "intersecting_fractures", [np.empty(0)] * w.num_points()
            )
            if any(t.size > 1 for t in tags_w):
                raise NotImplementedError(
                    "Wells meeting several fractures in one point are not "
                    "supported"
                )

            points_subline = np.empty((3, 0))
            endp_tip_tags = np.zeros(2, dtype=bool)
            endp_frac_tags = np.zeros(2, dtype=bool)
            # The well's first point may itself be an intersection: make the
            # 0d grid and its fracture interface up front; the interface to
            # the first well grid is added inside the segment loop.
            if tags_w[0].size > 0:
                sd_isec = _make_intersection_grid(w.pts[:, 0], mdg)
                _couple_fracture_to_intersection(sd_isec, tags_w[0], mdg)
                endp_frac_tags[0] = True

            for inds_seg, seg in w.segments():
                length = float(
                    np.asarray(
                        distances.point_pointset(seg[:, 0], seg[:, 1])
                    ).ravel()[0]
                )
                num_pts = max(int(length / self._mesh_size(w, inds_seg)), 2)
                points_loc = np.linspace(seg[:, 0], seg[:, 1], num_pts).T
                points_subline = np.hstack((points_subline, points_loc))

                if tags_w[inds_seg[1]].size == 0:
                    if inds_seg[1] == w.num_points() - 1:
                        # Well ends without an intersection: internal tip.
                        endp_tip_tags[1] = True
                        endp_frac_tags[1] = False
                    else:
                        # Kink: merge with the next segment (drop the shared
                        # point, re-added by the next iteration).
                        points_subline = np.reshape(
                            points_subline[:, :-1], (3, -1)
                        )
                        continue

                # Sub-line ends here (intersection or well end): build the
                # 1d well grid on the accumulated points.
                sd_w = TensorGrid(np.arange(points_subline.shape[1], dtype=float))
                sd_w.nodes = points_subline.copy()
                sd_w.compute_geometry()
                mdg.add_subdomains(sd_w)
                sd_w.well_num = well_num
                sd_w.name += " well " + str(well_num)
                sd_w.tags["parent_well_index"] = w.index
                well_num += 1

                if not endp_tip_tags[1]:
                    endp_frac_tags[1] = True
                    sd_isec = _make_intersection_grid(seg[:, 1], mdg)
                    sd_isec.tags["parent_well_index"] = w.index
                    _couple_well_to_intersection(sd_w, sd_isec, mdg)
                    _couple_fracture_to_intersection(
                        sd_isec, tags_w[inds_seg[1]], mdg
                    )

                if endp_frac_tags[0]:
                    # Intersection grid at this sub-line's start: the last 0d
                    # grid added, or the one before if we just added one for
                    # the end point.
                    previous_ind = -1 - int(endp_frac_tags[1])
                    previous_isec = mdg.subdomains(dim=self.well_dim - 1)[
                        previous_ind
                    ]
                    _couple_well_to_intersection(sd_w, previous_isec, mdg)

                # Face tags at the two well ends: domain boundary, tip or
                # fracture.
                bounding_planes = self.domain.polytope_from_bounding_box()
                boundary = np.zeros(2, dtype=bool)
                endp_inds = [0, -1]
                endpts = sd_w.face_centers[:, endp_inds]
                for plane in bounding_planes:
                    dist, _, _ = distances.points_polygon(endpts, plane)
                    boundary |= np.isclose(dist, 0)
                endp_tip_tags[0] = not (boundary[0] or endp_frac_tags[0])
                sd_w.tags["domain_boundary_faces"][endp_inds] = boundary
                sd_w.tags["tip_faces"][endp_inds] = endp_tip_tags
                sd_w.tags["fracture_faces"][endp_inds] = endp_frac_tags

                bg_w = mdg.subdomain_to_boundary_grid(sd_w)
                if bg_w is not None:
                    # The boundary grid was built before the face tags above
                    # existed; rebuild its cell count and projections.
                    bg_w.num_cells = int(np.sum(boundary))
                    bg_w.set_projections()
                    bg_w.compute_geometry()

                points_subline = np.empty((3, 0))
                endp_tip_tags = np.zeros(2, dtype=bool)
                endp_frac_tags = np.array([True, False])
        for t in ("domain_boundary", "tip", "fracture"):
            tag_utils.add_node_tags_from_face_tags(mdg, t)

    def __repr__(self) -> str:
        return f"WellNetwork3d({len(self.wells)} wells)"


def compute_well_fracture_intersections(
    well_network: WellNetwork3d, fracture_network
) -> None:
    """Insert well-fracture intersection points into each well's polyline and
    tag every well point with the indices of the fractures meeting it
    (``tags['intersecting_fractures']``)."""
    boundary_tags = fracture_network.tags.get(
        "boundary", [False] * len(fracture_network.fractures)
    )
    for well in well_network.wells:
        well_pts = np.empty((3, 0))
        well_tags: list[np.ndarray] = []
        for seg_ind, segment in well.segments():
            # The segment's end point doubles as the next segment's start:
            # defer its handling unless this is the well's last segment.
            defer_endpoint = seg_ind[1] < well.num_segments()
            pts_seg = segment.copy()
            tags_seg: list[np.ndarray] = [np.empty(0), np.empty(0)]
            for fracture, on_boundary in zip(
                fracture_network.fractures, boundary_tags
            ):
                if on_boundary:
                    continue
                pts_seg, tags_seg = _intersect_segment_fracture(
                    pts_seg, fracture, tags_seg, defer_endpoint
                )
            sort_inds, sorted_pts = _argsort_on_segment(pts_seg)
            stop = sort_inds.size - int(defer_endpoint)
            well_pts = np.hstack((well_pts, sorted_pts[:, :stop]))
            for i in sort_inds[:stop]:
                well_tags.append(tags_seg[i])
        well.pts = well_pts
        well.tags["intersecting_fractures"] = well_tags


def compute_well_rock_matrix_intersections(
    mdg,
    cells: Optional[np.ndarray] = None,
    min_length: float = 1e-10,
    tol: float = 1e-5,
) -> None:
    """Couple every well grid directly to the rock matrix (codim 2): for each
    well segment, find the matrix cells it crosses (ADTree box search +
    segment/polyhedron clipping) and add a mortar interface whose
    primary-to-mortar map carries the in-cell length fractions."""
    dim_max = mdg.dim_max()
    sd_max = mdg.subdomains(dim=dim_max)[0]
    tree = adtree.ADTree(2 * sd_max.dim, sd_max.dim)
    tree.from_grid(sd_max, cells)

    well_subdomains = [
        g for g in mdg.subdomains(dim=dim_max - 2) if hasattr(g, "well_num")
    ]

    # Segment (start, end) node pairs per well grid.
    nodes_w = []
    for sd_w in well_subdomains:
        cn = sd_w.cell_nodes()
        first = cn.indptr[:-1]
        second = cn.indptr[1:]
        nodes_w.append(
            cn.indices[expand_index_pointers(first, second)]
            .reshape((-1, 2))
            .T
        )

    cf = sd_max.cell_faces.tocsc()
    fn = sd_max.face_nodes.tocsc()

    for sd_w, n_w in zip(well_subdomains, nodes_w):
        start = sd_w.nodes[:, n_w[0]]
        end = sd_w.nodes[:, n_w[1]]

        rows_i: list[int] = []
        cols_j: list[int] = []
        vals: list[float] = []
        for seg_id, (s, e) in enumerate(zip(start.T, end.T)):
            box = np.sort(np.vstack((s, e)), axis=0).ravel()
            hits = tree.search(adtree.ADTNode("query", box))
            for node in hits:
                c = tree.nodes[node].key
                faces_loc = cf.indices[cf.indptr[c] : cf.indptr[c + 1]]
                poly = np.array(
                    [
                        sd_max.nodes[:, fn.indices[fn.indptr[f] : fn.indptr[f + 1]]]
                        for f in faces_loc
                    ]
                )
                _, _, _, ratio = isect_mod.segments_polyhedron(s, e, poly, tol)
                if ratio > min_length:
                    rows_i.append(seg_id)
                    cols_j.append(c)
                    vals.extend(np.atleast_1d(ratio).tolist())

        primary_secondary_map = sps.csc_matrix(
            (vals, (rows_i, cols_j)), shape=(sd_w.num_cells, sd_max.num_cells)
        )

        side_g = {MortarSides.LEFT_SIDE: sd_w.copy()}
        mg = MortarGrid(sd_w.dim, side_g, codim=sd_max.dim - sd_w.dim)
        mg._primary_to_mortar_int = primary_secondary_map
        mg._primary_to_mortar_avg = primary_secondary_map.copy()
        eye = sps.diags(np.ones(sd_w.num_cells), format="csc")
        mg._secondary_to_mortar_int = eye
        mg._secondary_to_mortar_avg = eye.copy()
        mg._set_projections()
        mg.compute_geometry()
        mdg.add_interface(mg, (sd_max, sd_w), primary_secondary_map)


# -- helpers -------------------------------------------------------------------


def _argsort_on_segment(seg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sort collinear points monotonically from the segment's first to
    second point (columns 0 and 1 of ``seg``)."""
    for dim in range(3):
        if not np.isclose(seg[dim, 0] - seg[dim, 1], 0):
            break
    inds = np.argsort(seg[dim])
    if seg[dim, 0] > seg[dim, 1]:
        inds = inds[::-1]
    return inds, seg[:, inds]


def _intersect_segment_fracture(
    segment_points: np.ndarray,
    fracture,
    tags: list[np.ndarray],
    defer_endpoint: bool,
    tol: float = 1e-8,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Intersect one segment (columns [start, end, *interior]) with a plane
    fracture; append a new interior point or extend an existing point's
    fracture tag."""
    distance, isec_pt = distances.segments_polygon(
        segment_points[:, 0], segment_points[:, 1], fracture.pts
    )
    if distance > tol:
        return segment_points, tags
    isec_pt = isec_pt.reshape((3, 1))
    dist_to_existing = distances.point_pointset(isec_pt, segment_points)
    at_existing = np.isclose(dist_to_existing, 0)
    if defer_endpoint and at_existing[1]:
        return segment_points, tags
    if np.any(at_existing):
        ind_loc = int(at_existing.nonzero()[0][0])
        if fracture.index is not None:
            tags[ind_loc] = np.append(tags[ind_loc], fracture.index)
    else:
        segment_points = np.hstack((segment_points, isec_pt))
        tags.append(np.atleast_1d(np.array(fracture.index)))
    return segment_points, tags


def _make_intersection_grid(point: np.ndarray, mdg) -> PointGrid:
    sd = PointGrid(point)
    sd.history.append("Well-fracture intersection grid")
    sd.compute_geometry()
    mdg.add_subdomains(sd)
    return sd


def _couple_fracture_to_intersection(sd_secondary, frac_num, mdg) -> None:
    """Codim-2 interface between the fracture ``frac_num`` and a 0d
    intersection grid (cell-to-cell map)."""
    sd_primary = None
    for sd in mdg.subdomains():
        if sd.frac_num == frac_num:
            sd_primary = sd
            break
    cell_primary = sd_primary.closest_cell(sd_secondary.cell_centers)
    cell_cell_map = sps.coo_matrix(
        (np.ones(1, dtype=bool), (np.array([0]), cell_primary)),
        shape=(sd_secondary.num_cells, sd_primary.num_cells),
    )
    _add_well_interface(sd_primary, sd_secondary, mdg, cell_cell_map)


def _couple_well_to_intersection(sd_primary, sd_secondary, mdg) -> None:
    """Codim-1 interface between a well grid and a 0d intersection grid
    (face-to-cell map on the well face nearest the point)."""
    vec = sd_primary.face_centers - sd_secondary.cell_centers
    face_h = np.array([np.argmin(np.sum(vec**2, axis=0))], dtype=int)
    face_cell_map = sps.coo_matrix(
        (np.ones(1, dtype=bool), (np.array([0]), face_h)),
        shape=(sd_secondary.num_cells, sd_primary.num_faces),
    )
    _add_well_interface(sd_primary, sd_secondary, mdg, face_cell_map)


def _add_well_interface(sd_primary, sd_secondary, mdg, primary_secondary_map) -> None:
    codim = sd_primary.dim - sd_secondary.dim
    side_g = {MortarSides.LEFT_SIDE: sd_secondary.copy()}
    mg = MortarGrid(0, side_g, primary_secondary_map, codim=codim)
    mg.compute_geometry()
    mdg.add_interface(mg, (sd_primary, sd_secondary), primary_secondary_map)
