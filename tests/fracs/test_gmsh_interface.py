"""Native gmsh interface: the .geo writer emits a complete, physically
tagged geometry; the MSH 4.1 reader reconstructs grids that assemble into a
working md-grid (reference ``fracs/gmsh_interface.py``,
``fracs/msh_2_grid.py``) — all without gmsh/meshio installed."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs import meshing, simplex
from porepy_tpu.fracs.gmsh_interface import GmshWriter, PhysicalNames
from porepy_tpu.fracs.msh_2_grid import create_grids_from_msh, parse_msh

DOM = {"xmin": 0.0, "xmax": 1.0, "ymin": 0.0, "ymax": 1.0}
FRAC_PTS = np.array([[0.2, 0.8, 0.5, 0.5], [0.5, 0.5, 0.2, 0.8]])
FRAC_EDGES = np.array([[0, 2], [1, 3]])


def test_geo_writer_structure(tmp_path):
    w = GmshWriter(DOM, FRAC_PTS, FRAC_EDGES, mesh_size_frac=0.1)
    path = w.generate(str(tmp_path / "net.geo"))
    text = open(path).read()
    assert text.count("Point(") == FRAC_PTS.shape[1] + 4
    assert 'Physical Surface("DOMAIN")' in text
    assert f'Physical Line("{PhysicalNames.FRACTURE.value}0")' in text
    assert f'Physical Line("{PhysicalNames.FRACTURE.value}1")' in text
    assert "In Surface{1}" in text
    # Characteristic lengths are attached to every point.
    for ln in text.splitlines():
        if ln.startswith("Point("):
            assert ln.rstrip(";").rstrip("}").split(",")[-1].strip() != ""


def _write_msh41(path, subs):
    """Emit an MSH 4.1 file from CDT grid lists (the inverse of the reader,
    used as a fixture generator)."""
    g2 = subs[0][0]
    p = g2.nodes
    cn = g2.cell_nodes()
    tri = np.vstack(
        [cn.indices[cn.indptr[c] : cn.indptr[c + 1]] for c in range(g2.num_cells)]
    )
    lines = ["$MeshFormat", "4.1 0 8", "$EndMeshFormat"]
    # Physical names: surface DOMAIN (tag 1), lines FRACTURE_k, points.
    phys = ['$PhysicalNames', str(1 + len(subs[1]) + len(subs[2]))]
    phys.append('2 1 "DOMAIN"')
    for k, _ in enumerate(subs[1]):
        phys.append(f'1 {10 + k} "FRACTURE_{k}"')
    for k, _ in enumerate(subs[2]):
        phys.append(f'0 {30 + k} "FRACTURE_INTERSECTION_POINT_{k}"')
    phys.append("$EndPhysicalNames")
    lines += phys

    # Entities: one point entity per 0d grid, one curve per fracture, one
    # surface.
    ent = ["$Entities", f"{len(subs[2])} {len(subs[1])} 1 0"]
    for k, g0 in enumerate(subs[2]):
        x, y = g0.cell_centers[0, 0], g0.cell_centers[1, 0]
        ent.append(f"{k + 1} {x} {y} 0 1 {30 + k}")
    for k, _ in enumerate(subs[1]):
        ent.append(f"{k + 1} 0 0 0 1 1 0 1 {10 + k} 0")
    ent.append("1 0 0 0 1 1 0 1 1 0")
    ent.append("$EndEntities")
    lines += ent

    # All nodes in one block on the surface entity.
    nn = p.shape[1]
    nd = ["$Nodes", f"1 {nn} 1 {nn}", f"2 1 0 {nn}"]
    nd += [str(i + 1) for i in range(nn)]
    nd += [f"{p[0, i]} {p[1, i]} 0" for i in range(nn)]
    nd.append("$EndNodes")
    lines += nd

    # Elements: points, fracture lines, triangles.
    blocks = []
    n_elem = 0
    eid = 1
    for k, g0 in enumerate(subs[2]):
        node = int(g0.global_point_ind[0])
        blocks.append(f"0 {k + 1} 15 1")
        blocks.append(f"{eid} {node + 1}")
        eid += 1
        n_elem += 1
    for k, g1 in enumerate(subs[1]):
        order = np.argsort(g1.global_point_ind)
        chain = np.asarray(g1.global_point_ind)[order]
        segs = list(zip(chain[:-1], chain[1:]))
        blocks.append(f"1 {k + 1} 1 {len(segs)}")
        for a, b in segs:
            blocks.append(f"{eid} {a + 1} {b + 1}")
            eid += 1
            n_elem += 1
    blocks.append(f"2 1 2 {tri.shape[0]}")
    for t in tri:
        blocks.append(f"{eid} {t[0] + 1} {t[1] + 1} {t[2] + 1}")
        eid += 1
        n_elem += 1
    n_blocks = len(subs[2]) + len(subs[1]) + 1
    lines += [
        "$Elements",
        f"{n_blocks} {n_elem} 1 {n_elem}",
        *blocks,
        "$EndElements",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


@pytest.fixture()
def msh_file(tmp_path):
    subs = simplex.triangle_grid_fractured_2d(DOM, FRAC_PTS, FRAC_EDGES, 0.2)
    return _write_msh41(str(tmp_path / "net.msh"), subs), subs


def test_msh_parse(msh_file):
    path, subs = msh_file
    parsed = parse_msh(path)
    assert parsed["nodes"].shape[1] == subs[0][0].num_nodes
    names = set(parsed["physical"].values())
    assert "DOMAIN" in names and "FRACTURE_0" in names


def test_msh_reader_builds_working_mdg(msh_file):
    path, subs = msh_file
    grids = create_grids_from_msh(path)
    g2 = grids[0][0]
    assert g2.num_cells == subs[0][0].num_cells
    assert len(grids[1]) == 2 and len(grids[2]) == 1
    assert np.isclose(g2.cell_volumes.sum(), 1.0)
    mdg = meshing.subdomains_to_mdg(grids)
    assert len(mdg.subdomains(dim=1)) == 2
    assert len(list(mdg.interfaces())) >= 4
    mdg.compute_geometry()


def _write_msh41_3d(path, g3, frac_tris):
    """Minimal 3d MSH 4.1 fixture: tets (DOMAIN) + fracture triangles."""
    p = g3.nodes
    cn = g3.cell_nodes()
    tets = np.vstack(
        [cn.indices[cn.indptr[c] : cn.indptr[c + 1]] for c in range(g3.num_cells)]
    )
    nn = p.shape[1]
    lines = ["$MeshFormat", "4.1 0 8", "$EndMeshFormat"]
    lines += [
        "$PhysicalNames", "2", '3 1 "DOMAIN"', '2 10 "FRACTURE_0"',
        "$EndPhysicalNames",
    ]
    lines += [
        "$Entities", "0 0 1 1",
        "1 0 0 0 1 1 1 1 10 0",
        "1 0 0 0 1 1 1 1 1 0",
        "$EndEntities",
    ]
    nd = ["$Nodes", f"1 {nn} 1 {nn}", f"3 1 0 {nn}"]
    nd += [str(i + 1) for i in range(nn)]
    nd += [f"{p[0, i]} {p[1, i]} {p[2, i]}" for i in range(nn)]
    nd.append("$EndNodes")
    lines += nd
    blocks = []
    eid = 1
    blocks.append(f"2 1 2 {len(frac_tris)}")
    for t in frac_tris:
        blocks.append(f"{eid} {t[0] + 1} {t[1] + 1} {t[2] + 1}")
        eid += 1
    blocks.append(f"3 1 4 {tets.shape[0]}")
    for t in tets:
        blocks.append(
            f"{eid} {t[0] + 1} {t[1] + 1} {t[2] + 1} {t[3] + 1}"
        )
        eid += 1
    n_elem = len(frac_tris) + tets.shape[0]
    lines += ["$Elements", f"2 {n_elem} 1 {n_elem}", *blocks, "$EndElements"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def test_msh_reader_3d_builds_working_mdg(tmp_path):
    g3 = pt.StructuredTetrahedralGrid([4, 4, 4], [1.0, 1.0, 1.0])
    g3.compute_geometry()
    fn = g3.face_nodes.tocsc()
    fc = g3.face_centers
    on_plane = (
        np.isclose(fc[0], 0.5)
        & (fc[1] > 0.25) & (fc[1] < 0.75)
        & (fc[2] > 0.25) & (fc[2] < 0.75)
    )
    tris = [
        fn.indices[fn.indptr[f] : fn.indptr[f + 1]]
        for f in np.flatnonzero(on_plane)
    ]
    assert len(tris) > 0
    path = _write_msh41_3d(str(tmp_path / "cube.msh"), g3, tris)

    grids = create_grids_from_msh(path)
    assert len(grids) == 4
    g3_read = grids[0][0]
    assert g3_read.num_cells == g3.num_cells
    assert len(grids[1]) == 1  # one fracture surface
    g2 = grids[1][0]
    assert g2.num_cells == len(tris)
    assert np.isclose(g3_read.cell_volumes.sum(), 1.0)
    mdg = meshing.subdomains_to_mdg(grids)
    assert mdg.dim_max() == 3
    assert len(list(mdg.interfaces())) == 1
    mdg.compute_geometry()
    # The fractured cube solves an md flow problem.
    class M(pt.SinglePhaseFlow):
        def set_geometry(self):
            self.mdg = mdg
            self.nd = 3
            self._domain = pt.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                 "zmin": 0, "zmax": 1}
            )
            self.well_network = None

        def set_well_network(self):
            self.well_network = None

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[0]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0, porosity=0.1,
                residual_aperture=1e-2, normal_permeability=1.0,
            )
        },
    }
    m = M(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    assert np.all(np.isfinite(p)) and p.min() > -1e-8 and p.max() < 1 + 1e-8
