"""GmshWriter3d: the native 3d .geo emitter produces a structurally
consistent gmsh script (every loop references defined lines, intersection
lines are embedded in both their host surfaces, physical groups follow the
porepy naming scheme the MSH parser expects)."""

import re

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs.fracture import PlaneFracture


def _network():
    f1 = PlaneFracture(
        np.array([[0.3, 0.7, 0.7, 0.3], [0.2, 0.2, 0.8, 0.8],
                  [0.5, 0.5, 0.5, 0.5]])
    )
    f2 = PlaneFracture(
        np.array([[0.5, 0.5, 0.5, 0.5], [0.2, 0.8, 0.8, 0.2],
                  [0.3, 0.3, 0.7, 0.7]])
    )
    dom = pt.Domain(
        {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1, "zmin": 0, "zmax": 1}
    )
    return pt.create_fracture_network([f1, f2], dom)


def test_geo_structure(tmp_path):
    net = _network()
    geo_file = net.prepare_for_gmsh(
        {"mesh_size_frac": 0.2}, str(tmp_path / "net3d")
    )
    geo = open(geo_file).read()
    line_ids = set(map(int, re.findall(r"^Line\((\d+)\)", geo, re.M)))
    # Every curve loop references only defined lines.
    for loop in re.findall(r"Curve Loop\(\d+\) = \{([^}]*)\}", geo):
        for tok in loop.split(","):
            assert abs(int(tok)) in line_ids
    # Two fracture surfaces embedded in the volume; one intersection line
    # embedded in both.
    assert len(re.findall(r"Surface\{\d+\} In Volume\{1\};", geo)) == 2
    emb = re.findall(r"Curve\{(\d+)\} In Surface\{(\d+)\};", geo)
    counts: dict = {}
    for cid, _s in emb:
        counts[cid] = counts.get(cid, 0) + 1
    assert 2 in counts.values()
    assert 'Physical Volume("DOMAIN")' in geo
    assert len(re.findall(r'Physical Surface\("FRACTURE_\d', geo)) == 2
    assert 'FRACTURE_INTERSECTION_LINE_0' in geo
    # Physical boundary surfaces for all six box sides.
    assert len(re.findall(r'DOMAIN_BOUNDARY_SURFACE_\d', geo)) == 6


def test_mesh_falls_back_to_native_mesher(tmp_path, monkeypatch):
    """Without gmsh, ``mesh()`` no longer raises: it writes the .geo file
    (for optional offline gmsh runs) AND meshes natively with the cut-tet
    mesher, returning a valid mdg."""
    monkeypatch.chdir(tmp_path)
    net = _network()
    mdg = net.mesh({"mesh_size_frac": 0.2}, file_name=str(tmp_path / "n"))
    assert (tmp_path / "n.geo").exists()  # offline-gmsh escape hatch stays
    assert mdg.dim_max() == 3
    assert len(mdg.subdomains(dim=2)) == len(net.fractures)


def test_boundary_touching_fracture_rejected(tmp_path):
    f = PlaneFracture(
        np.array([[0.0, 1.0, 1.0, 0.0], [0.2, 0.2, 0.8, 0.8],
                  [0.5, 0.5, 0.5, 0.5]])
    )
    dom = pt.Domain(
        {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1, "zmin": 0, "zmax": 1}
    )
    net = pt.create_fracture_network([f], dom)
    with pytest.raises(NotImplementedError):
        net.prepare_for_gmsh({"mesh_size_frac": 0.2}, str(tmp_path / "b"))
