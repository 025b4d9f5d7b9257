"""Exporter: vtu/pvd writing and restart round-trip without meshio."""

import glob
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.viz.exporter import Exporter


@pytest.mark.parametrize("binary", [True, False])
def test_single_grid_export(tmp_path, binary):
    g = pt.CartGrid([3, 2], physdims=[1, 1])
    g.compute_geometry()
    e = Exporter(g, "g2", folder_name=str(tmp_path), binary=binary)
    e.write_vtu([("p", np.arange(g.num_cells, dtype=float))])
    path = tmp_path / "g2_2_000000.vtu"
    assert path.exists()
    tree = ET.parse(path)
    piece = tree.getroot().find(".//Piece")
    assert int(piece.get("NumberOfCells")) == g.num_cells
    names = {d.get("Name") for d in tree.getroot().find(".//CellData")}
    assert {"p", "grid_dim", "cell_id", "subdomain_id"} <= names


def test_3d_polyhedral_export(tmp_path):
    g = pt.CartGrid([2, 2, 2], physdims=[1, 1, 1])
    g.compute_geometry()
    Exporter(g, "g3", folder_name=str(tmp_path)).write_vtu()
    tree = ET.parse(tmp_path / "g3_3_000000.vtu")
    cells = tree.getroot().find(".//Cells")
    assert any(d.get("Name") == "faces" for d in cells)
    assert any(d.get("Name") == "faceoffsets" for d in cells)


def test_md_export_and_restart_roundtrip(tmp_path):
    class Model(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [np.array([[0.25, 0.75], [0.5, 0.5]])]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "folder_name": str(tmp_path),
        "file_name": "sol",
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            )
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)

    files = sorted(os.path.basename(f) for f in glob.glob(str(tmp_path / "*")))
    # One vtu per dimension per step + mortar files + step pvd indexes.
    assert "sol_2_000001.vtu" in files
    assert "sol_1_000001.vtu" in files
    assert "sol_mortar_1_000001.vtu" in files
    assert "sol_000001.pvd" in files
    for f in glob.glob(str(tmp_path / "*")):
        ET.parse(f)  # all files are valid XML

    # Restart round-trip: zero out pressure, reload from the vtu files.
    p0 = m.equation_system.get_variable_values(["pressure"], iterate_index=0)
    m.equation_system.set_variable_values(
        np.zeros_like(p0), ["pressure"], iterate_index=0, time_step_index=0
    )
    m.load_data_from_pvd(str(tmp_path / "sol_000001.pvd"))
    p1 = m.equation_system.get_variable_values(["pressure"], iterate_index=0)
    assert np.abs(p0 - p1).max() == 0.0
