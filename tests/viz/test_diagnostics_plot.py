"""Tests for DiagnosticsMixin and plot_grid."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from porepy_tpu.applications.md_grids.model_geometries import (
    SquareDomainOrthogonalFractures,
)
from porepy_tpu.grids.simplex import StructuredTriangleGrid
from porepy_tpu.grids.structured import CartGrid, TensorGrid
from porepy_tpu.models.fluid_mass_balance import SinglePhaseFlow
from porepy_tpu.viz.diagnostics_mixin import DiagnosticsMixin
from porepy_tpu.viz.plot_grid import plot_grid, save_img


class _DiagnosticModel(
    DiagnosticsMixin, SquareDomainOrthogonalFractures, SinglePhaseFlow
):
    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass


@pytest.fixture(scope="module")
def model():
    m = _DiagnosticModel(
        {
            "fracture_indices": [0],
            "grid_type": "cartesian",
            "meshing_arguments": {"cell_size": 0.5},
        }
    )
    m.prepare_simulation()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    m.assemble_linear_system()
    return m


def test_run_diagnostics(model):
    data = model.run_diagnostics(default_handlers=("max", "cond"))
    eq_names = {k[0] for k in data}
    var_names = {k[1] for k in data}
    assert "mass_balance_equation" in eq_names
    assert "pressure" in var_names
    # The pressure block of the mass balance has nonzero entries and finite
    # conditioning.
    entry = data[("mass_balance_equation", "pressure")]
    assert entry["max"] > 0
    assert np.isfinite(entry["cond"]) and entry["cond"] >= 1.0
    # Block sizes tile the full Jacobian.
    mat, _ = model.linear_system
    rows = sum(
        e["block_size"][0]
        for (eq, var), e in data.items()
        if var == "pressure"
    )
    assert rows == mat.shape[0]


def test_plot_diagnostics(model):
    fig = model.plot_diagnostics(key="max")
    assert fig is not None


def test_plot_grid_dims(tmp_path):
    g1 = TensorGrid(np.linspace(0, 1, 4))
    g1.compute_geometry()
    fig = plot_grid(g1, plot=False)
    assert fig is not None

    g2 = StructuredTriangleGrid(np.array([2, 2]))
    g2.compute_geometry()
    save_img(str(tmp_path / "tri.png"), g2, cell_value=np.arange(g2.num_cells, dtype=float))
    assert (tmp_path / "tri.png").exists()

    g3 = CartGrid([2, 2, 2])
    g3.compute_geometry()
    fig = plot_grid(g3, cell_value=np.arange(g3.num_cells, dtype=float), plot=False)
    assert fig is not None


def test_plot_grid_mdg(model):
    fig = plot_grid(model.mdg, cell_value="pressure", plot=False)
    assert fig is not None
