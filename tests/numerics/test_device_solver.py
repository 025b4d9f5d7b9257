"""Device-resident assembly + preconditioned Krylov solve of real models.

The full Newton linear algebra (Jacobian data, residual, solve) stays on
device (``EquationSystem.assemble_device`` + ``DeviceLinearSolver``); these
tests assert the solutions match the host scipy direct path and that no
host-fallback triggers (counterpart of the reference's solver-backend tests
around ``models/solution_strategy.py:830``)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.numerics.linalg.krylov import FALLBACK_COUNTER

SOLID = dict(
    permeability=1.0, porosity=0.1, residual_aperture=0.01, normal_permeability=1.0
)


def _md_flow(solver):
    class MD(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [
                pt.LineFracture(np.array([[0.25, 0.75], [0.5, 0.5]])),
                pt.LineFracture(np.array([[0.5, 0.5], [0.25, 0.75]])),
            ]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1 / 16},
        "material_constants": {
            "solid": pt.SolidConstants(**SOLID),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1.0, density=1.0
            ),
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": solver,
    }
    m = MD(params)
    pt.run_time_dependent_model(m, params)
    return m


def _poromech(solver, blocks=False):
    class M(pt.Poromechanics):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[1, north] = -0.001
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return np.zeros(bg.num_cells)

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

        if blocks:

            def linear_solver_blocks(self):
                # Fixed-stress style field split: mechanics first, then flow
                # with the alpha^2/K_dr-stabilized pressure block.
                sds = self.mdg.subdomains(dim=self.nd)
                nc = sum(sd.num_cells for sd in sds)
                alpha = self.solid.biot_coefficient
                k_dr = self.solid.lame_lambda + 2 * self.solid.shear_modulus / self.nd
                vols = np.concatenate([sd.cell_volumes for sd in sds])
                stab = alpha**2 / k_dr * vols
                assert stab.size == nc
                return {
                    "blocks": [
                        (["momentum_balance_equation"], ["u"]),
                        (["mass_balance_equation"], ["pressure"]),
                    ],
                    "stabilization": {1: stab},
                }

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1 / 8},
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0,
                lame_lambda=1.0,
                permeability=1e-2,
                porosity=0.1,
                biot_coefficient=0.8,
                specific_storage=0.1,
            ),
            "fluid": pt.FluidComponent(
                viscosity=1.0, density=1.0, compressibility=1e-2
            ),
        },
        "time_manager": pt.TimeManager([0, 0.5], 0.25, constant_dt=True),
        "linear_solver": solver,
    }
    m = M(params)
    pt.run_time_dependent_model(m, params)
    return m


def test_device_gmres_md_flow_matches_host():
    ref = _md_flow("scipy_sparse").equation_system.get_variable_values(
        time_step_index=0
    )
    before = FALLBACK_COUNTER["count"]
    dev = _md_flow("device_gmres").equation_system.get_variable_values(
        time_step_index=0
    )
    assert FALLBACK_COUNTER["count"] == before, "device solve fell back to host"
    assert np.linalg.norm(dev - ref) / np.linalg.norm(ref) < 1e-10


def test_device_gmres_poromechanics_matches_host():
    ref = _poromech("scipy_sparse").equation_system.get_variable_values(
        time_step_index=0
    )
    before = FALLBACK_COUNTER["count"]
    dev = _poromech("device_gmres").equation_system.get_variable_values(
        time_step_index=0
    )
    assert FALLBACK_COUNTER["count"] == before
    assert np.linalg.norm(dev - ref) / np.linalg.norm(ref) < 1e-9


def test_device_block_preconditioner_poromechanics():
    """Fixed-stress field-split block preconditioner path (block lower
    Gauss-Seidel + Chebyshev inner) gives the same solution."""
    ref = _poromech("scipy_sparse").equation_system.get_variable_values(
        time_step_index=0
    )
    before = FALLBACK_COUNTER["count"]
    dev = _poromech("device_gmres", blocks=True).equation_system.get_variable_values(
        time_step_index=0
    )
    assert FALLBACK_COUNTER["count"] == before
    assert np.linalg.norm(dev - ref) / np.linalg.norm(ref) < 1e-9


def test_device_dense_preconditioner_md_flow():
    """Dense frozen preconditioner (blocked Gauss-Jordan inverse on device,
    one GEMV per Krylov apply — the MXU-native small-system path used on
    TPU below the HBM threshold) reproduces the host direct solution."""
    ref = _md_flow("scipy_sparse").equation_system.get_variable_values(
        time_step_index=0
    )
    before = FALLBACK_COUNTER["count"]
    m = _md_flow_dense()
    dev = m.equation_system.get_variable_values(time_step_index=0)
    assert FALLBACK_COUNTER["count"] == before, "device solve fell back to host"
    solver = next(iter(m._device_solvers.values()))
    assert solver._dense, "dense preconditioner was demoted"
    assert np.linalg.norm(dev - ref) / np.linalg.norm(ref) < 1e-10


def _md_flow_dense():
    class MD(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [
                pt.LineFracture(np.array([[0.25, 0.75], [0.5, 0.5]])),
                pt.LineFracture(np.array([[0.5, 0.5], [0.25, 0.75]])),
            ]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1 / 16},
        "material_constants": {
            "solid": pt.SolidConstants(**SOLID),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1.0, density=1.0
            ),
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "dense_precond": True,
    }
    m = MD(params)
    pt.run_time_dependent_model(m, params)
    return m


def test_assemble_device_matches_host_assembly():
    """Device BCOO data/indices reproduce the host scipy assembly exactly."""
    import scipy.sparse as sps

    m = _md_flow("scipy_sparse")
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    A, b = m.equation_system.assemble()
    data, b_dev, cs = m.equation_system.assemble_device()
    A_dev = sps.csr_matrix(
        (np.asarray(data), (cs.indices_np[:, 0], cs.indices_np[:, 1])),
        shape=cs.shape,
    )
    assert np.allclose(b_dev, b, atol=1e-14)
    assert abs(A - A_dev).max() < 1e-12


def test_dense_block_inverse_validates_on_ten_order_scaling():
    """A WELL-POSED block whose rows/columns span ~10 orders of magnitude
    (the md flow + mortar regime) must pass the equilibrated-space
    condition gate (host-side, pull-free) and yield an accurate frozen
    inverse — a raw-space criterion would reject it on scaling alone."""
    import scipy.sparse as sps
    from porepy_tpu.numerics.linalg.device_solver import _BlockPrecondBuilder

    rng = np.random.default_rng(3)
    n = 120
    # SPD core, then scaled by wildly varying diagonals (1e-5 .. 1e5).
    Q = rng.standard_normal((n, n))
    core = Q @ Q.T + n * np.eye(n)
    s = 10.0 ** rng.uniform(-5, 5, n)
    A = sps.csr_matrix(np.diag(s) @ core @ np.diag(s))

    b = _BlockPrecondBuilder(
        [(np.arange(n), np.arange(n))], ["jacobi"], None, None
    )
    b.dense_limit = 1024
    minv = np.asarray(b._build_dense_block(A))[:n, :n]
    # The validation contract is equilibrated-space accuracy: for any unit
    # residual e, the preconditioned apply solves the equilibrated system
    # to f32 level. Check with FRESH probes (different seed than the
    # builder's own validation batch).
    from porepy_tpu.numerics.linalg.device_solver import _ruiz_scaling

    dr, dc = _ruiz_scaling(A)
    S_eq = np.diag(dr) @ A.toarray() @ np.diag(dc)
    inv_eq = np.diag(1.0 / dc) @ minv @ np.diag(1.0 / dr)
    for seed in (11, 12, 13):
        e = np.random.default_rng(seed).standard_normal(n)
        e /= np.linalg.norm(e)
        assert np.linalg.norm(S_eq @ (inv_eq @ e) - e) < 0.05


def test_dense_block_inverse_demotes_deterministically_on_singular_block():
    """A numerically singular block must fail the host-side condition
    gate (estimate = inf) and demote to its sparse method — on every
    rebuild, deterministically."""
    import scipy.sparse as sps
    from porepy_tpu.numerics.linalg.device_solver import _BlockPrecondBuilder

    n = 64
    A = sps.csr_matrix(np.outer(np.arange(1, n + 1.0), np.arange(1, n + 1.0)))

    for _ in range(3):  # deterministic across rebuilds
        b = _BlockPrecondBuilder(
            [(np.arange(n), np.arange(n))], ["jacobi"], None, None
        )
        b.dense_limit = 1024
        with pytest.raises(Exception):
            b._build_dense_block(A)
        # The full build demotes instead of raising.
        _state, _apply, _h = b.build(A)
        assert b._block_dense.get(0) is False, "block was not demoted"
