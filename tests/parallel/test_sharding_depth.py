"""Sharding depth: the dof axis provably STAYS sharded through the solve
(per-device shard shapes are 1/n of global on the matvec operands and on
the returned increment), a coupled Biot system agrees sharded vs
single-device, and the batched interaction-region solves shard their batch
axis over the mesh (SURVEY §2.11). Conftest forces 8 virtual CPU devices."""

import jax
import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.parallel.sharded import ShardedNewton, make_dof_mesh

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _md_flow_model(cell_size=1 / 16):
    class MD(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [
                pt.LineFracture(np.array([[0.25, 0.75], [0.5, 0.5]]))
            ]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1.0, density=1.0
            ),
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = MD(params)
    m.prepare_simulation()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    return m


@needs8
def test_dof_axis_stays_sharded_through_solve():
    """The increment returned by the sharded solve must itself be sharded
    1/n per device — proof that the constraint chain (ELL values, Krylov
    iterates, preconditioner output) kept the dof axis partitioned instead
    of all-gathering somewhere inside the program."""
    m = _md_flow_model()
    mesh = make_dof_mesh(8)
    sn = ShardedNewton(m, mesh)

    data, b = sn.assemble()
    b = sn._shard(b)
    n = int(b.shape[0])
    assert n % 8 == 0, "test grid must give a divisible dof count"
    # Input residual: 8 shards of n/8 each.
    shard_rows = sorted(
        s.data.shape[0] for s in b.addressable_shards
    )
    assert shard_rows == [n // 8] * 8, shard_rows

    dx, res = sn.solver.solve_device(data, b)
    assert np.isfinite(float(res))
    # Output increment: still 8 shards of n/8 (no terminal all-gather).
    out_rows = sorted(s.data.shape[0] for s in dx.addressable_shards)
    assert out_rows == [n // 8] * 8, out_rows
    # And the shards live on distinct devices.
    assert len({s.device for s in dx.addressable_shards}) == 8


@needs8
def test_sharded_biot_agreement():
    """Coupled poromechanics (displacement + pressure field split incl.
    fixed-stress stabilization) solved over an 8-device mesh agrees with
    the single-device solve."""

    class M(pt.Poromechanics):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[1, north] = -0.001
            return vals.ravel("F")

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

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
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = M(params)
    m.prepare_simulation()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()

    sn = ShardedNewton(m, make_dof_mesh(8))
    dx_sharded, res = sn.solve_once()
    assert np.isfinite(res)

    data, b, cs = m.equation_system.assemble_device()
    import scipy.sparse as sps

    A = sps.csr_matrix(
        (np.asarray(data), (cs.indices_np[:, 0], cs.indices_np[:, 1])),
        shape=cs.shape,
    )
    dx_direct = sps.linalg.spsolve(A, np.asarray(b))
    scale = max(np.abs(dx_direct).max(), 1e-300)
    assert np.abs(dx_sharded - dx_direct).max() / scale < 1e-8


@needs8
def test_local_solves_batch_sharded_over_mesh():
    """The batched interaction-region kernel shards its batch axis over the
    mesh and reproduces the host LAPACK result, including non-divisible
    batch sizes (identity padding)."""
    from porepy_tpu.numerics.fv import local_solves

    rng = np.random.default_rng(12)
    B, n, m, k = 21, 7, 7, 4  # B=21 not divisible by 8 -> padding path
    a = rng.normal(size=(B, n, n)) + 5 * np.eye(n)
    rhs = rng.normal(size=(B, n, m))
    w = rng.normal(size=(B, k, n))
    want = local_solves._solve_chunk_host(a, rhs, w)

    mesh = make_dof_mesh(8)
    local_solves.set_batch_mesh(mesh)
    try:
        got = local_solves._solve_chunk_device(a, rhs, w)
    finally:
        local_solves.set_batch_mesh(None)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    # Shard-shape check on the placed operands.
    local_solves.set_batch_mesh(mesh)
    try:
        a_s, rhs_s, w_s, pad = local_solves._shard_batch(a, rhs, w)
    finally:
        local_solves.set_batch_mesh(None)
    assert pad == 3  # 21 -> 24
    rows = sorted(s.data.shape[0] for s in a_s.addressable_shards)
    assert rows == [3] * 8, rows
