"""Fused multi-step time block: a chunk of constant-dt time steps runs as
ONE device dispatch (lax.scan over steps, each step the fused device Newton
while_loop). Verifies:

- exact agreement (1e-10) with the per-step path on an md flow problem,
- statistics/time bookkeeping replay per committed step,
- rollback to the per-step path when equation inputs are time-dependent
  (a ramped BC), keeping results correct,
- Krylov iteration counts surfaced into ``DeviceLinearSolver.last_stats``.

Reference behavior being matched: the per-step Newton orchestration at
/root/reference/src/porepy/models/solution_strategy.py:820-887 (one host
round-trip per iteration); the block replaces it wholesale on device.
"""

import numpy as np
import pytest

import porepy_tpu as pt

FRACS = [
    np.array([[0.2, 0.8], [0.5, 0.5]]),
    np.array([[0.5, 0.5], [0.2, 0.8]]),
]


def _make_model(extra_params=None, time_bc=False):
    class Model(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [pt.LineFracture(f) for f in FRACS]

        def bc_values_pressure(self, bg):
            base = 1.0 - bg.cell_centers[1]
            if time_bc:
                base = base * (1.0 + 0.3 * self.time_manager.time)
            return base

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            self.saved_times = getattr(self, "saved_times", [])
            self.saved_times.append(round(self.time_manager.time, 12))

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 16},
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-4, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": pt.TimeManager([0, 6.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    params.update(extra_params or {})
    return Model(params), params


def _final_pressure(m):
    return np.concatenate(
        [
            m.equation_system.get_variable_values(["pressure"], time_step_index=0)
        ]
    )


def test_block_matches_per_step():
    m_ref, p_ref = _make_model()
    pt.run_time_dependent_model(m_ref, p_ref)
    m_blk, p_blk = _make_model({"fused_time_steps": 8})
    pt.run_time_dependent_model(m_blk, p_blk)

    a = _final_pressure(m_ref)
    b = _final_pressure(m_blk)
    denom = max(float(np.linalg.norm(a)), 1e-30)
    assert float(np.linalg.norm(a - b)) / denom < 1e-10

    # Per-step bookkeeping replayed: same times saved, clock at the end.
    assert m_blk.saved_times == m_ref.saved_times
    assert np.isclose(m_blk.time_manager.time, 6.0)
    assert m_blk.time_manager.time_index == m_ref.time_manager.time_index
    # The block genuinely engaged (did not silently fall back per-step).
    assert getattr(m_blk, "_ftb_blocks_committed", 0) >= 1
    assert getattr(m_ref, "_ftb_blocks_committed", 0) == 0


def test_block_surfaces_krylov_stats():
    m, p = _make_model({"fused_time_steps": 8})
    pt.run_time_dependent_model(m, p)
    stats = None
    for solver in m._device_solvers.values():
        stats = solver.last_stats
    assert stats is not None
    assert stats.get("fused") is True
    assert stats["krylov_iters"] >= 1
    assert all(k >= 0 for k in stats["krylov_iters_per_newton"])


def test_time_dependent_bc_rolls_back():
    """A BC ramp makes env inputs time-dependent: after two per-step solves
    the change detector (or the end-of-block re-validation) must reject the
    block, and results must match the pure per-step path exactly."""
    m_ref, p_ref = _make_model(time_bc=True)
    pt.run_time_dependent_model(m_ref, p_ref)
    m_blk, p_blk = _make_model({"fused_time_steps": 8}, time_bc=True)
    pt.run_time_dependent_model(m_blk, p_blk)

    a = _final_pressure(m_ref)
    b = _final_pressure(m_blk)
    denom = max(float(np.linalg.norm(a)), 1e-30)
    assert float(np.linalg.norm(a - b)) / denom < 1e-12
    # The ramped BC must have kept every step on the per-step path.
    assert getattr(m_blk, "_ftb_blocks_committed", 0) == 0


def test_partial_block_masking():
    """7 steps with chunk 4: steps 1-2 per-step, block of 4, then 1 left —
    the same compiled block executes with a smaller active count."""
    tm = {"time_manager": pt.TimeManager([0, 7.0], 1.0, constant_dt=True)}
    m_a, p_a = _make_model(tm)
    pt.run_time_dependent_model(m_a, p_a)

    tm = {"time_manager": pt.TimeManager([0, 7.0], 1.0, constant_dt=True)}
    m_b, p_b = _make_model({"fused_time_steps": 4, **tm})
    pt.run_time_dependent_model(m_b, p_b)

    a = _final_pressure(m_a)
    b = _final_pressure(m_b)
    denom = max(float(np.linalg.norm(a)), 1e-30)
    assert float(np.linalg.norm(a - b)) / denom < 1e-10
    assert np.isclose(m_b.time_manager.time, 7.0)
