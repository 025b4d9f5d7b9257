"""Value-only refresh of compiled constant matrices: rediscretization in a
Newton loop must not retrace every equation (VERDICT r2 framework-overhead
item), and must produce bit-identical physics vs the clear-and-retrace
path."""

import numpy as np

import porepy_tpu as pt
from porepy_tpu.numerics.ad.equation_system import EquationSystem


def _model():
    class M(pt.Poromechanics):
        def set_fractures(self):
            self._fractures = [
                pt.LineFracture(np.array([[0.25, 0.75], [0.5, 0.5]]))
            ]

        def meshing_arguments(self):
            return {"cell_size": 1.0 / 8}

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0,
                lame_lambda=1.0,
                permeability=1e-2,
                porosity=0.1,
                biot_coefficient=0.8,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
        },
        "time_manager": pt.TimeManager([0, 2.0], 1.0, constant_dt=True),
    }
    return M(params), params


def _run(counter, force_clear):
    import porepy_tpu.numerics.ad.equation_system as eqsys_mod

    m, params = _model()
    orig_init = eqsys_mod._CompiledEquation.__init__

    def spy(self, *a, **k):
        counter.append(1)
        return orig_init(self, *a, **k)

    eqsys_mod._CompiledEquation.__init__ = spy
    if force_clear:
        orig_refresh = EquationSystem.refresh_compiled_constants
        EquationSystem.refresh_compiled_constants = (
            EquationSystem.clear_compiled
        )
    try:
        pt.run_time_dependent_model(m, params)
    finally:
        eqsys_mod._CompiledEquation.__init__ = orig_init
        if force_clear:
            EquationSystem.refresh_compiled_constants = orig_refresh
    return m.equation_system.get_variable_values(iterate_index=0)


def test_refresh_matches_clear_and_avoids_retraces():
    n_refresh, n_clear = [], []
    x_refresh = _run(n_refresh, force_clear=False)
    x_clear = _run(n_clear, force_clear=True)
    # Identical physics...
    assert np.allclose(x_refresh, x_clear, rtol=1e-9, atol=1e-12)
    # ...at a fraction of the retraces (clear retraces every equation at
    # every nonlinear iteration; refresh only compiles once per equation).
    assert sum(n_refresh) < sum(n_clear), (sum(n_refresh), sum(n_clear))
