"""Fracture contact mechanics: field parity with the reference MomentumBalance
(contact-enabled) across sticking, sliding and open fracture states."""

import numpy as np
import pytest

import porepy_tpu as pt


# North-boundary displacement (shear, compression) driving each contact state.
CASES = [
    ("stick", (0.01, -0.005)),
    ("slide", (0.05, -0.002)),
    ("open", (0.0, 0.004)),
]


def _make(mod, base, frac_wrap, shear, normal):
    class Contact(base):
        def set_fractures(self):
            self._fractures = [frac_wrap(np.array([[0.25, 0.75], [0.5, 0.5]]))]

        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[0, north] = shear
            vals[1, north] = normal
            return vals.ravel("F")

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
    }
    return Contact(params), params


@pytest.mark.parametrize("name,bc", CASES, ids=[c[0] for c in CASES])
def test_contact_state_parity(golden, name, bc):
    m, params = _make(pt, pt.MomentumBalance, lambda a: a, *bc)
    pt.run_time_dependent_model(m, params)

    def compute(ref_pp):
        r, params_r = _make(
            ref_pp, ref_pp.MomentumBalance, ref_pp.LineFracture, *bc
        )
        ref_pp.run_time_dependent_model(r, params_r)
        return {
            var: r.equation_system.get_variable_values([var], iterate_index=0)
            for var in ["u", "u_interface", "contact_traction"]
        }

    ref_vals = golden(compute)
    for var in ["u", "u_interface", "contact_traction"]:
        v_o = m.equation_system.get_variable_values([var], iterate_index=0)
        v_r = np.asarray(ref_vals[var])
        assert v_o.size == v_r.size
        assert np.abs(v_o - v_r).max() < 1e-12, (var, np.abs(v_o - v_r).max())

    # The slide case must actually slide: tangential traction at the friction
    # bound; the open case must release the traction entirely.
    t = m.equation_system.get_variable_values(["contact_traction"], iterate_index=0)
    t = t.reshape(-1, 2)
    if name == "slide":
        assert np.abs(t[0, 0]) > 1e-5
    if name == "open":
        assert np.abs(t).max() < 1e-12


def test_unfractured_momentum_balance_still_runs():
    """The contact-enabled composition must degrade gracefully on
    unfractured domains (no fracture variables or equations)."""

    class NoFrac(pt.MomentumBalance):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[1, north] = -0.01
            return vals.ravel("F")

    params = {"grid_type": "cartesian", "meshing_arguments": {"cell_size": 0.25}}
    m = NoFrac(params)
    pt.run_time_dependent_model(m, params)
    u = m.equation_system.get_variable_values(["u"], iterate_index=0)
    assert np.linalg.norm(u) > 1e-4


def test_standalone_contact_mechanics_model():
    """The standalone ContactMechanics model (interface displacement as a
    prescribed parameter, reference ``models/contact_mechanics.py:577``)
    runs and produces a contact state."""
    import porepy_tpu as pt

    class CM(pt.ContactMechanics):
        def set_fractures(self):
            self._fractures = [
                pt.LineFracture(np.array([[0.2, 0.8], [0.5, 0.5]]))
            ]

        def meshing_arguments(self):
            return {"cell_size": 0.25}

        def interface_displacement_parameter_values(self, intf):
            vals = np.zeros((self.nd, intf.num_cells))
            vals[1] = -1e-3
            return vals

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    m = CM({})
    pt.run_time_dependent_model(m, {})
    t = m.equation_system.get_variable_values(
        ["contact_traction"], iterate_index=0
    )
    assert np.all(np.isfinite(t))
    assert np.abs(t).max() > 0
