"""Fracture damage mechanics: slip history accumulation and damage-scaled
friction/dilation (reference ``models/fracture_damage.py`` and
``examples/fracture_damage.py``)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs import meshing
from porepy_tpu.models import fracture_damage as damage


class _ShearBase(pt.MomentumBalance):
    """Horizontal fracture; compressed and sheared progressively from the
    north boundary so the fracture slips every step."""

    def __init__(self, params):
        self._injected_mdg = meshing.cart_grid(
            [np.array([[0.25, 0.75], [0.5, 0.5]])],
            np.array([4, 4]),
            physdims=[1.0, 1.0],
        )
        super().__init__(params)

    def set_geometry(self):
        from porepy_tpu.utils.tangential_normal_projection import (
            set_local_coordinate_projections,
        )

        self.mdg = self._injected_mdg
        self.nd = 2
        self._domain = pt.Domain({"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1})
        set_local_coordinate_projections(self.mdg)
        self.set_well_network()

    def set_well_network(self):
        self.well_network = None

    def bc_type_mechanics(self, sd):
        sides = self.domain_boundary_sides(sd)
        bc = pt.BoundaryConditionVectorial(
            sd, sides.north | sides.south, "dir"
        )
        bc.internal_to_dirichlet(sd)
        return bc

    def bc_values_displacement(self, bg):
        sides = self.domain_boundary_sides(bg)
        vals = np.zeros((self.nd, bg.num_cells))
        t = self.time_manager.time
        vals[0, sides.north] = 0.05 * t
        vals[1, sides.north] = -0.01
        return vals.ravel("F")

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass


class _IsoDamage(
    pt.constitutive_laws.FrictionDamage,
    pt.constitutive_laws.DilationDamage,
    damage.DamageHistoryVariable,
    damage.IsotropicHistoryEquation,
    _ShearBase,
):
    pass


class _AnisoDamage(
    pt.constitutive_laws.FrictionDamage,
    pt.constitutive_laws.DilationDamage,
    damage.DamageHistoryVariable,
    damage.AnisotropicHistoryEquation,
    _ShearBase,
):
    pass


def _params():
    return {
        "times_to_export": [],
        "time_manager": pt.TimeManager([0, 3.0], 1.0, constant_dt=True),
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0,
                lame_lambda=1.0,
                friction_coefficient=0.3,
                residual_aperture=1e-3,
                initial_friction_damage=0.5,
                friction_damage_decay=5.0,
                initial_dilation_damage=0.5,
                dilation_damage_decay=5.0,
            ),
        },
        "max_iterations": 40,
    }


@pytest.mark.parametrize("model_cls", [_IsoDamage, _AnisoDamage])
def test_damage_history_accumulates(model_cls):
    params = _params()
    m = model_cls(params)
    pt.run_time_dependent_model(m, params)
    es = m.equation_system
    h = es.get_variable_values(["damage_history"], time_step_index=0)
    # Shearing slipped the fracture: damage history is positive and equals
    # the accumulated tangential slip magnitude.
    assert np.all(h >= 0)
    assert h.max() > 1e-4
    fracture = m.mdg.subdomains(dim=1)
    fd = np.asarray(es.evaluate(m.friction_damage(fracture)))
    dd = np.asarray(es.evaluate(m.dilation_damage(fracture)))
    # Damage factors moved from the intact value 1 toward the fully
    # damaged value 0.5.
    assert np.all(fd < 1.0) and np.all(fd > 0.5)
    assert np.all(dd < 1.0) and np.all(dd > 0.5)
    # The history equals the integrated slip: sum of tangential jump
    # increments over the stored (deep) time-step history.
    u_t = m.tangential_component(fracture) @ m.plastic_displacement_jump(
        fracture
    )
    n_steps = 3
    # Pairwise increments over: current, 1 back, 2 back, 3 back. After the
    # final shift, time-step index 0 holds the just-converged state, so
    # k steps back reads previous_timestep(k + 1).
    states = [np.asarray(es.evaluate(u_t))] + [
        np.asarray(es.evaluate(u_t.previous_timestep(i + 1)))
        for i in range(1, n_steps + 1)
    ]
    expected = np.zeros(h.size)
    for a, b in zip(states[:-1], states[1:]):
        expected += np.abs(a - b)
    assert np.allclose(h, expected, atol=1e-8)
