"""Differentiable-permeability Darcy flux (DarcysLawAd): agreement with the
stored-matrix law for constant permeability, exact Jacobians for
solution-dependent permeability (vs finite differences), and cubic-law
fracture permeability in an md model."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.numerics import ad


class _BaseFlow(pt.SinglePhaseFlow):
    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass

    def bc_values_pressure(self, bg):
        return 1.0 - bg.cell_centers[0]

    def darcy_flux_discretization(self, subdomains):
        from porepy_tpu.numerics.ad.discretizations import TpfaAd

        return TpfaAd(self.darcy_keyword, subdomains, self.mdg)


class _AdFlow(pt.DarcysLawAd, _BaseFlow):
    pass


def _params(extra=None):
    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "solid": pt.SolidConstants(permeability=2.0, porosity=0.1),
        },
    }
    params.update(extra or {})
    return params


def test_matches_stored_matrix_law_constant_permeability():
    """With constant permeability the in-kernel TPFA flux must equal the
    stored-matrix flux exactly."""
    params = _params()
    m_ref = _BaseFlow(params)
    m_ref.prepare_simulation()
    m_ad = _AdFlow(_params())
    m_ad.prepare_simulation()

    rng = np.random.default_rng(3)
    x = rng.random(m_ref.equation_system.num_dofs())
    for m in (m_ref, m_ad):
        m.equation_system.set_variable_values(x, iterate_index=0)

    sds = m_ref.mdg.subdomains()
    q_ref = m_ref.equation_system.evaluate(m_ref.darcy_flux(sds))
    q_ad = m_ad.equation_system.evaluate(
        m_ad.darcy_flux(m_ad.mdg.subdomains())
    )
    assert np.allclose(q_ad, q_ref, atol=1e-12)

    # Jacobians agree too.
    J_ref = m_ref.darcy_flux(sds).value_and_jacobian(
        m_ref.equation_system
    ).jac.toarray()
    J_ad = m_ad.darcy_flux(m_ad.mdg.subdomains()).value_and_jacobian(
        m_ad.equation_system
    ).jac.toarray()
    assert np.allclose(J_ad, J_ref, atol=1e-12)


class _PressureDependentPerm:
    """k(p) = k0 * (1 + 0.3 p), mixed in above the Ad law."""

    def permeability(self, subdomains):
        size = sum(sd.num_cells for sd in subdomains)
        k0 = ad.wrap_as_dense_ad_array(self.solid.permeability, size)
        k = k0 * (ad.Scalar(1.0) + ad.Scalar(0.3) * self.pressure(subdomains))
        return self.isotropic_second_order_tensor(subdomains, k)


class _NonlinearFlow(_PressureDependentPerm, _AdFlow):
    pass


def test_jacobian_includes_permeability_derivative():
    """Finite-difference check of d(flux)/dp including the k(p) term."""
    m = _NonlinearFlow(_params())
    m.prepare_simulation()
    eq = m.equation_system
    sds = m.mdg.subdomains()
    rng = np.random.default_rng(11)
    x0 = 0.5 + 0.1 * rng.random(eq.num_dofs())
    eq.set_variable_values(x0, iterate_index=0)

    flux_op = m.darcy_flux(sds)
    res = flux_op.value_and_jacobian(eq)
    J = res.jac.toarray()

    eps = 1e-6
    for dof in rng.choice(eq.num_dofs(), size=5, replace=False):
        xp = x0.copy()
        xp[dof] += eps
        xm = x0.copy()
        xm[dof] -= eps
        qp = np.asarray(eq.evaluate(flux_op, state=xp))
        qm = np.asarray(eq.evaluate(flux_op, state=xm))
        fd = (qp - qm) / (2 * eps)
        assert np.allclose(J[:, dof], fd, atol=1e-6), dof


class _CubicLawMd(
    pt.DarcysLawAd,
    pt.constitutive_laws.CubicLawPermeability,
    _BaseFlow,
):
    def set_fractures(self):
        self._fractures = [pt.LineFracture(np.array([[0.25, 0.75], [0.5, 0.5]]))]


def test_cubic_law_md_model_runs():
    params = _params(
        {
            "material_constants": {
                "solid": pt.SolidConstants(
                    permeability=1.0,
                    porosity=0.1,
                    residual_aperture=1e-3,
                    normal_permeability=1.0,
                ),
            },
        }
    )
    m = _CubicLawMd(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    assert p.min() > -1e-8 and p.max() < 1.0 + 1e-8
    # Fracture permeability follows the cubic law a^2/12.
    sd_f = m.mdg.subdomains(dim=1)[0]
    kf = m.equation_system.evaluate(
        m.cubic_law_permeability([sd_f])
    )
    a = m.equation_system.evaluate(m.aperture([sd_f]))
    assert np.allclose(np.asarray(kf).reshape(-1, 9)[:, 0], a**2 / 12)
