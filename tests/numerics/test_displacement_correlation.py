"""Standalone displacement-correlation SIF module (reference
``numerics/displacement_correlation.py``): formula consistency, agreement
with the propagation mixin's embedded estimator, onset logic, host-face
selection, and a Griffith-crack analytic anchor."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs import meshing
from porepy_tpu.numerics.displacement_correlation import (
    determine_onset,
    estimate_rm,
    faces_to_open,
    sif_from_delta_u,
    tip_sifs,
)


def test_sif_from_delta_u_inverts_near_tip_field():
    """The DC formula must invert the analytic near-tip opening: a jump
    d_u_n = (kappa+1)/mu * K sqrt(rm/(2 pi)) maps back to exactly K, for
    every mode and any rm."""
    mu, kappa = 1.7, 2.2
    rm = np.array([0.05, 0.1, 0.2])
    K = np.array([3.0, 5.0, 7.0])
    d_u = np.zeros((3, 3))
    d_u[1] = (kappa + 1.0) / mu * K * np.sqrt(rm / (2.0 * np.pi))  # mode I
    d_u[0] = (kappa + 1.0) / mu * K * np.sqrt(rm / (2.0 * np.pi))  # mode II
    d_u[2] = 4.0 / mu * K * np.sqrt(rm / (2.0 * np.pi))  # mode III
    sifs = sif_from_delta_u(d_u, rm, mu, kappa)
    np.testing.assert_allclose(sifs, np.vstack([K, K, K]), rtol=1e-12)


def test_determine_onset():
    sifs = np.array([[1.0, 3.0, 0.5], [0.0, 0.0, 2.0]])
    onset = determine_onset(sifs, np.array([2.0, 1.5]))
    np.testing.assert_array_equal(onset, [False, True, True])


class _Tension(pt.MomentumBalance):
    """Fracture pulled open by vertical displacement of the north side."""

    def __init__(self, params, mdg):
        self._mdg_pre = mdg
        super().__init__(params)

    def set_geometry(self):
        self.mdg = self._mdg_pre
        self.nd = 2
        self._domain = pt.Domain(
            {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1}
        )
        pt.set_local_coordinate_projections(self.mdg)
        self.set_well_network()

    def bc_values_displacement(self, bg):
        vals = np.zeros((self.nd, bg.num_cells))
        vals[1, self.domain_boundary_sides(bg).north] = 0.01
        return vals.ravel("F")

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass


@pytest.fixture(scope="module")
def solved():
    mdg = meshing.cart_grid(
        [np.array([[0.3, 0.7], [0.5, 0.5]])],
        np.array([10, 10]),
        physdims=[1.0, 1.0],
    )
    params = {
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0, lame_lambda=1.0, residual_aperture=1e-3
            ),
        },
    }
    m = _Tension(params, mdg)
    pt.run_time_dependent_model(m, params)
    return m


def test_tip_sifs_match_model_mixin(solved):
    """The standalone estimator and the propagation mixin's embedded one
    read the same mortar jump — their mode-I SIFs must agree exactly."""
    m = solved
    mu = float(m.solid.shear_modulus)
    lam = float(m.solid.lame_lambda)
    kappa = 3.0 - 4.0 * lam / (2.0 * (lam + mu))
    out = tip_sifs(m.mdg, None, mu=mu, kappa=kappa)
    sd_l = m.mdg.subdomains(dim=1)[0]
    sifs, tip_faces = out[sd_l]
    assert tip_faces.size == 2
    assert np.all(sifs[0] > 0), "opening must give positive K_I"

    from porepy_tpu.numerics.fracture_deformation.conforming_propagation import (
        ConformingFracturePropagation,
    )

    class _Mix(ConformingFracturePropagation, type(m)):
        pass

    mix = _Mix.__new__(_Mix)
    mix.__dict__.update(m.__dict__)
    intf = list(m.mdg.interfaces())[0]
    sifs_mix, tips_mix, _bases = mix._displacement_correlation(sd_l, intf)
    np.testing.assert_array_equal(tip_faces, tips_mix)
    np.testing.assert_allclose(sifs[0], sifs_mix[0], rtol=1e-12)


def test_griffith_anchor(solved):
    """Analytic anchor: for a center crack of half-length a under remote
    tension sigma, K_I = sigma sqrt(pi a). The north-boundary displacement
    delta imposes approximately uniaxial-strain tension sigma =
    (lambda + 2 mu) * delta / H away from the crack; on this coarse grid
    the DC estimate must land within 40% of the analytic value (DC
    converges from below as the tip is refined; finite-domain effects
    raise the true value)."""
    m = solved
    mu, lam = 1.0, 1.0
    kappa = 3.0 - 4.0 * lam / (2.0 * (lam + mu))
    sd_l = m.mdg.subdomains(dim=1)[0]
    sifs, _tips = tip_sifs(m.mdg, None, mu=mu, kappa=kappa)[sd_l]
    a = 0.2
    sigma = (lam + 2.0 * mu) * 0.01 / 1.0
    K_analytic = sigma * np.sqrt(np.pi * a)
    for K in sifs[0]:
        assert 0.6 * K_analytic < K < 1.4 * K_analytic, (K, K_analytic)


def test_faces_to_open_selects_tip_continuations(solved):
    """With a low critical SIF both tips propagate; the selected host
    faces must be vertical-normal faces horizontally adjacent to the
    fracture tips (straight mode-I growth)."""
    m = solved
    faces, sifs = faces_to_open(
        m.mdg, None, critical_sifs=np.array([1e-8, 1e-8]), mu=1.0, kappa=2.0
    )
    sd_l = m.mdg.subdomains(dim=1)[0]
    sd_h = m.mdg.subdomains(dim=2)[0]
    got = faces[sd_l]
    assert got.size == 2
    fc = sd_h.face_centers[:, got]
    # Straight continuation: the chosen faces sit on the fracture line.
    assert np.allclose(fc[1], 0.5, atol=1e-12)
    assert np.all((fc[0] < 0.3) | (fc[0] > 0.7))

    # And with an impossibly high threshold nothing opens.
    faces_hi, _ = faces_to_open(
        m.mdg, None, critical_sifs=np.array([1e9, 1e9]), mu=1.0, kappa=2.0
    )
    assert faces_hi[sd_l].size == 0


def test_estimate_rm(solved):
    sd_l = solved.mdg.subdomains(dim=1)[0]
    rm = estimate_rm(sd_l)
    assert rm.shape == (2,)
    np.testing.assert_allclose(rm, 0.05, rtol=1e-10)  # h/2 on a 10x10 grid
