"""Standalone UpwindCoupling matrices and their AD wrapper (reference
``numerics/fv/upwind.py:377``, ``ad/discretizations.py:226``)."""

import numpy as np

import porepy_tpu as pt
from porepy_tpu.fracs import meshing
from porepy_tpu.numerics.fv.upwind import UpwindCoupling
from porepy_tpu.params.data import initialize_data
from porepy_tpu.utils import common_constants as cc


def _setup():
    mdg = meshing.cart_grid(
        [np.array([[0.25, 0.75], [0.5, 0.5]])], np.array([4, 4]),
        physdims=[1.0, 1.0],
    )
    intf = list(mdg.interfaces())[0]
    sd_h, sd_l = mdg.interface_to_subdomain_pair(intf)
    d_i = mdg.interface_data(intf)
    lam = np.array([1.0, -1.0, 1.0, -1.0])
    initialize_data(d_i, "transport", {"darcy_flux": lam})
    uc = UpwindCoupling("transport")
    uc.discretize(
        sd_h, sd_l, intf, mdg.subdomain_data(sd_h),
        mdg.subdomain_data(sd_l), d_i,
    )
    return mdg, intf, sd_h, sd_l, lam


def test_upwind_coupling_matrices():
    mdg, intf, sd_h, sd_l, lam = _setup()
    mats = mdg.interface_data(intf)[cc.DISCRETIZATION_MATRICES]["transport"]
    assert np.allclose(mats["upwind_primary"].diagonal(), lam > 0)
    assert np.allclose(mats["upwind_secondary"].diagonal(), lam <= 0)
    assert np.allclose(mats["flux"].diagonal(), np.sign(lam))
    assert mats["mortar_discr"].shape == (intf.num_cells, intf.num_cells)
    # Trace pair: |div|^T maps cells to their faces with unit weights.
    assert np.allclose(
        (mats["inv_trace"] @ np.ones(sd_h.num_faces)),
        np.asarray(abs(sd_h.cell_faces).sum(axis=0)).ravel(),
    )


def test_upwind_coupling_ad_wrapper():
    mdg, intf, sd_h, sd_l, lam = _setup()
    from porepy_tpu.numerics import ad

    discr = ad.UpwindCouplingAd("transport", [intf], mdg)
    up = discr.upwind_primary().fetch()
    assert np.allclose(up.diagonal(), lam > 0)
    assert discr.mortar_discr().fetch().shape == (
        intf.num_cells, intf.num_cells,
    )
