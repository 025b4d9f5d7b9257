"""Device flow-kernel tests: unstructured scatter kernel vs model layer,
structured stencil kernel vs unstructured, and sharded execution on the
virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import porepy_tpu as pt
from porepy_tpu.parallel.flow_step import build_cart_flow_kernel, jitted_newton_step
from porepy_tpu.parallel.structured_flow import build_structured_flow_kernel

FLUID = dict(compressibility=1e-6, viscosity=1e-3, rho_ref=1000.0, p_ref=1e5)


def _newton_to_convergence(step, p0, tol=1e-6, max_iter=20):
    p = p0
    for _ in range(max_iter):
        p_new, rn = step(p, p0)
        p = p_new
        if float(rn) < tol:
            break
    return p


def test_unstructured_kernel_matches_model():
    kernel, _ = build_cart_flow_kernel(
        [8, 8], physdims=[1, 1], dt=1.0,
        bc_pressure=lambda fc: 1e5 + 1e4 * (1 - fc[0]), **FLUID,
    )
    p_prev = jnp.asarray(np.full(kernel.num_cells, 2e5))
    p = _newton_to_convergence(
        lambda a, b: jitted_newton_step(kernel, a, b), p_prev
    )

    class M(pt.SinglePhaseFlow):
        def bc_values_pressure(self, bg):
            return 1e5 + 1e4 * (1 - bg.cell_centers[0])

        def ic_values_pressure(self, sd):
            return np.full(sd.num_cells, 2e5)

    params = {
        "meshing_arguments": {"cell_size": 1 / 8},
        "material_constants": {
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
            "solid": pt.SolidConstants(permeability=1.0, porosity=0.1),
        },
        "reference_variable_values": pt.ReferenceVariableValues(pressure=1e5),
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
    }
    m = M(params)
    pt.run_time_dependent_model(m, params)
    p_model = m.equation_system.get_variable_values(time_step_index=0)
    assert np.abs(np.asarray(p) - p_model).max() < 1e-4


def test_structured_matches_unstructured():
    bcp = lambda x, y, z: 1e5 + 1e4 * (1 - np.asarray(x))  # noqa: E731
    kernel, _ = build_structured_flow_kernel(
        (8, 8, 4), (1.0, 1.0, 1.0), dt=1.0, bc_pressure=bcp, **FLUID
    )
    p_prev = jnp.full(kernel.shape, 2e5)
    step = jax.jit(lambda p, q: kernel.newton_step(p, q))
    p_s = _newton_to_convergence(step, p_prev)

    uk, _ = build_cart_flow_kernel(
        [8, 8, 4], physdims=[1, 1, 1], dt=1.0,
        bc_pressure=lambda fc: 1e5 + 1e4 * (1 - fc[0]), **FLUID,
    )
    pu_prev = jnp.asarray(np.full(uk.num_cells, 2e5))
    p_u = _newton_to_convergence(
        lambda a, b: jitted_newton_step(uk, a, b), pu_prev
    )
    # CartGrid flattens F-order (x fastest).
    p_u3 = np.asarray(p_u).reshape(4, 8, 8).T
    assert np.abs(np.asarray(p_s) - p_u3).max() < 1e-4


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(float(out[1]))


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    n = len(jax.devices())
    assert n >= 2, "conftest should provide 8 virtual devices"
    ge.dryrun_multichip(n)
