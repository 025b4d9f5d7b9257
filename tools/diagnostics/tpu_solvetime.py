"""Time solver kernel variants on the TPU for the md bench system."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from bench import FRACTURES_2D, _timed
import porepy_tpu as pt
from porepy_tpu.numerics.linalg.device_solver import DeviceLinearSolver, device_gmres

class Model(_timed(pt.SinglePhaseFlow)):
    def set_fractures(self):
        self._fractures = [pt.LineFracture(f) for f in FRACTURES_2D]
    def bc_values_pressure(self, bg):
        return 1.0 - bg.cell_centers[1]

params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1.0 / 128},
    "material_constants": {
        "solid": pt.SolidConstants(permeability=1.0, porosity=0.1,
                                   residual_aperture=0.01, normal_permeability=1.0),
        "fluid": pt.FluidComponent(compressibility=1e-6, viscosity=1e-3, density=1000.0),
    },
    "time_manager": pt.TimeManager([0, 6.0], 1.0, constant_dt=True),
    "linear_solver": "device_gmres",
}
m = Model(params)
m.prepare_simulation(); m.before_nonlinear_loop(); m.before_nonlinear_iteration()
data, b, cs = m.equation_system.assemble_device()
jax.block_until_ready(data)
print("assembled", flush=True)
solver = DeviceLinearSolver(cs, method="gmres", tol=1e-11)
print(f"dia: {solver._num_dia} offsets, rem rows {solver._rem_nr}, n {solver.n}, nnz {cs.indices_np.shape[0]}", flush=True)
acinv = solver._coarse_inverse(data)
bj = jnp.asarray(b); bn = float(jnp.linalg.norm(bj)); bu = bj / bn
x0 = jnp.zeros(solver.n)

# Warm + time the full chunk.
x, res = solver._jit(data, bu, x0, acinv); jax.block_until_ready(x)
t0 = time.perf_counter(); x, res = solver._jit(data, bu, x0, acinv); jax.block_until_ready(x)
print(f"chunk(400it gmres+2lvl): {time.perf_counter()-t0:.3f}s res {float(res):.2e}", flush=True)

# Pure matvec loop cost: 400 segment-sum matvecs in one fori.
@jax.jit
def mv400(data, v):
    packed = solver._pack(data)
    def body(_i, v):
        return solver._matvec_packed(packed, v) * 1e-3
    return jax.lax.fori_loop(0, 400, body, v)
y = mv400(data, bu); jax.block_until_ready(y)
t0 = time.perf_counter(); y = mv400(data, bu); jax.block_until_ready(y)
print(f"400 bare matvecs: {time.perf_counter()-t0:.3f}s", flush=True)

# Preconditioner cost alone: 400 M applications.
r_, c_ = jax.jit(solver._equilibrate)(data)
data_s = data * r_[solver._rows] * c_[solver._cols]
M = solver._make_preconditioner(data_s, acinv)
@jax.jit
def M400(v):
    def body(_i, v):
        return M(v) * 1e-3
    return jax.lax.fori_loop(0, 400, body, v)
y = M400(bu); jax.block_until_ready(y)
t0 = time.perf_counter(); y = M400(bu); jax.block_until_ready(y)
print(f"400 M applications: {time.perf_counter()-t0:.3f}s", flush=True)

# GMRES without preconditioner/equilibration, 10 cycles x 40.
@jax.jit
def gm(data, b):
    return device_gmres(lambda x: solver._matvec(data, x), lambda r: r, b, 1e-11, 40, 10)
x, res = gm(data, bu); jax.block_until_ready(x)
t0 = time.perf_counter(); x, res = gm(data, bu); jax.block_until_ready(x)
print(f"gmres noM 400it: {time.perf_counter()-t0:.3f}s res {float(res):.2e}", flush=True)
