"""Multi-chip execution of the framework Newton iteration.

SPMD over a 1d ``jax.sharding.Mesh`` ("dofs" axis): the global dof vector,
residual, Jacobian nonzero data and all Krylov vectors are sharded across
devices; XLA/GSPMD inserts the (ICI) collectives implied by the assembly
gathers and the matvec segment-sums. This shards the REAL model path — the
same jitted kernels as single-chip (``EquationSystem.assemble_device`` +
``DeviceLinearSolver``), re-lowered for the sharded operands — so
multi-chip and single-chip execution agree to machine precision.

Counterpart of SURVEY §2.11 (the reference has no distributed story; its
scaling axis is the memory-bounded subproblem partitioning of
``fv/mpfa.py:150-300``, which here becomes sharding).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardedNewton", "make_dof_mesh"]


def make_dof_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1d device mesh over the 'dofs' axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("dofs",))


class ShardedNewton:
    """Run a model's Newton iterations with all linear algebra sharded.

    Usage::

        model.prepare_simulation()
        sn = ShardedNewton(model, make_dof_mesh())
        model.before_nonlinear_loop()
        model.before_nonlinear_iteration()
        increment, residual_norm = sn.step()

    ``step`` assembles on device (sharded), solves with the model's device
    solver (sharded Krylov), and feeds the increment through the model's
    ``after_nonlinear_iteration`` so state bookkeeping matches the host loop.
    """

    def __init__(
        self, model, mesh: Mesh, method: str = "gmres", dof_permutation=None
    ) -> None:
        self.model = model
        self.mesh = mesh
        eq = model.equation_system
        self.cs = eq.compiled_system()
        if not hasattr(model, "_device_solvers"):
            model._device_solvers = {}
        if not model.linear_solver.startswith("device"):
            model.linear_solver = f"device_{method}"
        # Optional spatial dof permutation (parallel/placement.py): the
        # solver is built over permuted index tables so each device's
        # contiguous dof shard is a spatially coherent region; vectors are
        # permuted in and the increment permuted back out.
        self.perm = None
        if dof_permutation is not None:
            from porepy_tpu.numerics.linalg.device_solver import (
                DeviceLinearSolver,
            )
            from porepy_tpu.parallel.placement import PermutedSystem

            self.perm = np.asarray(dof_permutation)
            self._psys = PermutedSystem(self.cs, self.perm)
            self.solver = DeviceLinearSolver(self._psys, method=method)
        else:
            self.solver = model._device_solver_for(self.cs)
        self.dof_sharding = NamedSharding(mesh, P("dofs"))
        self.replicated = NamedSharding(mesh, P())
        self.n_devices = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        # Pin the dof axis through the whole Krylov solve with explicit
        # sharding constraints (see DeviceLinearSolver.set_dof_sharding):
        # GSPMD is then not free to all-gather the iterates at a fusion
        # boundary. Vectors whose length does not divide the mesh are
        # handled by GSPMD's internal padding.
        if self.n_devices > 1:
            self.solver.set_dof_sharding(self.dof_sharding)

    def _shard(self, arr):
        """Shard over 'dofs' when the leading dim divides the mesh;
        replicate otherwise (GSPMD still partitions downstream ops)."""
        if arr.shape[0] % self.n_devices == 0:
            return jax.device_put(arr, self.dof_sharding)
        import logging

        logging.getLogger(__name__).warning(
            "Array of size %d not divisible by %d devices; replicating",
            arr.shape[0],
            self.n_devices,
        )
        return jax.device_put(arr, self.replicated)

    def assemble(self):
        """(Jacobian data, -residual) with sharded inputs; GSPMD chooses the
        output layout (data follows the nnz partition of the gathers)."""
        eq = self.model.equation_system
        x = self._shard(jnp.asarray(eq._global_vector()))
        envs = jax.device_put(self.cs._envs(eq), self.replicated)
        return self.cs._data_and_rhs(x, envs)

    def _solve(self, data, b):
        if self.perm is not None:
            b = jnp.take(jnp.asarray(b), jnp.asarray(self.perm))
        dx, res = self.solver.solve_device(data, self._shard(np.asarray(b)))
        dx_host = np.asarray(dx)
        if self.perm is not None:
            dx_host = dx_host[self._psys.inv]
        return dx_host, float(res)

    def step(self) -> tuple[np.ndarray, float]:
        data, b = self.assemble()
        dx_host, res = self._solve(data, b)
        self.model.after_nonlinear_iteration(dx_host)
        return dx_host, res

    def solve_once(self) -> tuple[np.ndarray, float]:
        """Assemble + solve without mutating model state (for parity tests)."""
        data, b = self.assemble()
        return self._solve(data, b)
