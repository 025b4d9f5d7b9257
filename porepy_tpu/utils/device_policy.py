"""Device placement policy: setup on host CPU, hot loop on the accelerator.

The framework splits work by ROLE rather than leaving placement to jax's
process-wide default:

- *Setup* — geometry, meshing, discretization, operator tracing, host
  (scipy-path) assembly — is thousands of tiny eager ops orchestrated from
  Python. It runs on the local CPU backend.
- The *iteration hot loop* — compiled device assembly
  (``EquationSystem.assemble_device``), the preconditioned Krylov solve,
  and the fused Newton loop — is a handful of large jitted programs. It
  runs on the accelerator.

Measured motivation (TPU v5e reached through a network tunnel): each
eager dispatch to the remote device costs 60–150 ms of round-trip latency
and each XLA compile ~2.3 s, with transient multi-minute stalls. Leaving
the default device as the TPU turned a 4.4 s md-flow setup (CPU) into
218–500 s of tunnel round trips. The same split is correct on healthy
PCIe hosts too — setup is latency-bound scalar work the accelerator is
bad at, independent of the link.

The reference has no counterpart (it is host-only CPU scipy/numba,
``/root/reference/src/porepy/models/solution_strategy.py:830``); this
module is where the TPU port decides what the accelerator is FOR.

``porepy_tpu.__init__`` sets the process default device to :func:`host`;
hot-loop modules opt in to the accelerator via :func:`accel_scope` /
explicit :func:`put` calls.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

__all__ = ["host", "accelerator", "accel_scope", "on_accelerator", "put"]

_HOST = None
_ACCEL = None


def host():
    """The local CPU device (always present). ``porepy_tpu.__init__`` sets
    ``jax_default_device`` to the lazy string ``"cpu"`` instead of this
    device object, so that importing the package never initializes the
    accelerator runtime (a flaky tunneled plugin can raise at init)."""
    global _HOST
    if _HOST is None:
        _HOST = jax.local_devices(backend="cpu")[0]
    return _HOST


def accelerator():
    """The compute device for the hot loop: the default backend's first
    device (TPU/GPU when present, otherwise the CPU)."""
    global _ACCEL
    if _ACCEL is None:
        try:
            _ACCEL = jax.devices()[0]
        except RuntimeError:  # accelerator runtime failed to initialize
            _ACCEL = host()
    return _ACCEL


def accel_scope():
    """Context manager making the accelerator the default device, so eager
    ``jnp.*`` creations and jit dispatches of uncommitted arrays inside the
    scope land on the accelerator."""
    return jax.default_device(accelerator())


def on_accelerator(fn):
    """Decorator form of :func:`accel_scope`."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with accel_scope():
            return fn(*args, **kwargs)

    return wrapped


def put(x, device: Optional[object] = None):
    """``jax.device_put`` onto the accelerator (or the given device)."""
    return jax.device_put(x, device if device is not None else accelerator())
