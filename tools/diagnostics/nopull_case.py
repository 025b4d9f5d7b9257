"""Run one benchmark case through the no-pull fused-block timer.

Usage: python tools/diagnostics/nopull_case.py <case> [--stats] [--repeats N]
Backend: set JAX_PLATFORMS=cpu for the CPU twin (pull-capable; use
--stats there), leave unset for the TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    _plat = os.environ["JAX_PLATFORMS"]
    if "cpu" not in [p.strip() for p in _plat.split(",")]:
        _plat += ",cpu"
    jax.config.update("jax_platforms", _plat)

sys.path.insert(0, "/root/repo")

import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("NOPULL_WATCHDOG_S", "900")), exit=True
)

_T0 = time.perf_counter()


def _emit(**kw):
    kw["t"] = round(time.perf_counter() - _T0, 3)
    print(f"## {json.dumps(kw)}", file=sys.stderr, flush=True)


def main():
    case = sys.argv[1]
    stats = "--stats" in sys.argv
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])

    from porepy_tpu.applications.benchmarking import build_case
    from porepy_tpu.applications.benchmarking.nopull import fused_block_timer

    t0 = time.perf_counter()
    model, params = build_case(case)
    _emit(phase="build", s=round(time.perf_counter() - t0, 3))
    out = fused_block_timer(
        model,
        params,
        repeats=repeats,
        measure_budget_s=60.0,
        pull_stats=stats,
        export_key=case,
        emit=_emit,
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
