"""Scale demonstration: benchmark-size 3d MPSA/MPFA discretization.

VERDICT scale-path deliverable: discretize a ~350k-cell 3d grid with the
batched interaction-region kernels, recording wall-clock and peak RSS.
The memory-bounded chunking in ``numerics/fv/local_solves.py`` (the
TPU-native counterpart of the reference's subproblem partitioning,
reference ``fv/mpfa.py:150-300``) keeps the dense device scratch flat.

Usage: python tools/scale_demo.py [--scheme mpsa|mpfa] [--n 70]
       [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scheme", default="mpsa", choices=["mpsa", "mpfa"])
    parser.add_argument("--n", type=int, default=70)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    import porepy_tpu as pt
    from porepy_tpu.params.data import initialize_data

    n = args.n
    sd = pt.CartGrid([n, n, n], [1.0, 1.0, 1.0])
    sd.compute_geometry()

    t0 = time.perf_counter()
    if args.scheme == "mpfa":
        from porepy_tpu.numerics.fv.mpfa import Mpfa

        data = initialize_data(
            {},
            "flow",
            {
                "second_order_tensor": pt.SecondOrderTensor(
                    np.ones(sd.num_cells)
                ),
                "bc": pt.BoundaryCondition(
                    sd, sd.get_all_boundary_faces(), "dir"
                ),
                "ambient_dimension": 3,
            },
        )
        Mpfa("flow").discretize(sd, data)
        nnz = data["discretization_matrices"]["flow"]["flux"].nnz
    else:
        from porepy_tpu.numerics.fv.mpsa import Mpsa

        data = initialize_data(
            {},
            "mechanics",
            {
                "fourth_order_tensor": pt.FourthOrderTensor(
                    np.ones(sd.num_cells), np.ones(sd.num_cells)
                ),
                "bc": pt.BoundaryConditionVectorial(
                    sd, sd.get_all_boundary_faces(), "dir"
                ),
                "ambient_dimension": 3,
            },
        )
        Mpsa("mechanics").discretize(sd, data)
        nnz = data["discretization_matrices"]["mechanics"]["stress"].nnz
    wall = time.perf_counter() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    print(
        json.dumps(
            {
                "scheme": args.scheme,
                "num_cells": int(sd.num_cells),
                "wall_s": round(wall, 1),
                "peak_rss_gb": round(peak_gb, 2),
                "stencil_nnz": int(nnz),
            }
        )
    )


if __name__ == "__main__":
    main()
