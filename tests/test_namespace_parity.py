"""Top-level API namespace parity: every public name of the reference's
``pp`` namespace exists in ``porepy_tpu`` (reference
``src/porepy/__init__.py:46-249``), so user code switching frameworks
resolves its imports."""

import numpy as np
import pytest

import porepy_tpu as pt

# Import-side-effect artifacts of the reference's __init__, not API.
_NON_API = {
    "os", "sys", "Path", "warnings", "configparser", "cwd", "pth",
    "porepy", "test_utils", "cfg", "config",
}


def test_reference_namespace_covered(golden):
    def compute(ref_pp):
        names = sorted(
            {n for n in dir(ref_pp) if not n.startswith("_")} - _NON_API
        )
        return {"names": np.array(names)}

    theirs = [str(n) for n in golden(compute)["names"]]
    missing = sorted(n for n in theirs if not hasattr(pt, n))
    assert not missing, f"missing top-level names: {missing}"
