"""Every tutorial under docs/tutorials must run end to end (VERDICT r2
item 10: tutorials exercised by a regression test). Each is executed in a
subprocess on CPU from a scratch directory, like a user would."""

import glob
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TUTORIALS = sorted(glob.glob(os.path.join(_REPO, "docs", "tutorials", "*.py")))


@pytest.mark.parametrize(
    "path", _TUTORIALS, ids=[os.path.basename(p) for p in _TUTORIALS]
)
def test_tutorial_runs(path, tmp_path):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    res = subprocess.run(
        [sys.executable, path],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
