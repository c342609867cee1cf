"""The committed examples must actually run: they are the documented entry
path for reference users switching to this framework (README Quick start),
and nothing else executes them in CI."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize(
    "script, expect",
    [
        ("examples/quickstart.py", None),
        ("examples/streaming_serving.py", "ok 12/12"),
    ],
)
def test_example_runs_clean(script, expect):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # scripts pin the cpu platform themselves
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, script)],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    if expect:
        assert expect in out.stdout, out.stdout[-2000:]
