"""Every script under examples/ must run end-to-end (VERDICT r4 next #10:
the examples layer, mirroring the reference's examples/ notebooks)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parents[2] / "examples"
SCRIPTS = sorted(p.name for p in EXAMPLES.glob("*.py") if not p.name.startswith("_"))


@pytest.mark.cli
@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, script],
        cwd=EXAMPLES,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"{script}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"


def test_every_script_is_listed_in_readme():
    readme = (EXAMPLES / "README.md").read_text()
    for s in SCRIPTS:
        assert s in readme, s
