"""Every example CLI must import and parse ``--help`` cleanly.

The examples are the user-facing mirror of the reference's entry points;
most need checkpoints to *run*, so this is the cheapest guard against
import/flag rot across all of them."""
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
SCRIPTS = sorted(f for f in os.listdir(EXAMPLES)
                 if f.endswith(".py") and f != "__init__.py")


@pytest.mark.slow
@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help(script):
    r = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), "--help"],
        capture_output=True, text=True, timeout=180,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, (script, r.stderr[-2000:])
    assert "usage" in r.stdout.lower(), (script, r.stdout[:200])
