"""The f32 tier: the exact dtype configuration that runs on TPU hardware.

x64 is a process-level JAX setting (this suite runs x64 for the reference's
~1e-7 oracles), so the f32 path is exercised in a fresh subprocess running
tests/f32_check.py — flagship RS-VI must converge to acceptable ATE in pure
float32 (SURVEY §7: the central numerical-engineering risk)."""
import os
import subprocess
import sys
from pathlib import Path


def test_f32_flagship_converges():
    script = Path(__file__).parent / "f32_check.py"
    env = dict(os.environ)
    env["KONTIKI_TPU_X64"] = "0"
    env.pop("PYTEST_CURRENT_TEST", None)
    out = subprocess.run(
        [sys.executable, str(script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "F32 TIER OK" in out.stdout
