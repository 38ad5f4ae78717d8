"""Hardware gate as a pytest target: `python -m pytest -m tpu tests/`.

The in-suite conftest forces the CPU platform (interpret-mode Pallas), so the
hardware checks run in a SUBPROCESS with a clean environment where the axon
TPU plugin can claim the chip. Skipped automatically when no TPU is reachable.
Deselected from default runs (pyproject addopts `-m "not tpu"`): a full smoke
pass costs minutes of remote compiles on a cold cache.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS"):
        env.pop(k, None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    return env


def _tpu_available() -> bool:
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; import sys; sys.exit(0 if jax.default_backend() == "
         "'tpu' else 1)"],
        env=_clean_env(), cwd=REPO, capture_output=True, timeout=300,
    )
    return r.returncode == 0


@pytest.mark.tpu
def test_tpu_smoke_gate():
    """Compile + run every production kernel variant on the real chip and
    write the hardware stamp (utils/hwgate) that bench.py checks."""
    if not _tpu_available():
        pytest.skip("no TPU reachable from this environment")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tpu_smoke.py")],
        env=_clean_env(), cwd=REPO, timeout=1800,
    )
    assert r.returncode == 0, "tpu_smoke failed on hardware"

    from dtrenderer_tpu.utils import hwgate

    assert hwgate.check_stamp() is None, "smoke passed but stamp not written"
