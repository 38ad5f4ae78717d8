"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (multi-chip paths validated on a host-platform mesh)."""

import os

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; jax.config.update
# (and JAX_PLATFORM_NAME) do work. Force CPU + 8 virtual devices for sharding tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# XLA:CPU's JIT accumulates live compiled executables for every jitted program
# the suite touches (the pjit cache pins them); after 100+ heavyweight
# compiles in ONE process the NEXT large compile segfaults inside LLVM
# (observed twice at different tests, always in backend_compile_and_load,
# RSS ~8.5 GB on a 125 GB box — resource accumulation, not OOM and not any
# single program). Dropping the caches every few tests releases the
# executables and keeps the compiler healthy; the recompile cost is small
# because tests rarely share programs across modules.
_TESTS_PER_CACHE_CLEAR = 20
_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % _TESTS_PER_CACHE_CLEAR == 0:
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def assert_ulp(a, b, max_ulp=1, msg=""):
    """Assert two f32 arrays match within max_ulp ULPs (inf/nan must match exactly)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape} {msg}"
    special_a = ~np.isfinite(a)
    special_b = ~np.isfinite(b)
    assert np.array_equal(special_a, special_b), f"inf/nan mismatch {msg}"
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    # Map to monotonic integer line (two's-complement trick for negative floats).
    ai = np.where(ai < 0, -(2**31) - ai, ai)
    bi = np.where(bi < 0, -(2**31) - bi, bi)
    diff = np.where(special_a, 0, np.abs(ai - bi))
    worst = diff.max() if diff.size else 0
    assert worst <= max_ulp, (
        f"max ULP diff {worst} > {max_ulp} at {np.unravel_index(diff.argmax(), diff.shape)} "
        f"(a={a.flat[diff.argmax()]}, b={b.flat[diff.argmax()]}) {msg}"
    )
