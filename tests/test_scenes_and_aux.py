"""Benchmark scene smoke tests + aux subsystems (checkpoint, timers, counters)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.models import scenes
from dtrenderer_tpu.ops import fb as fblib


def _render(spec, t=0.6):
    fb0 = fblib.create(spec.height, spec.width)
    color, depth = jax.jit(spec.frame)(fb0.color, fb0.depth, jnp.float32(t))
    return np.asarray(color), np.asarray(depth)


def test_configs_1_to_3_render(rng):
    for n, kw in [(1, {}), (2, {}), (3, {})]:
        spec = scenes.ALL_CONFIGS[n](width=160, height=120, backend="ref", **kw)
        color, depth = _render(spec)
        assert np.isfinite(color).all(), spec.name
        cov = np.isfinite(depth).mean()
        assert cov > 0.05, f"{spec.name}: coverage {cov}"


def test_config4_small_render(rng):
    spec = scenes.make_config4(width=192, height=108, backend="ref")
    color, depth = _render(spec)
    assert np.isfinite(color).all()
    assert np.isfinite(depth).mean() > 0.1


def test_config5_small_render(rng):
    # shrunken stress scene: 2000 tiny soup tris at 256x128, pallas backend.
    # Each soup triangle is ~2px at this scale and half are backface-culled,
    # so expected coverage is small but nonzero; capacity 1024 avoids overflow.
    spec = scenes.make_config5(width=256, height=128, n_tris=2000,
                               backend="pallas", capacity=1024)
    color, depth = _render(spec)
    assert np.isfinite(color).all()
    cov = np.isfinite(depth).mean()
    assert 0.005 < cov < 0.9, cov
    # pallas and ref backends agree on the same scene
    spec_ref = scenes.make_config5(width=256, height=128, n_tris=2000,
                                   backend="ref")
    _, depth_ref = _render(spec_ref)
    assert np.array_equal(np.isfinite(depth_ref), np.isfinite(depth))


def test_config5_banded_audit_and_parity():
    """The flagship banded path end-to-end at mini scale — exactly the flow
    bench.run_4k_band8_bench runs on TPU: bands_audit pre-flight OK, zero
    render-time overflow (counters through the scene hook), and the 8-band
    frame bit-exact vs the unbanded one (the multi-chip scaling stand-in)."""
    import functools

    base = dict(tile_h=8, capacity=512, small_span=8, pair_budget=8192,
                chunk=8, cols=1)
    spec = scenes.make_config5(width=256, height=128, n_tris=2000,
                               extra_opts=dict(base, row_bands=8))
    rep = spec.bands_audit(8)
    assert rep["ok"], rep
    assert len(rep["band_tris"]) == 8 and sum(rep["band_tris"]) > 0
    fb0 = fblib.create(spec.height, spec.width)
    c, d, ov = jax.jit(functools.partial(spec.frame, return_counters=True))(
        fb0.color, fb0.depth, jnp.float32(0.5))
    assert int(np.asarray(ov)) == 0
    spec_u = scenes.make_config5(width=256, height=128, n_tris=2000,
                                 extra_opts=dict(base))
    cu, du = jax.jit(spec_u.frame)(fb0.color, fb0.depth, jnp.float32(0.5))
    assert np.array_equal(np.asarray(c), np.asarray(cu))
    assert np.array_equal(np.asarray(d), np.asarray(du))


def test_scene_determinism():
    spec = scenes.make_config2(width=128, height=96, backend="ref")
    a, _ = _render(spec, 0.7)
    b, _ = _render(spec, 0.7)
    assert np.array_equal(a, b)


def test_checkpoint_roundtrip(tmp_path):
    from dtrenderer_tpu.utils.checkpoint import load_pytree, save_pytree

    fb = fblib.create(32, 64)
    fb = fblib.Framebuffer(
        color=fb.color + jnp.asarray([0.25, 0.5, 0.75, 1.0]),
        depth=fb.depth.at[3, 4].set(0.5),
    )
    p = str(tmp_path / "state.npz")
    save_pytree(p, fb)
    restored = load_pytree(p, fblib.create(32, 64))
    assert np.array_equal(np.asarray(fb.color), np.asarray(restored.color))
    assert np.array_equal(np.asarray(fb.depth), np.asarray(restored.depth))


def test_checkpoint_structure_mismatch_raises(tmp_path):
    """Restoring into a structurally different state must fail, not coerce."""
    import pytest

    from dtrenderer_tpu.utils.checkpoint import load_pytree, save_pytree

    p = str(tmp_path / "state.npz")
    save_pytree(p, {"a": jnp.zeros(3), "b": jnp.ones(2)})
    with pytest.raises(ValueError):
        load_pytree(p, {"a": jnp.zeros(3), "c": jnp.ones(2)})  # different keys
    with pytest.raises(ValueError):
        load_pytree(p, {"a": jnp.zeros(3)})  # different leaf count


def test_frame_counters_merge():
    from dtrenderer_tpu.debug import FrameCounters

    a = FrameCounters(jnp.int32(3), jnp.int32(2), jnp.int32(100), jnp.int32(0))
    b = FrameCounters(jnp.int32(1), jnp.int32(1), jnp.int32(50), jnp.int32(2))
    m = a.merge(b)
    assert int(m.tris_submitted) == 4
    assert int(m.pixels_shaded) == 150
    assert int(m.bin_overflow) == 2


def test_frame_timer():
    from dtrenderer_tpu.utils.trace import FrameTimer

    ft = FrameTimer(window=4)
    for _ in range(6):
        ft.tick()
    assert len(ft.samples) == 4
    assert ft.mean_ms >= 0.0


def test_hwgate_stamp_tracks_kernel_sources(tmp_path, monkeypatch):
    """The hardware-gate stamp is keyed by kernel-source CONTENT: writing a
    stamp validates the current code, and any source change (even
    uncommitted) invalidates it."""
    from dtrenderer_tpu.utils import hwgate

    monkeypatch.setattr(hwgate, "STAMP_DIR", str(tmp_path))
    assert hwgate.check_stamp() is not None  # fresh dir: no stamp
    p = hwgate.write_stamp()
    assert os.path.exists(p)
    assert hwgate.check_stamp() is None

    # simulate a kernel edit by monkeypatching the hash
    monkeypatch.setattr(hwgate, "kernel_hash", lambda: "deadbeefdeadbeef")
    warn = hwgate.check_stamp()
    assert warn is not None and "deadbeef" in warn


def test_hwgate_covers_every_device_program_source():
    """The gate must hash EVERY file whose edits change traced device
    programs — all of ops/ (pipeline payload packing, geometry, sampling,
    shading, binning, the kernels) plus math3d — not just the Pallas kernel
    files (the round-3 blind spot)."""
    from dtrenderer_tpu.utils import hwgate

    covered = set(hwgate.KERNEL_FILES)
    for must in ("ops/pipeline.py", "ops/geometry.py", "ops/render_fused.py",
                 "ops/raster_pallas.py", "ops/binning.py", "ops/sampling.py",
                 "ops/shading.py", "utils/math3d.py"):
        assert must in covered, f"hwgate does not hash {must}"
    # every ops/*.py source is hashed (a new op file is covered by default)
    pkg = os.path.dirname(os.path.abspath(hwgate.__file__))
    ops_dir = os.path.join(os.path.dirname(pkg), "ops")
    for f in os.listdir(ops_dir):
        if f.endswith(".py"):
            assert os.path.join("ops", f) in covered
