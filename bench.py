"""Headline benchmark: shaded fill rate AND triangle throughput at 1080p through
the full production pipeline (fused Pallas visibility+shading kernel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra": {...}}.
- primary metric: shaded fill rate, config-4-style multi-mesh Phong+bilinear
  scene. vs_baseline: BASELINE.md's north star is >= 1 Gpixel/s shaded fill on a
  v5e-8; this runs on ONE chip, so the per-chip share is 1e9/8 = 125 Mpix/s and
  vs_baseline = measured / 125.
- extra.mtris_s: triangle throughput on a 200k-triangle soup (config-5-style
  geometry load at 1080p), zero-overflow audited. extra.mtris_vs_baseline is
  measured / (10 Mtris/s / 8 chips = 1.25 Mtris/s per-chip share).

Timing uses utils/benchlib.device_time (device-side loop; wall-clock dispatch and
tunnel fetches are excluded — see benchlib docstring for why that is required on
this platform). Both scenes assert zero bin overflow first (overflow = silent
triangle drops that fake speed).
"""

from __future__ import annotations

import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    # The axon tunnel is flaky: backend init can raise UNAVAILABLE or HANG
    # outright (observed: a multi-hour outage mid-round; hangs block in C so
    # in-process timeouts cannot interrupt them, and jax caches the failure
    # for the process lifetime so in-process retries are useless). Probe in a
    # SUBPROCESS with a hard timeout before this process touches a device;
    # on persistent failure emit an explicit error artifact instead of
    # crashing (or hanging) with no JSON line.
    import subprocess
    import time

    for attempt in range(4):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, check=True, capture_output=True)
            break
        except Exception as e:  # init failure/hang, not a code bug
            print(f"bench: backend probe failed (attempt {attempt + 1}/4): "
                  f"{type(e).__name__}", file=sys.stderr)
            if attempt == 3:
                print(json.dumps(dict(
                    metric="shaded_fill_rate_1080p_single_chip", value=0.0,
                    unit="Mpix/s", vs_baseline=0.0,
                    extra={"error": "TPU backend unavailable "
                                    "(tunnel probe failed 4x)"})))
                return
            time.sleep(30)

    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import draw_mesh
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3
    from dtrenderer_tpu.utils.benchlib import device_time

    on_tpu = jax.default_backend() == "tpu"
    h, w = 1080, 1920
    if not on_tpu:
        h, w = 120, 256  # smoke-test size off-TPU
    print(f"bench: backend={jax.default_backend()} frame={w}x{h}", file=sys.stderr)

    if on_tpu:
        from dtrenderer_tpu.utils import hwgate

        warn = hwgate.check_stamp()
        if warn:
            print(f"bench: *** WARNING *** {warn}", file=sys.stderr)

    # Config-4 style scene: multi-mesh, textured, perspective-correct, Phong.
    # A dense sphere grid covering most of the frame -> high shaded coverage.
    sphere = primitives.uv_sphere(24, 32)
    tex = primitives.checkerboard(64, 8)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    models = [
        jnp.asarray(m3.model_matrix((x, y, -3.2), m3.rotate_y(0.3 * (x + y)), 1.05))
        for x in (-1.2, 0.0, 1.2)
        for y in (-0.7, 0.7)
    ]

    backend = "fused"
    # tuned via tools/profile_fused.py sweeps: 64x128 tiles, 4096-px shading
    # batches (t128/c384 measured within run-to-run noise of t64; t64 keeps
    # the larger capacity margin). Audited zero-overflow below.
    raster_opts = dict(tile_h=64, tile_w=128, capacity=256, batch_rows=32)

    # Pre-flight: assert zero bin overflow (overflow = silent triangle drops).
    from dtrenderer_tpu.ops.pipeline import DrawSpec, audit_scene

    specs_audit = [DrawSpec(sphere, mdl, texture=tex, shading="phong")
                   for mdl in models]
    overflow, maxcount, cap = audit_scene(proj, specs_audit, h, w, light=light,
                                          raster_opts=raster_opts)
    print(f"bench: bin audit overflow={overflow} maxcount={maxcount}/{cap}",
          file=sys.stderr)
    assert overflow == 0, "bin capacity overflow — raise capacity"

    def frame(color, depth, t):
        from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_meshes

        fb = fblib.Framebuffer(color=color, depth=depth)
        fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
        # rotate_y(t - 0.5) is the identity at runtime (t == 0.5; device_time's
        # per-iteration eps flushes to zero) but XLA cannot prove it, so the
        # WHOLE vertex->binning->raster chain depends on the loop-carried input
        # and cannot be hoisted out of the timing loop. Scene values == audit.
        rot_t = m3.rotate_y(t - jnp.float32(0.5))
        fb = draw_meshes(
            fb, proj,
            [DrawSpec(sphere, m3.mat4mul(mdl, rot_t), texture=tex, shading="phong")
             for mdl in models],
            light=light, sampling_mode="bilinear",
            raster_opts=raster_opts,  # tuned via tools/tune.py; audited above
        )
        return fb.color, fb.depth

    fb0 = fblib.create(h, w)
    t = jnp.float32(0.5)

    # Shaded-pixel count for the fill-rate numerator (covered pixels per frame).
    cjit = jax.jit(frame)
    color, depth = cjit(fb0.color, fb0.depth, t)
    covered = int(np.asarray(jnp.sum(jnp.isfinite(depth)).astype(jnp.int32)))
    n_tris = len(models) * sphere.num_tris
    print(f"bench: covered {covered/1e6:.2f} Mpix, {n_tris} tris/frame",
          file=sys.stderr)

    dt = device_time(frame, fb0.color, fb0.depth, t, iters=12, repeats=3)
    mpix_s = covered / dt / 1e6
    tris_s = n_tris / dt / 1e6
    print(f"bench: {dt*1000:.2f} ms/frame, {mpix_s:.0f} Mpix/s shaded, "
          f"{tris_s:.1f} Mtris/s", file=sys.stderr)

    # ---- scene 2: triangle throughput (200k soup @1080p, config-5 style) ----
    soup_tris, soup_dt, soup_mtris = run_soup_bench(h, w, on_tpu)

    extra = {
        "frame_ms": round(dt * 1000, 2),
        "mtris_s": round(soup_mtris, 2),
        "mtris_vs_baseline": round(soup_mtris / (10.0 / 8), 3),
        "soup_tris": soup_tris,
        "soup_frame_ms": round(soup_dt * 1000, 2),
    }

    # ---- scene 3: ordered translucency (round-4 tile engine) ----
    if on_tpu:
        try:
            otris, odt = run_ordered_bench(h, w)
        except Exception as e:  # record, keep the artifact
            extra["ordered_error"] = str(e)[:200]
            print(f"bench(ordered): FAILED {e}", file=sys.stderr)
        else:
            extra["ordered_tris"] = otris
            extra["ordered_frame_ms"] = round(odt * 1000, 2)
            extra["ordered_mtris_s"] = round(otris / odt / 1e6, 2)

    # ---- scene 4: the FULL BASELINE config 5 (1M-tri soup @4K) ----
    if on_tpu:
        tris4k, dt4k = run_4k_bench()
        extra["4k_tris"] = tris4k
        extra["4k_frame_ms"] = round(dt4k * 1000, 1)
        extra["4k_mtris_s"] = round(tris4k / dt4k / 1e6, 2)

        # ---- config-5 MULTI-CHIP scaling evidence (the BASELINE "sharded
        # across v5e-8" claim): render the SAME scene as 8 sequential bands
        # (row_bands=8 — exactly the per-device work of an 8-row shard_map,
        # incl. each band's own compaction + binning) and project the 8-chip
        # frame time from the measured sum instead of assuming linearity.
        try:
            dt8 = run_4k_band8_bench()
        except Exception as e:  # record the failure, keep the artifact
            extra["4k_band8_error"] = str(e)[:200]
            print(f"bench(4k band8): FAILED {e}", file=sys.stderr)
        else:
            extra["4k_band8_sum_ms"] = round(dt8 * 1000, 1)
            extra["4k_8chip_projected_ms"] = round(dt8 / 8 * 1000, 1)
            extra["4k_8chip_projected_mtris_s"] = round(
                tris4k / (dt8 / 8) / 1e6, 2)
            extra["4k_8chip_projected_speedup"] = round(dt4k / (dt8 / 8), 2)
            print(f"bench(4k band8): sum-of-8-bands {dt8*1000:.1f} ms -> "
                  f"projected 8-chip {dt8/8*1000:.1f} ms/frame, "
                  f"{extra['4k_8chip_projected_mtris_s']} Mtris/s "
                  f"(x{extra['4k_8chip_projected_speedup']} vs single-chip)",
                  file=sys.stderr)

        # ---- multi-chip scaling EVIDENCE from one chip (tools/band_sweep):
        # render the fill scene as 8 sequential bands (the per-device work of
        # an 8-row shard_map, auto shard_budget active) and project the
        # 8-chip wall-clock from the measured per-band overhead instead of
        # assuming linear scaling.
        band_dt = run_band8_bench(h, w, sphere, tex, proj, light, models)
        extra["band8_sum_ms"] = round(band_dt * 1000, 2)
        speedup = dt / (band_dt / 8)
        extra["fill_8chip_projected_speedup"] = round(speedup, 2)
        extra["fill_8chip_projected_gpix_s"] = round(
            covered / (band_dt / 8) / 1e9, 2)
        print(f"bench(band8): sum-of-8-bands {band_dt*1000:.2f} ms -> "
              f"projected 8-chip speedup x{speedup:.2f}, "
              f"{extra['fill_8chip_projected_gpix_s']} Gpix/s", file=sys.stderr)

    per_chip_target = 1e9 / 8 / 1e6  # 125 Mpix/s
    print(json.dumps({
        "metric": "shaded_fill_rate_1080p_single_chip",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / per_chip_target, 3),
        "extra": extra,
    }))


def run_band8_bench(h, w, sphere, tex, proj, light, models):
    """Sum-of-8-bands render of the fill scene (full-frame viewport, y_offset
    per band, auto shard_budget) — one device doing all 8 devices' work in
    sequence. tile_h=32 so band tiling is comparable across band heights."""
    from dtrenderer_tpu.models import primitives  # noqa: F401 (parity w/ main)
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_meshes
    from dtrenderer_tpu.utils import math3d as m3
    from dtrenderer_tpu.utils.benchlib import device_time

    k = 8
    band_h = h // k
    opts = dict(tile_h=32, tile_w=128, capacity=256, batch_rows=32)

    def frame(color, depth, t):
        rot_t = m3.rotate_y(t - jnp.float32(0.5))
        draws = [DrawSpec(sphere, m3.mat4mul(mdl, rot_t), texture=tex,
                          shading="phong") for mdl in models]
        outs_c, outs_d = [], []
        for b in range(k):
            bh = band_h if b < k - 1 else h - band_h * (k - 1)
            fb = fblib.clear(
                fblib.create(bh, w),
                jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
            fb = draw_meshes(fb, proj, draws, light=light,
                             sampling_mode="bilinear", frame_height=h,
                             frame_width=w, y_offset=b * band_h,
                             raster_opts=opts)
            outs_c.append(fb.color)
            outs_d.append(fb.depth)
        return jnp.concatenate(outs_c, 0), jnp.concatenate(outs_d, 0)

    fb0 = fblib.create(h, w)
    return device_time(frame, fb0.color, fb0.depth, jnp.float32(0.5),
                       iters=8, repeats=3)


def run_ordered_bench(h, w):
    """Reference-order translucency through the production tile engine
    (pipeline.draw_mesh_ordered(engine="tile"), ops/raster_ordered.py):
    a ~5k-tri translucent sphere @1080p — the README reference scene. The
    round-3 lax.scan engine measured 59-64 ms here; the tile kernel's
    per-tile id-ordered windows are the round-4 fix. Drops CHANGE the
    blend for ordered draws, so overflow is audited to zero first."""
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import draw_mesh_ordered
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3
    from dtrenderer_tpu.utils.benchlib import device_time

    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    mesh = primitives.uv_sphere(50, 52)  # ~5k tris
    mdl = jnp.asarray(m3.model_matrix((0, 0, -3.0), m3.rotate_y(0.4), 1.4))
    col = (0.8, 0.5, 0.9, 0.5)
    fb0 = fblib.create(h, w)

    # jit the audit render (eager API calls dispatch per-op — CLAUDE.md);
    # only the overflow scalar is fetched
    ov = int(np.asarray(jax.jit(lambda: draw_mesh_ordered(
        fb0, mesh, mdl, proj, light=light, color=col, shading="gouraud",
        engine="tile", return_counters=True)[1].bin_overflow)()))
    print(f"bench(ordered): {mesh.num_tris} tris, overflow={ov}",
          file=sys.stderr)
    assert ov == 0, "ordered bin overflow — the blend would be wrong"

    def frame(color, depth, t):
        fb = fblib.Framebuffer(color, depth)
        fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
        rot_t = m3.rotate_y(t - jnp.float32(0.5))
        out = draw_mesh_ordered(fb, mesh, m3.mat4mul(mdl, rot_t), proj,
                                light=light, color=col, shading="gouraud",
                                engine="tile")
        return out.color, out.depth

    dt = device_time(frame, fb0.color, fb0.depth, jnp.float32(0.5),
                     iters=8, repeats=3)
    print(f"bench(ordered): {dt*1000:.2f} ms/frame tile engine "
          f"({mesh.num_tris/dt/1e6:.2f} Mtris/s reference-order)",
          file=sys.stderr)
    return mesh.num_tris, dt


def run_4k_bench():
    """BASELINE config 5 on one chip: 1M-triangle soup, 4K framebuffer, full
    production pipeline (models/scenes.make_config5), zero-overflow audited."""
    from dtrenderer_tpu.models.scenes import make_config5
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.utils.benchlib import device_time

    spec = make_config5()
    overflow, maxcount, cap = spec.audit()
    print(f"bench(4k): bin audit overflow={overflow} maxcount={maxcount}/{cap}",
          file=sys.stderr)
    assert overflow == 0, "4k bin overflow — results would be fake"

    fb0 = fblib.create(spec.height, spec.width)
    dt = device_time(spec.frame, fb0.color, fb0.depth, jnp.float32(0.5),
                     iters=4, repeats=3)
    print(f"bench(4k): {dt*1000:.1f} ms/frame, "
          f"{spec.n_tris/dt/1e6:.2f} Mtris/s ({spec.n_tris} tris @ "
          f"{spec.width}x{spec.height})", file=sys.stderr)
    return spec.n_tris, dt


def run_4k_band8_bench():
    """BASELINE config 5 as 8 sequential horizontal bands on one chip — the
    per-device work of an 8-row shard, measured, not assumed. Since round 5
    the banded flat path uses the SHARED cross-band binning pass
    (render_fused.render_fused_rowbands): ONE full-frame partition sort whose
    per-band windows feed all 8 band kernel calls, replacing the 8x
    compaction+sort+gather redundancy (sum-of-bands 322 -> 227 ms, projected
    8-chip x5.12 -> x7.16). The sum/8 projection charges each chip 1/8 of
    the binning, which corresponds to the DISTRIBUTED form of the shared
    pass (parallel/shard.py distributed_flat_bins: triangle-sliced pair
    emission + an all_to_all by band — each device sorts/gathers ~1/8 of
    the pairs; proven bit-exact under shard_map in dryrun scene 8).
    Pre-flight: audit_bands (runs the REAL shared binning host-side) AND a
    render-time overflow fetch."""
    from dtrenderer_tpu.models.scenes import make_config5
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.utils.benchlib import device_time

    spec = make_config5(extra_opts=dict(row_bands=8))
    rep = spec.bands_audit(8)
    print(f"bench(4k band8): band audit ok={rep['ok']} "
          f"max_band_tris={max(rep['band_tris'])}/{rep['shard_budget']} "
          f"max_band_pairs={max(rep['band_pairs'])}/{rep['pair_budget']}",
          file=sys.stderr)
    assert rep["ok"], f"banded config-5 audit failed: {rep}"

    fb0 = fblib.create(spec.height, spec.width)
    _, _, ov = jax.jit(
        functools.partial(spec.frame, return_counters=True)
    )(fb0.color, fb0.depth, jnp.float32(0.5))
    ov = int(np.asarray(ov))
    assert ov == 0, f"banded config-5 drops {ov} pairs at render time"

    return device_time(spec.frame, fb0.color, fb0.depth, jnp.float32(0.5),
                       iters=4, repeats=3)


def run_soup_bench(h, w, on_tpu):
    """Triangle-throughput scene: 200k-tri soup @1080p, zero-overflow audited
    (tuned raster_opts from tools/tune.py sweeps; ARCHITECTURE.md 'Soup')."""
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import DrawSpec, audit_scene, draw_meshes
    from dtrenderer_tpu.utils import math3d as m3
    from dtrenderer_tpu.utils.benchlib import device_time

    n_tris = 200_000 if on_tpu else 2_000
    soup = primitives.random_triangle_soup(n_tris, rng_seed=11, extent=1.6)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))
    # tuned via tools/tune_soup.py: tile16/cap512/cols2, NO slab culling — at
    # 2 slabs the y-sort binning machinery costs more than the cull saves for
    # 200k tiny tris; cols=2 amortizes per-grid-step overhead (cols 3/5 lose).
    raster_opts = dict(tile_h=16, capacity=512, small_span=8,
                       use_ybounds=False, cols=2, batch_rows=16)

    draws = [DrawSpec(soup, mdl, shading="gouraud")]
    overflow, maxcount, cap = audit_scene(proj, draws, h, w, near_clip=False,
                                          raster_opts=raster_opts)
    print(f"bench(soup): bin audit overflow={overflow} maxcount={maxcount}/{cap}",
          file=sys.stderr)
    assert overflow == 0, "soup bin overflow — results would be fake"

    def frame(color, depth, t):
        fb = fblib.Framebuffer(color=color, depth=depth)
        fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
        # identity at runtime; ties the raster chain to the timing loop (see
        # the fill-rate scene for why).
        rot_t = m3.rotate_y(t - jnp.float32(0.5))
        fb = draw_meshes(fb, proj,
                         [DrawSpec(soup, m3.mat4mul(mdl, rot_t), shading="gouraud")],
                         sampling_mode="nearest", near_clip=False,
                         raster_opts=raster_opts)
        return fb.color, fb.depth

    fb0 = fblib.create(h, w)
    dt = device_time(frame, fb0.color, fb0.depth, jnp.float32(0.5), iters=8, repeats=3)
    mtris = n_tris / dt / 1e6
    print(f"bench(soup): {dt*1000:.2f} ms/frame, {mtris:.2f} Mtris/s "
          f"({n_tris} tris)", file=sys.stderr)
    return n_tris, dt, mtris


if __name__ == "__main__":
    main()
