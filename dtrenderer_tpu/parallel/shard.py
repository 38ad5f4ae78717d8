"""Multi-chip parallel rendering: framebuffer-domain decomposition over a JAX mesh.

TPU-native replacement for the reference's ONLY parallel mechanism — the Win32
worker-thread job queue that spreads per-region rasterization jobs across cores
(SURVEY.md §2 "P-THREAD", CS-5). On TPU the framebuffer itself is the parallel axis:
each device owns a horizontal band (rows mesh axis) or a (row, col) tile (rows x cols
2D mesh) of the frame, rasterizes the replicated scene against just its pixels via
shard_map, and shades locally. Pixel ownership is disjoint, so no inter-device
reduction is needed for z-buffering; assembling the display image is a single
all-gather over ICI (implicit in the output sharding). A leading batch-of-frames
axis ("frames") gives the data-parallel analog: independent frames on independent
device groups.

Axes:
  "frames" — data parallel over a batch of frames (optional leading axis)
  "rows"   — spatial decomposition of the framebuffer into row bands
  "cols"   — optional second spatial axis: column bands (rows x cols = 2D tiles)
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from dtrenderer_tpu.ops import pipeline
from dtrenderer_tpu.ops.fb import Framebuffer


def make_mesh(frames: int = 1, rows: int | None = None, cols: int = 1,
              devices: Sequence[jax.Device] | None = None) -> DeviceMesh:
    """Build a ("frames", "rows", "cols") device mesh.

    rows defaults to n_devices // (frames * cols). cols=1 (the default) is the
    pure row-band decomposition; cols>1 tiles the frame 2D (each device owns a
    rows x cols rectangle)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if rows is None:
        rows = n // (frames * cols)
    assert frames * rows * cols <= n, (
        f"mesh {frames}x{rows}x{cols} needs > {n} devices")
    dev_array = np.array(devices[: frames * rows * cols]).reshape(
        frames, rows, cols)
    return DeviceMesh(dev_array, ("frames", "rows", "cols"))


def create_sharded_fb(height: int, width: int, mesh: DeviceMesh,
                      batch: int | None = None) -> Framebuffer:
    """Framebuffer sharded rows over "rows" and columns over "cols".

    With batch != None, a leading frames axis sharded over "frames".
    """
    cax = ("cols",) if "cols" in mesh.shape else ()
    if batch is None:
        cspec = NamedSharding(mesh, P("rows", *cax, None))
        dspec = NamedSharding(mesh, P("rows", *cax))
        color = jnp.zeros((height, width, 4), jnp.float32, device=cspec)
        depth = jnp.full((height, width), jnp.inf, jnp.float32, device=dspec)
    else:
        cspec = NamedSharding(mesh, P("frames", "rows", *cax, None))
        dspec = NamedSharding(mesh, P("frames", "rows", *cax))
        color = jnp.zeros((batch, height, width, 4), jnp.float32, device=cspec)
        depth = jnp.full((batch, height, width), jnp.inf, jnp.float32, device=dspec)
    return Framebuffer(color=color, depth=depth)


def _tile_dims(fb_hw, device_mesh: DeviceMesh):
    """(band_h, band_w) of each device's tile, asserting divisibility."""
    n_rows = device_mesh.shape["rows"]
    n_cols = device_mesh.shape.get("cols", 1)
    height, width = fb_hw
    assert height % n_rows == 0, f"height {height} not divisible by {n_rows} bands"
    assert width % n_cols == 0, f"width {width} not divisible by {n_cols} columns"
    return height // n_rows, width // n_cols


def draw_mesh_sharded(fb: Framebuffer, mesh_obj, model, view_proj,
                      device_mesh: DeviceMesh, **kwargs) -> Framebuffer:
    """draw_mesh over a row- (and optionally column-) sharded framebuffer.

    Scene inputs (mesh/model/textures/light) are replicated; each device runs the
    full vertex pipeline (cheap) and rasterizes + shades only its tile.
    """
    height, width = fb.depth.shape
    band_h, band_w = _tile_dims((height, width), device_mesh)
    has_cols = "cols" in device_mesh.shape

    # SHARED cross-band binning (render_fused.render_fused_rowbands): when
    # the raster opts request row_bands, each device consumes its own band
    # window of the ONE shared binning table — pass its band index in. The
    # binning compute is replicated (identical on every chip, so it runs
    # CONCURRENTLY on real hardware); only the kernel work is per-band.
    ro = kwargs.get("raster_opts")
    shared_bands = bool(ro and int(ro.get("row_bands", 1) or 1) > 1
                        and ro.get("flat_bins")
                        and ro.get("band_shared", True))
    if shared_bands:
        assert not has_cols or device_mesh.shape.get("cols", 1) == 1, (
            "shared cross-band binning shards rows only")
        assert int(ro["row_bands"]) == device_mesh.shape["rows"], (
            f"raster_opts row_bands ({ro['row_bands']}) must equal the mesh "
            f"rows axis ({device_mesh.shape['rows']})")

    def band_fn(color_b, depth_b):
        y0 = jax.lax.axis_index("rows") * band_h
        x0 = jax.lax.axis_index("cols") * band_w if has_cols else 0
        kw = dict(kwargs)
        if shared_bands:
            kw["raster_opts"] = dict(ro, band_index=jax.lax.axis_index("rows"))
        out = pipeline.draw_mesh(
            Framebuffer(color=color_b, depth=depth_b),
            mesh_obj, model, view_proj,
            frame_height=height, frame_width=width, y_offset=y0, x_offset=x0,
            **kw,
        )
        return out.color, out.depth

    cax = ("cols",) if has_cols else ()
    color, depth = shard_map(
        band_fn,
        mesh=device_mesh,
        in_specs=(P("rows", *cax, None), P("rows", *cax)),
        out_specs=(P("rows", *cax, None), P("rows", *cax)),
        check_vma=False,
    )(fb.color, fb.depth)
    return Framebuffer(color=color, depth=depth)


def draw_mesh_ordered_sharded(fb: Framebuffer, mesh_obj, model, view_proj,
                              device_mesh: DeviceMesh, **kwargs) -> Framebuffer:
    """draw_mesh_ordered (reference-order translucent blend + depth write)
    over a row-/column-sharded framebuffer.

    Pixel ownership is disjoint, so per-tile submission order IS global
    order: each device blends its band's triangles sequentially via the
    ordered tile kernel (raster_ordered) with the band's frame offsets, and
    the assembled image matches the single-device ordered render exactly —
    the reference's blend semantics survive the framebuffer decomposition
    (SURVEY.md §2 #4 + P-THREAD)."""
    height, width = fb.depth.shape
    band_h, band_w = _tile_dims((height, width), device_mesh)
    has_cols = "cols" in device_mesh.shape

    def band_fn(color_b, depth_b):
        y0 = jax.lax.axis_index("rows") * band_h
        x0 = jax.lax.axis_index("cols") * band_w if has_cols else 0
        out = pipeline.draw_mesh_ordered(
            Framebuffer(color=color_b, depth=depth_b),
            mesh_obj, model, view_proj,
            frame_height=height, frame_width=width, y_offset=y0, x_offset=x0,
            **kwargs,
        )
        return out.color, out.depth

    cax = ("cols",) if has_cols else ()
    color, depth = shard_map(
        band_fn,
        mesh=device_mesh,
        in_specs=(P("rows", *cax, None), P("rows", *cax)),
        out_specs=(P("rows", *cax, None), P("rows", *cax)),
        check_vma=False,
    )(fb.color, fb.depth)
    return Framebuffer(color=color, depth=depth)


def render_frames_sharded(render_band_fn, fb: Framebuffer,
                          device_mesh: DeviceMesh, frame_args) -> Framebuffer:
    """Batched multi-frame render: "frames" data-parallel x "rows"/"cols" spatial.

    render_band_fn(band_fb, frame_arg, y0, frame_h, frame_w, x0=0) -> band_fb
    must be a pure per-tile frame function (it can call pipeline.draw_mesh with
    the given offsets). On a rows-only mesh (cols=1) x0 is always 0, and
    legacy 5-arg band functions (no x0 parameter) are accepted. fb: batched
    sharded framebuffer from create_sharded_fb(batch=...). frame_args: pytree
    whose leaves have a leading [batch] axis (per-frame params, e.g. rotation
    angles) — sharded over "frames".
    """
    import inspect

    n_rows = device_mesh.shape["rows"]
    n_cols = device_mesh.shape.get("cols", 1)
    n_frames = device_mesh.shape["frames"]
    batch, height, width = fb.depth.shape
    assert height % n_rows == 0 and batch % n_frames == 0
    band_h, band_w = _tile_dims((height, width), device_mesh)
    # legacy band functions take (fb, arg, y0, fh, fw); pass x0 only when the
    # callee accepts it (keeps every rows-only caller working unchanged)
    try:
        takes_x0 = len(inspect.signature(render_band_fn).parameters) >= 6
    except (TypeError, ValueError):
        takes_x0 = False

    has_cols = "cols" in device_mesh.shape

    def shard_fn(color_b, depth_b, args_b):
        y0 = jax.lax.axis_index("rows") * band_h
        x0 = jax.lax.axis_index("cols") * band_w if has_cols else 0

        def one_frame(color_1, depth_1, args_1):
            fb1 = Framebuffer(color=color_1, depth=depth_1)
            if takes_x0:
                out = render_band_fn(fb1, args_1, y0, height, width, x0)
            else:
                out = render_band_fn(fb1, args_1, y0, height, width)
            return out.color, out.depth

        color_o, depth_o = jax.vmap(one_frame)(color_b, depth_b, args_b)
        return color_o, depth_o

    cax = ("cols",) if has_cols else ()
    arg_specs = jax.tree.map(lambda _: P("frames"), frame_args)
    color, depth = shard_map(
        shard_fn,
        mesh=device_mesh,
        in_specs=(
            P("frames", "rows", *cax, None),
            P("frames", "rows", *cax),
            arg_specs,
        ),
        out_specs=(
            P("frames", "rows", *cax, None),
            P("frames", "rows", *cax),
        ),
        check_vma=False,
    )(fb.color, fb.depth, frame_args)
    return Framebuffer(color=color, depth=depth)


def gather_image(fb: Framebuffer) -> np.ndarray:
    """Assemble the full frame on host (final ICI all-gather + DCN fetch)."""
    return np.asarray(jax.device_get(fb.color))
