"""Lighting and shading terms.

Counterpart of the reference's light dot-product shading inside DTRRender_Triangle /
DTRRender_Mesh (SURVEY.md §2 #4: "light dot-product shading"; light params passed to
mesh submit). Modes mirror the BASELINE configs: flat (config 1/2), Gouraud (config 3),
per-pixel Phong (config 4). Formulas: FORMULAS.md §"Lighting".
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

F32 = jnp.float32

SHADING_NONE = "none"
SHADING_FLAT = "flat"
SHADING_GOURAUD = "gouraud"
SHADING_PHONG = "phong"


class Light(NamedTuple):
    """Directional light. direction points FROM the surface TOWARD the light."""
    direction: jnp.ndarray  # f32 [3], need not be normalized
    ambient: jnp.ndarray    # f32 scalar in [0,1]


def make_light(direction=(0.0, 0.0, 1.0), ambient=0.1) -> Light:
    return Light(
        direction=jnp.asarray(direction, F32),
        ambient=jnp.asarray(ambient, F32),
    )


def normalize_exact(v):
    """v / sqrt(dot(v,v)) — FORMULAS.md: true divide + sqrt, no rsqrt.

    Zero-length vectors pass through unchanged (dot == 0 -> divide by 1), so a
    degenerate interpolated normal yields ndl = 0 (ambient-lit), matching the
    fused kernel's d > 0 guard and the oracle."""
    d = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.where(d > 0, d, F32(1.0)))


def lambert(normals, light: Light):
    """max(dot(n_hat, l_hat), 0) for [..., 3] normals."""
    n = normalize_exact(normals)
    l = normalize_exact(light.direction)
    ndl = jnp.sum(n * l, axis=-1)
    return jnp.maximum(ndl, F32(0.0))


def light_term(normals, light: Light):
    """ambient + (1-ambient) * lambert, per FORMULAS.md."""
    ndl = lambert(normals, light)
    return light.ambient + (F32(1.0) - light.ambient) * ndl


def apply_light(rgba, term):
    """Scale rgb by the scalar light term, alpha untouched. rgba [..., 4]."""
    return jnp.concatenate(
        [rgba[..., :3] * term[..., None], rgba[..., 3:4]], axis=-1
    )
