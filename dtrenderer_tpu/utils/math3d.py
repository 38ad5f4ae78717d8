"""3D math: vectors, 4x4 matrices, projection/viewport transforms.

TPU-native replacement for the reference's `dqn.h` math layer (SURVEY.md §2 #7:
DqnV2/V3/V4, DqnMat4 identity/translate/rotate/scale/perspective, mul, mulV4): instead
of scalar vector structs, everything here operates on batched jnp arrays ([..., 3] /
[..., 4] points, [4, 4] matrices) so vertex transforms compile to fused elementwise ops
or MXU matmuls.

Matrices act on COLUMN vectors (v' = M @ v); batched points of shape [N, 4] transform as
`points @ M.T` (see `transform_points`). Conventions in FORMULAS.md.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Vector helpers (work on [..., 3] or [..., 4])
# ---------------------------------------------------------------------------

def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v):
    # FORMULAS.md: true divide + sqrt, no rsqrt fast path (oracle parity).
    return v / jnp.sqrt(dot(v, v))[..., None]


def lerp(a, b, t):
    return a + (b - a) * t


def homogenize(p3):
    """[..., 3] points -> [..., 4] with w=1."""
    return jnp.concatenate([p3, jnp.ones(p3.shape[:-1] + (1,), p3.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# Mat4 constructors (all return f32 [4,4])
# ---------------------------------------------------------------------------

def identity():
    return jnp.eye(4, dtype=F32)


def translate(t):
    t = jnp.asarray(t, F32)
    m = jnp.eye(4, dtype=F32)
    return m.at[:3, 3].set(t)


def scale(s):
    s = jnp.broadcast_to(jnp.asarray(s, F32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), F32)]))


def rotate_x(theta):
    theta = jnp.asarray(theta, F32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array(
        [[1, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], F32
    ).at[1, 1].set(c).at[1, 2].set(-s).at[2, 1].set(s).at[2, 2].set(c)


def rotate_y(theta):
    theta = jnp.asarray(theta, F32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array(
        [[0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], F32
    ).at[0, 0].set(c).at[0, 2].set(s).at[2, 0].set(-s).at[2, 2].set(c)


def rotate_z(theta):
    theta = jnp.asarray(theta, F32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array(
        [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], F32
    ).at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)


def rotate_axis(axis, theta):
    """Rodrigues rotation about a (not necessarily unit) axis."""
    axis = normalize(jnp.asarray(axis, F32))
    theta = jnp.asarray(theta, F32)
    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    C = 1.0 - c
    r = jnp.stack(
        [
            jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s]),
            jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s]),
            jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C]),
        ]
    )
    m = jnp.eye(4, dtype=F32)
    return m.at[:3, :3].set(r)


def perspective(fov_y_rad, aspect, z_near, z_far):
    """OpenGL-style right-handed perspective; maps z to NDC [-1, 1]."""
    f = 1.0 / np.tan(float(fov_y_rad) / 2.0)
    zn, zf = float(z_near), float(z_far)
    return jnp.array(
        [
            [f / float(aspect), 0, 0, 0],
            [0, f, 0, 0],
            [0, 0, (zf + zn) / (zn - zf), (2.0 * zf * zn) / (zn - zf)],
            [0, 0, -1, 0],
        ],
        F32,
    )


def orthographic(left, right, bottom, top, z_near, z_far):
    l, r, b, t, zn, zf = map(float, (left, right, bottom, top, z_near, z_far))
    return jnp.array(
        [
            [2.0 / (r - l), 0, 0, -(r + l) / (r - l)],
            [0, 2.0 / (t - b), 0, -(t + b) / (t - b)],
            [0, 0, -2.0 / (zf - zn), -(zf + zn) / (zf - zn)],
            [0, 0, 0, 1],
        ],
        F32,
    )


def look_at(eye, target, up):
    eye = jnp.asarray(eye, F32)
    fwd = normalize(jnp.asarray(target, F32) - eye)
    right = normalize(cross(fwd, jnp.asarray(up, F32)))
    up2 = cross(right, fwd)
    rot = jnp.stack([right, up2, -fwd])  # world -> view rotation rows
    m = jnp.eye(4, dtype=F32)
    m = m.at[:3, :3].set(rot)
    # explicit mat3·vec (exact f32; see mat4mul for why not `@`)
    t = -(rot[:, 0] * eye[0] + rot[:, 1] * eye[1] + rot[:, 2] * eye[2])
    return m.at[:3, 3].set(t)


def mat4mul(a, b):
    """Exact 4x4 composition in fixed op order (FORMULAS.md).

    NEVER use the `@` operator to compose matrices that reach the device: on
    TPU the default-precision matmul runs with bfloat16 inputs and corrupts the
    MVP badly enough to cull entire meshes (verified on hardware). This
    broadcast form lowers to exact f32 VPU ops with the same accumulation
    order as transform_points: out_ij = (a_i0*b_0j + a_i1*b_1j) + (a_i2*b_2j
    + a_i3*b_3j). Chains left-assoc: mat4mul(mat4mul(T, R), S).
    """
    a = jnp.asarray(a, F32)
    b = jnp.asarray(b, F32)
    return (a[:, 0:1] * b[0:1, :] + a[:, 1:2] * b[1:2, :]) + (
        a[:, 2:3] * b[2:3, :] + a[:, 3:4] * b[3:4, :]
    )


def transform_points(points4, mat4):
    """Batched v' = M @ v for points of shape [..., 4].

    Written in explicit broadcast form (not jnp.dot) so the op order is
    deterministic and matches the NumPy oracle exactly (FORMULAS.md contract):
    out_i = ((m_i0*x + m_i1*y) + (m_i2*z + m_i3*w)).
    """
    x = points4[..., 0:1]
    y = points4[..., 1:2]
    z = points4[..., 2:3]
    w = points4[..., 3:4]
    m = mat4
    return jnp.concatenate(
        [
            (m[0, 0] * x + m[0, 1] * y) + (m[0, 2] * z + m[0, 3] * w),
            (m[1, 0] * x + m[1, 1] * y) + (m[1, 2] * z + m[1, 3] * w),
            (m[2, 0] * x + m[2, 1] * y) + (m[2, 2] * z + m[2, 3] * w),
            (m[3, 0] * x + m[3, 1] * y) + (m[3, 2] * z + m[3, 3] * w),
        ],
        axis=-1,
    )


def transform_directions(dirs3, mat4):
    """Rotate/scale [..., 3] direction vectors by the upper 3x3 (no translation)."""
    x = dirs3[..., 0:1]
    y = dirs3[..., 1:2]
    z = dirs3[..., 2:3]
    m = mat4
    return jnp.concatenate(
        [
            (m[0, 0] * x + m[0, 1] * y) + m[0, 2] * z,
            (m[1, 0] * x + m[1, 1] * y) + m[1, 2] * z,
            (m[2, 0] * x + m[2, 1] * y) + m[2, 2] * z,
        ],
        axis=-1,
    )


def model_matrix(position=(0.0, 0.0, 0.0), rotation=None, scale_v=1.0):
    """Convenience: T @ R @ S, mirroring the reference's per-mesh
    pos/rotation/scale submit parameters (SURVEY.md CS-2 DTRRender_Mesh)."""
    r = identity() if rotation is None else rotation
    return mat4mul(mat4mul(translate(position), r), scale(scale_v))
