"""Unit tests for utils/math3d (the dqn.h-math-layer replacement, SURVEY.md §2 #7)."""

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.utils import math3d as m3


def test_identity_and_translate():
    p = jnp.array([[1.0, 2.0, 3.0, 1.0]])
    assert np.allclose(m3.transform_points(p, m3.identity()), p)
    t = m3.translate([10.0, -5.0, 2.0])
    out = np.asarray(m3.transform_points(p, t))
    assert np.allclose(out, [[11.0, -3.0, 5.0, 1.0]])


def test_scale_rotate():
    p = jnp.array([[1.0, 0.0, 0.0, 1.0]])
    s = m3.scale([2.0, 3.0, 4.0])
    assert np.allclose(m3.transform_points(p, s), [[2.0, 0.0, 0.0, 1.0]])
    rz = m3.rotate_z(jnp.pi / 2)
    out = np.asarray(m3.transform_points(p, rz))
    assert np.allclose(out, [[0.0, 1.0, 0.0, 1.0]], atol=1e-6)
    ry = m3.rotate_y(jnp.pi / 2)
    out = np.asarray(m3.transform_points(p, ry))
    assert np.allclose(out, [[0.0, 0.0, -1.0, 1.0]], atol=1e-6)
    rx = m3.rotate_x(jnp.pi / 2)
    p2 = jnp.array([[0.0, 1.0, 0.0, 1.0]])
    out = np.asarray(m3.transform_points(p2, rx))
    assert np.allclose(out, [[0.0, 0.0, 1.0, 1.0]], atol=1e-6)


def test_rotate_axis_matches_axis_aligned():
    theta = 0.7
    for axis, ref in [((1, 0, 0), m3.rotate_x(theta)),
                      ((0, 1, 0), m3.rotate_y(theta)),
                      ((0, 0, 1), m3.rotate_z(theta))]:
        got = np.asarray(m3.rotate_axis(axis, theta))
        assert np.allclose(got, np.asarray(ref), atol=1e-6), axis


def test_perspective_maps_near_far():
    proj = m3.perspective(np.pi / 2, 1.0, 1.0, 10.0)
    near = m3.transform_points(jnp.array([[0.0, 0.0, -1.0, 1.0]]), proj)
    far = m3.transform_points(jnp.array([[0.0, 0.0, -10.0, 1.0]]), proj)
    near = np.asarray(near)[0]
    far = np.asarray(far)[0]
    assert np.isclose(near[2] / near[3], -1.0, atol=1e-5)
    assert np.isclose(far[2] / far[3], 1.0, atol=1e-5)
    assert near[3] > 0  # in front of camera -> positive clip w


def test_look_at_eye_maps_to_origin():
    view = m3.look_at([1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    out = np.asarray(m3.transform_points(jnp.array([[1.0, 2.0, 3.0, 1.0]]), view))
    assert np.allclose(out[0, :3], 0.0, atol=1e-5)
    # Target is in front of the camera (negative view-space z).
    tgt = np.asarray(m3.transform_points(jnp.array([[0.0, 0.0, 0.0, 1.0]]), view))
    assert tgt[0, 2] < 0


def test_normalize_and_cross():
    v = jnp.array([3.0, 0.0, 4.0])
    n = np.asarray(m3.normalize(v))
    assert np.allclose(np.linalg.norm(n), 1.0, atol=1e-6)
    c = np.asarray(m3.cross(jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])))
    assert np.allclose(c, [0.0, 0.0, 1.0])


def test_transform_points_matches_numpy_matmul():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((17, 4)).astype(np.float32)
    m = rng.standard_normal((4, 4)).astype(np.float32)
    got = np.asarray(m3.transform_points(jnp.asarray(pts), jnp.asarray(m)))
    want = pts @ m.T
    assert np.allclose(got, want, atol=1e-4)


def test_mat4mul_exact_vs_reference_order():
    """mat4mul must equal the FORMULAS.md accumulation order bit-for-bit (no
    MXU, no bf16 — the TPU default-precision matmul corrupts MVPs)."""
    import numpy as np
    import jax.numpy as jnp

    from dtrenderer_tpu.utils import math3d as m3

    rng = np.random.default_rng(3)
    for _ in range(5):
        a = rng.uniform(-4, 4, (4, 4)).astype(np.float32)
        b = rng.uniform(-4, 4, (4, 4)).astype(np.float32)
        want = (a[:, 0:1] * b[0:1] + a[:, 1:2] * b[1:2]) + (
            a[:, 2:3] * b[2:3] + a[:, 3:4] * b[3:4])
        got = np.asarray(m3.mat4mul(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(want.astype(np.float32), got)
