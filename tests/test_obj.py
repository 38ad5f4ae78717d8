"""OBJ parser tests (DTRAsset_LoadWavefrontObj parity surface, SURVEY.md §2 #5)."""

import numpy as np

from dtrenderer_tpu.assets.obj import load_obj_text, parse_obj_text

CUBE_OBJ = """
# simple quad cube-ish fixture
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
"""


def test_quad_fan_triangulation():
    mesh = load_obj_text(CUBE_OBJ)
    assert mesh.faces.shape == (2, 3)
    assert mesh.verts.shape[0] == 4  # welded: each (v,vt,vn) triple unique
    v = np.asarray(mesh.verts)
    assert set(map(tuple, v.tolist())) == {
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)
    }
    n = np.asarray(mesh.normals)
    assert np.allclose(n, [[0, 0, 1]] * 4)


def test_negative_indices_and_missing_fields():
    txt = """
v 0 0 0
v 2 0 0
v 0 2 0
f -3 -2 -1
"""
    mesh = load_obj_text(txt)
    assert mesh.faces.shape == (1, 3)
    assert np.allclose(np.asarray(mesh.uv), 0.0)
    # normals computed from geometry (area-weighted): +z for CCW in xy
    assert np.allclose(np.asarray(mesh.normals), [[0, 0, 1]] * 3)


def test_v_slash_slash_vn():
    txt = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 1 0
f 1//1 2//1 3//1
"""
    pos, uvs, norms, pi, ti, ni = parse_obj_text(txt)
    assert uvs is None and ti is None
    assert norms.shape == (1, 3)
    assert (ni == 0).all()


def test_welding_dedups_shared_corners():
    # two triangles sharing two verts with same vt/vn -> 4 unique welded verts
    txt = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
f 1/1 2/1 3/1
f 1/1 3/1 4/1
"""
    mesh = load_obj_text(txt)
    assert mesh.verts.shape[0] == 4
    assert mesh.faces.shape == (2, 3)
