"""Mesh representation: welded, array-first.

TPU-native counterpart of the reference's `DTRMesh {DqnV4 *vertexes; DqnV3 *texUV;
DqnV3 *normals; DTRMeshFace *faces}` (SURVEY.md §2 #5). The reference keeps OBJ-style
separate index spaces per face corner; here the loader WELDS unique (v, vt, vn) triples
into a single unified vertex buffer so every per-vertex attribute gathers with one index
— the layout the TPU vertex pipeline (batched matmul + one gather) wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


class Mesh(NamedTuple):
    verts: jnp.ndarray    # f32 [N, 3] model-space positions
    uv: jnp.ndarray       # f32 [N, 2] texcoords (v up, Wavefront convention)
    normals: jnp.ndarray  # f32 [N, 3] vertex normals (unnormalized ok)
    faces: jnp.ndarray    # i32 [T, 3] indices into the welded vertex buffer

    @property
    def num_tris(self) -> int:
        return self.faces.shape[0]


def make_mesh(verts, uv=None, normals=None, faces=None) -> Mesh:
    verts = jnp.asarray(verts, F32)
    n = verts.shape[0]
    if faces is None:
        faces = jnp.arange(n, dtype=jnp.int32).reshape(-1, 3)
    else:
        faces = jnp.asarray(faces, jnp.int32)
    if uv is None:
        uv = jnp.zeros((n, 2), F32)
    else:
        uv = jnp.asarray(uv, F32)
    if normals is None:
        normals = compute_vertex_normals(np.asarray(verts), np.asarray(faces))
        normals = jnp.asarray(normals, F32)
    else:
        normals = jnp.asarray(normals, F32)
    return Mesh(verts=verts, uv=uv, normals=normals, faces=faces)


def compute_vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (host-side; used when the asset has none)."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )
    out = np.zeros_like(verts)
    for c in range(3):
        np.add.at(out, faces[:, c], fn)
    norms = np.linalg.norm(out, axis=-1, keepdims=True)
    norms[norms == 0] = 1.0
    return (out / norms).astype(np.float32)


def weld(positions, pos_idx, uvs=None, uv_idx=None, normals=None, n_idx=None):
    """Weld OBJ-style multi-index faces into a unified vertex buffer.

    positions: [Nv,3] f32; pos_idx/uv_idx/n_idx: [T,3] int per-corner indices
    (uv/n may be None). Returns (verts, uv, normals_or_None, faces) numpy arrays.
    """
    pos_idx = np.asarray(pos_idx, np.int64)
    t = pos_idx.shape[0]
    uvi = np.asarray(uv_idx, np.int64) if uv_idx is not None else np.full((t, 3), -1)
    nni = np.asarray(n_idx, np.int64) if n_idx is not None else np.full((t, 3), -1)
    key = np.stack([pos_idx, uvi, nni], axis=-1).reshape(-1, 3)  # [T*3, 3]
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    faces = inverse.reshape(t, 3).astype(np.int32)
    verts = np.asarray(positions, np.float32)[uniq[:, 0]]
    # -1 is the "corner has no vt/vn" sentinel (mixed OBJ faces): mask those rows
    # to zero instead of letting -1 silently index the LAST uv/normal.
    if uvs is not None and uv_idx is not None:
        ui = uniq[:, 1]
        uv = np.asarray(uvs, np.float32)[np.maximum(ui, 0)]
        uv[ui < 0] = 0.0
    else:
        uv = np.zeros((uniq.shape[0], 2), np.float32)
    if normals is not None and n_idx is not None:
        ni = uniq[:, 2]
        normals = np.asarray(normals, np.float32)[np.maximum(ni, 0)]
        normals[ni < 0] = 0.0  # zero normal -> ambient-lit (FORMULAS.md guard)
    else:
        normals = None
    return verts, uv, normals, faces
