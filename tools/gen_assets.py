"""Generate the repo's data/ assets (the reference's data/ dir analog, SURVEY.md §2
#11) — procedurally, so they are reproducible: a ~5k-triangle organic "head" OBJ
(deformed sphere, config-3 subject) and a small PNG texture.

Run: python tools/gen_assets.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def head_obj(n_lat=50, n_lon=52, seed=3):
    """Deformed uv-sphere with smooth pseudo-noise bumps -> OBJ text (~5k tris)."""
    rng = np.random.default_rng(seed)
    lats = np.linspace(0, np.pi, n_lat + 1)
    lons = np.linspace(0, 2 * np.pi, n_lon + 1)
    lat, lon = np.meshgrid(lats, lons, indexing="ij")

    # smooth radial displacement: a few random spherical harmonics-ish waves
    r = np.ones_like(lat)
    for _ in range(6):
        fl = rng.integers(1, 5)
        fm = rng.integers(1, 6)
        amp = rng.uniform(0.02, 0.09)
        ph = rng.uniform(0, 2 * np.pi)
        r += amp * np.sin(fl * lat + ph) * np.cos(fm * lon)
    # elongate into a head-ish ellipsoid
    x = r * np.sin(lat) * np.cos(lon) * 0.8
    y = r * np.cos(lat) * 1.1
    z = r * np.sin(lat) * np.sin(lon) * 0.9

    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    u = lon / (2 * np.pi)
    v = 1.0 - lat / np.pi
    uvs = np.stack([u, v], -1).reshape(-1, 2)

    stride = n_lon + 1
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * stride + j
            b = a + 1
            c = a + stride
            d = c + 1
            if i > 0:
                faces.append((a, b, c))
            if i < n_lat - 1:
                faces.append((b, d, c))

    lines = [f"# procedurally generated head-ish mesh ({len(faces)} tris)"]
    for p in verts:
        lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    for t in uvs:
        lines.append(f"vt {t[0]:.6f} {t[1]:.6f}")
    for f in faces:
        lines.append(
            f"f {f[0]+1}/{f[0]+1} {f[1]+1}/{f[1]+1} {f[2]+1}/{f[2]+1}"
        )
    return "\n".join(lines) + "\n", len(faces)


def texture_png(path, size=128, seed=5):
    from PIL import Image

    rng = np.random.default_rng(seed)
    u = np.linspace(0, 4 * np.pi, size)
    a, b = np.meshgrid(u, u, indexing="xy")
    r = (0.55 + 0.45 * np.sin(a + 0.7 * b)) * 255
    g = (0.55 + 0.45 * np.sin(1.3 * b - a * 0.4)) * 255
    bl = (0.55 + 0.45 * np.sin(0.6 * a * b / (4 * np.pi))) * 255
    noise = rng.integers(-12, 12, (size, size, 3))
    rgb = np.clip(np.stack([r, g, bl], -1) + noise, 0, 255).astype(np.uint8)
    rgba = np.concatenate([rgb, np.full((size, size, 1), 255, np.uint8)], -1)
    Image.fromarray(rgba, "RGBA").save(path)


def main():
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")
    os.makedirs(root, exist_ok=True)
    obj_text, n = head_obj()
    with open(os.path.join(root, "head.obj"), "w") as f:
        f.write(obj_text)
    print(f"wrote data/head.obj ({n} tris)")
    texture_png(os.path.join(root, "texture.png"))
    print("wrote data/texture.png")


if __name__ == "__main__":
    main()
