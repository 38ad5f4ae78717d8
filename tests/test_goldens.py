"""Golden-image regression tests.

Renders small deterministic frames of BASELINE configs 1-3 on the CPU ref backend
and compares packed u8 output against committed golden PNGs (tests/goldens/).
The oracle tests prove correctness; goldens catch UNINTENDED changes (a formula
edit that shifts every path together would pass parity but fail here).

Regenerate after an INTENTIONAL change: python tests/test_goldens.py --regen
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")  # goldens are CPU-rendered

import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _render_cases():
    from dtrenderer_tpu.models import scenes
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.utils.color import pack_srgb_u8

    for n in (1, 2, 3):
        spec = scenes.ALL_CONFIGS[n](width=160, height=120, backend="ref")
        fb0 = fblib.create(spec.height, spec.width)
        color, _ = jax.jit(spec.frame)(fb0.color, fb0.depth, jnp.float32(0.6))
        yield spec.name, np.asarray(pack_srgb_u8(color))


def test_goldens_match():
    from PIL import Image

    missing = []
    for name, img in _render_cases():
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        if not os.path.exists(path):
            missing.append(name)
            continue
        want = np.asarray(Image.open(path), np.uint8)
        diff = np.abs(img.astype(int) - want.astype(int))
        assert diff.max() <= 1, (
            f"{name}: golden mismatch (max diff {diff.max()}, "
            f"{(diff > 1).sum()} channels >1) — regenerate only if intentional: "
            f"python tests/test_goldens.py --regen"
        )
    assert not missing, f"missing goldens {missing}: python tests/test_goldens.py --regen"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        from PIL import Image

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, img in _render_cases():
            Image.fromarray(img, "RGBA").save(os.path.join(GOLDEN_DIR, f"{name}.png"))
            print(f"wrote goldens/{name}.png")
    else:
        print(__doc__)
