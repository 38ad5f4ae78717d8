"""Hardware-gate stamping: did THIS kernel code ever compile+run on a real TPU?

The automated suite runs Pallas in interpret mode on CPU (tests/conftest.py),
and interpret mode accepts programs Mosaic rejects on hardware (CLAUDE.md
"Platform gotchas") — so a kernel edit can ship green without ever having
compiled on a chip. tools/tpu_smoke.py is the gate; this module makes it
ENFORCEABLE: on success the smoke test writes a stamp file keyed by a content
hash of the kernel sources, and bench.py refuses to stay quiet when the stamp
is missing or stale. Editing any kernel file invalidates the stamp (content
hash, not git sha: uncommitted edits count), while unrelated edits keep it.
"""

from __future__ import annotations

import hashlib
import os

# The files whose edits can change the device programs that reach Mosaic.
# Not just the Pallas kernels: pipeline payload packing / clipping / banding,
# geometry setup, sampling/shading formulas, and math3d all shape the traced
# programs (the round-3 gate hashed only 3 files, leaving a blind spot exactly
# one directory wide) — so the gate hashes ALL of ops/ plus math3d.
def _kernel_files() -> tuple[str, ...]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ops = sorted(
        os.path.join("ops", f)
        for f in os.listdir(os.path.join(root, "ops"))
        if f.endswith(".py")
    )
    return tuple(ops) + ("utils/math3d.py",)


KERNEL_FILES = _kernel_files()

STAMP_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def kernel_hash() -> str:
    """16-hex content hash of every source that shapes a device program."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in KERNEL_FILES:
        with open(os.path.join(root, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def stamp_path() -> str:
    return os.path.join(STAMP_DIR, f"smoke_ok_{kernel_hash()}")


def write_stamp() -> str:
    """Record a successful hardware smoke run for the current kernel code."""
    os.makedirs(STAMP_DIR, exist_ok=True)
    p = stamp_path()
    with open(p, "w") as f:
        f.write("tpu_smoke passed for kernel hash " + kernel_hash() + "\n")
    return p


def check_stamp() -> str | None:
    """None when the current kernel code is hardware-validated; otherwise a
    human-readable warning explaining what to run."""
    if os.path.exists(stamp_path()):
        return None
    return (
        f"kernel sources ({', '.join(KERNEL_FILES)}) have NO hardware smoke "
        f"stamp (hash {kernel_hash()}): interpret-mode tests cannot catch "
        f"Mosaic-only failures. Run `timeout 1800 python tools/tpu_smoke.py` "
        f"on the TPU before trusting these numbers."
    )
