"""RenderState checkpoint/resume.

The reference's closest persistence analog is hot-reload state survival: app state in
PlatformMemory outlives DLL code swaps (SURVEY.md §5 "Checkpoint/resume", CS-4). The
functional equivalent here: all state is a pytree of arrays, code is re-traceable — so
persistence is just (de)serializing the pytree. Any NamedTuple/dict/list tree of
jnp/np arrays round-trips through one .npz file.
"""

from __future__ import annotations

import numpy as np
import jax


def save_pytree(path: str, tree) -> None:
    """Serialize a pytree of arrays (+ scalars) to an .npz file."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Restore a pytree saved by save_pytree; `like` provides the structure.

    The stored treedef is verified against `like`'s structure — restoring into a
    structurally different state is an error, not a silent reinterpretation.
    """
    import jax.numpy as jnp

    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    stored_treedef = bytes(data["__treedef__"]).decode()
    if stored_treedef != str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch:\n  stored: {stored_treedef}\n"
            f"  expected: {treedef}")
    n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_stored != len(leaves_like):
        raise ValueError(
            f"checkpoint has {n_stored} leaves, `like` has {len(leaves_like)}")
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves_like[i]
        if hasattr(ref, "dtype"):
            leaves.append(jnp.asarray(arr, ref.dtype))
        else:
            leaves.append(arr.item())
    return jax.tree.unflatten(treedef, leaves)
