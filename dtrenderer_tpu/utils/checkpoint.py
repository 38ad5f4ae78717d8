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
    """Restore a pytree saved by save_pytree; `like` provides the structure."""
    import jax.numpy as jnp

    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
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
