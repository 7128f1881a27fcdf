"""Checkpoint/resume for time-dependent solves.

The reference has no persistence beyond VTU dumps (SURVEY §5); solver
state here is a pytree of arrays plus the scalar time, so checkpointing
is a single npz file.  Wired into AdvectionProblem.run_scan
(checkpoint_path=) and the long composite-DoD production run
(scripts/run_composite_dod.py), which resumes mid-horizon after a kill.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax


def save(path: str, state, time: float, meta: dict = None):
    """state: pytree of arrays; written atomically."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__time__"] = np.asarray(time)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp[:-4], **payload)  # np.savez appends .npz
    os.replace(tmp, path)


def load(path: str, like):
    """Returns (state, time, meta); `like` provides the pytree structure."""
    with np.load(path) as z:
        leaves, treedef = jax.tree_util.tree_flatten(like)
        out = [z[f"leaf_{i}"] for i in range(len(leaves))]
        t = float(z["__time__"])
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z \
            else {}
    import jax.numpy as jnp

    state = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in out]
    )
    return state, t, meta
