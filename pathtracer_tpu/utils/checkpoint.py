"""Checkpoint / resume.

The reference has none (SURVEY.md §5): its accumulation state lives in a JS
array and a page refresh restarts sampling. Here the natural checkpointable
state is (accumulated radiance sum, samples completed) plus a fingerprint of
the scene+settings; because all randomness is counter-based on
(pixel, sample) (ops.rng), resuming at sample k reproduces exactly the
render that would have run straight through.

Also provides generic pytree save/load for inverse-rendering runs
(material params + optimizer state).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np


def render_fingerprint(scene, settings) -> str:
    """Stable id for (scene geometry, render settings) compatibility."""
    payload = {
        "settings": repr(settings),
        "num_tris": scene.num_tris,
        "padded": int(scene.tri_v0.shape[0]),
        "num_analytic": scene.num_analytic,
        "mats": int(scene.mat_Kd.shape[0]),
    }
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[
        :16
    ]


def save_render_state(path: str, image_sum, samples_done: int, fingerprint: str):
    tmp = path + ".tmp"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp + ".npz",
        image_sum=np.asarray(image_sum),
        samples_done=np.int64(samples_done),
        fingerprint=np.bytes_(fingerprint.encode()),
    )
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


def load_render_state(path: str, fingerprint: str):
    """-> (image_sum, samples_done) or None if absent/incompatible."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if z["fingerprint"].tobytes().decode() != fingerprint:
                return None
            return z["image_sum"], int(z["samples_done"])
    except Exception:
        return None


def save_pytree(path: str, tree) -> None:
    """Save an arbitrary pytree of arrays (e.g. params + optimizer state)."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp.npz"
    np.savez(tmp, treedef=np.bytes_(str(treedef).encode()), **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, like):
    """Load arrays saved by ``save_pytree`` into the structure of ``like``."""
    import jax

    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as z:
        if str(treedef) != z["treedef"].tobytes().decode():
            raise ValueError("checkpoint structure mismatch")
        loaded = [z[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, loaded)
