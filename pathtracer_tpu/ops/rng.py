"""Counter-based RNG for path tracing.

Replaces the reference's integer-hash chain (``src/wgsl-util/hash.wgsl``:
the classic ``n<<13 ^ n`` one-liner, re-hashed ad hoc through the kernel)
with JAX's threefry keys derived *structurally*:

    ray_key = fold_in(fold_in(base, pixel_id), sample_id)
    draw    = uniform(fold_in(ray_key, bounce * STRIDE + purpose))

This makes every random draw a pure function of (pixel, sample, bounce,
purpose) — independent of batch chunking or device placement, so a render
sharded over N chips is bit-identical to a single-chip render, and the
backward path-replay pass can regenerate the exact forward samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Draw-purpose slots within one bounce (stride leaves room to grow).
STRIDE = 8
LIGHT_CHOICE = 0
LIGHT_BARY = 1  # consumes 2 uniforms
RR = 3
FRESNEL = 4
BSDF_DIR = 5  # consumes 2 uniforms
PIXEL_JITTER = 7  # bounce 0 only


def ray_keys(base_key: jax.Array, pixel_ids: jax.Array, sample_ids: jax.Array):
    """Per-ray keys from global pixel ids [B] and sample indices [B]."""
    fold = jax.vmap(jax.random.fold_in, in_axes=(None, 0))
    keys = fold(base_key, pixel_ids.astype(jnp.uint32))
    return jax.vmap(jax.random.fold_in)(keys, sample_ids.astype(jnp.uint32))


def bounce_uniforms(keys: jax.Array, bounce, n: int = STRIDE) -> jax.Array:
    """[B, n] uniforms in [0, 1) for one bounce, one row per ray."""
    folded = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, bounce)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,)))(folded)
