"""Tone mapping.

Reproduces the reference's CPU display transform
(``src/program-raymarch.ts:295-316``): per-pixel mean luminance through a
Reinhard curve, applied as a (very gentle) ``lum_o ** 0.01`` scale on the raw
averaged radiance, then clamped to [0, 1]. Also provides standard options.
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap_reference(img):
    """[H, W, 3] mean radiance -> display-linear [0, 1] (reference-exact)."""
    lum = jnp.mean(img, axis=-1, keepdims=True)
    lum_o = lum / (lum + 1.0)
    out = img * jnp.power(jnp.maximum(lum_o, 1e-20), 0.01)
    return jnp.clip(out, 0.0, 1.0)


def tonemap_reinhard(img):
    """Plain Reinhard on luminance."""
    lum = jnp.mean(img, axis=-1, keepdims=True)
    scale = 1.0 / (1.0 + lum)
    return jnp.clip(img * scale, 0.0, 1.0)


def tonemap_none(img):
    return jnp.clip(img, 0.0, 1.0)


TONEMAPS = {
    "reference": tonemap_reference,
    "reinhard": tonemap_reinhard,
    "none": tonemap_none,
}
