"""Emissive-area-light sampling for next-event estimation.

TPU-native equivalent of ``sample_area_lights``
(``src/wgsl-util/intersection-logic.wgsl:217-285``). The reference reads up
to four (start, end) emissive index ranges from its packed-buffer header and
picks a triangle uniformly *by count*; here the emissive table is a flat
index list of any length (``models.pack``), and two estimators are provided:

- ``count`` (compat): weight = 1 / num_emissive_triangles, no area term —
  reproduces the reference estimator and hence its golden images;
- ``area``: proper area-weighted triangle selection via the emissive-area
  CDF, weight = total_area (solid-angle conversion stays at the call site's
  cos.cos/d^2 factors, turning the estimator into the standard area-form NEE).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_triangle_barycentric(u1, u2):
    """Uniform barycentrics via (1 - sqrt(u), v sqrt(u)) (samplers.wgsl:70-79)."""
    su = jnp.sqrt(u1)
    b0 = 1.0 - su
    b1 = u2 * su
    return b0, b1


def sample_area_lights(scene, x, u_choice, u1, u2, compat_count_pdf: bool):
    """Sample a point on the emissive set for each shading point x [B, 3].

    Returns (direction [B, 3], weight [B]) where the NEE contribution is
    ``beta * Ke_hit * brdf * cos_l * cos_s / d^2 * weight`` — matching the
    reference call site (program-raymarch.wgsl:146-182).
    """
    e_pad = scene.emissive_tri.shape[0]
    n_emissive = jnp.maximum(scene.num_emissive, 1)

    if compat_count_pdf:
        # Uniform by count (intersection-logic.wgsl:238-257).
        j = jnp.minimum(
            (u_choice * n_emissive).astype(jnp.int32), n_emissive - 1
        )
        weight = jnp.full(x.shape[0], 1.0, dtype=x.dtype) / n_emissive.astype(
            x.dtype
        )
    else:
        # Area-weighted: invert the CDF of emissive triangle areas.
        idx_valid = jnp.arange(e_pad) < scene.num_emissive
        areas = jnp.where(idx_valid, scene.emissive_area, 0.0)
        total = jnp.maximum(jnp.sum(areas), 1e-20)
        cdf = jnp.cumsum(areas) / total
        j = jnp.searchsorted(cdf, u_choice, side="right").astype(jnp.int32)
        j = jnp.minimum(j, n_emissive - 1)
        # Area-form NEE: pdf_A = 1 / total_area -> weight = total_area.
        weight = jnp.full(x.shape[0], 1.0, dtype=x.dtype) * total

    tri = scene.emissive_tri[j]
    v0 = scene.tri_v0[tri]
    p1 = v0 + scene.tri_e1[tri]
    p2 = v0 + scene.tri_e2[tri]

    b0, b1 = sample_triangle_barycentric(u1, u2)
    # Reference maps (b0, b1) onto (p0, p1) with remainder on p2
    # (samplers.wgsl:76-78).
    p = b0[:, None] * v0 + b1[:, None] * p1 + (1.0 - b0 - b1)[:, None] * p2

    direction = p - x
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-20
    )
    return direction, weight
