"""Fused small-scene Pallas kernel (ops.intersect_small_pallas) vs brute.

Interpret mode on CPU (Mosaic lowering is exercised by the TPU perf canary
and bench; the math/contract is identical either way).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.models.procedural import cornell_box_scene
from pathtracer_tpu.models.scene import RenderSettings
from pathtracer_tpu.ops.camera_rays import generate_rays
from pathtracer_tpu.ops.intersect import closest_hit, closest_tri_brute
from pathtracer_tpu.ops.intersect_small_pallas import (
    closest_tri_small_pallas_attrs,
    occluded_tri_small_pallas,
)


@pytest.fixture(scope="module")
def rays():
    scene, camera = cornell_box_scene()
    frame = {
        k: jnp.asarray(v) for k, v in camera.ray_frame(32, 32).items()
    }
    b = 1024
    pix = jnp.arange(b, dtype=jnp.uint32)
    # Irrational-ish jitter keeps rays off the Cornell quad-diagonal seams:
    # a ray exactly on the u+v == 1 edge shared by two triangles can
    # resolve to either one depending on FMA contraction order, which is
    # implementation-legal but breaks t-equality assertions.
    jit2 = jnp.tile(jnp.asarray([[0.371, 0.613]], jnp.float32), (b, 1))
    o, d = generate_rays(frame, 32, 32, pix, jit2)
    return scene, o, d


def test_closest_matches_brute_bit_exact(rays):
    scene, o, d = rays
    t_ref, id_ref = closest_tri_brute(scene, o, d)
    t, tri_id, n_geo, mat_id = closest_tri_small_pallas_attrs(
        scene, o, d, interpret=True
    )
    hit = np.asarray(jnp.isfinite(t_ref))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(tri_id), np.asarray(id_ref))
    # Winner attributes match the scene tables at the winning ids.
    ids = np.asarray(id_ref)[hit]
    np.testing.assert_array_equal(
        np.asarray(n_geo)[hit], np.asarray(scene.tri_n)[ids]
    )
    np.testing.assert_array_equal(
        np.asarray(mat_id)[hit], np.asarray(scene.tri_mat)[ids]
    )
    # Miss lanes sanitized by contract.
    np.testing.assert_array_equal(np.asarray(tri_id)[~hit], -1)


def test_occluded_matches_brute(rays):
    scene, o, d = rays
    t_ref, _ = closest_tri_brute(scene, o, d)
    # Cut halfway to the closest hit: nothing occludes. Cut past it: the
    # hit occludes.
    t_fin = jnp.where(jnp.isfinite(t_ref), t_ref, 1.0)
    near = occluded_tri_small_pallas(scene, o, d, t_fin * 0.5, interpret=True)
    far = occluded_tri_small_pallas(scene, o, d, t_fin * 2.0, interpret=True)
    assert not bool(jnp.any(near))
    np.testing.assert_array_equal(
        np.asarray(far), np.asarray(jnp.isfinite(t_ref))
    )


def test_closest_hit_routes_and_matches(rays):
    """closest_hit with intersector=small_pallas (interpret) == brute."""
    scene, o, d = rays
    st_b = RenderSettings(intersector="brute")
    hb, mb = closest_hit(scene, o, d, st_b)
    import pathtracer_tpu.ops.intersect_small_pallas as sp

    # Route through the kernel in interpret mode on CPU.
    orig = sp._small_pallas_raw
    import functools

    def patched(scene, o, d, **kw):
        kw["interpret"] = True
        return orig(scene, o, d, **kw)

    sp_raw = sp._small_pallas_raw
    sp._small_pallas_raw = patched
    try:
        st_p = RenderSettings(intersector="small_pallas")
        hp, mp = closest_hit(scene, o, d, st_p)
    finally:
        sp._small_pallas_raw = sp_raw

    hit = np.asarray(hb.hit)
    np.testing.assert_array_equal(np.asarray(hp.t), np.asarray(hb.t))
    np.testing.assert_array_equal(
        np.asarray(hp.mat_id)[hit], np.asarray(hb.mat_id)[hit]
    )
    np.testing.assert_allclose(
        np.asarray(hp.normal)[hit], np.asarray(hb.normal)[hit], rtol=0, atol=0
    )
    # Miss lanes: only the sanitized fields are contractual (unit-z normal,
    # Ni = 1); other material channels are don't-care and differ by path.
    np.testing.assert_array_equal(np.asarray(hp.normal)[~hit, 2], 1.0)
    np.testing.assert_array_equal(np.asarray(mp["Ni"])[~hit], 1.0)
    for k in mb:
        np.testing.assert_allclose(
            np.asarray(mp[k])[hit], np.asarray(mb[k])[hit], rtol=0, atol=0
        )
