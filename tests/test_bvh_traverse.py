"""BVH traversal ≡ brute force (the property class that catches the
reference's 'triangles sometimes missing' bug, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.models.obj import ObjMaterial, ObjMesh
from pathtracer_tpu.models.pack import pack_scene
from pathtracer_tpu.models.procedural import cornell_box_scene
from pathtracer_tpu.models.scene import RenderSettings, _to_device
from pathtracer_tpu.ops.bvh_traverse import closest_tri_bvh
from pathtracer_tpu.ops.intersect import closest_tri_brute


def random_scene(rng, n_tris, max_leaf=4):
    v0 = rng.uniform(-5, 5, (n_tris, 3))
    v1 = v0 + rng.uniform(-1, 1, (n_tris, 3))
    v2 = v0 + rng.uniform(-1, 1, (n_tris, 3))
    mesh = ObjMesh(
        positions=np.concatenate([v0, v1, v2]),
        normals=np.zeros((0, 3)),
        faces=np.arange(3 * n_tris, dtype=np.int32).reshape(3, n_tris).T,
        face_normals=np.full((n_tris, 3), -1, dtype=np.int32),
        face_material=np.zeros(n_tris, dtype=np.int32),
        materials=[ObjMaterial(Kd=(0.5, 0.5, 0.5))],
    )
    return _to_device(pack_scene(mesh, max_leaf=max_leaf))


def random_rays(rng, n):
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)))
    d = jnp.asarray(rng.normal(size=(n, 3)))
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def assert_equivalent(scene, o, d):
    t_ref, id_ref = closest_tri_brute(scene, o, d)
    t_bvh, id_bvh = closest_tri_bvh(scene, o, d)
    t_ref, t_bvh = np.asarray(t_ref), np.asarray(t_bvh)
    hit_ref = np.isfinite(t_ref)
    np.testing.assert_array_equal(hit_ref, np.isfinite(t_bvh))
    np.testing.assert_allclose(t_bvh[hit_ref], t_ref[hit_ref], rtol=1e-5, atol=1e-6)
    # Ids may differ only where two triangles tie on t.
    id_ref, id_bvh = np.asarray(id_ref), np.asarray(id_bvh)
    diff = hit_ref & (id_ref != id_bvh)
    assert (np.abs(t_bvh[diff] - t_ref[diff]) <= 1e-6).all()


def test_bvh_equiv_cornell(rng_np):
    scene, _ = cornell_box_scene(max_leaf=4)
    o, d = random_rays(rng_np, 512)
    assert_equivalent(scene, o, d)


@pytest.mark.parametrize("n_tris", [17, 200, 1500])
def test_bvh_equiv_random(rng_np, n_tris):
    scene = random_scene(rng_np, n_tris)
    o, d = random_rays(rng_np, 256)
    assert_equivalent(scene, o, d)


def test_bvh_render_matches_brute(rng_np):
    import dataclasses

    from pathtracer_tpu.render import render

    scene, camera = cornell_box_scene(max_leaf=4)
    s_brute = RenderSettings(
        width=16, height=16, samples_per_pixel=2, intersector="brute",
        scheduler="scan",
    )
    s_bvh = dataclasses.replace(s_brute, intersector="bvh")
    a = np.asarray(render(scene, camera, s_brute))
    b = np.asarray(render(scene, camera, s_bvh))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_bvh_grad_path_still_works(rng_np):
    """Material grads must survive the non-differentiable traversal
    (stop_gradient on hit geometry)."""
    import jax

    from pathtracer_tpu.ops import rng as prng
    from pathtracer_tpu.ops.camera_rays import generate_rays
    from pathtracer_tpu.ops.integrator import radiance_batch

    scene, camera = cornell_box_scene(max_leaf=4)
    settings = RenderSettings(width=8, height=8, max_depth=3, intersector="bvh")
    frame = {k: jnp.asarray(v) for k, v in camera.ray_frame(8, 8).items()}
    pids = jnp.arange(64, dtype=jnp.uint32)
    sids = jnp.zeros((64,), jnp.uint32)
    jitter = prng.pixel_jitter_hash(pids, sids)
    o, d = generate_rays(frame, 8, 8, pids, jitter)

    def loss(kd):
        s = scene.replace(mat_Kd=kd)
        return jnp.mean(radiance_batch(s, settings, o, d, pids, sids))

    g = jax.grad(loss)(scene.mat_Kd)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
