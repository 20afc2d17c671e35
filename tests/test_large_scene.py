"""Large-mesh tests (MedievalBoat, 12.5k triangles).

BASELINE.json config 4 names MedievalBoat.xml as the large-scene stressor
(reference: scene_assets/MedievalBoat.xml, 15216 v / 12571 f). Covers an
end-to-end tiny render (parse -> BVH pack -> wavefront integrate, finite
and non-trivial) and exact cross-intersector agreement on boat rays
(brute sweep vs BVH traversal vs cluster kernel).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def boat(reference_root):
    from pathtracer_tpu.models.scene import scene_from_graph
    from pathtracer_tpu.models.scenegraph import load_scenegraph

    graph = load_scenegraph(str(reference_root / "scene_assets/MedievalBoat.xml"))
    scene, camera = scene_from_graph(
        graph, str(reference_root / "scene_assets")
    )
    return scene, camera


def test_boat_packs(boat):
    scene, _ = boat
    assert scene.num_tris > 12000
    assert scene.padded_tris % 128 == 0


def test_boat_renders(boat):
    from pathtracer_tpu.models.scene import RenderSettings
    from pathtracer_tpu.render import render_image

    scene, camera = boat
    settings = RenderSettings(
        width=24, height=24, samples_per_pixel=1, max_depth=3
    )
    img = np.asarray(render_image(scene, camera, settings))
    assert img.shape == (24, 24, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.0


def test_boat_intersectors_agree(boat, rng_np):
    """brute / bvh / cluster closest-hit agree exactly on boat rays."""
    import jax.numpy as jnp

    from pathtracer_tpu.ops.bvh_traverse import closest_tri_bvh
    from pathtracer_tpu.ops.intersect import closest_tri_brute
    from pathtracer_tpu.ops.intersect_cluster import closest_tri_cluster

    scene, camera = boat
    o = jnp.asarray(
        np.broadcast_to(np.asarray(camera.pos, np.float32), (128, 3)).copy()
    )
    d = rng_np.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    t0, id0 = (np.asarray(a) for a in closest_tri_brute(scene, o, d))
    t1, id1 = (np.asarray(a) for a in closest_tri_bvh(scene, o, d))
    t2, id2 = (np.asarray(a) for a in closest_tri_cluster(scene, o, d, interpret=True))
    hit = np.isfinite(t0)
    assert hit.any(), "no boat hits sampled"
    for t, ids in ((t1, id1), (t2, id2)):
        assert np.array_equal(hit, np.isfinite(t))
        assert np.allclose(t0[hit], t[hit], rtol=1e-5, atol=1e-6)
        assert np.array_equal(id0[hit], ids[hit])
