"""Golden-image integration tests.

Renders each of the reference's final configs at reduced size and compares
(MSE, after the reference tonemap) against the images the reference code
itself produced (``student_outputs/final/*.png``) — compat mode reproduces
that estimator exactly, so the remaining error is Monte Carlo noise.
Thresholds are ~2x the measured noise floor at 48px/8spp.

(The ``ground_truth/`` instructor images embed the same dropped-translation
geometry but a different renderer; student outputs are the tighter oracle.)
"""

import numpy as np
import pytest

from pathtracer_tpu.models.scene import load_scene
from pathtracer_tpu.ops.tonemap import tonemap_reference
from pathtracer_tpu.render import render
from pathtracer_tpu.utils.image import mse

SIZE = 48
SPP = 8

CASES = [
    ("cornell_box_full_lighting", 0.012),
    ("cornell_box_direct_lighting_only", 0.008),
    ("glossy", 0.030),
    ("mirror", 0.020),
    ("refraction", 0.025),
]


@pytest.mark.parametrize("name,threshold", CASES)
def test_final_scene_matches_reference_render(reference_root, name, threshold):
    from PIL import Image

    ini = str(reference_root / f"scene_files/final/{name}.ini")
    scene, camera, settings, _ = load_scene(
        ini, width=SIZE, height=SIZE, samples_per_pixel=SPP, intersector="bvh"
    )
    img = np.asarray(tonemap_reference(render(scene, camera, settings)))

    golden_path = reference_root / f"student_outputs/final/{name}.png"
    golden = (
        np.asarray(
            Image.open(golden_path).convert("RGB").resize((SIZE, SIZE)),
            dtype=np.float32,
        )
        / 255.0
    )
    err = mse(img, golden)
    assert err < threshold, f"{name}: MSE {err:.5f} >= {threshold}"


def test_low_probability_config(reference_root):
    """rr=0.1 config: golden-gated like the other finals.

    The reference's own 50-spp render of this config is itself noisy
    (bench-measured full-size MSE vs it ~0.020), so the threshold here is
    ~2x the noise floor measured at this reduced size — a real MSE gate,
    not a smoke check, while staying robust to the golden's own variance.
    """
    from PIL import Image

    ini = str(
        reference_root
        / "scene_files/final/cornell_box_full_lighting_low_probability.ini"
    )
    scene, camera, settings, parsed = load_scene(
        ini, width=SIZE, height=SIZE, samples_per_pixel=16
    )
    assert settings.rr_prob == 0.1
    img = np.asarray(tonemap_reference(render(scene, camera, settings)))
    assert np.isfinite(img).all()

    golden_path = (
        reference_root
        / "student_outputs/final/cornell_box_full_lighting_low_probability.png"
    )
    golden = (
        np.asarray(
            Image.open(golden_path).convert("RGB").resize((SIZE, SIZE)),
            dtype=np.float32,
        )
        / 255.0
    )
    err = mse(img, golden)
    assert err < 0.040, f"low_probability: MSE {err:.5f} >= 0.040"
