"""Inverse rendering closes the loop (BASELINE.json config 5, VERDICT r1 #5).

Perturb the procedural Cornell box's materials, render a target with the
true materials, and verify gradient descent actually recovers them — not
just that one train step runs. Gradients are the unbiased paired-wave
path-replay estimator (inverse._paired_objective).

Notes on what is recoverable at test scale:
- albedo (Kd) and emission (Ke) each recover tightly when fit alone;
- fitting both jointly is gauge-ambiguous on a mostly-diffuse box (pixel
  brightness ~ Ke * Kd along the light path; only the handful of pixels
  that see the emitter directly pin Ke), so the joint test asserts on the
  *relit image*, not on individual parameters;
- the light's own Kd is invisible to the camera and legitimately stays
  unconstrained — assertions cover the wall/box materials (ids 0..2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.inverse import material_params, recover_materials
from pathtracer_tpu.models.procedural import cornell_box_scene
from pathtracer_tpu.models.scene import RenderSettings
from pathtracer_tpu.render import render
from pathtracer_tpu.utils.image import mse


SETTINGS = RenderSettings(
    width=24, height=24, samples_per_pixel=16, max_depth=4, scheduler="scan"
)


@pytest.fixture(scope="module")
def problem():
    """(true scene, camera, target image, true params)."""
    scene, camera = cornell_box_scene()
    true_params = material_params(scene)
    target = jnp.asarray(render(scene, camera, SETTINGS))
    return scene, camera, target, true_params


def test_recover_albedo_converges(problem):
    scene, camera, target, true_params = problem
    pert = scene.replace(mat_Kd=scene.mat_Kd * 0.5)
    params, _ = recover_materials(
        pert, camera, SETTINGS, target, steps=100, learning_rate=0.05,
        fields=("mat_Kd",),
    )
    kd = np.asarray(params["mat_Kd"])
    kd_true = np.asarray(true_params["mat_Kd"])
    # White walls/boxes, red wall, green wall all land on the truth.
    err = np.abs(kd - kd_true).max(axis=1)
    assert (err[:3] < 0.08).all(), f"per-material Kd error {err}"


def test_recover_emission_converges(problem):
    scene, camera, target, true_params = problem
    pert = scene.replace(mat_Ke=scene.mat_Ke * 0.5)
    params, _ = recover_materials(
        pert, camera, SETTINGS, target, steps=150, learning_rate=0.5,
        fields=("mat_Ke",),
    )
    ke = np.asarray(params["mat_Ke"])
    ke_true = np.asarray(true_params["mat_Ke"])
    emitter = ke_true.sum(axis=1) > 0
    np.testing.assert_allclose(ke[emitter], ke_true[emitter], atol=1.5)


def test_recover_joint_relights_the_scene(problem):
    """Joint Kd+Ke fit: individual parameters are gauge-ambiguous, but the
    relit image must land on the target."""
    scene, camera, target, _ = problem
    pert = scene.replace(mat_Kd=scene.mat_Kd * 0.5, mat_Ke=scene.mat_Ke * 0.6)
    init_mse = mse(np.asarray(render(pert, camera, SETTINGS)), np.asarray(target))
    params, _ = recover_materials(
        pert, camera, SETTINGS, target, steps=150, learning_rate=0.15
    )
    relit = render(pert.replace(**params), camera, SETTINGS)
    final_mse = mse(np.asarray(relit), np.asarray(target))
    assert final_mse < 0.25 * init_mse, (init_mse, final_mse)


def test_recover_materials_sharded_mesh(problem):
    """Albedo recovery with the pixel batch sharded over the 8-device mesh
    (psum'd paired gradients)."""
    from pathtracer_tpu.parallel.mesh import make_mesh

    scene, camera, target, true_params = problem
    pert = scene.replace(mat_Kd=scene.mat_Kd * 0.5)
    params, _ = recover_materials(
        pert, camera, SETTINGS, target, steps=60, learning_rate=0.05,
        fields=("mat_Kd",), mesh=make_mesh(),
    )
    err = np.abs(
        np.asarray(params["mat_Kd"]) - np.asarray(true_params["mat_Kd"])
    ).max(axis=1)
    assert (err[:3] < 0.15).all(), f"per-material Kd error {err}"


def test_recover_checkpoint_resume_identical(problem, tmp_path):
    """Stop after 10 steps, resume from the saved optimizer state, and land
    bit-identically on the straight-through 20-step result."""
    scene, camera, target, _ = problem
    pert = scene.replace(mat_Kd=scene.mat_Kd * 0.5)
    straight, _ = recover_materials(
        pert, camera, SETTINGS, target, steps=20, learning_rate=0.05
    )

    ckpt = str(tmp_path / "opt.npz")
    recover_materials(
        pert, camera, SETTINGS, target, steps=20, learning_rate=0.05,
        checkpoint_path=ckpt, checkpoint_every=5, stop_after=10,
    )
    resumed, losses = recover_materials(
        pert, camera, SETTINGS, target, steps=20, learning_rate=0.05,
        checkpoint_path=ckpt, checkpoint_every=5,
    )
    assert len(losses) == 10  # only the remaining steps ran
    for k in straight:
        np.testing.assert_array_equal(
            np.asarray(straight[k]), np.asarray(resumed[k])
        )
