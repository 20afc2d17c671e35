"""Checkpoint/resume: interrupted renders must equal straight-through ones."""

import numpy as np

from pathtracer_tpu.models.procedural import cornell_box_scene
from pathtracer_tpu.models.scene import RenderSettings
from pathtracer_tpu.render import render, render_checkpointed
from pathtracer_tpu.utils.checkpoint import (
    load_pytree,
    load_render_state,
    render_fingerprint,
    save_pytree,
    save_render_state,
)


def test_checkpointed_render_matches_direct(tmp_path):
    scene, camera = cornell_box_scene()
    settings = RenderSettings(width=16, height=16, samples_per_pixel=6, max_depth=4)
    direct = np.asarray(render(scene, camera, settings))
    ckpt = str(tmp_path / "render.npz")
    resumed = np.asarray(
        render_checkpointed(scene, camera, settings, ckpt, chunk_samples=2)
    )
    np.testing.assert_allclose(direct, resumed, rtol=1e-5, atol=1e-6)


def test_resume_after_partial(tmp_path):
    """Simulate a kill mid-render: partial state on disk, rerun completes."""
    scene, camera = cornell_box_scene()
    settings = RenderSettings(width=16, height=16, samples_per_pixel=4, max_depth=4)
    ckpt = str(tmp_path / "render.npz")

    calls = []

    def stop_after_first(done, total):
        calls.append(done)
        if len(calls) == 1:
            raise KeyboardInterrupt

    try:
        render_checkpointed(
            scene, camera, settings, ckpt, chunk_samples=2,
            progress_callback=stop_after_first,
        )
    except KeyboardInterrupt:
        pass

    fp = render_fingerprint(scene, settings)
    state = load_render_state(ckpt, fp)
    assert state is not None and state[1] == 2  # two samples persisted

    resumed = np.asarray(
        render_checkpointed(scene, camera, settings, ckpt, chunk_samples=2)
    )
    direct = np.asarray(render(scene, camera, settings))
    np.testing.assert_allclose(direct, resumed, rtol=1e-5, atol=1e-6)


def test_fingerprint_invalidates(tmp_path):
    scene, camera = cornell_box_scene()
    s1 = RenderSettings(width=16, height=16, samples_per_pixel=2)
    s2 = RenderSettings(width=16, height=16, samples_per_pixel=2, rr_prob=0.5)
    path = str(tmp_path / "r.npz")
    save_render_state(path, np.zeros((256, 3)), 1, render_fingerprint(scene, s1))
    assert load_render_state(path, render_fingerprint(scene, s1)) is not None
    assert load_render_state(path, render_fingerprint(scene, s2)) is None


def test_pytree_roundtrip(tmp_path):
    import optax

    from pathtracer_tpu.inverse import material_params

    scene, _ = cornell_box_scene()
    params = material_params(scene)
    opt = optax.adam(1e-2)
    state = opt.init(params)
    path = str(tmp_path / "opt.npz")
    save_pytree(path, {"params": params, "opt": state})
    loaded = load_pytree(path, {"params": params, "opt": state})
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["mat_Kd"]), np.asarray(params["mat_Kd"])
    )
