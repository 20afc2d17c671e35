"""Roughness (Phong exponent Ns) gradients and recovery (VERDICT r3 #4).

The reference's glossy lobe is ``Ks (Ns+2)/(2pi) cos^Ns(alpha)``
(program-raymarch.wgsl:262-278); its exponent is a scene parameter the
reference never differentiates. Here ``mat_Ns`` is in the optimizable set
(inverse.PARAM_FIELDS). All tests run the corrected estimator
(``compat_count_light_pdf=False``) because the compat NEE keys the glossy
lobe on Ns == 40.0 exactly — a loss discontinuous in Ns (see the
PARAM_FIELDS note in inverse.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.inverse import material_params, recover_materials
from pathtracer_tpu.models.procedural import cornell_box_scene
from pathtracer_tpu.models.scene import RenderSettings
from pathtracer_tpu.ops import rng
from pathtracer_tpu.ops.camera_rays import generate_rays
from pathtracer_tpu.ops.integrator import radiance_batch
from pathtracer_tpu.render import render

SETTINGS = RenderSettings(
    width=24, height=24, samples_per_pixel=16, max_depth=4,
    scheduler="scan", compat_count_light_pdf=False,
)

GLOSSY = 4  # material row of the tall box (procedural.cornell_box_mesh)


@pytest.fixture(scope="module")
def glossy_box():
    return cornell_box_scene(glossy_tall_box=True)


def test_ns_grad_matches_finite_difference(glossy_box):
    """Path-replay d(radiance)/d(Ns) vs central finite differences."""
    scene, camera = glossy_box
    settings = dataclasses.replace(SETTINGS, width=8, height=8, max_depth=3)
    n = 128
    pids = jnp.arange(n, dtype=jnp.uint32)
    sids = jnp.zeros((n,), jnp.uint32)
    frame = {
        k: jnp.asarray(v)
        for k, v in camera.ray_frame(settings.width, settings.height).items()
    }
    jitter = rng.pixel_jitter(settings, pids, sids)
    o, d = generate_rays(
        frame, settings.width, settings.height, pids % 64, jitter
    )

    def loss(ns):
        s = scene.replace(mat_Ns=ns)
        return jnp.mean(radiance_batch(s, settings, o, d, pids, sids))

    ns0 = scene.mat_Ns
    g = jax.grad(loss)(ns0)
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(g[GLOSSY])) > 0.0, "glossy Ns receives no gradient"

    eps = 5e-2  # Ns ~ 40; the loss is smooth in Ns with compat off
    e = jnp.zeros_like(ns0).at[GLOSSY].set(eps)
    fd = (loss(ns0 + e) - loss(ns0 - e)) / (2 * eps)
    assert abs(float(g[GLOSSY]) - float(fd)) < 1e-4 + 0.05 * abs(float(fd)), (
        float(g[GLOSSY]), float(fd)
    )


def test_ns_grad_flows_through_nee_and_bounce(glossy_box):
    """Both consumers of Ns (NEE eval and the bounce-lobe eval) contribute:
    the gradient changes when depth allows a glossy bounce."""
    scene, camera = glossy_box
    n = 576  # the full 24x24 grid — the glossy box must be in view
    pids = jnp.arange(n, dtype=jnp.uint32)
    sids = jnp.zeros((n,), jnp.uint32)
    frame = {k: jnp.asarray(v) for k, v in camera.ray_frame(24, 24).items()}
    jitter = rng.pixel_jitter(SETTINGS, pids, sids)
    o, d = generate_rays(frame, 24, 24, pids, jitter)

    def grad_at(depth):
        settings = dataclasses.replace(SETTINGS, max_depth=depth)

        def loss(ns):
            s = scene.replace(mat_Ns=ns)
            return jnp.mean(radiance_batch(s, settings, o, d, pids, sids))

        return float(jax.grad(loss)(scene.mat_Ns)[GLOSSY])

    g1, g3 = grad_at(1), grad_at(3)
    assert g1 != 0.0
    assert g3 != g1  # extra bounces add the lobe-sampling contribution


def test_recover_kd_and_ns_jointly(glossy_box):
    """Perturbed-Ns glossy Cornell recovers Ns to < 5% relative error,
    jointly with albedo (VERDICT r3 next-round item 4).

    The fit uses a FIXED sample set shared with the target (a deterministic
    loss whose exact argmin is the true parameters) — the standard
    same-seed recovery check for differentiable renderers: it exercises
    the full path-replay gradient chain (NEE Phong eval + bounce lobe)
    and gradient-descent convergence, without the Monte Carlo
    heavy-tail pathology documented below.

    Measured, for the record (CornellBox glossy box, Ks 0.9, 32x32): the
    1-sample paired gradient of dMSE/dNs at Ns=14 has mean -2.9e-5
    (correctly pointing at the Ns=40 optimum) but median +3.3e-6 with 56%
    of steps positive and std 4.1e-4 — the signal lives in rare
    highlight-path spikes. Adam follows the median-ish normalized
    direction and stalls ~Ns=15-25 from below (and drifts *up* from
    above); plain SGD follows the mean but a single 4e-3 spike at the
    ~1e5 lr the tiny mean needs launches Ns hundreds of units; clipping
    the spikes removes the mean. Fitting noisy Ns therefore needs large
    ``samples_per_step`` (the mean must beat the median within one step)
    — that knob plus the ``optimizer`` override exist on
    ``recover_materials`` for exactly this, but a converged noisy fit is
    minutes of compute and lives outside the CI budget.
    """
    import optax

    from pathtracer_tpu.inverse import with_material_params
    from pathtracer_tpu.ops.camera_rays import generate_rays as _gen

    scene, camera = glossy_box
    true_params = material_params(scene)

    k = 6  # waves in the fixed sample set
    n_pixels = SETTINGS.width * SETTINGS.height
    pixel_ids = jnp.tile(jnp.arange(n_pixels, dtype=jnp.uint32), k)
    sample_ids = jnp.repeat(jnp.arange(k, dtype=jnp.uint32), n_pixels)
    frame = {
        k2: jnp.asarray(v)
        for k2, v in camera.ray_frame(SETTINGS.width, SETTINGS.height).items()
    }
    jitter = rng.pixel_jitter(SETTINGS, pixel_ids, sample_ids)
    o, d = _gen(frame, SETTINGS.width, SETTINGS.height, pixel_ids, jitter)

    def mean_image(params):
        s = with_material_params(scene, params)
        rad = radiance_batch(s, SETTINGS, o, d, pixel_ids, sample_ids)
        return rad.reshape(k, n_pixels, 3).mean(axis=0)

    fields = ("mat_Kd", "mat_Ns")
    target = mean_image({f: getattr(scene, f) for f in fields})

    pert = {
        "mat_Kd": scene.mat_Kd * 0.6,
        "mat_Ns": scene.mat_Ns.at[GLOSSY].set(12.0),
    }

    @jax.jit
    def loss_fn(params):
        return jnp.mean((mean_image(params) - target) ** 2)

    opt = optax.adam(optax.cosine_decay_schedule(0.6, 220))
    state = opt.init(pert)
    params = pert
    for _ in range(220):
        g = jax.grad(loss_fn)(params)
        upd, state = opt.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        params["mat_Kd"] = jnp.clip(params["mat_Kd"], 0.0, 1.0)
        params["mat_Ns"] = jnp.clip(params["mat_Ns"], 1.0, 499.0)

    ns_fit = float(params["mat_Ns"][GLOSSY])
    ns_true = float(true_params["mat_Ns"][GLOSSY])
    assert abs(ns_fit - ns_true) / ns_true < 0.05, (ns_fit, ns_true)

    kd = np.asarray(params["mat_Kd"])
    kd_true = np.asarray(true_params["mat_Kd"])
    err = np.abs(kd - kd_true).max(axis=1)
    # Walls and the glossy box are visible and must land on the truth.
    assert (err[[0, 1, 2, GLOSSY]] < 0.05).all(), f"Kd error {err}"
