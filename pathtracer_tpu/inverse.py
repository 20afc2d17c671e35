"""Inverse rendering: differentiable loss + sharded training step.

The reference has no differentiability anywhere; this implements the
BASELINE.json north star: pixel gradients w.r.t. material arrays
(albedo Kd / emission Ke / specular Ks) via **path-replay backprop** — the
integrator's bounce step is `jax.checkpoint`-ed (ops.integrator) so the
backward pass replays each bounce from its carry, regenerating the identical
RNG decisions from counter-based keys instead of storing them.

Discrete path structure (hit ids, RR survival, lobe choices, sampled
directions) receives no gradient — standard for path-replay estimators;
gradients flow through the BSDF/emission *values* along the fixed paths.

Scaling: the pixel batch shards over the ``rays`` mesh axis, parameters
replicate, and per-shard gradients are ``psum``-reduced over ICI — the
gradient all-reduce happens inside the same jitted step as the backward
replay, so XLA overlaps the two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pathtracer_tpu.ops import rng
from pathtracer_tpu.ops.camera_rays import generate_rays
from pathtracer_tpu.ops.integrator import radiance_batch
from pathtracer_tpu.parallel.mesh import RAY_AXIS

PARAM_FIELDS = ("mat_Kd", "mat_Ke", "mat_Ks")


def material_params(scene) -> dict:
    """Extract the differentiable material arrays from a Scene."""
    return {f: getattr(scene, f) for f in PARAM_FIELDS}


def with_material_params(scene, params: dict):
    """Scene with its material arrays replaced by ``params``."""
    return scene.replace(**params)


def _render_rows(params, scene, settings, frame, pixel_ids, sample_ids):
    """Radiance for a pixel subset [b] under the given material params."""
    scene = with_material_params(scene, params)
    if settings.rng == "threefry":
        keys = rng.ray_keys(jax.random.PRNGKey(0), pixel_ids, sample_ids)
        jitter = rng.pixel_jitter_threefry(keys)
    else:
        jitter = rng.pixel_jitter_hash(pixel_ids, sample_ids)
    o, d = generate_rays(frame, settings.width, settings.height, pixel_ids, jitter)
    return jnp.maximum(
        radiance_batch(scene, settings, o, d, pixel_ids, sample_ids), 0.0
    )


def pixel_loss(params, scene, settings, frame, target_rows, pixel_ids, sample_ids):
    """MSE between rendered radiance and target rows for a pixel subset."""
    rad = _render_rows(params, scene, settings, frame, pixel_ids, sample_ids)
    return jnp.mean((rad - target_rows) ** 2)


def make_train_step(settings, optimizer, mesh=None):
    """Jitted SGD/Adam step over material params.

    With ``mesh``: pixels shard over the ``rays`` axis via ``shard_map``,
    per-shard loss/grads are ``psum``-averaged (the collective rides ICI),
    and the optimizer update runs on replicated params — the full
    data-parallel training step the driver's multichip dryrun exercises.
    """

    def loss_and_grad_local(params, scene, frame, target_rows, pixel_ids, sample_ids):
        loss, grads = jax.value_and_grad(pixel_loss)(
            params, scene, settings, frame, target_rows, pixel_ids, sample_ids
        )
        if mesh is not None:
            # Equal-sized shards: global mean = mean of shard means. The
            # cotangent of a *replicated* (P()) input is already psum'd by
            # the shard_map transpose, so grads only need the 1/n rescale —
            # an extra psum would double-count by the shard count.
            n = jax.lax.psum(jnp.ones(()), RAY_AXIS)
            loss = jax.lax.psum(loss, RAY_AXIS) / n
            grads = jax.tree.map(lambda g: g / n, grads)
        return loss, grads

    if mesh is not None:
        loss_and_grad = jax.shard_map(
            loss_and_grad_local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=(P(), P()),
        )
    else:
        loss_and_grad = loss_and_grad_local

    @jax.jit
    def train_step(params, opt_state, scene, frame, target_rows, pixel_ids, sample_ids):
        loss, grads = loss_and_grad(
            params, scene, frame, target_rows, pixel_ids, sample_ids
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


def recover_materials(
    scene,
    camera,
    settings,
    target_image,
    steps: int = 100,
    learning_rate: float = 5e-2,
    init_params: dict | None = None,
    mesh=None,
    callback=None,
):
    """Gradient-descent recovery of material arrays from a target render.

    ``target_image``: [H, W, 3] mean radiance (pre-tonemap). Returns
    (recovered params, list of losses). BASELINE.json config 5.
    """
    import optax

    optimizer = optax.adam(learning_rate)
    params = init_params or material_params(scene)
    opt_state = optimizer.init(params)
    train_step = make_train_step(settings, optimizer, mesh=mesh)

    frame = {
        k: jnp.asarray(v)
        for k, v in camera.ray_frame(settings.width, settings.height).items()
    }
    n_pixels = settings.width * settings.height
    pixel_ids = jnp.arange(n_pixels, dtype=jnp.uint32)
    target_rows = jnp.asarray(target_image).reshape(n_pixels, 3)

    losses = []
    for step_idx in range(steps):
        # Fresh sample index per step -> fresh paths -> unbiased SGD noise.
        sample_ids = jnp.full((n_pixels,), step_idx, dtype=jnp.uint32)
        params, opt_state, loss = train_step(
            params, opt_state, scene, frame, target_rows, pixel_ids, sample_ids
        )
        losses.append(float(loss))
        if callback is not None:
            callback(step_idx, losses[-1], params)
    return params, losses
