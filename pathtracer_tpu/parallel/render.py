"""Sharded rendering over a device mesh.

The path-tracing analogue of data parallelism (SURVEY.md §2.4): the flat
pixel batch shards across the ``rays`` mesh axis, the scene replicates, and
each device traces its pixel slice with ``shard_map``. Because the RNG is
counter-based on (pixel, sample) — ops.rng — the sharded render is
bit-identical to the single-device render regardless of device count or
placement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pathtracer_tpu.models.camera import Camera
from pathtracer_tpu.models.scene import RenderSettings, Scene
from pathtracer_tpu.ops import rng
from pathtracer_tpu.ops.camera_rays import generate_rays
from pathtracer_tpu.ops.integrator import radiance_batch
from pathtracer_tpu.parallel.mesh import RAY_AXIS, make_mesh


def _wave_local(scene, frame, sample_idx, pixel_ids, settings):
    """Per-shard sample wave on local pixel ids [b_local]."""
    sample_ids = jnp.full(pixel_ids.shape, sample_idx, dtype=jnp.uint32)
    if settings.rng == "threefry":
        keys = rng.ray_keys(jax.random.PRNGKey(0), pixel_ids, sample_ids)
        jitter = rng.pixel_jitter_threefry(keys)
    else:
        jitter = rng.pixel_jitter_hash(pixel_ids, sample_ids)
    o, d = generate_rays(frame, settings.width, settings.height, pixel_ids, jitter)
    return jnp.maximum(
        radiance_batch(scene, settings, o, d, pixel_ids, sample_ids), 0.0
    )


@functools.partial(jax.jit, static_argnames=("settings", "mesh"))
def sample_wave_sharded(scene: Scene, frame, settings: RenderSettings, sample_idx, mesh):
    """One sample for every pixel, pixels sharded over the mesh -> [HW, 3].

    Pixel count must divide the mesh size (render_sharded pads to this).
    """
    n_pixels = settings.width * settings.height
    pixel_ids = jnp.arange(n_pixels, dtype=jnp.uint32)

    wave = jax.shard_map(
        functools.partial(_wave_local, settings=settings),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
    )
    return wave(scene, frame, sample_idx, pixel_ids)


def render_sharded(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    mesh=None,
    progress_callback=None,
):
    """Progressive sharded render -> mean radiance [H, W, 3] (pre-tonemap)."""
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.size
    n_pixels = settings.width * settings.height
    if n_pixels % n_dev != 0:
        raise ValueError(
            f"pixel count {n_pixels} must divide the mesh size {n_dev}"
        )

    frame = {
        k: jnp.asarray(v)
        for k, v in camera.ray_frame(settings.width, settings.height).items()
    }
    # Replicate scene/frame; let pixels shard.
    rep = NamedSharding(mesh, P())
    scene = jax.device_put(scene, rep)
    frame = jax.device_put(frame, rep)

    acc = jnp.zeros((n_pixels, 3), dtype=jnp.float32)
    for s in range(settings.samples_per_pixel):
        acc = acc + sample_wave_sharded(scene, frame, settings, jnp.uint32(s), mesh)
        if progress_callback is not None:
            progress_callback(s + 1, settings.samples_per_pixel)
    mean = acc / settings.samples_per_pixel
    return mean.reshape(settings.height, settings.width, 3)
