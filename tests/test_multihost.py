"""N-process localhost ``jax.distributed`` test (SURVEY.md §4, §7 step 8).

Two processes x 2 virtual CPU devices each; collectives run over Gloo/TCP —
the DCN-path rehearsal for multi-host pods. The multi-process results must
match this (single-process, 8-virtual-device) process's own values: the
counter-based RNG makes per-path radiance placement-independent, so the
image agrees to fp-summation-order tolerance and the psum'd gradients to
reduction-order tolerance.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_localhost(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    out = str(tmp_path / "proc0.npz")
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"

    with np.load(out) as z:
        image, loss, kd = z["image"], z["loss"], z["kd"]

    # Single-process reference (this pytest process has 8 CPU devices).
    import jax.numpy as jnp
    import optax

    from pathtracer_tpu.inverse import make_train_step, material_params
    from pathtracer_tpu.models.procedural import cornell_box_scene
    from pathtracer_tpu.models.scene import RenderSettings
    from pathtracer_tpu.render import render

    scene, camera = cornell_box_scene()
    settings = RenderSettings(
        width=16, height=16, samples_per_pixel=4, max_depth=3,
        scheduler="regen",
    )
    single = np.asarray(render(scene, camera, settings))
    np.testing.assert_allclose(image, single, rtol=3e-5, atol=3e-6)

    params = material_params(scene)
    optimizer = optax.adam(1e-2)
    step = make_train_step(settings, optimizer, mesh=None)
    n = settings.width * settings.height
    frame = {
        k: jnp.asarray(v)
        for k, v in camera.ray_frame(settings.width, settings.height).items()
    }
    pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    ids_a = jnp.zeros((n,), jnp.uint32)
    ref_params, _, ref_loss = step(
        params, optimizer.init(params), scene, frame, jnp.zeros((n, 3)),
        pixel_ids, ids_a, ids_a + 1,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        kd, np.asarray(ref_params["mat_Kd"]), rtol=1e-4, atol=1e-6
    )
