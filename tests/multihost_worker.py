"""Worker process for the N-process localhost jax.distributed test.

Launched by tests/test_multihost.py as:
    python tests/multihost_worker.py <process_id> <num_processes> <port> <out>

Each process owns 2 virtual CPU devices; collectives cross processes over
Gloo/TCP — the DCN-path rehearsal from SURVEY.md §4/§7 step 8.
"""

import os
import sys


def main():
    process_id, num_processes, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from pathtracer_tpu.parallel.distributed import (
        initialize,
        is_initialized,
        sync_global_devices,
    )

    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert is_initialized(), "distributed runtime did not come up"
    assert jax.device_count() == 2 * num_processes
    assert jax.local_device_count() == 2

    import jax.numpy as jnp
    import numpy as np
    import optax

    from pathtracer_tpu.inverse import make_train_step, material_params
    from pathtracer_tpu.models.procedural import cornell_box_scene
    from pathtracer_tpu.models.scene import RenderSettings
    from pathtracer_tpu.parallel.mesh import make_mesh
    from pathtracer_tpu.parallel.render import render_pool_sharded

    scene, camera = cornell_box_scene()
    settings = RenderSettings(
        width=16, height=16, samples_per_pixel=4, max_depth=3,
        scheduler="regen",
    )
    mesh = make_mesh()  # all global devices
    assert mesh.size == 2 * num_processes

    # 1) Sharded regenerative render: the psum'd image is replicated, so
    # every process holds the full result.
    image = render_pool_sharded(scene, camera, settings, mesh=mesh)
    image_np = np.asarray(jax.device_get(image))

    # 2) Sharded train step: paired path-replay grads psum over DCN.
    params = material_params(scene)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(settings, optimizer, mesh=mesh)
    n = settings.width * settings.height
    frame = {
        k: jnp.asarray(v)
        for k, v in camera.ray_frame(settings.width, settings.height).items()
    }
    pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    ids_a = jnp.zeros((n,), jnp.uint32)
    new_params, _, loss = step(
        params, opt_state, scene, frame, jnp.zeros((n, 3)), pixel_ids,
        ids_a, ids_a + 1,
    )

    if process_id == 0:
        np.savez(
            out,
            image=image_np,
            loss=np.float32(float(loss)),
            kd=np.asarray(jax.device_get(new_params["mat_Kd"])),
        )
    sync_global_devices("done")
    print(f"worker {process_id}: OK", flush=True)


if __name__ == "__main__":
    main()
