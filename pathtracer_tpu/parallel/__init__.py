from pathtracer_tpu.parallel import mesh, render  # noqa: F401
