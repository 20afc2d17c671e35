from pathtracer_tpu.ops import (  # noqa: F401
    bsdf,
    camera_rays,
    integrator,
    intersect,
    lights,
    rng,
    tonemap,
)
