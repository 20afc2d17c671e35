from pathtracer_tpu.utils import math, image  # noqa: F401
