from pathtracer_tpu.models import ini, obj, scenegraph, camera, materials, bvh, pack  # noqa: F401
from pathtracer_tpu.models.scene import load_scene, Scene, RenderSettings  # noqa: F401
