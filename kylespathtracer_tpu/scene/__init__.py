from kylespathtracer_tpu.scene.types import Scene, Materials, OBJ  # noqa: F401
from kylespathtracer_tpu.scene.scene import default_scene  # noqa: F401
