from sgrt_tpu.models.gaussians import GaussianScene, grid_scene, pad_scene, scene_from_obj
from sgrt_tpu.models.camera import Camera

__all__ = ["GaussianScene", "grid_scene", "pad_scene", "scene_from_obj", "Camera"]
