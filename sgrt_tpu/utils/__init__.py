from sgrt_tpu.utils.objio import read_obj_vertices
from sgrt_tpu.utils.image import write_png

__all__ = ["read_obj_vertices", "write_png"]
