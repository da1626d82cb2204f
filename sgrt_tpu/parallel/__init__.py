from sgrt_tpu.parallel.mesh import make_mesh, shard_rays
from sgrt_tpu.parallel.render import render_sharded
from sgrt_tpu.parallel.fit import make_train_step, fit

__all__ = ["make_mesh", "shard_rays", "render_sharded", "make_train_step", "fit"]
