from gsdx.dist.mesh import get_mesh, initialize_distributed
from gsdx.dist.train_dp import make_dp_train_step, shard_batch
from gsdx.dist.render_sharded import sharded_composite, make_sharded_tracking_step

__all__ = [
    "get_mesh",
    "initialize_distributed",
    "make_dp_train_step",
    "shard_batch",
    "sharded_composite",
    "make_sharded_tracking_step",
]
