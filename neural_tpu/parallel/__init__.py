from .sharding import (make_mesh, shard_params, shard_cache, param_specs,
                       cache_specs)
from .tp import make_tp_step
from .multihost import init_distributed, auto_mesh, is_primary

__all__ = ["make_mesh", "shard_params", "shard_cache", "param_specs",
           "cache_specs", "make_tp_step", "init_distributed", "auto_mesh",
           "is_primary"]
