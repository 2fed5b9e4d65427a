from .sharding import (make_mesh, shard_params, shard_cache, param_specs,
                       cache_specs)
from .tp import make_tp_step
from .multihost import init_distributed, auto_mesh, is_primary
from .sp import ring_attend, sequence_sharded_forward
from .ep import ep_moe, expert_capacity, ep_param_specs
from .pp import make_pp_train_step, pp_param_specs, fix_replicated_grads

__all__ = ["make_mesh", "shard_params", "shard_cache", "param_specs",
           "cache_specs", "make_tp_step", "init_distributed", "auto_mesh",
           "is_primary", "ring_attend", "sequence_sharded_forward",
           "ep_moe", "expert_capacity", "make_pp_train_step",
           "pp_param_specs", "fix_replicated_grads"]
