from . import multihost
from .distributed import maybe_initialize
from .mesh import (batch_spec, default_mesh_shape, make_mesh,
                   parse_mesh_shape, replicate, replicated_sharding,
                   shard_batch, shard_gvars, spatial_constraint)

__all__ = ["batch_spec", "default_mesh_shape", "make_mesh",
           "parse_mesh_shape", "replicate", "replicated_sharding",
           "shard_batch", "shard_gvars", "spatial_constraint",
           "maybe_initialize", "multihost"]
