from .mesh import (MeshConfig, make_mesh, make_shard_fn, parse_mesh_spec,
                   param_pspec, shard_params, shard_kv, shard_sampler_state)

__all__ = ["MeshConfig", "make_mesh", "make_shard_fn", "parse_mesh_spec",
           "param_pspec", "shard_params", "shard_kv", "shard_sampler_state"]
