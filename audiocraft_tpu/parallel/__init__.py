"""Parallelism: device mesh, sharding rules, distributed facade."""
# flake8: noqa
from . import distrib, mesh, sharding
from .mesh import batch_sharding, create_mesh, replicated
from .sharding import infer_shardings, shard_params
