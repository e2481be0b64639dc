"""Mesh/sharding helpers and sharded lattice datagen."""

from irbfn_tpu.parallel.datagen import (
    CLOTHOID_GRID,
    FRENET_GRID,
    GridSpec,
    build_lattice,
    frenet_table,
    save_table,
    solve_lattice_sharded,
    TableSolution,
)
from irbfn_tpu.parallel.mesh import (
    DATA_AXIS,
    EXPERT_AXIS,
    data_sharding,
    make_mesh,
    replicated,
    shard_params,
    wcrbf_param_sharding,
)

__all__ = [
    "CLOTHOID_GRID", "FRENET_GRID", "GridSpec", "build_lattice",
    "frenet_table", "save_table", "solve_lattice_sharded", "TableSolution", "DATA_AXIS",
    "EXPERT_AXIS", "data_sharding", "make_mesh", "replicated",
    "shard_params", "wcrbf_param_sharding",
]
