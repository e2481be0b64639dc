"""Device-mesh and sharding helpers.

The reference scales with process pools (joblib) and a single GPU; here every
parallel axis is an explicit ``jax.sharding.Mesh``:

- ``data``   — batch / lattice axis (DP; replaces joblib fan-out, N7)
- ``expert`` — region axis of the WCRBF region banks (EP; the
  region-partitioned net is a hard-gated mixture-of-experts, SURVEY.md §2.7)

Collectives (gradient psum, region-contraction psum, lattice all-gather) are
inserted by XLA from sharding annotations — no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def make_mesh(devices: Optional[Sequence] = None, expert: int = 1,
              axis_names=(DATA_AXIS, EXPERT_AXIS)) -> Mesh:
    """Build a (data, expert) mesh over the given (or all) devices.

    ``expert`` divides the device count; the remainder becomes the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % expert != 0:
        raise ValueError(f"expert axis {expert} must divide device count {n}")
    arr = np.asarray(devices).reshape(n // expert, expert)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for (B, ...) arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def wcrbf_param_sharding(mesh: Mesh):
    """PartitionSpec tree for WCRBF params: region (expert) axis of the RBF
    banks sharded over EXPERT_AXIS, everything else replicated."""

    def spec_for(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        if "core" in keys and keys[-1] in ("centers", "log_sigs"):
            return P(EXPERT_AXIS)
        return P()

    def apply(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        specs = [spec_for(path, leaf) for path, leaf in flat[0]]
        return jax.tree_util.tree_unflatten(flat[1], [
            NamedSharding(mesh, s) for s in specs])

    return apply


def shard_params(params, mesh: Mesh):
    shardings = wcrbf_param_sharding(mesh)(params)
    return jax.tree.map(jax.device_put, params, shardings)
