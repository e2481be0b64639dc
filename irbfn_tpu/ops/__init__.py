"""Device-side primitive ops: geometry, Pallas kernels."""

from irbfn_tpu.ops.geometry import (
    intersect_point,
    nearest_point,
    rotation_matrix,
    zero_to_2pi,
)

__all__ = ["intersect_point", "nearest_point", "rotation_matrix", "zero_to_2pi"]
