"""Model layer (L4): region-partitioned RBF networks and baselines."""

from irbfn_tpu.models.kernels import BASIS_FUNCTIONS, get_basis
from irbfn_tpu.models.wcrbf import (
    ClusterWCRBFNet,
    DeeperWCRBFNet,
    MLP,
    RegionRBFCore,
    WCRBFNet,
    build_region_bounds,
    overlapping_segments,
    rbf_distances,
    region_activation,
)

_MODEL_CLASSES = {
    "WCRBFNet": WCRBFNet,
    "DeeperWCRBFNet": DeeperWCRBFNet,
    "MLP": MLP,
    "ClusterWCRBFNet": ClusterWCRBFNet,
}


def from_config(config: dict, centers=None, model_class: str = "WCRBFNet"):
    """Rebuild a model from a trainer-written config dict.

    Replaces the reference's ``eval(conf.basis_func)`` reconstruction
    (irbfn_planner.py:68-79) with the kernel registry. The config keys match
    the YAML schema written by the reference trainer
    (train_nmpc_frenet.py:463-480).
    """
    cls = _MODEL_CLASSES[config.get("model_class", model_class)]
    kwargs = dict(
        in_features=config["in_features"],
        out_features=config["out_features"],
        num_kernels=config["num_kernels"],
        basis_func=get_basis(config["basis_func"]),
        num_regions=config["num_regions"],
    )
    if cls is not ClusterWCRBFNet:
        kwargs.update(
            lower_bounds=config["lower_bounds"],
            upper_bounds=config["upper_bounds"],
            dimension_ranges=config["dimension_ranges"],
            activation_idx=config["activation_idx"],
            delta=config["delta"],
        )
    scale = config.get("input_scale")
    if scale is not None and cls is not MLP:
        kwargs["input_scale"] = tuple(float(v) for v in scale)
    if cls is WCRBFNet:
        kwargs.update(
            centers=centers,
            fixed_centers=config.get("fixed_centers", False),
            fixed_width=config.get("fixed_width", False),
            head_mode=config.get("head_mode", "shared"),
        )
    return cls(**kwargs)


__all__ = [
    "BASIS_FUNCTIONS", "get_basis", "ClusterWCRBFNet", "DeeperWCRBFNet",
    "MLP", "RegionRBFCore", "WCRBFNet", "build_region_bounds",
    "rbf_distances", "region_activation", "from_config",
    "overlapping_segments",
]
