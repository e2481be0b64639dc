"""Training layer (L6): losses, train loops, checkpoint/config I/O."""

from irbfn_tpu.train.checkpoints import (
    load_config,
    input_bounds_from_config,
    load_model,
    restore_params,
    save_checkpoint,
    save_config,
)
from irbfn_tpu.train.trainer import (
    StepMetrics,
    TrainState,
    cartesian_fullint_loss,
    clothoid_endpoint_loss,
    cluster_fullint_loss,
    create_train_state,
    frenet_fullint_loss,
    frenet_oneint_loss,
    make_train_step,
    mirror_cartesian_table,
    region_spec_from_table,
    mirror_frenet_table,
    train_epochs,
)

__all__ = [
    "input_bounds_from_config", "load_config", "load_model", "restore_params", "save_checkpoint",
    "save_config", "StepMetrics", "TrainState", "cartesian_fullint_loss",
    "clothoid_endpoint_loss",
    "cluster_fullint_loss", "create_train_state", "frenet_fullint_loss",
    "frenet_oneint_loss", "make_train_step", "mirror_cartesian_table",
    "region_spec_from_table",
    "mirror_frenet_table",
    "train_epochs",
]
