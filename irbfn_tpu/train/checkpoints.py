"""Checkpointing and config round-trip.

The reference pairs every checkpoint with a YAML file holding the exact
model-constructor arguments, reloaded with ``argparse.Namespace`` +
``eval(basis_func)`` (train_nmpc_frenet.py:456-482, irbfn_planner.py:46-79),
and stores flax legacy msgpack checkpoints with orbax explicitly disabled.

Here: same YAML-config-next-to-checkpoint convention (it is the planner
loading ABI), but the basis function goes through the kernel registry
instead of ``eval``, and weights go through **orbax** (sharding-aware, the
TPU-native checkpoint path).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml

from irbfn_tpu.models import from_config


def save_config(path: str, config: dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_pyify(config), f, default_flow_style=False)


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _pyify(tree):
    """numpy/jax scalars+arrays -> plain python for yaml."""
    if isinstance(tree, dict):
        return {k: _pyify(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_pyify(v) for v in tree]
    if isinstance(tree, (np.generic,)):
        return tree.item()
    if hasattr(tree, "tolist"):
        return tree.tolist()
    return tree


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 100):
    """Save train-state params (+opt state) with orbax, keeping history
    like the reference's ``keep=100`` (train_nmpc_frenet.py:560-565)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    mngr = ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep))
    # materialize to host numpy so the checkpoint carries NO device-sharding
    # metadata: a ckpt written on TPU must restore on CPU and vice versa
    # (orbax records jax.Array shardings and refuses foreign devices)
    payload = jax.tree.map(
        lambda a: np.asarray(a) if hasattr(a, "dtype") else a,
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step})
    # explicit delete-then-save: orbax otherwise SILENTLY skips (or, with
    # force=True, raises StepAlreadyExistsError for) a save whose step
    # already exists, leaving a stale checkpoint paired with a fresh YAML
    # config (re-running a trainer with the same run_name restored the
    # previous run's weights and shape-errored on load)
    if step in mngr.all_steps():
        mngr.delete(step)
    mngr.save(step, args=ocp.args.StandardSave(payload))
    mngr.wait_until_finished()
    mngr.close()


def restore_params(ckpt_dir: str, step: Optional[int] = None, template=None):
    """Restore the params pytree (latest step if unspecified).

    Passing ``template`` (a pytree of arrays/ShapeDtypeStructs with the
    expected topology, e.g. from ``model.init``) makes the restore
    structure-checked and sharding-aware; without it orbax restores the
    stored topology as saved.
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    mngr = ocp.CheckpointManager(ckpt_dir)
    step = mngr.latest_step() if step is None else step
    try:
        restored = mngr.restore(step)
    except ValueError:
        # older ckpt with foreign-device sharding metadata (saved as
        # jax.Arrays on another platform): restore into a host-numpy
        # template built from the stored shapes/dtypes
        meta = mngr.item_metadata(step)
        tmpl = jax.tree.map(lambda m: np.zeros(m.shape, m.dtype), meta.tree)
        restored = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
    mngr.close()
    params = restored["params"]
    if template is not None:
        # structure check against the expected topology
        expect = jax.tree_util.tree_structure(template)
        got = jax.tree_util.tree_structure(params)
        if expect != got:
            raise ValueError(
                f"checkpoint params topology {got} != expected {expect}")
    return params


def input_bounds_from_config(config: dict):
    """Per-input-dim (in_features, 2) [lo, hi] of the trained grid, from the
    config's region bounds (the union of segment bounds per activation dim).
    Dims without region bounds get +-inf (no clamp). For
    IRBFNFrenetPlanner(input_bounds=...)."""
    n = int(config["in_features"])
    out = np.full((n, 2), (-np.inf, np.inf), np.float64)
    for d, lbs, ubs in zip(config.get("activation_idx", []),
                           config.get("lower_bounds", []),
                           config.get("upper_bounds", [])):
        out[int(d), 0] = float(min(lbs))
        out[int(d), 1] = float(max(ubs))
    return out


def load_model(config_path: str, ckpt_dir: Optional[str] = None,
               centers=None, step: Optional[int] = None):
    """Rebuild (model, params) from a config YAML + checkpoint dir — the
    planner-loading ABI (irbfn_planner.py:46-90 equivalent, eval-free)."""
    config = load_config(config_path)
    model = from_config(config, centers=centers)
    params = restore_params(ckpt_dir, step) if ckpt_dir else None
    return model, params, config
