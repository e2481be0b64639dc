#!/usr/bin/env python
"""Goal-MPC net trainer (reference deprecated/train_goal_mpc.py): fit a
WCRBF net mapping (v_car, x_goal, y_goal, t_goal, v_goal) -> (speed, steer)
on a table produced by scripts/gen_goal_mpc_table.py.

The reference trains a single-region WCRBF on normalized inputs with L1 loss
for thousands of Adam epochs (train_goal_mpc.py:95-230); here the anisotropic
``input_scale`` metric replaces input normalization (same effect inside the
RBF distance, without a preprocessing step the planner must remember) and the
closed-form per-region Cholesky fit replaces the Adam epochs, with an
optional L1 fine-tune.

Writes the YAML config + orbax checkpoint pair (train.checkpoints registry)
that eval_goal_mpc.py consumes via --config_f/--ckpt.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from irbfn_tpu.models import WCRBFNet, get_basis  # noqa: E402
from irbfn_tpu.models.fit import (choose_centers, data_scale,  # noqa: E402
                                  device_table, fit_direct, fit_per_region)
from irbfn_tpu.models.wcrbf import build_region_bounds  # noqa: E402
from irbfn_tpu.train import (create_train_state, make_train_step,  # noqa: E402
                             region_spec_from_table, save_checkpoint,
                             save_config, train_epochs)

DIMS = ["v_car", "x_goal", "y_goal", "t_goal", "v_goal"]


def pred_l1_loss(apply_fn, params, x, y, dyn_params):
    """Plain prediction L1 — the reference goal-MPC training loss
    (train_goal_mpc.py:181-196)."""
    y_pred = apply_fn(params, x)
    loss = jnp.abs(y_pred - y).mean()
    return loss, (loss, jnp.zeros_like(loss))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--run_name", type=str, default="goal_mpc_pr")
    p.add_argument("--num_k", type=int, default=256)
    for d in DIMS:
        p.add_argument(f"--num_{d}", type=int, default=1,
                       help=f"region splits along {d}")
    p.add_argument("--num_overlap", type=int, default=1)
    p.add_argument("--basis_function", type=str, default="inverse_quadratic",
                   help="reference default (train_goal_mpc.py:141)")
    p.add_argument("--fit_mode", type=str, default="per_region",
                   choices=["shared", "per_region"])
    p.add_argument("--reg", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--finetune_epochs", type=int, default=0)
    p.add_argument("--finetune_lr", type=float, default=1e-4)
    p.add_argument("--batch", type=int, default=8192)
    args = p.parse_args()

    data = np.load(args.npz_path)
    inputs = data["inputs"].astype(np.float32)
    outputs = data["outputs"].astype(np.float32)
    valid = data["valid"]
    inputs, outputs = inputs[valid], outputs[valid]
    print(f"{inputs.shape[0]:,} converged rows")

    splits = [getattr(args, f"num_{d}") for d in DIMS]
    lower_bounds, upper_bounds, dimension_ranges, delta = (
        region_spec_from_table(inputs, splits, num_overlap=args.num_overlap))
    num_regions = int(np.prod(splits))
    activation_idx = list(range(5))
    input_scale = tuple(float(v) for v in data_scale(inputs))

    model = WCRBFNet(
        in_features=5, out_features=2, num_kernels=args.num_k,
        basis_func=get_basis(args.basis_function), num_regions=num_regions,
        lower_bounds=lower_bounds, upper_bounds=upper_bounds,
        dimension_ranges=dimension_ranges, activation_idx=activation_idx,
        delta=delta, input_scale=input_scale, head_mode=args.fit_mode)
    config = {
        "model_class": "WCRBFNet", "in_features": 5, "out_features": 2,
        "num_kernels": args.num_k, "basis_func": args.basis_function,
        "num_regions": num_regions, "lower_bounds": lower_bounds,
        "upper_bounds": upper_bounds, "dimension_ranges": dimension_ranges,
        "activation_idx": activation_idx, "delta": delta,
        "seed": args.seed, "input_scale": list(input_scale),
        "head_mode": args.fit_mode,
    }
    os.makedirs("configs", exist_ok=True)
    save_config(f"configs/{args.run_name}.yaml", config)
    ckpt_dir = os.path.abspath(f"ckpts/{args.run_name}")

    state = create_train_state(model, jax.random.PRNGKey(args.seed),
                               jnp.ones((8, 5), jnp.float32), lr=1e-3)

    t0 = time.time()
    x_dev, y_dev, _ = device_table(inputs, outputs)
    x_dev.block_until_ready()
    print(f"table resident on device in {time.time() - t0:.1f}s "
          f"({(x_dev.nbytes + y_dev.nbytes) / 2**20:.0f} MB)")
    lb, ub = build_region_bounds(lower_bounds, upper_bounds,
                                 dimension_ranges, activation_idx)
    centers, log_sigs = choose_centers(
        inputs, num_kernels=args.num_k, num_regions=num_regions,
        seed=args.seed, input_scale=input_scale, lb=lb, ub=ub,
        activation_idx=activation_idx)
    basis = get_basis(args.basis_function)
    t0 = time.time()
    if args.fit_mode == "per_region":
        fit = fit_per_region(inputs, outputs, centers, log_sigs,
                             jnp.asarray(lb), jnp.asarray(ub),
                             jnp.asarray(delta), tuple(activation_idx),
                             basis, reg=args.reg, input_scale=input_scale,
                             x_dev=x_dev, y_dev=y_dev)
    else:
        fit = fit_direct(inputs, outputs, centers, log_sigs,
                         jnp.asarray(lb), jnp.asarray(ub),
                         jnp.asarray(delta), tuple(activation_idx),
                         basis, reg=args.reg, input_scale=input_scale)
    print(f"direct fit in {time.time() - t0:.1f}s")
    params = dict(state.params["params"])
    params["core"] = {"centers": fit.centers, "log_sigs": fit.log_sigs}
    params["head"] = {"kernel": fit.weights, "bias": fit.bias}
    state = state.replace(params={"params": params})

    if args.finetune_epochs > 0:
        steps_per_epoch = max(1, inputs.shape[0] // args.batch)
        state = create_train_state(
            model, jax.random.PRNGKey(args.seed),
            jnp.ones((8, 5), jnp.float32), lr=args.finetune_lr,
            decay_steps=args.finetune_epochs * steps_per_epoch).replace(
                params={"params": params})
        step_fn = make_train_step(pred_l1_loss, None)
        t0 = time.time()
        state, _ = train_epochs(
            state, step_fn, inputs, outputs, batch_size=args.batch,
            epochs=args.finetune_epochs, rng=jax.random.PRNGKey(args.seed),
            log_fn=lambda s, m: print(
                f"  step {s}: L1 {float(m.loss):.4f}", flush=True),
            log_every=200)
        print(f"fine-tuned {args.finetune_epochs} epochs "
              f"in {time.time() - t0:.1f}s")

    save_checkpoint(ckpt_dir, state, step=0)
    print(f"checkpoint at {ckpt_dir}")

    # strided probe over true rows (x_dev is zero-padded)
    apply = jax.jit(lambda pr, xb: model.apply({"params": pr["params"]}, xb))
    n_rows = inputs.shape[0]
    n_probe = min(65536, n_rows)
    stride = max(n_rows // n_probe, 1)
    idx_all = np.arange(0, n_rows, stride)[:n_probe]
    ae_sum = np.zeros(2)
    n_seen = 0
    for i0 in range(0, idx_all.size, 8192):
        idx = jnp.asarray(idx_all[i0:i0 + 8192])
        pred = apply(state.params, x_dev[idx])
        ae_sum += np.asarray(jnp.abs(pred - y_dev[idx]).sum(axis=0))
        n_seen += int(idx.size)
    print(f"speed MAE {ae_sum[0] / n_seen:.4f} m/s, "
          f"steer MAE {ae_sum[1] / n_seen:.4f} rad "
          f"(on {n_seen:,} strided rows)")


if __name__ == "__main__":
    main()
