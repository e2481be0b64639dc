#!/usr/bin/env python
"""Cartesian trainer (reference scripts/train_nmpc.py equivalent): loads a
cartesian NMPC table (gen_nmpc_table_cartesian.py), filters infeasible rows,
optional mirror augmentation, fits a WCRBF model — closed form with
``--direct_fit`` (shared or per-region heads) and/or SGD with the
full-rollout integration loss (train_nmpc.py:303-421 semantics).

Writes the YAML config + orbax checkpoint pairing IRBFNPlanner loads.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.models import WCRBFNet, get_basis
from irbfn_tpu.train import (cartesian_fullint_loss, create_train_state,
                             make_train_step, mirror_cartesian_table,
                             save_checkpoint, save_config, train_epochs)
from irbfn_tpu.utils.profiling import MetricLogger

DIMS = ["v_car", "x_goal", "y_goal", "t_goal", "v_goal", "beta", "angv_z"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--mirror_data", action="store_true")
    p.add_argument("--basis_function", type=str, default="gaussian")
    p.add_argument("--num_k", type=int, default=256)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=80000)
    p.add_argument("--train_epochs", type=int, default=0)
    p.add_argument("--run_name", type=str, default="dnmpc_cart_tpu")
    p.add_argument("--direct_fit", action="store_true")
    p.add_argument("--fit_mode", choices=["shared", "per_region"],
                   default="shared")
    p.add_argument("--finetune_epochs", type=int, default=0)
    p.add_argument("--mu", type=float, default=1.0)
    p.add_argument("--cs", type=float, default=5.0)
    for name in DIMS:
        p.add_argument(f"--num_{name}", type=int, default=1)
    args = p.parse_args()

    data = np.load(args.npz_path)
    inputs, outputs = data["inputs"], data["outputs"]
    valid = ~np.any(outputs == -999.0, axis=1)
    inputs, outputs = inputs[valid], outputs[valid]
    print(f"{inputs.shape[0]:,} feasible rows")
    if args.mirror_data:
        inputs, outputs = mirror_cartesian_table(inputs, outputs)

    from irbfn_tpu.train import region_spec_from_table

    splits = [getattr(args, f"num_{d}") for d in DIMS]
    lower_bounds, upper_bounds, dimension_ranges, delta = (
        region_spec_from_table(inputs, splits))
    num_regions = int(np.prod(splits))
    activation_idx = list(range(7))

    from irbfn_tpu.models.fit import data_scale

    input_scale = tuple(float(v) for v in data_scale(inputs))
    model = WCRBFNet(
        in_features=7, out_features=outputs.shape[1], num_kernels=args.num_k,
        basis_func=get_basis(args.basis_function), num_regions=num_regions,
        lower_bounds=lower_bounds, upper_bounds=upper_bounds,
        dimension_ranges=dimension_ranges, activation_idx=activation_idx,
        delta=delta, input_scale=input_scale, head_mode=args.fit_mode)
    config = {
        "model_class": "WCRBFNet", "in_features": 7,
        "out_features": outputs.shape[1], "num_kernels": args.num_k,
        "basis_func": args.basis_function, "num_regions": num_regions,
        "lower_bounds": lower_bounds, "upper_bounds": upper_bounds,
        "dimension_ranges": dimension_ranges,
        "activation_idx": activation_idx, "delta": delta,
        "epochs": args.train_epochs, "lr": args.lr,
        "batch_size": args.batch_size, "seed": args.seed,
        "mu": args.mu, "cs": args.cs, "mirror": args.mirror_data,
        "input_scale": list(input_scale), "head_mode": args.fit_mode,
        "pipeline": "cartesian",
    }
    os.makedirs("configs", exist_ok=True)
    save_config(f"configs/{args.run_name}.yaml", config)
    ckpt_dir = os.path.abspath(f"ckpts/{args.run_name}")

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    bs = min(args.batch_size, inputs.shape[0])
    state = create_train_state(model, init_rng, jnp.ones((bs, 7), jnp.float32),
                               lr=args.lr, max_grad_norm=args.max_grad_norm)

    if args.direct_fit:
        import time

        from irbfn_tpu.models.fit import (choose_centers, fit_direct,
                                          fit_per_region)
        from irbfn_tpu.models.wcrbf import build_region_bounds

        x = jnp.asarray(inputs, jnp.float32)
        yv = jnp.asarray(outputs, jnp.float32)
        lb, ub = build_region_bounds(lower_bounds, upper_bounds,
                                     dimension_ranges, activation_idx)
        centers, log_sigs = choose_centers(
            x, num_kernels=args.num_k, num_regions=num_regions,
            seed=args.seed, input_scale=input_scale, lb=lb, ub=ub,
            activation_idx=activation_idx)
        fitter = fit_per_region if args.fit_mode == "per_region" else fit_direct
        t0 = time.time()
        fit = fitter(x, yv, centers, log_sigs, jnp.asarray(lb),
                     jnp.asarray(ub), jnp.asarray(delta),
                     tuple(activation_idx), get_basis(args.basis_function),
                     input_scale=input_scale)
        print(f"direct fit in {time.time() - t0:.1f}s")
        # checkpoint BEFORE the L1 probe, and probe in chunks: a full-batch
        # predict materializes a (B, R, K) feature intermediate that OOMs
        # HBM next to the resident table (same failure train_frenet.py hit)
        params = dict(state.params["params"])
        params["core"] = {"centers": fit.centers, "log_sigs": fit.log_sigs}
        params["head"] = {"kernel": fit.weights, "bias": fit.bias}
        state = state.replace(params={"params": params})
        save_checkpoint(ckpt_dir, state, step=0)
        print(f"checkpoint at {ckpt_dir}")
        n_rows = inputs.shape[0]
        n_probe = min(65536, n_rows)
        stride = max(n_rows // n_probe, 1)
        idx_all = np.arange(0, n_rows, stride)[:n_probe]
        l1_sum, n_seen = 0.0, 0
        for i0 in range(0, idx_all.size, 8192):
            idx = jnp.asarray(idx_all[i0:i0 + 8192])
            pred = fit.predict(x[idx], jnp.asarray(lb), jnp.asarray(ub),
                               jnp.asarray(delta), tuple(activation_idx),
                               get_basis(args.basis_function))
            l1_sum += float(jnp.abs(pred - yv[idx]).sum())
            n_seen += int(idx.size)
        l1 = l1_sum / (n_seen * outputs.shape[1])
        print(f"control L1 {l1:.4f} (on {n_seen:,} strided rows)")
        if args.finetune_epochs <= 0:
            return
        args.train_epochs = args.finetune_epochs
        print(f"fine-tuning {args.finetune_epochs} epochs")

    if args.train_epochs <= 0:
        return
    dyn_params = f1tenth_params(mu=args.mu, cs=args.cs).to_vector()
    step_fn = make_train_step(cartesian_fullint_loss, dyn_params, donate=False)
    logger = MetricLogger(path=f"ckpts/{args.run_name}.metrics.jsonl",
                          config=config)

    def log_fn(step, metrics):
        logger.log({"train_loss_batch": metrics.loss,
                    "pred_loss_batch": metrics.pred_loss,
                    "int_loss_batch": metrics.int_loss}, step=step)

    state, final_loss = train_epochs(
        state, step_fn, inputs.astype(np.float32), outputs.astype(np.float32),
        bs, args.train_epochs, rng, log_fn=log_fn,
        checkpoint_fn=lambda s, e: save_checkpoint(ckpt_dir, s, step=e + 1))
    print(f"final mean loss {final_loss:.6f}; checkpoints at {ckpt_dir}")
    logger.close()


if __name__ == "__main__":
    main()
