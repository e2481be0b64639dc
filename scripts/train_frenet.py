#!/usr/bin/env python
"""Flagship Frenet trainer (reference scripts/train_nmpc_frenet.py
equivalent): loads a solver table, filters infeasible rows, optional mirror
augmentation, builds region bounds from the grid, trains a WCRBF-family model
with pred + integration losses — or fits it in closed form with
``--direct_fit`` (the Cholesky path the reference lacks).

Writes the YAML config + orbax checkpoints pairing that the planners load.
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
from irbfn_tpu.models import (ClusterWCRBFNet, DeeperWCRBFNet, MLP, WCRBFNet,
                              get_basis)
from irbfn_tpu.train import (cluster_fullint_loss, create_train_state,
                             frenet_fullint_loss, frenet_oneint_loss,
                             make_train_step, mirror_frenet_table,
                             save_checkpoint, save_config, train_epochs)
from irbfn_tpu.utils.args import add_train_args, add_vehicle_args
from irbfn_tpu.utils.profiling import MetricLogger

DIMS = ["ey", "delta", "vx_car", "vy_car", "vx_goal", "wz", "epsi", "curv"]


def region_spec_from_table(inputs, splits, num_overlap: int = 1):
    """Moved to irbfn_tpu.train.trainer (shared with train_cartesian.py)."""
    from irbfn_tpu.train import region_spec_from_table as impl

    return impl(inputs, splits, num_overlap)


def main():
    p = argparse.ArgumentParser()
    add_train_args(p)
    add_vehicle_args(p)
    args = p.parse_args()

    data = np.load(args.npz_path)
    inputs, outputs = data["inputs"], data["outputs"]
    from irbfn_tpu.parallel.datagen import controls_block
    outputs = controls_block(outputs)
    valid = ~np.any(outputs == -999.0, axis=1)
    inputs, outputs = inputs[valid], outputs[valid]
    print(f"{inputs.shape[0]:,} feasible rows")

    if args.mirror_data:
        if args.use_cluster:
            # cluster ids are per-TABLE-row (…_cluster_ids.npz aligns with
            # the unmirrored table); the reflected copy's active-constraint
            # pattern is a permutation of the original's, not the same id,
            # so mirror augmentation would mislabel half the CE targets.
            # The reference's cluster runs train unmirrored
            # (scripts/configs/dnmpc_500_clusters*.yaml).
            raise SystemExit("--use_cluster is incompatible with "
                             "--mirror_data (cluster ids align with the "
                             "unmirrored table)")
        inputs, outputs = mirror_frenet_table(inputs, outputs)
    if args.only_onestep:
        T = outputs.shape[1] // 2
        outputs = outputs[:, [0, T]]

    splits = [getattr(args, f"num_{d}") for d in DIMS]
    lower_bounds, upper_bounds, dimension_ranges, delta = (
        region_spec_from_table(inputs, splits))
    num_regions = int(np.prod(splits))
    activation_idx = list(range(8))

    centers = None
    if args.use_centers:
        cdata = np.load(args.npz_path[:-4] + args.centers_name +
                        args.npz_path[-4:])
        centers = cdata["centers"]
        # the cluster bank IS the kernel budget (one kernel per top-k
        # activation pattern, nmpc_constraint_regions.ipynb semantics)
        args.num_k = int(centers.shape[0])

    # anisotropic RBF metric: normalize each input dim by its data std so
    # e.g. curvature (+-0.45) and velocity (1-8) contribute comparably to
    # kernel distances (models/fit.py:data_scale)
    from irbfn_tpu.models.fit import data_scale

    input_scale = tuple(float(v) for v in data_scale(inputs))

    model_kwargs = dict(
        in_features=8, out_features=outputs.shape[1], num_kernels=args.num_k,
        basis_func=get_basis(args.basis_function), num_regions=num_regions,
        lower_bounds=lower_bounds, upper_bounds=upper_bounds,
        dimension_ranges=dimension_ranges, activation_idx=activation_idx,
        delta=delta, input_scale=input_scale)
    model_class = "WCRBFNet"
    if args.deeper:
        model = DeeperWCRBFNet(**model_kwargs)
        model_class = "DeeperWCRBFNet"
    elif args.mlp:
        model = MLP(**model_kwargs)
        model_class = "MLP"
    elif args.use_cluster:
        num_regions = args.num_clusters + 1
        model = ClusterWCRBFNet(
            in_features=8, out_features=outputs.shape[1],
            num_kernels=args.num_k, basis_func=get_basis(args.basis_function),
            num_regions=num_regions, input_scale=input_scale)
        model_class = "ClusterWCRBFNet"
    else:
        model = WCRBFNet(**model_kwargs, centers=centers,
                         fixed_centers=args.fixed_centers,
                         fixed_width=args.fixed_width,
                         head_mode=args.fit_mode)

    config = {
        "model_class": model_class, "in_features": 8,
        "out_features": outputs.shape[1], "num_kernels": args.num_k,
        "basis_func": args.basis_function, "num_regions": num_regions,
        "lower_bounds": lower_bounds, "upper_bounds": upper_bounds,
        "dimension_ranges": dimension_ranges,
        "activation_idx": activation_idx, "delta": delta,
        "epochs": args.train_epochs, "lr": args.lr,
        "batch_size": args.batch_size, "seed": args.seed,
        "mu": args.mu, "cs": args.cs,
        "fixed_centers": args.fixed_centers, "fixed_width": args.fixed_width,
        "input_scale": list(input_scale),
        "head_mode": args.fit_mode if model_class == "WCRBFNet" else "shared",
    }
    os.makedirs("configs", exist_ok=True)
    save_config(f"configs/{args.run_name}.yaml", config)
    ckpt_dir = os.path.abspath(f"ckpts/{args.run_name}")

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    bs = min(args.batch_size, inputs.shape[0])
    state = create_train_state(model, init_rng,
                               jnp.ones((bs, 8), jnp.float32),
                               lr=args.lr, max_grad_norm=args.max_grad_norm)

    if args.direct_fit:
        # closed-form Cholesky fit: solve the head weights (and install the
        # chosen centers/widths) directly — orders of magnitude faster than
        # the Adam path for table fitting
        import time

        from irbfn_tpu.models.fit import (choose_centers, device_table,
                                          fit_direct, fit_per_region,
                                          tube_weights)
        from irbfn_tpu.models.wcrbf import build_region_bounds

        # one upload: through the remote-TPU tunnel the host link is the
        # bottleneck, so the table goes to HBM once and the tube weighting
        # + per-region gram passes gather rows device-side
        t0 = time.time()
        x_dev, y_dev, _ = device_table(inputs, outputs)
        x_dev.block_until_ready()
        print(f"table resident on device in {time.time() - t0:.1f}s "
              f"({(x_dev.nbytes + y_dev.nbytes) / 2**20:.0f} MB)")
        lb, ub = build_region_bounds(lower_bounds, upper_bounds,
                                     dimension_ranges, activation_idx)
        sample_weight = None
        if args.tube_npz:
            tube = np.load(args.tube_npz)["states"]
            t0 = time.time()
            sample_weight = tube_weights(inputs, tube,
                                         input_scale=input_scale,
                                         bandwidth=args.tube_bandwidth,
                                         floor=args.tube_floor,
                                         x_dev=x_dev)
            frac = float((sample_weight > 2 * args.tube_floor).mean())
            print(f"tube weights from {tube.shape[0]} visited states in "
                  f"{time.time() - t0:.1f}s; {100 * frac:.1f}% of rows "
                  "substantially weighted")
        if centers is not None:
            # constraint-cluster warm starts (--use_centers): every region
            # shares the top-k activation-pattern mode centers; widths from
            # the same nearest-neighbor recipe choose_centers uses
            from irbfn_tpu.models.fit import widths_from_centers

            c_np = np.broadcast_to(
                np.asarray(centers, np.float32),
                (num_regions,) + np.asarray(centers).shape).copy()
            centers = jnp.asarray(c_np)
            log_sigs = jnp.asarray(
                widths_from_centers(c_np, input_scale=input_scale),
                jnp.float32)
        else:
            centers, log_sigs = choose_centers(inputs, num_kernels=args.num_k,
                                               num_regions=num_regions,
                                               seed=args.seed,
                                               input_scale=input_scale,
                                               lb=lb, ub=ub,
                                               activation_idx=activation_idx,
                                               probs=sample_weight)
        t0 = time.time()
        if args.fit_mode == "per_region":
            fit = fit_per_region(inputs, outputs, centers, log_sigs,
                                 jnp.asarray(lb), jnp.asarray(ub),
                                 jnp.asarray(delta), tuple(activation_idx),
                                 get_basis(args.basis_function),
                                 input_scale=input_scale,
                                 sample_weight=sample_weight,
                                 x_dev=x_dev, y_dev=y_dev)
        else:
            fit = fit_direct(inputs, outputs, centers, log_sigs,
                             jnp.asarray(lb), jnp.asarray(ub),
                             jnp.asarray(delta), tuple(activation_idx),
                             get_basis(args.basis_function),
                             input_scale=input_scale,
                             sample_weight=sample_weight)
        print(f"direct fit in {time.time() - t0:.1f}s")
        # install into the WCRBFNet parameter tree so planners load it —
        # and CHECKPOINT BEFORE the L1 probe: a 90-minute fit of a GB-scale
        # table must not be lost to an OOM in the diagnostics (the probe
        # once died in exactly that way: (100k, R, K) per-region feature
        # intermediates on top of the resident table)
        params = dict(state.params["params"])
        params["core"] = {"centers": fit.centers, "log_sigs": fit.log_sigs}
        params["head"] = {"kernel": fit.weights, "bias": fit.bias}
        state = state.replace(params={"params": params})
        save_checkpoint(ckpt_dir, state, step=0)
        print(f"checkpoint at {ckpt_dir}")
        # strided true-row indices: x_dev is zero-PADDED to a chunk multiple
        # (models/fit.py:device_table), so plain slices would average padding
        # rows into the L1 (seen once as "8,192 strided rows" on a 352-row
        # verify table)
        n_rows = inputs.shape[0]
        n_probe = min(65536, n_rows)
        stride = max(n_rows // n_probe, 1)  # spread over the lattice
        idx_all = np.arange(0, n_rows, stride)[:n_probe]
        l1_sum, n_seen = 0.0, 0
        for i0 in range(0, idx_all.size, 8192):
            idx = jnp.asarray(idx_all[i0:i0 + 8192])
            pred = fit.predict(x_dev[idx], jnp.asarray(lb),
                               jnp.asarray(ub), jnp.asarray(delta),
                               tuple(activation_idx),
                               get_basis(args.basis_function))
            l1_sum += float(jnp.abs(pred - y_dev[idx]).sum())
            n_seen += int(idx.size)
        l1 = l1_sum / (n_seen * outputs.shape[1])
        print(f"control L1 {l1:.4f} (on {n_seen:,} strided rows)")
        if args.finetune_epochs <= 0:
            return
        # SGD fine-tune from the closed-form warm start with the
        # integration loss (the reference's 100x-weighted rollout-mismatch
        # term, train_nmpc_frenet.py:394-421): the pure control-matching fit
        # minimizes pointwise error but not the dynamic consistency of the
        # control SEQUENCE the planner executes
        args.train_epochs = args.finetune_epochs
        print(f"fine-tuning {args.finetune_epochs} epochs "
              "with the integration loss")

    dyn_params = f1tenth_params(mu=args.mu, cs=args.cs).to_vector()

    cluster_extra = None
    if args.use_cluster:
        cdata = np.load(args.npz_path[:-4] +
                        f"_{args.num_clusters}_cluster_ids" +
                        args.npz_path[-4:])
        # integer labels, NOT one-hots: a dense (B, 500) one-hot upload was
        # measured at 40 MB/step through the dev tunnel (trainer.py
        # cluster_fullint_loss docstring)
        cluster_extra = cdata["cluster_int_ids"][valid].astype(np.int32)
        loss_fn = cluster_fullint_loss
    elif args.only_onestep:
        loss_fn = frenet_oneint_loss
    else:
        loss_fn = frenet_fullint_loss

    step_fn = make_train_step(loss_fn, dyn_params, donate=False)
    logger = MetricLogger(path=f"ckpts/{args.run_name}.metrics.jsonl",
                          config=config)

    def log_fn(step, metrics):
        logger.log({"train_loss_batch": metrics.loss,
                    "pred_loss_batch": metrics.pred_loss,
                    "int_loss_batch": metrics.int_loss,
                    "cluster_loss_batch": metrics.cluster_loss}, step=step)

    def ckpt_fn(state, epoch):
        # epoch e saves as step e+1: step 0 is the --direct_fit warm start
        # (orbax silently skips an existing step number)
        save_checkpoint(ckpt_dir, state, step=epoch + 1)

    state, final_loss = train_epochs(
        state, step_fn, inputs.astype(np.float32),
        outputs.astype(np.float32), bs, args.train_epochs, rng,
        extra=cluster_extra, log_fn=log_fn, checkpoint_fn=ckpt_fn)
    print(f"final mean loss {final_loss:.6f}; checkpoints at {ckpt_dir}")
    logger.close()


if __name__ == "__main__":
    main()
