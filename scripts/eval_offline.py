#!/usr/bin/env python
"""Offline accuracy eval (reference scripts/eval_irbfn_dnmpc.py equivalent):
forward-pass the whole table through the trained net in one batched call,
roll out predicted vs oracle control sequences, print first/final-state
position / heading / velocity errors."""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp

from irbfn_tpu.dynamics import integrate_frenet
from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.train import load_model
from irbfn_tpu.train.trainer import mirror_frenet_table


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_f", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--mirror", action="store_true")
    args = p.parse_args()

    model, params, config = load_model(args.config_f, args.ckpt)
    data = np.load(args.npz_path)
    inputs, outputs = data["inputs"], data["outputs"]
    outputs = outputs.reshape(outputs.shape[0], -1)
    valid = ~np.any(outputs == -999.0, axis=1)
    inputs, outputs = inputs[valid], outputs[valid]
    if args.mirror:
        inputs, outputs = mirror_frenet_table(inputs, outputs)

    x = jnp.asarray(inputs, jnp.float32)
    y = jnp.asarray(outputs, jnp.float32)
    pred = model.apply({"params": params["params"]}, x)

    dyn = f1tenth_params(mu=config.get("mu", 1.0),
                         cs=config.get("cs", 5.0)).to_vector()
    init = x[:, [0, 0, 1, 2, 3, 5, 6, 7]]
    actual = integrate_frenet(jnp.concatenate([init, y], axis=1), dyn)
    predicted = integrate_frenet(jnp.concatenate([init, pred], axis=1), dyn)

    def report(k, name):
        dy = np.asarray(predicted[:, k] - actual[:, k])
        print(f"{name}: ey MAE {np.abs(dy[:, 1]).mean():.5f}  "
              f"epsi MAE {np.abs(dy[:, 6]).mean():.5f}  "
              f"vx MAE {np.abs(dy[:, 3]).mean():.5f}")

    print(f"control L1: {float(jnp.abs(pred - y).mean()):.5f}")
    report(0, "first state")
    report(-1, "final state")


if __name__ == "__main__":
    main()
