#!/usr/bin/env python
"""Offline accuracy eval (reference scripts/eval_irbfn_dnmpc.py equivalent):
forward-pass the whole table through the trained net, roll out predicted vs
oracle control sequences, print first/final-state position / heading /
velocity errors. Multi-million-row tables stream through in fixed-size
chunks (one compiled program; metrics accumulated) so HBM stays bounded."""

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
    p.add_argument("--chunk", type=int, default=1 << 20)
    args = p.parse_args()

    model, params, config = load_model(args.config_f, args.ckpt)
    if config.get("head_mode") == "per_region":
        # the per-region head materializes a (B, R, K) feature tensor; at
        # the 1M default chunk with 16x512 that is a 34 GB HBM allocation
        # (observed OOM on v5e). 64k keeps it ~2 GB.
        args.chunk = min(args.chunk, 1 << 16)
    data = np.load(args.npz_path)
    inputs, outputs = data["inputs"], data["outputs"]
    from irbfn_tpu.parallel.datagen import controls_block
    outputs = controls_block(outputs)
    valid = ~np.any(outputs == -999.0, axis=1)
    inputs, outputs = inputs[valid], outputs[valid]
    if args.mirror:
        inputs, outputs = mirror_frenet_table(inputs, outputs)

    import jax

    dyn = f1tenth_params(mu=config.get("mu", 1.0),
                         cs=config.get("cs", 5.0)).to_vector()

    @jax.jit
    def chunk_sums(x, y):
        """Per-chunk error SUMS (reduced on device; only scalars cross the
        host link): control |err|, first/final-state |err| on ey/epsi/vx."""
        pred = model.apply({"params": params["params"]}, x)
        if isinstance(pred, tuple):  # ClusterWCRBFNet returns (out, logits)
            pred = pred[0]
        init = x[:, [0, 0, 1, 2, 3, 5, 6, 7]]
        actual = integrate_frenet(jnp.concatenate([init, y], axis=1), dyn)
        predicted = integrate_frenet(jnp.concatenate([init, pred], axis=1),
                                     dyn)
        d = predicted - actual
        picks = jnp.stack([
            jnp.abs(d[:, 0, 1]).sum(), jnp.abs(d[:, 0, 6]).sum(),
            jnp.abs(d[:, 0, 3]).sum(), jnp.abs(d[:, -1, 1]).sum(),
            jnp.abs(d[:, -1, 6]).sum(), jnp.abs(d[:, -1, 3]).sum(),
        ])
        return jnp.abs(pred - y).mean(axis=1).sum(), picks

    n = inputs.shape[0]
    ctrl_sum, pick_sum = 0.0, np.zeros(6)
    for s in range(0, n, args.chunk):
        # the tail chunk compiles once at its own (smaller) shape
        xs = jnp.asarray(inputs[s:s + args.chunk], jnp.float32)
        ys = jnp.asarray(outputs[s:s + args.chunk], jnp.float32)
        c, k = chunk_sums(xs, ys)
        ctrl_sum += float(c)
        pick_sum += np.asarray(k)

    pick = pick_sum / n
    print(f"control L1: {ctrl_sum / n:.5f}")
    print(f"first state: ey MAE {pick[0]:.5f}  epsi MAE {pick[1]:.5f}  "
          f"vx MAE {pick[2]:.5f}")
    print(f"final state: ey MAE {pick[3]:.5f}  epsi MAE {pick[4]:.5f}  "
          f"vx MAE {pick[5]:.5f}")


if __name__ == "__main__":
    main()
