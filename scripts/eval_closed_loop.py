#!/usr/bin/env python
"""Closed-loop robustness sweep (reference scripts/eval_dnmpc.py equivalent):
run a planner in the closed-loop simulator over a (mu, cs) grid x noisy-start
trials, collect lateral/heading deviation and lap completion.

TPU-first: all (mu, cs, trial) episodes run as ONE vmapped batch on device —
the reference fans the grid out over joblib processes, each stepping
f1tenth_gym + IPOPT point-by-point.
"""

import argparse
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import VehicleParams, f1tenth_params
from irbfn_tpu.sim import TrackEnv, deviation_metrics, oval_track
from irbfn_tpu.train import load_model
from irbfn_tpu.utils.args import add_eval_args


def main():
    p = argparse.ArgumentParser()
    add_eval_args(p)
    p.add_argument("--config_f", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--planner", choices=["irbfn", "nmpc"], default="nmpc")
    args = p.parse_args()

    mus = np.linspace(args.mu_min, args.mu_max, args.num_mu)
    css = np.linspace(args.cs_min, args.cs_max, args.num_cs)
    mu_g, cs_g = np.meshgrid(mus, css, indexing="ij")
    combos = np.stack([mu_g.reshape(-1), cs_g.reshape(-1)], axis=-1)
    n_combo = combos.shape[0]
    B = n_combo * args.num_trials

    track = oval_track(n_samples=512, speed=3.0)

    # batched vehicle params: each episode gets its own (mu, cs)
    mu_b = jnp.asarray(np.repeat(combos[:, 0], args.num_trials), jnp.float32)
    cs_b = jnp.asarray(np.repeat(combos[:, 1], args.num_trials), jnp.float32)
    base = f1tenth_params()
    params_b = VehicleParams(
        mu=mu_b, m=jnp.full((B,), base.m), I=jnp.full((B,), base.I),
        lf=jnp.full((B,), base.lf), lr=jnp.full((B,), base.lr),
        C_Sf=cs_b, C_Sr=cs_b, h=jnp.full((B,), base.h),
        dt=jnp.full((B,), 0.01), sv_max=jnp.full((B,), base.sv_max),
        a_max=jnp.full((B,), base.a_max), s_max=jnp.full((B,), base.s_max),
        v_max=jnp.full((B,), base.v_max))

    env = TrackEnv(track, params_b)
    key = jax.random.PRNGKey(args.seed)
    sim = env.reset(s0=jnp.zeros(B), speed0=1.0, key=key,
                    noise_scale=args.noise_scale, batch_shape=(B,))

    if args.planner == "irbfn" and args.config_f:
        from irbfn_tpu.planning import IRBFNFrenetPlanner

        model, net_params, _ = load_model(args.config_f, args.ckpt)
        planner = IRBFNFrenetPlanner(model, {"params": net_params["params"]},
                                     track)

        def policy(obs):
            res = planner._plan_fn(planner._params, obs.s, obs.ey, obs.epsi,
                                   obs.delta, obs.linear_vel_x,
                                   obs.linear_vel_y, obs.ang_vel_z)
            return jnp.stack([res.accel, res.steer_vel], axis=-1)
    else:
        # simple pursuit baseline: P control on ey/epsi + speed hold
        def policy(obs):
            sv = jnp.clip(-1.0 * obs.ey - 1.5 * obs.epsi - 0.8 * obs.delta,
                          -3.2, 3.2)
            a = jnp.clip(2.0 * (3.0 - obs.linear_vel_x), -9.51, 9.51)
            return jnp.stack([a, sv], axis=-1)

    final, traj = env.rollout(sim, policy, n_steps=args.n_steps)
    ey_mean, epsi_mean = deviation_metrics(traj)
    laps = np.asarray(final.laps)

    ey_by_combo = np.asarray(ey_mean).reshape(n_combo, args.num_trials).mean(1)
    epsi_by_combo = np.asarray(epsi_mean).reshape(n_combo, args.num_trials).mean(1)
    for i, (mu, cs) in enumerate(combos):
        print(f"mu={mu:.2f} cs={cs:.2f}: mean|ey|={ey_by_combo[i]:.4f} "
              f"mean|epsi|={epsi_by_combo[i]:.4f}")

    with open(f"{args.out_name}.pkl", "wb") as f:
        pickle.dump({"combos": combos, "ey": ey_by_combo,
                     "epsi": epsi_by_combo, "laps": laps}, f)
    print(f"saved {args.out_name}.pkl")


if __name__ == "__main__":
    main()
