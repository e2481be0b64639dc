#!/usr/bin/env python
"""Closed-loop demo (the run_irbfn_mpc_in_gym.ipynb / run_nmpc_in_gym.ipynb
capability): drive a planner around the track, print lap metrics, save an
episode figure.

Planners: "nmpc" (solver in the loop), "irbfn" (trained net; needs
--config_f/--ckpt), "pursuit" (geometric baseline).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import f1tenth_params, fullscale_params
from irbfn_tpu.sim import TrackEnv, deviation_metrics, oval_track
from irbfn_tpu.sim.render import plot_episode
from irbfn_tpu.solvers import NMPCConfig, solve_nmpc_batch
from irbfn_tpu.sim.track import interp_wrapped


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--planner",
                   choices=["nmpc", "irbfn", "irbfn_cart", "pursuit",
                            "goal_mpc", "goal_mpc_net"],
                   default="nmpc")
    p.add_argument("--config_f", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--n_steps", type=int, default=400)
    p.add_argument("--speed", type=float, default=3.0)
    p.add_argument("--out", type=str, default="demo_episode.png")
    p.add_argument("--map_dir", type=str, default=None,
                   help="reference-format track dir (<name>_map.yaml + "
                        "raceline csv); collision then uses the real map")
    p.add_argument("--speed_scale", type=float, default=1.0,
                   help="scale the raceline speed profile (map tracks)")
    p.add_argument("--car_radius", type=float, default=0.15,
                   help="collision disc radius on map tracks (the "
                        "Oschersleben raceline protocol note in BASELINE.md "
                        "applies: reference racelines pinch below "
                        "car-radius clearance in places)")
    p.add_argument("--goal_lookahead", type=float, default=None,
                   help="goal-MPC lookahead horizon [s] (default T*dt=0.4)")
    p.add_argument("--control_dt", type=float, default=0.1,
                   help="replanning period [s]. The cartesian net (like the "
                        "reference's 7-D table, nmpc_data_generator.py:36-65) "
                        "has NO delta input — every plan assumes steering "
                        "starts at 0 — so it is only stable when replanned "
                        "fast enough that delta stays near 0 between plans. "
                        "The reference runs it at the gym's 100 Hz physics "
                        "rate (run_irbfn_mpc_in_gym.ipynb cell 11, one plan "
                        "per 0.01 s step); at 10 Hz the uncorrected delta "
                        "drift measurably rings the steering in corners")
    args = p.parse_args()

    if args.map_dir:
        from irbfn_tpu.sim.map import load_track_bundle

        track, omap = load_track_bundle(args.map_dir)
        if args.speed_scale != 1.0:
            rl = track.raceline._replace(vxs=track.raceline.vxs
                                         * args.speed_scale)
            track = track._replace(raceline=rl)
        env = TrackEnv(track, f1tenth_params(dtype=jnp.float32),
                       occ_map=omap, car_radius=args.car_radius,
                       control_dt=args.control_dt)
    else:
        track = oval_track(n_samples=512, speed=args.speed)
        env = TrackEnv(track, f1tenth_params(dtype=jnp.float32),
                       control_dt=args.control_dt)
    sim = env.reset(s0=0.0, speed0=1.0, batch_shape=(1,))
    rl = track.raceline

    if args.planner == "irbfn" and args.config_f:
        from irbfn_tpu.planning import IRBFNFrenetPlanner
        from irbfn_tpu.train import input_bounds_from_config, load_model

        model, params, conf = load_model(args.config_f, args.ckpt)
        planner = IRBFNFrenetPlanner(model, {"params": params["params"]},
                                     track,
                                     input_bounds=input_bounds_from_config(conf))

        def policy(obs):
            res = planner._plan_fn(planner._params, obs.s, obs.ey, obs.epsi,
                                   obs.delta, obs.linear_vel_x,
                                   obs.linear_vel_y, obs.ang_vel_z)
            return jnp.stack([res.accel, res.steer_vel], axis=-1)
    elif args.planner == "irbfn_cart":
        # cartesian learned planner (reference IRBFNPlanner in
        # run_irbfn_mpc_in_gym.ipynb): body-frame lookahead goal + mirror
        from irbfn_tpu.planning import IRBFNPlanner
        from irbfn_tpu.train import input_bounds_from_config, load_model

        if not args.config_f:
            raise SystemExit("--planner irbfn_cart requires --config_f/--ckpt")
        model, params, conf = load_model(args.config_f, args.ckpt)
        planner = IRBFNPlanner(model, {"params": params["params"]}, track,
                               mirror=bool(conf.get("mirror", True)),
                               sv_ind=conf["out_features"] // 2,
                               input_bounds=input_bounds_from_config(conf))

        def policy(obs):
            res = planner._plan_fn(planner._params, obs.pose_x, obs.pose_y,
                                   obs.pose_theta, obs.delta,
                                   obs.linear_vel_x, obs.beta, obs.ang_vel_z)
            return jnp.stack([res.accel, res.steer_vel], axis=-1)
    elif args.planner in ("goal_mpc", "goal_mpc_net"):
        # waypoint-following goal MPC (reference goal_mpc_node.py /
        # mpc_node.py): (speed, steer) actions through the gym's speed
        # control mode. "goal_mpc" solves the QP live every step; "_net"
        # serves the trained compression (train_goal_mpc.py ckpt)
        from irbfn_tpu.planning import GoalMPCPlanner

        la = args.goal_lookahead
        if args.planner == "goal_mpc_net":
            from irbfn_tpu.train import load_model

            if not args.config_f:
                raise SystemExit("goal_mpc_net requires --config_f/--ckpt")
            model, params, conf = load_model(args.config_f, args.ckpt)
            planner = GoalMPCPlanner(track, model,
                                     {"params": params["params"]},
                                     horizon_time=la)
        else:
            planner = GoalMPCPlanner(track, horizon_time=la)
        env = TrackEnv(track, f1tenth_params(dtype=jnp.float32),
                       occ_map=env.occ_map, car_radius=env.car_radius,
                       control_dt=args.control_dt, control_mode="speed")
        sim = env.reset(s0=0.0, speed0=1.0, batch_shape=(1,))

        def policy(obs):
            speed, steer = planner.plan_batch(obs.pose_x, obs.pose_y,
                                              obs.pose_theta,
                                              obs.linear_vel_x)
            return jnp.stack([speed, steer], axis=-1)
    elif args.planner == "nmpc":
        solver_params = fullscale_params(dtype=jnp.float32)
        cfg = NMPCConfig(gn_iters=25, al_outer=3)

        def policy(obs):
            zeros = jnp.zeros_like(obs.ey)
            x0 = jnp.stack([zeros, obs.ey, obs.delta, obs.linear_vel_x,
                            obs.linear_vel_y, obs.ang_vel_z, obs.epsi],
                           axis=-1)
            curv = interp_wrapped(rl.ss, rl.ks, obs.s, rl.length)
            vx_goal = interp_wrapped(rl.ss, rl.vxs, obs.s, rl.length)
            goal = jnp.stack([zeros] * 3 + [vx_goal] + [zeros] * 3, axis=-1)
            sol = solve_nmpc_batch(x0, goal, curv, solver_params, cfg)
            return jnp.stack([sol.accel[..., 0], sol.steer_vel[..., 0]],
                             axis=-1)
    else:
        def policy(obs):
            sv = jnp.clip(-1.0 * obs.ey - 1.5 * obs.epsi - 0.8 * obs.delta,
                          -3.2, 3.2)
            a = jnp.clip(2.0 * (args.speed - obs.linear_vel_x), -9.51, 9.51)
            return jnp.stack([a, sv], axis=-1)

    t0 = time.time()
    final, traj = env.rollout(sim, policy, n_steps=args.n_steps)
    jax.block_until_ready(final.x)
    wall = time.time() - t0
    ey_mean, epsi_mean = deviation_metrics(traj)
    sim_time = args.n_steps * args.control_dt
    print(f"{args.planner}: {args.n_steps} control steps "
          f"({sim_time:.0f}s sim) in {wall:.2f}s wall "
          f"({sim_time / wall:.1f}x realtime)")
    status = "CRASHED" if bool(final.done[0]) else "ok"
    print(f"laps {int(final.laps[0])}  progress {float(final.s[0]):.1f} m  "
          f"mean|ey| {float(ey_mean[0]):.3f} m  "
          f"mean|epsi| {float(epsi_mean[0]):.3f} rad  [{status}]")
    if args.out.endswith(".gif"):
        from irbfn_tpu.sim.render import animate_episode

        animate_episode(track, traj, path=args.out, stride=2,
                        occ_map=getattr(env, "occ_map", None))
    else:
        plot_episode(track, traj, path=args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
