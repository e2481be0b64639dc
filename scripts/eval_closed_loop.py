#!/usr/bin/env python
"""Closed-loop robustness sweep (reference scripts/eval_dnmpc.py equivalent):
run a planner in the closed-loop simulator over a (mu, cs) grid x noisy-start
trials, collect lateral/heading deviation, completion rate, laps.

TPU-first: all (mu, cs, trial) episodes run as ONE vmapped batch on device —
the reference fans the grid out over joblib processes, each stepping
f1tenth_gym + IPOPT point-by-point (eval_dnmpc.py:40-127). Failed trials
(off-track / numerical crash before the horizon ends) are retried with fresh
start noise, like the reference's trial_fail loop (eval_dnmpc.py:63-101);
the reference's 500 s wall timeout is structural here (fixed-step rollouts).
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

from irbfn_tpu.dynamics.params import (VehicleParams, f1tenth_params,
                                       fullscale_params)
from irbfn_tpu.sim import TrackEnv, deviation_metrics, oval_track
from irbfn_tpu.sim.track import horizon_goal_speed, interp_wrapped
from irbfn_tpu.solvers import NMPCConfig, solve_nmpc_batch
from irbfn_tpu.train import load_model
from irbfn_tpu.utils.args import add_eval_args


def make_policy(args, track):
    """Build the batched closed-loop policy. The NMPC branch runs the real
    AL/projected-Newton solver every control step (the reference's DNMPC
    planner-in-the-loop, eval_dnmpc.py:69-75) — all episodes solved as one
    batch on device."""
    rl = track.raceline
    if args.planner == "irbfn":
        if not args.config_f:
            raise SystemExit("--planner irbfn requires --config_f/--ckpt")
        from irbfn_tpu.planning import IRBFNFrenetPlanner
        from irbfn_tpu.train import input_bounds_from_config

        model, net_params, conf = load_model(args.config_f, args.ckpt)
        planner = IRBFNFrenetPlanner(model, {"params": net_params["params"]},
                                     track,
                                     input_bounds=input_bounds_from_config(conf))

        def policy(obs):
            # the public batched API (the one the planner docstrings
            # advertise) — the flagship sweep exercises it directly
            res = planner.plan_batch(obs.s, obs.ey, obs.epsi, obs.delta,
                                     obs.linear_vel_x, obs.linear_vel_y,
                                     obs.ang_vel_z)
            return jnp.stack([res.accel, res.steer_vel], axis=-1)
    elif args.planner == "irbfn_adaptive":
        # grip-adaptive bank planner: online effective-grip observer picks
        # BOTH the nearest-mu arm and the sqrt(g) pace scale per episode
        # lane (planning/grip.py + GripAdaptiveFrenetPlanner) — no
        # hand-tuned --speed_scale
        if not args.bank:
            raise SystemExit("--planner irbfn_adaptive requires --bank "
                             "CONFIG:CKPT pairs + --arm_mus")
        from irbfn_tpu.planning import GripAdaptiveFrenetPlanner
        from irbfn_tpu.planning.grip import GripConfig
        from irbfn_tpu.train import input_bounds_from_config

        assert args.arm_mus and len(args.arm_mus) == len(args.bank), \
            "--arm_mus must pair with --bank"
        order = np.argsort(args.arm_mus)
        model0, plist = None, []
        for i in order:
            cf, ck = args.bank[i].rsplit(":", 1)
            m, prm, conf = load_model(cf, ck)
            if model0 is None:
                model0, conf0 = m, conf
            plist.append({"params": prm["params"]})
        planner = GripAdaptiveFrenetPlanner(
            model0, plist, np.asarray(args.arm_mus)[order], track,
            input_bounds=input_bounds_from_config(conf0),
            grip_cfg=GripConfig(g0=args.g0),
            pace_lo=args.pace_lo, pace_hi=args.pace_hi,
            pace_margin=args.pace_margin)
        return planner.policy(), planner.init_state
    elif args.planner == "irbfn_cart":
        # cartesian learned planner (reference IRBFNPlanner): body-frame
        # lookahead goal, exact mirror, steer-angle setpoint execution
        if not args.config_f:
            raise SystemExit("--planner irbfn_cart requires --config_f/--ckpt")
        from irbfn_tpu.planning import IRBFNPlanner
        from irbfn_tpu.train import input_bounds_from_config

        model, net_params, conf = load_model(args.config_f, args.ckpt)
        planner = IRBFNPlanner(model, {"params": net_params["params"]}, track,
                               mirror=bool(conf.get("mirror", True)),
                               sv_ind=conf["out_features"] // 2,
                               input_bounds=input_bounds_from_config(conf))

        def policy(obs):
            res = planner.plan_batch(obs.pose_x, obs.pose_y, obs.pose_theta,
                                     obs.delta, obs.linear_vel_x, obs.beta,
                                     obs.ang_vel_z)
            return jnp.stack([res.accel, res.steer_vel], axis=-1)
    elif args.planner == "explicit":
        # explicit-MPC table lookup (reference ExplicitFrenetPlanner in the
        # loop): nearest-lattice-cell controls via grid-index arithmetic,
        # mirror trick for ey below the table range. Infeasible cells brake
        # hard (the cell being infeasible means "this state can't track at
        # this speed" — braking re-enters the feasible set; the reference's
        # coast guard, explicit_planner.py:390-392, sails straight off at
        # speed)
        if not args.table_path:
            raise SystemExit("--planner explicit requires --table_path")
        from irbfn_tpu.planning.explicit import (grid_lookup_linear,
                                                 grid_table_from_arrays)

        d = np.load(args.table_path)
        table = grid_table_from_arrays(d["inputs"], d["outputs"],
                                       d.get("valid"))
        rl_ss, rl_ks = rl.ss, rl.ks

        ht = args.horizon * args.ctrl_dt  # table generator's horizon x dt

        def policy(obs):
            curv = interp_wrapped(rl_ss, rl_ks, obs.s, rl.length)
            # horizon-end goal speed (reference ref_path[3][-1] semantics):
            # braking starts BEFORE the corner
            vx_goal = horizon_goal_speed(rl, obs.s, obs.linear_vel_x, ht)
            need_m = obs.ey < -0.05
            sign = jnp.where(need_m, -1.0, 1.0)
            # exact reflection (every lateral quantity flips; see
            # mirror_frenet_table docstring)
            q = jnp.stack([sign * obs.ey, sign * obs.delta,
                           obs.linear_vel_x, sign * obs.linear_vel_y,
                           vx_goal, sign * obs.ang_vel_z,
                           sign * obs.epsi, sign * curv], axis=-1)
            out, valid = grid_lookup_linear(table, q)
            T = out.shape[-1] // 2
            act = jnp.stack([out[..., 0], sign * out[..., T]], axis=-1)
            brake = jnp.stack([jnp.full_like(obs.ey, -9.51),
                               jnp.zeros_like(obs.ey)], axis=-1)
            return jnp.where(valid[..., None], act, brake)
    elif args.planner in ("goal_mpc", "goal_mpc_net"):
        # waypoint-following kinematic goal MPC (reference goal_mpc_node /
        # mpc_node deployment shape): (speed, steer) actions through the
        # env's speed control mode (main() switches control_mode)
        from irbfn_tpu.planning import GoalMPCPlanner

        if args.planner == "goal_mpc_net":
            if not args.config_f:
                raise SystemExit("goal_mpc_net requires --config_f/--ckpt")
            model, net_params, conf = load_model(args.config_f, args.ckpt)
            planner = GoalMPCPlanner(track, model,
                                     {"params": net_params["params"]})
        else:
            planner = GoalMPCPlanner(track)

        def policy(obs):
            speed, steer = planner.plan_batch(obs.pose_x, obs.pose_y,
                                              obs.pose_theta,
                                              obs.linear_vel_x)
            return jnp.stack([speed, steer], axis=-1)
    elif args.planner == "nmpc":
        # nominal internal model: the sim's (mu, cs) vary, the planner's
        # don't — that mismatch IS the robustness experiment
        solver_params = fullscale_params(dtype=jnp.float32)
        cfg = NMPCConfig(gn_iters=args.gn_iters, al_outer=args.al_outer)
        ht = cfg.horizon * cfg.dt

        def policy(obs):
            zeros = jnp.zeros_like(obs.ey)
            x0 = jnp.stack([zeros, obs.ey, obs.delta, obs.linear_vel_x,
                            obs.linear_vel_y, obs.ang_vel_z, obs.epsi],
                           axis=-1)
            curv = interp_wrapped(rl.ss, rl.ks, obs.s, rl.length)
            # horizon-end goal speed, unified with the explicit/irbfn
            # branches (one semantics across the sweep comparison)
            vx_goal = horizon_goal_speed(rl, obs.s, obs.linear_vel_x, ht)
            goal = jnp.stack([zeros] * 3 + [vx_goal] + [zeros] * 3, axis=-1)
            sol = solve_nmpc_batch(x0, goal, curv, solver_params, cfg)
            return jnp.stack([sol.accel[..., 0], sol.steer_vel[..., 0]],
                             axis=-1)
    else:  # pursuit: geometric P-control baseline
        def policy(obs):
            sv = jnp.clip(-1.0 * obs.ey - 1.5 * obs.epsi - 0.8 * obs.delta,
                          -3.2, 3.2)
            a = jnp.clip(2.0 * (3.0 - obs.linear_vel_x), -9.51, 9.51)
            return jnp.stack([a, sv], axis=-1)
    return policy


def main():
    p = argparse.ArgumentParser()
    add_eval_args(p)
    p.add_argument("--config_f", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--planner",
                   choices=["irbfn", "irbfn_adaptive", "irbfn_cart", "nmpc",
                            "explicit", "pursuit", "goal_mpc",
                            "goal_mpc_net"],
                   default="nmpc")
    p.add_argument("--bank", type=str, nargs="+", default=None,
                   help="per-arm CONFIG_YAML:CKPT_DIR pairs for "
                        "--planner irbfn_adaptive (one net per trained mu)")
    p.add_argument("--arm_mus", type=float, nargs="+", default=None,
                   help="training mu of each --bank arm")
    p.add_argument("--g0", type=float, default=0.5,
                   help="grip observer prior (initial pace = sqrt(g0))")
    p.add_argument("--pace_lo", type=float, default=0.35)
    p.add_argument("--pace_hi", type=float, default=1.0)
    p.add_argument("--pace_margin", type=float, default=1.0)
    p.add_argument("--table_path", type=str, default=None,
                   help="solver-table npz for --planner explicit")
    p.add_argument("--horizon", type=int, default=5,
                   help="table generator's control horizon (goal-speed "
                        "lookahead = horizon * ctrl_dt)")
    p.add_argument("--ctrl_dt", type=float, default=0.1,
                   help="table generator's control dt")
    p.add_argument("--speed_scale", type=float, default=1.0,
                   help="scale the raceline speed profile (run a track "
                        "below its racing speeds)")
    p.add_argument("--oval_scale", type=float, default=1.0,
                   help="scale the synthetic oval's size (no --map_dir); "
                        "curvature scales as 1/oval_scale — e.g. 3.0 keeps "
                        "|curv| <= 0.1, matching the reference-parity "
                        "table's curv grid")
    p.add_argument("--half_width", type=float, default=2.0,
                   help="corridor half width; leaving it fails the trial")
    p.add_argument("--max_retries", type=int, default=2,
                   help="noisy-start retries for failed trials")
    p.add_argument("--gn_iters", type=int, default=25)
    p.add_argument("--al_outer", type=int, default=3)
    p.add_argument("--map_dir", type=str, default=None,
                   help="reference-format track dir; collision then checks "
                        "the real occupancy map instead of a corridor")
    p.add_argument("--line", choices=["raceline", "centerline"],
                   default="raceline",
                   help="which track line to follow (centerline = mid-track"
                        ", unit speed profile — combine with --speed_scale)")
    p.add_argument("--line_csv", type=str, default=None,
                   help="explicit line CSV overriding the bundle's "
                        "raceline/centerline — e.g. the width-feasible "
                        "projection data/Oschersleben_raceline_feasible.csv "
                        "(scripts/make_feasible_raceline.py)")
    p.add_argument("--car_radius", type=float, default=0.15,
                   help="collision disc radius vs the occupancy map. The "
                        "gym's own sim never terminates on wall contact "
                        "(agent-agent GJK + iTTC only, base_classes.py), "
                        "and some bundled racelines run sub-half-car-width "
                        "from walls (Oschersleben pinches to 0.143 m "
                        "clearance at s=135.7) — lower this to evaluate "
                        "such tracks under a wall-contact-tolerant model")
    p.add_argument("--save_tube", type=str, default=None,
                   help="save the visited 8-dim net-input states (the "
                        "closed-loop operating tube) to this npz — feeds "
                        "train_frenet.py --tube_npz")
    args = p.parse_args()

    mus = np.linspace(args.mu_min, args.mu_max, args.num_mu)
    css = np.linspace(args.cs_min, args.cs_max, args.num_cs)
    mu_g, cs_g = np.meshgrid(mus, css, indexing="ij")
    combos = np.stack([mu_g.reshape(-1), cs_g.reshape(-1)], axis=-1)
    n_combo = combos.shape[0]
    B = n_combo * args.num_trials

    omap = None
    if args.map_dir:
        from irbfn_tpu.sim.map import load_track_bundle

        track, omap = load_track_bundle(args.map_dir, prefer=args.line)
        if args.line_csv:
            from irbfn_tpu.sim.map import raceline_from_csv
            from irbfn_tpu.sim.track import Track

            track = Track(raceline_from_csv(args.line_csv))
    else:
        track = oval_track(length=30.0 * args.oval_scale,
                           width=15.0 * args.oval_scale,
                           n_samples=512, speed=3.0)
    if args.speed_scale != 1.0:
        rl0 = track.raceline
        track = track._replace(raceline=rl0._replace(
            vxs=rl0.vxs * args.speed_scale))

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

    env = TrackEnv(track, params_b,
                   half_width=None if omap is not None else args.half_width,
                   occ_map=omap, car_radius=args.car_radius,
                   control_mode=("speed"
                                 if args.planner.startswith("goal_mpc")
                                 else "accl"))
    policy = make_policy(args, track)
    init_state = None
    if isinstance(policy, tuple):  # stateful planner (grip observer carry)
        policy, init_state = policy
    key = jax.random.PRNGKey(args.seed)

    # trial loop with noisy-start retries: rerun the (compiled) batched
    # rollout, keeping each episode's first successful attempt
    ey_res = np.full(B, np.nan)
    epsi_res = np.full(B, np.nan)
    laps_res = np.zeros(B)
    vx_res = np.full(B, np.nan)
    g_res = np.full(B, np.nan)
    success = np.zeros(B, bool)
    tube_chunks = []
    rl = track.raceline
    for attempt in range(args.max_retries + 1):
        key, sub = jax.random.split(key)
        sim0 = env.reset(s0=jnp.zeros(B), speed0=1.0, key=sub,
                         noise_scale=args.noise_scale, batch_shape=(B,))
        if init_state is not None:
            final, pstate, traj = env.rollout_stateful(
                sim0, policy, init_state((B,)), n_steps=args.n_steps)
        else:
            pstate = None
            final, traj = env.rollout(sim0, policy, n_steps=args.n_steps)
        if args.save_tube:
            o = traj.obs
            curv_t = interp_wrapped(rl.ss, rl.ks, o.s, rl.length)
            vxg_t = horizon_goal_speed(rl, o.s, o.linear_vel_x,
                                       args.horizon * args.ctrl_dt)
            states = np.asarray(jnp.stack(
                [o.ey, o.delta, o.linear_vel_x, o.linear_vel_y, vxg_t,
                 o.ang_vel_z, o.epsi, curv_t], axis=-1))
            alive = ~np.asarray(traj.done)
            tube_chunks.append(states[alive])
        ey_mean, epsi_mean = deviation_metrics(traj)
        # pace honesty metric: mean driven speed over alive steps (the
        # adaptive planner must earn completions by slowing only where grip
        # demands it, not by sandbagging everywhere)
        alive = ~np.asarray(traj.done)
        vx_t = np.asarray(traj.obs.linear_vel_x)
        vx_mean = (vx_t * alive).sum(0) / np.maximum(alive.sum(0), 1)
        ok = ~np.asarray(final.done)
        newly = (ok | (attempt == args.max_retries)) & ~success
        ey_res[newly] = np.asarray(ey_mean)[newly]
        epsi_res[newly] = np.asarray(epsi_mean)[newly]
        laps_res[newly] = np.asarray(final.laps)[newly]
        vx_res[newly] = vx_mean[newly]
        if pstate is not None:
            g_res[newly] = np.asarray(pstate.g)[newly]
        success |= ok
        if success.all():
            break
        print(f"attempt {attempt + 1}: {int((~success).sum())}/{B} trials "
              "failed (off-track/crash), retrying with fresh noise")

    def by_combo(a):
        return a.reshape(n_combo, args.num_trials).mean(1)

    ey_c, epsi_c = by_combo(ey_res), by_combo(epsi_res)
    comp_c, laps_c = by_combo(success.astype(float)), by_combo(laps_res)
    vx_c, g_c = by_combo(vx_res), by_combo(g_res)
    for i, (mu, cs) in enumerate(combos):
        extra = (f" g_est={g_c[i]:.2f}" if np.isfinite(g_c[i]) else "")
        print(f"mu={mu:.2f} cs={cs:.2f}: mean|ey|={ey_c[i]:.4f} "
              f"mean|epsi|={epsi_c[i]:.4f} completion={comp_c[i]:.2f} "
              f"laps={laps_c[i]:.1f} vx={vx_c[i]:.2f}{extra}")

    if args.save_tube and tube_chunks:
        tube = np.concatenate(tube_chunks, axis=0)
        np.savez_compressed(args.save_tube, states=tube)
        print(f"saved {tube.shape[0]} tube states to {args.save_tube}")

    with open(f"{args.out_name}.pkl", "wb") as f:
        pickle.dump({"combos": combos, "ey": ey_c, "epsi": epsi_c,
                     "completion": comp_c, "laps": laps_c,
                     "vx_mean": vx_c, "g_est": g_c,
                     "planner": args.planner}, f)
    print(f"saved {args.out_name}.pkl")


if __name__ == "__main__":
    main()
