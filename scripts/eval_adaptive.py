#!/usr/bin/env python
"""Closed-loop EXP3 adaptation over a multi-mu explicit-table bank
(VERDICT r2 item #4; reference AdaptiveExplicitPlanner + EXP3,
explicit_planner.py:452-608 + bandits.py:7-31 — whose arm selection was
never actually wired into plan()).

Per (mu, cs) sim combo, an EXP3 bandit selects which mu-table drives each
episode; episode reward is lap progress. All combos run as ONE vmapped
batch per episode round; the mixed-arm lookup is a single fused device op
(arm index rides as an extra exact-integer grid dimension,
planning/explicit.py:stack_grid_tables).

Also runs every fixed arm over every combo for the adaptive-vs-fixed
comparison table.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import VehicleParams, f1tenth_params
from irbfn_tpu.planning.bandits import EXP3
from irbfn_tpu.planning.explicit import (grid_lookup_linear,
                                         grid_table_from_arrays,
                                         stack_grid_tables)
from irbfn_tpu.sim import TrackEnv
from irbfn_tpu.sim.map import load_track_bundle
from irbfn_tpu.sim.track import horizon_goal_speed, interp_wrapped


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tables", type=str, nargs="+", default=None,
                   help="one solver-table npz per arm (same lattice); "
                        "not needed with --nets")
    p.add_argument("--arm_mus", type=float, nargs="+", required=True)
    p.add_argument("--map_dir", type=str, required=True)
    p.add_argument("--mus", type=float, nargs="+",
                   default=[0.6, 0.8, 1.0])
    p.add_argument("--css", type=float, nargs="+", default=[5.0])
    p.add_argument("--episodes", type=int, default=20)
    p.add_argument("--n_steps", type=int, default=600)
    p.add_argument("--gamma", type=float, default=0.3)
    p.add_argument("--prog_norm", type=float, default=1.0,
                   help="laps of progress that count as reward 1.0; >1 makes "
                        "the reward pace-aware (fast arms separate from "
                        "slow ones instead of all saturating at one lap)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise_scale", type=float, default=0.01)
    p.add_argument("--horizon_time", type=float, default=0.5)
    p.add_argument("--speed_scales", type=float, nargs="+", default=None,
                   help="per-arm raceline speed multiplier; default "
                        "sqrt(arm_mu/max(arm_mus)) — grip-limited cornering "
                        "speed scales with sqrt(mu), so each arm drives at "
                        "the pace its solver-mu can actually hold. Without "
                        "this every arm commands full raceline speed and "
                        "ALL of them crash at low sim mu, making reward "
                        "progress-before-crash noise")
    p.add_argument("--baseline_rounds", type=int, default=3,
                   help="rounds to average each fixed-arm baseline over")
    p.add_argument("--nets", type=str, nargs="+", default=None,
                   help="per-arm CONFIG_YAML:CKPT_DIR pairs — run the "
                        "LEARNED planner bank instead of table lookups "
                        "(the reference's AdaptiveIRBFNPlanner, "
                        "irbfn_planner.py:563-625, whose EXP3 is never "
                        "wired into plan()). All arms must share one "
                        "architecture: params are stacked on a leading arm "
                        "axis and all arms evaluate as ONE vmapped forward; "
                        "the pulled arm selects per episode")
    p.add_argument("--json_out", type=str, default="adaptive_results.json")
    args = p.parse_args()

    if not args.tables and not args.nets:
        raise SystemExit("need --tables (table bank) or --nets (learned bank)")
    n_arms = len(args.arm_mus)
    stacked = None
    if args.tables:
        tables = []
        for path in args.tables:
            d = np.load(path)
            tables.append(grid_table_from_arrays(d["inputs"], d["outputs"],
                                                 d.get("valid")))
        stacked = stack_grid_tables(tables)
        assert n_arms == len(tables)

    net_apply, net_bounds = None, None
    if args.nets:
        assert len(args.nets) == n_arms, "one CONFIG:CKPT per arm"
        from irbfn_tpu.planning import stack_net_bank
        from irbfn_tpu.train import input_bounds_from_config, load_model

        models, plist = [], []
        for spec in args.nets:
            cf, ck = spec.rsplit(":", 1)
            m, prm, conf = load_model(cf, ck)
            models.append((m, conf))
            plist.append({"params": prm["params"]})
        net_bounds = jnp.asarray(input_bounds_from_config(models[0][1]),
                                 jnp.float32)
        net_apply, stacked_params = stack_net_bank(models[0][0], plist)
    if args.speed_scales is None:
        mu_ref = max(args.arm_mus)
        args.speed_scales = [float(np.sqrt(m / mu_ref)) for m in args.arm_mus]
    assert len(args.speed_scales) == n_arms
    scales_arr = jnp.asarray(args.speed_scales, jnp.float32)
    print("per-arm speed scales:", [f"{s:.3f}" for s in args.speed_scales])

    track, omap = load_track_bundle(args.map_dir)
    rl = track.raceline
    combos = [(mu, cs) for mu in args.mus for cs in args.css]
    B = len(combos)
    base = f1tenth_params()
    params_b = VehicleParams(
        mu=jnp.asarray([c[0] for c in combos], jnp.float32),
        m=jnp.full((B,), base.m), I=jnp.full((B,), base.I),
        lf=jnp.full((B,), base.lf), lr=jnp.full((B,), base.lr),
        C_Sf=jnp.asarray([c[1] for c in combos], jnp.float32),
        C_Sr=jnp.asarray([c[1] for c in combos], jnp.float32),
        h=jnp.full((B,), base.h), dt=jnp.full((B,), 0.01),
        sv_max=jnp.full((B,), base.sv_max),
        a_max=jnp.full((B,), base.a_max),
        s_max=jnp.full((B,), base.s_max),
        v_max=jnp.full((B,), base.v_max))
    env = TrackEnv(track, params_b, occ_map=omap, car_radius=0.15)

    def make_policy(arm_b):
        def policy(obs):
            curv = interp_wrapped(rl.ss, rl.ks, obs.s, rl.length)
            vx_goal = horizon_goal_speed(rl, obs.s, obs.linear_vel_x,
                                         args.horizon_time)
            vx_goal = vx_goal * jnp.take(scales_arr, arm_b.astype(jnp.int32))
            need_m = obs.ey < -0.05
            sign = jnp.where(need_m, -1.0, 1.0)
            q = jnp.stack([sign * obs.ey, sign * obs.delta,
                           obs.linear_vel_x, sign * obs.linear_vel_y,
                           vx_goal, sign * obs.ang_vel_z, sign * obs.epsi,
                           sign * curv], axis=-1)
            if net_apply is not None:
                qn = jnp.clip(q, net_bounds[:, 0], net_bounds[:, 1])
                out_all = net_apply(stacked_params, qn)  # (A, B, 2T)
                out = jnp.take_along_axis(
                    out_all, arm_b.astype(jnp.int32)[None, :, None],
                    axis=0)[0]
                T = out.shape[-1] // 2
                return jnp.stack([out[..., 0], sign * out[..., T]], axis=-1)
            qa = jnp.concatenate([arm_b[..., None], q], axis=-1)
            out, valid = grid_lookup_linear(stacked, qa)
            T = out.shape[-1] // 2
            act = jnp.stack([out[..., 0], sign * out[..., T]], axis=-1)
            brake = jnp.stack([jnp.full_like(obs.ey, -9.51),
                               jnp.zeros_like(obs.ey)], axis=-1)
            return jnp.where(valid[..., None], act, brake)
        return policy

    # ONE jitted round for the whole experiment: the arm assignment enters
    # as a traced ARGUMENT (a per-episode policy closure would embed arm_b
    # as a compile-time constant — a fresh XLA program per episode, which
    # through the remote-TPU tunnel means minutes of recompile each)
    @jax.jit
    def _round_dev(arm_b, key):
        final, _ = env.rollout(
            env.reset(s0=jnp.zeros(B), speed0=1.0, key=key,
                      noise_scale=args.noise_scale, batch_shape=(B,)),
            make_policy(arm_b), n_steps=args.n_steps)
        return final.s

    def run_round(arms, key):
        s_final = _round_dev(jnp.asarray(arms, jnp.float32), key)
        # reward: lap progress fraction (crash freezes s; laps don't — the
        # env only freezes on collision, so s keeps unwrapping past one lap
        # and prog_norm>1 rewards pace, not just survival)
        prog = np.asarray(s_final) / float(rl.length)
        return np.clip(prog / args.prog_norm, 0.0, 1.0)

    key = jax.random.PRNGKey(args.seed)

    # fixed-arm baselines: every arm over every combo, averaged over rounds
    fixed = np.zeros((n_arms, B))
    for a in range(n_arms):
        for _ in range(args.baseline_rounds):
            key, sub = jax.random.split(key)
            fixed[a] += run_round(np.full(B, a), sub)
        fixed[a] /= args.baseline_rounds
        print(f"fixed arm mu={args.arm_mus[a]}: "
              + " ".join(f"{combos[i][0]:.1f}/{combos[i][1]:.0f}:"
                         f"{fixed[a, i]:.2f}" for i in range(B)))

    bandits = [EXP3(n_arms, args.gamma, args.seed + i) for i in range(B)]
    pulls = np.zeros((args.episodes, B), int)
    rewards = np.zeros((args.episodes, B))
    for ep in range(args.episodes):
        arms = np.asarray([b.pull_arm() for b in bandits])
        key, sub = jax.random.split(key)
        r = run_round(arms, sub)
        for i, b in enumerate(bandits):
            # rew_scale=None: rewards are already lap-progress fractions in
            # [0, 1]; the reference's sigmoid squash would collapse the arm
            # gap ~8x and the bandit never converges (see exp3_update)
            b.update_dist(int(arms[i]), float(r[i]), rew_scale=None)
        pulls[ep], rewards[ep] = arms, r
        print(f"ep {ep:02d}: arms {arms.tolist()} rewards "
              + " ".join(f"{v:.2f}" for v in r))

    results = {"combos": combos, "arm_mus": args.arm_mus,
               "mode": "learned" if args.nets else "table",
               "speed_scales": args.speed_scales,
               "baseline_rounds": args.baseline_rounds,
               "fixed_rewards": fixed.tolist(),
               "pulls": pulls.tolist(), "rewards": rewards.tolist()}
    half = args.episodes // 2
    print("\nper-combo summary (late-half episodes):")
    for i, (mu, cs) in enumerate(combos):
        late = pulls[half:, i]
        mode_arm = int(np.bincount(late, minlength=n_arms).argmax())
        best_fixed = int(fixed[:, i].argmax())
        adapt_r = rewards[half:, i].mean()
        print(f"  sim mu={mu:.1f} cs={cs:.0f}: bandit favors arm "
              f"mu={args.arm_mus[mode_arm]} ({(late == mode_arm).mean():.0%}"
              f" of late pulls); best fixed arm mu={args.arm_mus[best_fixed]}"
              f" (r={fixed[best_fixed, i]:.2f}); adaptive late reward "
              f"{adapt_r:.2f}")
        results.setdefault("summary", []).append(
            {"mu": mu, "cs": cs, "mode_arm_mu": args.arm_mus[mode_arm],
             "best_fixed_mu": args.arm_mus[best_fixed],
             "adaptive_late_reward": float(adapt_r),
             "best_fixed_reward": float(fixed[best_fixed, i])})
    with open(args.json_out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"saved {args.json_out}")


if __name__ == "__main__":
    main()
