#!/usr/bin/env python
"""Two-car overtake demo: an ego car running the lattice planner (goal grid
-> clothoid spirals -> obstacle-aware selection) laps past a slower
raceline-following lead car, with exact SAT rectangle collision checking
every physics step.

This is the integration demo for the multi-agent + lattice subsystems (the
reference races two cars in f1tenth_gym, envs/base_classes.py:359-542, and
plans around opponents with the nuPlan lattice planner,
deprecated/planner.py:94-180). TPU-first: BOTH cars' control laws — the
lead's pure pursuit and the ego's full 360-goal lattice plan — and the
10-substep RK4 physics live inside ONE jitted lax.scan rollout; the host
fetches the trajectory once at the end.
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

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.planning.lattice import plan_lattice, sample_lookahead_grid
from irbfn_tpu.sim.multi_agent import MultiAgentEnv
from irbfn_tpu.sim.safety import pid_lowlevel
from irbfn_tpu.sim.track import frenet_to_cartesian, interp_wrapped, oval_track
from irbfn_tpu.solvers.clothoid import solve_g1_lattice


def _to_local(psi, dx, dy):
    """World-frame offsets -> body frame (rotation by -psi)."""
    c, s = jnp.cos(psi), jnp.sin(psi)
    return c * dx + s * dy, -s * dx + c * dy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--map_dir", type=str, default=None)
    p.add_argument("--n_steps", type=int, default=300)
    p.add_argument("--ego_speed_scale", type=float, default=0.85)
    p.add_argument("--lead_speed_scale", type=float, default=0.45)
    p.add_argument("--gap", type=float, default=6.0,
                   help="initial ego deficit behind the lead [m]")
    p.add_argument("--lookahead", type=float, default=7.0)
    p.add_argument("--grid", type=int, nargs=3, default=[8, 9, 5],
                   help="lattice goal grid (n_lon, n_lat, n_theta)")
    p.add_argument("--out", type=str, default="overtake_demo.png")
    p.add_argument("--from_scan", action="store_true",
                   help="plan from the ego's own lidar (agent-aware scan, "
                        "base_classes.py:210-231) instead of the opponent's "
                        "privileged pose: scan hits become the lattice "
                        "planner's obstacle points")
    p.add_argument("--n_beams", type=int, default=64)
    args = p.parse_args()

    omap = None
    if args.map_dir:
        from irbfn_tpu.sim.map import load_track_bundle

        track, omap = load_track_bundle(args.map_dir)
    else:
        track = oval_track(length=40.0, width=20.0, n_samples=512, speed=4.0)
    rl = track.raceline
    params = f1tenth_params(dtype=jnp.float32)
    wheelbase = float(params.lf + params.lr)
    scan_spec = None
    scan_angles = None
    if args.from_scan:
        from irbfn_tpu.sim.map import ScanSpec

        scan_spec = ScanSpec(n_beams=args.n_beams, fov=4.7)
        scan_angles = jnp.linspace(-scan_spec.fov / 2, scan_spec.fov / 2,
                                   scan_spec.n_beams, dtype=jnp.float32)
    env = MultiAgentEnv(track, params, n_agents=2, collision_model="rect",
                        occ_map=omap if args.from_scan else None,
                        scan_spec=scan_spec)

    goals = sample_lookahead_grid(args.lookahead, half_width=1.2,
                                  n_lon=args.grid[0], n_lat=args.grid[1],
                                  n_theta=args.grid[2], theta_range=0.5)

    def pursuit(px, py, psi, v, s, lookahead, speed_scale):
        """Pure-pursuit steer + raceline speed command toward s + lookahead."""
        s_t = s + lookahead
        tx, ty, _ = frenet_to_cartesian(rl, s_t, jnp.zeros_like(s_t),
                                        jnp.zeros_like(s_t))
        lx, ly = _to_local(psi, tx - px, ty - py)
        kappa = 2.0 * ly / jnp.maximum(lx * lx + ly * ly, 1e-3)
        steer = jnp.arctan(wheelbase * kappa)
        v_goal = interp_wrapped(rl.ss, rl.vxs, s_t, rl.length) * speed_scale
        return steer, v_goal

    def control(x, s_agents, scan=None):
        """x (2, 7) agent states [ego, lead] -> (2, 2) [accel, steer_vel]."""
        px, py, delta, v, psi = (x[:, 0], x[:, 1], x[:, 2], x[:, 3], x[:, 4])

        # lead (agent 1): pure pursuit on the raceline at reduced pace
        la_lead = jnp.maximum(0.6 * v[1], 1.5)
        steer_l, v_l = pursuit(px[1], py[1], psi[1], v[1], s_agents[1],
                               la_lead, args.lead_speed_scale)

        # ego (agent 0): lattice plan toward the raceline lookahead point,
        # with the lead's axle discs as obstacles — all in the ego frame
        s_t = s_agents[0] + args.lookahead
        tx, ty, _ = frenet_to_cartesian(rl, s_t, jnp.zeros(()), jnp.zeros(()))
        target = jnp.stack(_to_local(psi[0], tx - px[0], ty - py[0]))
        if args.from_scan:
            # perception-driven: the ego's own lidar returns (which already
            # include the opponent's footprint via ray_cast_footprints)
            # become obstacle points in the ego body frame; open-space
            # beams are parked far away so they never enter the clearance
            r = scan[0]  # (B,)
            hit = r < scan_spec.max_range * 0.99
            pts = jnp.stack([r * jnp.cos(scan_angles),
                             r * jnp.sin(scan_angles)], axis=-1)
            obstacles = jnp.where(hit[:, None], pts, 1e6)
        else:
            # privileged: the lead's true axle-disc positions
            heading_l = jnp.stack([jnp.cos(psi[1]), jnp.sin(psi[1])])
            opp = px[1], py[1]
            discs = jnp.stack([
                jnp.stack([opp[0] + params.lf * heading_l[0],
                           opp[1] + params.lf * heading_l[1]]),
                jnp.stack([opp[0] - params.lr * heading_l[0],
                           opp[1] - params.lr * heading_l[1]])])  # (2, 2)
            ox, oy = _to_local(psi[0], discs[:, 0] - px[0],
                               discs[:, 1] - py[0])
            obstacles = jnp.stack([ox, oy], axis=-1)
        plan = plan_lattice(solve_g1_lattice, goals, target,
                            obstacle_xy=obstacles, n_path_points=9,
                            obstacle_radius=0.8)
        # execute the multimodal-safe hard-argmin path by pure pursuit on an
        # early path point (softargmin can blend +-y detours into the car)
        pt = plan.argmin_path[3, :2]
        kappa = 2.0 * pt[1] / jnp.maximum(pt[0] ** 2 + pt[1] ** 2, 1e-3)
        steer_e = jnp.arctan(wheelbase * kappa)
        v_e = (interp_wrapped(rl.ss, rl.vxs, s_t, rl.length)
               * args.ego_speed_scale)
        # if every candidate path is blocked (collision penalty dominates the
        # best cost), fall back to following at the lead's pace
        blocked = plan.costs[jnp.argmin(plan.costs)] > 200.0
        v_e = jnp.where(blocked, 0.8 * v[1], v_e)

        steer = jnp.stack([steer_e, steer_l])
        v_cmd = jnp.stack([v_e, v_l])
        accl, sv = pid_lowlevel(v_cmd, steer, v, delta, params)
        return jnp.stack([accl, sv], axis=-1)

    state0 = env.reset(s0=jnp.asarray([0.0, args.gap]), speed0=1.0)

    @jax.jit
    def rollout(state):
        def step_fn(st, _):
            obs = env.observe(st)
            actions = control(st.x, obs["s"], obs.get("scan"))
            st = env.step(st, actions)
            return st, (st.x, obs["s"], st.collided)

        return jax.lax.scan(step_fn, state, None, length=args.n_steps)

    t0 = time.time()
    final, (traj_x, traj_s, traj_hit) = rollout(state0)
    traj_x = np.asarray(traj_x)  # (T, 2, 7)
    traj_s = np.asarray(traj_s)
    traj_hit = np.asarray(traj_hit)
    wall = time.time() - t0
    print(f"{args.n_steps} control steps (2 agents) in {wall:.2f}s wall "
          f"({args.n_steps * 0.1 / wall:.1f}x realtime)")

    # unwrap s per agent, then find the overtake instant
    L = float(rl.length)
    s_unwrap = traj_s + L * np.cumsum(
        np.vstack([np.zeros((1, 2)), np.diff(traj_s, axis=0) < -L / 2]),
        axis=0)
    lead_margin = s_unwrap[:, 1] - s_unwrap[:, 0]
    passed = np.nonzero(lead_margin < -0.5)[0]  # ego fully ahead
    collided = bool(traj_hit.any())
    if collided:
        print(f"COLLISION at step {int(np.argmax(traj_hit.any(axis=1)))}")
    if passed.size and not collided:
        k = int(passed[0])
        print(f"OVERTAKE COMPLETE at step {k} (t={k * 0.1:.1f}s): ego "
              f"closed a {args.gap:.1f} m gap and leads by "
              f"{-lead_margin[-1]:.1f} m at the end")
    else:
        print(f"no overtake: final margin {lead_margin[-1]:.1f} m "
              f"(positive = lead still ahead)")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from irbfn_tpu.sim.render import draw_map, draw_track

    fig, ax = plt.subplots(figsize=(9, 7))
    if omap is not None:
        draw_map(ax, omap)
    draw_track(ax, track)
    ax.plot(traj_x[:, 1, 0], traj_x[:, 1, 1], color="tab:orange", lw=1.5,
            label="lead (pursuit, slow)")
    ax.plot(traj_x[:, 0, 0], traj_x[:, 0, 1], color="tab:blue", lw=1.5,
            label="ego (lattice)")
    if passed.size and not collided:
        ax.plot(traj_x[k, 0, 0], traj_x[k, 0, 1], "g*", ms=16,
                label=f"overtake t={k * 0.1:.1f}s")
    ax.set_aspect("equal")
    ax.legend(loc="upper right")
    mode = "lidar-perceived" if args.from_scan else "privileged-pose"
    ax.set_title(f"lattice-planner overtake, {mode} opponent "
                 "(SAT rectangle collision)")
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
