"""Online planners: learned (IRBFN), solver-in-the-loop (NMPC), adaptive.

Capability match for reference ``src/irbfn_mpc/irbfn_planner.py`` (IRBFNPlanner,
IRBFNFrenetPlanner, AdaptiveIRBFNPlanner) and the online half of
``nonlinear_dmpc_frenet.py`` (NMPCPlanner.plan), rebuilt TPU-first:

- the full plan step — waypoint lookup, frame transform, mirror trick, net
  forward, un-mirror, rollout — is ONE jitted function with no host
  round-trips (the reference interleaves numba host loops with jax calls);
- every planner is natively batched: one call serves a batch of poses
  (the sub-ms batch-1024 north-star), a single pose is just batch=1;
- the mirror symmetry trick (halving the table, irbfn_planner.py:189-208)
  is branchless (sign masks instead of Python if).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.dynamics.params import VehicleParams, f1tenth_params
from irbfn_tpu.dynamics.single_track import rollout as st_rollout
from irbfn_tpu.planning.bandits import EXP3
from irbfn_tpu.sim.track import Track, horizon_goal_speed, interp_wrapped
from irbfn_tpu.solvers.clothoid import wrap_angle
from irbfn_tpu.solvers.nmpc import NMPCConfig, solve_nmpc_batch


class PlanResult(NamedTuple):
    accel: jnp.ndarray  # (...,)
    steer_vel: jnp.ndarray  # (...,)
    pred_controls: jnp.ndarray  # (..., T, 2) full predicted sequence
    pred_states: jnp.ndarray  # (..., T, 7) rollout for visualization
    goal: jnp.ndarray  # (..., >=3) goal state used


def _pallas_vmem_bytes(model, tile_b: int = 128) -> int:
    """Estimate the fused RBF kernel's resident VMEM for a WCRBFNet: all
    operands are loaded whole per batch tile (ops/pallas_rbf.py in_specs),
    dominated by the (R, Kp, Fp) centers block. A bank past the ~16 MB
    scoped-VMEM budget fails at compile time with a Mosaic error, so 'auto'
    mode must not select Pallas for it."""
    rnd = lambda v, m: ((v + m - 1) // m) * m  # noqa: E731
    R, K, F = model.num_regions, model.num_kernels, model.in_features
    Kp, Fp, Op = rnd(K, 128), rnd(F, 128), rnd(model.out_features, 128)
    Rp = rnd(R, 8)
    head = (R * Kp * Op + Rp * Op
            if getattr(model, "head_mode", "shared") == "per_region"
            else Kp * Op + Op)
    operands = R * Kp * Fp + R * Kp + head
    per_tile = tile_b * (Fp + Rp + Op + 2 * Kp)  # x, gamma, out, feat/phi
    return 4 * (operands + per_tile)


def _make_apply(model, params, use_pallas):
    """Net forward for the plan step: the flax/XLA path, or the fused
    Pallas kernel (ops/pallas_rbf.py — keeps the (B, R, K) basis tensor in
    VMEM; 1.8x faster than the XLA path on v5e, 12.6 us vs 23.3 us at
    batch 1024 with serve-accurate f32 distances + HIGHEST head).
    Pallas serves plain WCRBFNet (linear head) only.

    ``use_pallas``: True / False / "auto" (default in planners) — auto
    serves through the fused kernel when the backend is a TPU and the model
    qualifies, and falls back to flax elsewhere (compiled Mosaic kernels
    don't run on CPU)."""
    from irbfn_tpu.models.wcrbf import WCRBFNet

    if use_pallas == "auto":
        use_pallas = (isinstance(model, WCRBFNet)
                      and jax.default_backend() == "tpu"
                      and _pallas_vmem_bytes(model) <= 12 * 2**20)
    if not use_pallas:
        from irbfn_tpu.models.wcrbf import ClusterWCRBFNet

        if isinstance(model, ClusterWCRBFNet):
            # the learned-gate net returns (out, gate_logits); the plan
            # step consumes controls only (irbfn_planner.py:286-326 serves
            # the cluster variant the same way)
            return lambda prm, xin: model.apply(prm, xin)[0]
        return model.apply
    from irbfn_tpu.ops.pallas_rbf import (wcrbf_forward_pallas,
                                          wcrbf_params_to_pallas)

    if not isinstance(model, WCRBFNet):
        raise ValueError(
            f"use_pallas supports WCRBFNet, got {type(model).__name__}")
    ops = wcrbf_params_to_pallas(params, model)
    basis = model.basis_func
    scale = (None if model.input_scale is None
             else jnp.asarray(model.input_scale, jnp.float32))

    def apply_fn(net_params, xin):
        del net_params  # operands were extracted once at planner build
        if scale is not None:  # operands are pre-scaled to match (see
            xin = xin * scale  # wcrbf_params_to_pallas)
        return wcrbf_forward_pallas(xin, *ops, basis_fn=basis)

    return apply_fn


def _lookahead_goal(rl_points, rl_vxs, rl_yaws, x, y, v, horizon_time=0.5,
                    min_lookahead=0.1):
    """Velocity-scaled lookahead waypoint on the raceline.

    Device-side analogue of the reference's nearest_point+intersect_point
    lookup (irbfn_planner.py:113-145): project the pose on the raceline and
    walk the arc forward by v * horizon_time.
    """
    query = jnp.stack([x, y], axis=-1)
    d2 = jnp.sum((query[..., None, :] - rl_points) ** 2, axis=-1)
    idx = jnp.argmin(d2, axis=-1)
    n = rl_points.shape[0]
    # arc spacing (uniform resampled raceline)
    seg = jnp.linalg.norm(rl_points[1] - rl_points[0])
    la_d = jnp.maximum(jnp.maximum(v, 0.1) * horizon_time, min_lookahead)
    steps = jnp.ceil(la_d / seg).astype(jnp.int32)
    goal_idx = jnp.mod(idx + steps, n)
    gx = rl_points[goal_idx, 0]
    gy = rl_points[goal_idx, 1]
    gtheta = rl_yaws[goal_idx]
    gv = rl_vxs[idx]  # velocity from the CLOSEST point (irbfn_planner.py:140)
    return gx, gy, gtheta, gv


class IRBFNPlanner:
    """Cartesian learned planner (reference IRBFNPlanner, irbfn_planner.py:35-241).

    net input: [v, x_g, y_g, t_g, v_g, beta, angv] in body frame with the
    y>=0 mirror trick; output: [accl_0..4, sv_0..4] (sv_ind selects layout).
    """

    def __init__(self, model, params, track: Track,
                 dyn_params: Optional[VehicleParams] = None,
                 mirror: bool = False, sv_ind: int = 5,
                 horizon_time: float = 0.5, dtype=jnp.float32,
                 use_pallas="auto", input_bounds=None,
                 steer_mode: str = "setpoint", setpoint_frac: float = 0.4,
                 setpoint_gain: float = 10.0, plan_dt: float = 0.1):
        """``input_bounds``: optional (7, 2) per-dim [lo, hi] of the trained
        grid; queries are clamped into it after mirroring. Without it, a
        state outside EVERY region's bounds zeroes the WCRBF indicator and
        the net outputs exactly 0 — measured closed-loop as a car frozen at
        constant speed/steer circling forever once it first leaves the grid.

        ``steer_mode``: how the plan's steer-rate sequence is executed.
        The cartesian table (like the reference's 7-D lattice,
        nmpc_data_generator.py:36-65) has NO delta input — every plan
        assumes steering starts at 0 — so executing the raw first rate
        (``"rate"``, the reference's plan() return) is an unstable feedback
        law: in a steady corner every replan says "ramp delta up from 0",
        the executed delta ratchets past the needed steady angle (measured
        0.155 rad where ~0.04 holds the arc), and the car rings then spins;
        replanning 10x faster does NOT fix it (the continuous-time law is
        what's unstable — measured identical divergence at 100 Hz).
        ``"setpoint"`` (default) instead integrates the plan's FULL rate
        sequence into the delta profile the solver intended (from its
        assumed 0), takes the profile value at ``setpoint_frac`` of the
        horizon as a steer-ANGLE setpoint, and emits
        ``sv = clip(gain * (setpoint - delta), +-sv_max)`` — delta feedback
        with the solver's target, the same steer-angle+P-loop interface as
        the gym's default action mode (dynamic_models.py:419-461). Measured
        on the oval: rate mode 0 laps (spins at the first corner); setpoint
        mode 4 laps, mean|ey| 0.028 m — NMPC-in-the-loop-level tracking.
        ``plan_dt`` is the table's horizon step (0.1 s).
        """
        if steer_mode not in ("setpoint", "rate"):
            raise ValueError(f"steer_mode {steer_mode!r}")
        self.track = track
        self.mirror = mirror
        self.sv_ind = sv_ind
        self._dtype = dtype
        p = (dyn_params or f1tenth_params()).astype(dtype)
        rl = track.raceline
        apply_fn = _make_apply(model, params, use_pallas)
        if input_bounds is not None:
            input_bounds = jnp.asarray(input_bounds, dtype)

        @jax.jit
        def plan_fn(net_params, x, y, theta, delta, v, beta, angv):
            gx, gy, gtheta, gv = _lookahead_goal(
                rl.points, rl.vxs, rl.yaws, x, y, v, horizon_time)
            # body-frame goal
            dx, dy = gx - x, gy - y
            c, s = jnp.cos(-theta), jnp.sin(-theta)
            lx = c * dx - s * dy
            ly = s * dx + c * dy
            # wrap to [-pi, pi]: theta accumulates over laps while the
            # raceline yaw stays wrapped; the raw difference drifts by 2*pi
            # per lap and walks the query off the t_goal axis
            ltheta = gtheta - theta
            ltheta = jnp.arctan2(jnp.sin(ltheta), jnp.cos(ltheta))
            # mirror trick: reflect right-half goals onto the y>=0 half with
            # the EXACT single-track symmetry — every lateral quantity flips
            # (ly, ltheta, beta, angv; sv on the way out), matching
            # mirror_cartesian_table. The reference instead maps theta
            # through `% np.pi` and leaves beta/angv unflipped
            # (irbfn_planner.py:188-204): a goal with a slightly-negative
            # relative heading queries t_g ~ pi — the table's "goal behind
            # you" row — measured closed-loop as a U-turn/brake at the first
            # rightward deviation. Knowingly diverged (same class of fix as
            # the frenet exact mirror).
            need_m = ly < 0 if self.mirror else jnp.zeros_like(ly, bool)
            sign = jnp.where(need_m, -1.0, 1.0)
            net_in = jnp.stack([v, lx, sign * ly, sign * ltheta, gv,
                                sign * beta, sign * angv], axis=-1)
            if input_bounds is not None:
                net_in = jnp.clip(net_in, input_bounds[:, 0],
                                  input_bounds[:, 1])
            u = apply_fn(net_params, jnp.atleast_2d(net_in))
            u = jnp.reshape(u, net_in.shape[:-1] + (u.shape[-1],))
            u = u.astype(net_in.dtype)
            if self.mirror:
                # un-mirror the steer-vel block (irbfn_planner.py:207-208)
                T = u.shape[-1] - self.sv_ind
                flip = jnp.concatenate([
                    jnp.ones(u.shape[-1] - T, u.dtype),
                    jnp.full((T,), -1.0, u.dtype)])
                u = jnp.where(need_m[..., None], u * flip, u)
            controls = jnp.stack(
                [u[..., 0:u.shape[-1] // 2], u[..., u.shape[-1] // 2:]], axis=-1)
            x0 = jnp.stack([x, y, delta, v, theta, angv, beta], axis=-1)
            states = st_rollout(x0, controls, p)
            goal = jnp.stack([gx, gy, gtheta, gv], axis=-1)
            if steer_mode == "setpoint":
                # track the plan's implied steer-angle profile (see __init__)
                d_prof = jnp.cumsum(controls[..., 1], axis=-1) * plan_dt
                T = d_prof.shape[-1]
                k = min(max(int(round(setpoint_frac * T)) - 1, 0), T - 1)
                sv_exec = jnp.clip(setpoint_gain * (d_prof[..., k] - delta),
                                   -p.sv_max, p.sv_max)
            else:
                sv_exec = u[..., self.sv_ind]
            return PlanResult(u[..., 0], sv_exec, controls, states, goal)

        self._plan_fn = plan_fn
        self._params = params
        self.last: Optional[PlanResult] = None

    def plan_batch(self, x, y, theta, delta, v, beta, angv) -> PlanResult:
        res = self._plan_fn(self._params,
                            *(jnp.asarray(a, self._dtype) for a in
                              (x, y, theta, delta, v, beta, angv)))
        self.last = res
        return res

    def plan(self, obs) -> tuple:
        """Reference obs-dict API: returns (accel, steer_vel) floats."""
        res = self.plan_batch(
            obs["pose_x"], obs["pose_y"], obs["pose_theta"], obs["delta"],
            obs["linear_vel_x"], obs["beta"], obs["ang_vel_z"])
        return float(res.accel), float(res.steer_vel)


class IRBFNFrenetPlanner:
    """Frenet learned planner (reference IRBFNFrenetPlanner,
    irbfn_planner.py:244-560).

    net input: [ey, delta, vx, vy, vx_goal, wz, epsi, curv] with the ey<-0.05
    mirror (irbfn_planner.py:456-480); output: [accl_0..4, sv_0..4].
    """

    MIRROR_EY_THRESHOLD = -0.05

    def __init__(self, model, params, track: Track,
                 dyn_params: Optional[VehicleParams] = None,
                 mirror: bool = True, horizon: int = 5,
                 dtype=jnp.float32, use_pallas="auto", input_bounds=None):
        """``input_bounds``: optional (8, 2) per-dim [lo, hi] — the trained
        table's grid range. When given, net inputs are clamped into it
        (after mirroring), so off-table states (e.g. a corner sharper than
        the table's curvature axis) degrade to the nearest trained problem
        instead of extrapolating the RBF tails. The solver-table analogue of
        the explicit planner's -999 guard (explicit_planner.py:390-392)."""
        self.track = track
        self._dtype = dtype
        p = (dyn_params or f1tenth_params()).astype(dtype)
        rl = track.raceline
        apply_fn = _make_apply(model, params, use_pallas)
        thresh = self.MIRROR_EY_THRESHOLD
        if input_bounds is not None:
            input_bounds = jnp.asarray(input_bounds, dtype)

        @jax.jit
        def plan_fn(net_params, s, ey, epsi, delta, vx, vy, wz):
            curv = interp_wrapped(rl.ss, rl.ks, s, rl.length)
            vx_goal = horizon_goal_speed(rl, s, vx, horizon * p.dt)
            need_m = ey < thresh if mirror else jnp.zeros_like(ey, bool)
            sign = jnp.where(need_m, -1.0, 1.0)
            # exact reflection: EVERY lateral quantity flips (ey, delta, vy,
            # wz, epsi, curv; sv un-flipped on the way out) — the reference
            # flips only ey/epsi (irbfn_planner.py:456-480), which queries a
            # wrong-problem row whenever delta/vy/wz/curv are nonzero
            net_in = jnp.stack([sign * ey, sign * delta, vx, sign * vy,
                                vx_goal, sign * wz, sign * epsi,
                                sign * curv], axis=-1)
            if input_bounds is not None:
                net_in = jnp.clip(net_in, input_bounds[:, 0],
                                  input_bounds[:, 1])
            u = apply_fn(net_params, jnp.atleast_2d(net_in))
            u = jnp.reshape(u, net_in.shape[:-1] + (u.shape[-1],))
            u = u.astype(net_in.dtype)
            T = u.shape[-1] // 2
            flip = jnp.concatenate([jnp.ones((T,), u.dtype),
                                    -jnp.ones((T,), u.dtype)])
            u = jnp.where(need_m[..., None], u * flip, u)
            controls = jnp.stack([u[..., :T], u[..., T:]], axis=-1)
            x0 = jnp.stack([s, ey, delta, vx, vy, wz, epsi], axis=-1)
            from irbfn_tpu.dynamics.frenet import frenet_rollout
            states = frenet_rollout(x0, controls, curv, p, blend="ls")
            goal = jnp.stack([jnp.zeros_like(ey), jnp.zeros_like(ey),
                              jnp.zeros_like(ey), vx_goal], axis=-1)
            return PlanResult(u[..., 0], u[..., T], controls, states, goal)

        self._plan_fn = plan_fn
        self._params = params
        self.last: Optional[PlanResult] = None

    def plan_batch(self, s, ey, epsi, delta, vx, vy, wz) -> PlanResult:
        res = self._plan_fn(self._params,
                            *(jnp.asarray(a, self._dtype) for a in
                              (s, ey, epsi, delta, vx, vy, wz)))
        self.last = res
        return res

    def plan(self, obs) -> tuple:
        s, ey, epsi = self.track.cartesian_to_frenet(
            obs["pose_x"], obs["pose_y"], obs["pose_theta"])
        res = self.plan_batch(s, ey, epsi, obs["delta"],
                              obs["linear_vel_x"], obs["linear_vel_y"],
                              obs["ang_vel_z"])
        return float(res.accel), float(res.steer_vel)


class NMPCPlanner:
    """Solver-in-the-loop planner: replaces the reference's online IPOPT
    call (nonlinear_dmpc_frenet.py:558-603) with the batched AL/Newton
    solver.

    Warm starts, in priority order (BASELINE config #5's "iRBFN warm-start
    + differentiable rollout" pattern):
      1. an attached IRBFN net's predicted control sequence (amortized
         optimization — the net proposes, the solver polishes),
      2. the previous solution shifted one step,
      3. zeros.
    """

    def __init__(self, track: Track, params: VehicleParams,
                 cfg: NMPCConfig = NMPCConfig(),
                 warm_start_planner: "IRBFNFrenetPlanner | None" = None):
        self.track = track
        self.params = params
        self.cfg = cfg
        self.warm_start_planner = warm_start_planner
        self._u_prev = None

    def plan_batch(self, s, ey, epsi, delta, vx, vy, wz):
        rl = self.track.raceline
        curv = interp_wrapped(rl.ss, rl.ks, s, rl.length)
        vx_goal = horizon_goal_speed(
            rl, s, vx, float(self.cfg.horizon * self.cfg.dt))
        zeros = jnp.zeros_like(ey)
        x0 = jnp.stack([zeros, ey, delta, vx, vy, wz, epsi], axis=-1)
        goal = jnp.stack([zeros] * 3 + [vx_goal] + [zeros] * 3, axis=-1)
        if self.warm_start_planner is not None:
            net_plan = self.warm_start_planner.plan_batch(
                s, ey, epsi, delta, vx, vy, wz)
            u_init = net_plan.pred_controls.astype(x0.dtype)
        else:
            u_init = self._u_prev
            if u_init is not None and u_init.shape[:-2] != x0.shape[:-1]:
                u_init = None
        sol = solve_nmpc_batch(x0, goal, curv, self.params, self.cfg,
                               u_init=u_init)
        u = jnp.stack([sol.accel, sol.steer_vel], axis=-1)
        # shift warm start one step forward
        self._u_prev = jnp.concatenate([u[..., 1:, :], u[..., -1:, :]], axis=-2)
        return sol

    def plan(self, obs) -> tuple:
        s, ey, epsi = self.track.cartesian_to_frenet(
            obs["pose_x"], obs["pose_y"], obs["pose_theta"])
        sol = self.plan_batch(jnp.atleast_1d(s), jnp.atleast_1d(ey),
                              jnp.atleast_1d(epsi),
                              jnp.atleast_1d(jnp.asarray(obs["delta"])),
                              jnp.atleast_1d(jnp.asarray(obs["linear_vel_x"])),
                              jnp.atleast_1d(jnp.asarray(obs["linear_vel_y"])),
                              jnp.atleast_1d(jnp.asarray(obs["ang_vel_z"])))
        return float(sol.accel[0, 0]), float(sol.steer_vel[0, 0])


def stack_net_bank(model, params_list):
    """Fuse a bank of same-architecture checkpoints into ONE vmapped forward
    (the learned-planner analog of ``stack_grid_tables``; reference
    AdaptiveIRBFNPlanner loads N configs/ckpts as N separate planners,
    irbfn_planner.py:583-631, and fans out in Python).

    Returns ``(apply_fn, stacked_params)`` where
    ``apply_fn(stacked_params, x)`` evaluates EVERY arm on the batch in one
    device dispatch, shape ``(n_arms, *x.shape[:-1], out)`` — a per-row arm
    index then gathers the pulled arm (one fused op for a mixed-arm episode
    batch, used by ``scripts/eval_adaptive.py --nets``)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    apply_fn = jax.vmap(lambda prm, x: model.apply(prm, x),
                        in_axes=(0, None))
    return apply_fn, stacked


class AdaptiveIRBFNPlanner:
    """EXP3 bandit over a bank of planners trained for different (mu, cs)
    (reference AdaptiveIRBFNPlanner, irbfn_planner.py:563-781; unlike the
    reference, arm selection is actually wired into plan())."""

    def __init__(self, planners: List, gamma: float = 0.2, seed: int = 0):
        self.planners = planners
        self.bandit = EXP3(len(planners), gamma, seed)
        self.current_arm = 0

    def select(self) -> int:
        self.current_arm = self.bandit.pull_arm()
        return self.current_arm

    def reward(self, r: float):
        self.bandit.update_dist(self.current_arm, r)

    def plan(self, obs):
        return self.planners[self.current_arm].plan(obs)


class GripAdaptiveFrenetPlanner:
    """Grip-adaptive learned planner: a multi-mu WCRBF net bank fused into
    one vmapped forward (``stack_net_bank``), with BOTH the arm and the pace
    selected ONLINE by the lateral-residual grip observer (planning/grip.py).

    This composes the round-3 pieces into one shipping planner (VERDICT r3
    item #1): the per-arm sqrt(mu) pace law measured in
    ``scripts/eval_adaptive.py`` and the hand-picked global ``--speed_scale``
    of the 10x10 grid study both become functions of the observer's
    per-lane effective-grip estimate g:

        arm  = argmin_a |arm_mu_a - g|       (nearest trained-mu net)
        pace = clip(sqrt(g) * margin, lo, hi)  (grip-limited cornering speed)

    The reference's AdaptiveIRBFNPlanner holds N planners and an EXP3 whose
    arm selection is never wired into plan() (irbfn_planner.py:563-631) and
    has no pace adaptation at all; EXP3 also needs tens of EPISODES per
    (mu, cs) while the observer converges within the first corner of ONE
    episode. The whole policy — observer update, arm gather, mirrored net
    forward, pace-scaled goal speed — is one jitted step, batched over
    episode lanes, usable inside ``TrackEnv.rollout_stateful``.
    """

    def __init__(self, model, params_list: List, arm_mus, track: Track,
                 input_bounds=None, horizon: int = 5,
                 dyn_params: Optional[VehicleParams] = None,
                 nominal_mu: float = 1.0, nominal_cs: float = 5.0,
                 grip_cfg=None, pace_lo: float = 0.35, pace_hi: float = 1.0,
                 pace_margin: float = 1.0, ctrl_dt: float = 0.1,
                 mirror: bool = True, dtype=jnp.float32):
        from irbfn_tpu.planning.grip import (GripConfig, grip_init,
                                             grip_record, grip_update)

        self.track = track
        self._dtype = dtype
        self._grip_cfg = grip_cfg or GripConfig()
        self._grip_init = grip_init
        rl = track.raceline
        arm_mus = jnp.asarray(arm_mus, dtype)
        apply_fn, stacked = stack_net_bank(model, params_list)
        # the observer's g = 1 reference: the bank's training nominal
        # (mu = 1, C_S = 5 fullscale-equivalent on the SIM's param scale)
        p_nom = (dyn_params or f1tenth_params()).astype(dtype)
        p_nom = p_nom._replace(
            mu=jnp.asarray(nominal_mu, dtype),
            C_Sf=jnp.asarray(nominal_cs, dtype),
            C_Sr=jnp.asarray(nominal_cs, dtype))
        if input_bounds is not None:
            input_bounds = jnp.asarray(input_bounds, dtype)
        thresh = IRBFNFrenetPlanner.MIRROR_EY_THRESHOLD
        cfg = self._grip_cfg

        def policy_step(grip_state, obs):
            grip_state = grip_update(grip_state, obs, cfg, ctrl_dt)
            g = grip_state.g
            arm = jnp.argmin(
                jnp.abs(arm_mus - jnp.clip(g, arm_mus[0], arm_mus[-1])
                        [..., None]), axis=-1)
            pace = jnp.clip(jnp.sqrt(g) * pace_margin, pace_lo, pace_hi)
            s, ey, epsi = obs.s, obs.ey, obs.epsi
            vx, vy, wz = (obs.linear_vel_x, obs.linear_vel_y, obs.ang_vel_z)
            curv = interp_wrapped(rl.ss, rl.ks, s, rl.length)
            vx_goal = horizon_goal_speed(rl, s, vx, horizon * ctrl_dt) * pace
            need_m = ey < thresh if mirror else jnp.zeros_like(ey, bool)
            sign = jnp.where(need_m, -1.0, 1.0)
            net_in = jnp.stack([sign * ey, sign * obs.delta, vx, sign * vy,
                                vx_goal, sign * wz, sign * epsi,
                                sign * curv], axis=-1)
            if input_bounds is not None:
                net_in = jnp.clip(net_in, input_bounds[:, 0],
                                  input_bounds[:, 1])
            out_all = apply_fn(stacked, net_in)  # (A, ..., 2T)
            out = jnp.take_along_axis(
                out_all, arm[None, ..., None].astype(jnp.int32),
                axis=0)[0]
            T = out.shape[-1] // 2
            action = jnp.stack([out[..., 0], sign * out[..., T]], axis=-1)
            grip_state = grip_record(grip_state, obs, action, p_nom, cfg)
            return action, grip_state

        self._policy_step = jax.jit(policy_step)

    def init_state(self, batch_shape=()):
        return self._grip_init(batch_shape, self._grip_cfg, self._dtype)

    def policy(self):
        """``(grip_state, obs) -> (action, grip_state)`` for
        ``TrackEnv.rollout_stateful`` (accl control mode)."""
        return self._policy_step
