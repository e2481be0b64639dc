"""Minimal closed-loop track simulator (f1tenth_gym capability replacement).

Provides the closed-loop evaluation surface the reference gets from
f1tenth_gym (SURVEY.md §2.5): single-track dynamics stepping with (mu, cs)
vehicle parameters, track-relative observations (the "frenet_dynamic_state"
observation the planners consume), lap tracking, noisy resets, and
vectorized batch rollouts for robustness sweeps.

TPU-first: the simulator state is a pytree of arrays batched over parallel
episodes; ``step`` is jittable, so an entire (mu, cs) robustness sweep
(reference scripts/eval_dnmpc.py joblib fan-out) becomes ONE vmapped/sharded
closed-loop rollout on device.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import VehicleParams
from irbfn_tpu.dynamics.single_track import blended_deriv, rk4_step
from irbfn_tpu.sim.track import Track, cartesian_to_frenet


class SimState(NamedTuple):
    x: jnp.ndarray  # (..., 7) ST state [x, y, delta, v, psi, psidot, beta]
    t: jnp.ndarray  # (...,) sim time
    s: jnp.ndarray  # (...,) frenet progress (unwrapped)
    laps: jnp.ndarray  # (...,) completed laps
    done: jnp.ndarray  # (...,) terminated flag


class Observation(NamedTuple):
    """Superset of the gym observation dicts the reference planners read
    (pose/velocity/frenet fields, irbfn_planner.py:161-167 &
    nonlinear_dmpc_frenet.py:472-487). ``scan`` carries lidar ranges
    (..., n_beams) when the env has a scan_spec (the gym env returns scans
    in every obs, base_classes.py:345-357) and is None otherwise (None is a
    pytree-empty leaf, so scanless envs keep their treedef)."""

    pose_x: jnp.ndarray
    pose_y: jnp.ndarray
    pose_theta: jnp.ndarray
    delta: jnp.ndarray
    linear_vel_x: jnp.ndarray
    linear_vel_y: jnp.ndarray
    ang_vel_z: jnp.ndarray
    beta: jnp.ndarray
    s: jnp.ndarray
    ey: jnp.ndarray
    epsi: jnp.ndarray
    scan: jnp.ndarray | None = None


class StepRecord(NamedTuple):
    """Per-step rollout record: the observation the policy saw, plus the
    post-step termination flag and lap counter (the reference's per-step
    `done`/lap bookkeeping, eval_dnmpc.py:63-95)."""

    obs: Observation
    done: jnp.ndarray
    laps: jnp.ndarray


class TrackEnv:
    """Closed-loop env; all methods jittable and batched."""

    def __init__(self, track: Track, params: VehicleParams,
                 sim_dt: float = 0.01, control_dt: float = 0.1,
                 half_width: float | None = None, occ_map=None,
                 car_radius: float = 0.0, control_mode: str = "accl",
                 scan_spec=None, enable_ttc: bool = False,
                 ttc_thresh: float = 0.005,
                 car_footprint: tuple | None = None):
        """``half_width``: drivable corridor half width around the raceline;
        when set, leaving the corridor terminates the episode (the gym env's
        collision-with-map `done`, eval_dnmpc.py:77-80). ``occ_map``: an
        OccupancyMap — when set, collision is checked against the real map
        geometry (distance field < car_radius) instead of / in addition to
        the corridor. None for both = open world.

        ``control_mode``: 'accl' — action = [accel, steer_vel] (default) —
        or 'speed' — action = [speed, steer], run through the reference's PID
        low-level controller each control period (the gym's
        ``control_input='speed'`` pipeline, envs/action.py:62-84).

        ``scan_spec``: a sim.map.ScanSpec — observations then include lidar
        ranges sphere-traced against ``occ_map`` (the gym returns a scan in
        every obs, base_classes.py:345-357). ``enable_ttc``: the iTTC
        emergency check runs each control step on the current scan; a hit
        stops the vehicle and terminates the episode (the gym zeroes
        velocity and sets the collision flag -> done, base_classes.py:
        240-272,515-522; checked per control period here rather than per
        physics substep — 10x cheaper, and iTTC thresholds are ~ms so the
        0.1 s control period bounds the same approach speeds). Both require
        ``occ_map``."""
        from irbfn_tpu.sim.safety import ACTION_MODES

        self.track = track
        self.params = params
        self.sim_dt = sim_dt
        self.substeps = max(1, int(round(control_dt / sim_dt)))
        self.half_width = half_width
        self.occ_map = occ_map
        self.car_radius = car_radius
        # (length, width): map collision checks the oriented rectangle
        # footprint (covering-disc chain, map.footprint_clearance) instead
        # of a single CoG disc — the reference's footprint-vertex accuracy
        self.car_footprint = car_footprint
        if control_mode not in ACTION_MODES:
            raise ValueError(f"unknown control_mode {control_mode!r}; "
                             f"one of {sorted(ACTION_MODES)}")
        self.control_mode = control_mode
        self._act = ACTION_MODES[control_mode]
        self._p_sim = params._replace(dt=jnp.asarray(sim_dt, jnp.result_type(params.dt)))
        if (scan_spec is not None or enable_ttc) and occ_map is None:
            raise ValueError("scan_spec/enable_ttc require an occ_map")
        if enable_ttc and scan_spec is None:
            from irbfn_tpu.sim.map import ScanSpec

            scan_spec = ScanSpec()
        self.scan_spec = scan_spec
        self.enable_ttc = enable_ttc
        self.ttc_thresh = ttc_thresh
        if enable_ttc:
            from irbfn_tpu.sim.safety import beam_geometry

            # f1tenth footprint beam geometry (the gym's per-beam car-edge
            # offsets, base_classes.py:125-164)
            _, self._ttc_cos, self._ttc_side = beam_geometry(
                n_beams=scan_spec.n_beams, fov=scan_spec.fov)

    def reset(self, s0=0.0, ey0=0.0, speed0=0.1, key=None,
              noise_scale: float = 0.0, batch_shape=()) -> SimState:
        """Start on the raceline at arc length s0 (+ optional pose noise,
        matching eval_dnmpc.py:51-53's noisy trials)."""
        dtype = jnp.result_type(self.params.dt)
        s0 = jnp.broadcast_to(jnp.asarray(s0, dtype), batch_shape)
        ey0 = jnp.broadcast_to(jnp.asarray(ey0, dtype), batch_shape)
        x, y, theta = self.track.frenet_to_cartesian(s0, ey0, jnp.zeros_like(s0))
        if key is not None and noise_scale > 0:
            noise = noise_scale * jax.random.normal(key, batch_shape + (3,))
            x = x + noise[..., 0]
            y = y + noise[..., 1]
            theta = theta + noise[..., 2]
        zeros = jnp.zeros_like(s0)
        state = jnp.stack([x, y, zeros, jnp.full_like(s0, speed0), theta,
                           zeros, zeros], axis=-1)
        return SimState(state, zeros, s0, zeros.astype(jnp.int32),
                        jnp.zeros(batch_shape, bool))

    def _scan(self, x):
        from irbfn_tpu.sim.map import trace_rays

        return trace_rays(self.occ_map, x[..., 0], x[..., 1], x[..., 4],
                          self.scan_spec)

    def observe(self, sim: SimState) -> Observation:
        x = sim.x
        s, ey, epsi = self.track.cartesian_to_frenet(x[..., 0], x[..., 1],
                                                     x[..., 4])
        scan = self._scan(x) if self.scan_spec is not None else None
        return Observation(x[..., 0], x[..., 1], x[..., 4], x[..., 2],
                           x[..., 3], x[..., 3] * jnp.tan(x[..., 6]),
                           x[..., 5], x[..., 6], s, ey, epsi, scan)

    @partial(jax.jit, static_argnums=(0,))
    def step(self, sim: SimState, action: jnp.ndarray,
             scan=None) -> SimState:
        """Advance one control period (substepped RK4 at sim_dt).

        action (..., 2): [accel, steer_vel] in 'accl' mode, [speed, steer] in
        'speed' mode. The command is held constant over substeps (the
        reference's control pipeline holds actions over sim substeps); in
        'speed' mode the PID re-evaluates each substep against the current
        state, like the gym's per-physics-step low-level loop.

        ``scan``: with enable_ttc, the current-pose scan (pass obs.scan to
        reuse the observation's trace — rollout does; recomputed here if
        None). An iTTC hit stops the vehicle where it stands and terminates
        (reference check_ttc, base_classes.py:240-272).
        """
        action = jnp.asarray(action, sim.x.dtype)

        ttc_hit = None
        if self.enable_ttc:
            from irbfn_tpu.sim.safety import ttc_in_collision

            if scan is None:
                scan = self._scan(sim.x)
            ttc_hit = ttc_in_collision(scan, sim.x[..., 3], self._ttc_cos,
                                       self._ttc_side, self.ttc_thresh)

        def sub(x, _):
            u = self._act(action, x, self._p_sim)
            return rk4_step(blended_deriv, x, u, self._p_sim), None

        x_new, _ = jax.lax.scan(sub, sim.x, None, length=self.substeps)
        if ttc_hit is not None:
            # stopped in place: velocity / yaw rate / slip zeroed like the
            # reference's state[3:] = 0 (steer angle kept)
            stopped = sim.x.at[..., 3].set(0.0).at[..., 5].set(0.0)
            stopped = stopped.at[..., 6].set(0.0)
            x_new = jnp.where(ttc_hit[..., None], stopped, x_new)
        # terminated episodes are frozen: no further integration or progress
        x_new = jnp.where(sim.done[..., None], sim.x, x_new)
        s_new, ey_new, _ = self.track.cartesian_to_frenet(
            x_new[..., 0], x_new[..., 1], x_new[..., 4])
        # lap detection: wrapped progress jumps backwards by ~track length
        length = self.track.raceline.length
        ds = s_new - jnp.mod(sim.s, length)
        lap = (ds < -0.5 * length) & ~sim.done
        laps = sim.laps + lap.astype(jnp.int32)
        s_unwrapped = jnp.where(lap, sim.s + ds + length, sim.s + ds)
        s_unwrapped = jnp.where(sim.done, sim.s, s_unwrapped)
        # termination: numerical blow-up (the gym's crash) or off-track
        crashed = ~jnp.all(jnp.isfinite(x_new), axis=-1)
        if ttc_hit is not None:
            crashed = crashed | ttc_hit
        if self.half_width is not None:
            crashed = crashed | (jnp.abs(ey_new) > self.half_width)
        if self.occ_map is not None:
            from irbfn_tpu.sim.map import footprint_clearance, map_clearance

            if self.car_footprint is not None:
                length, width = self.car_footprint
                clear = footprint_clearance(
                    self.occ_map, x_new[..., 0], x_new[..., 1],
                    x_new[..., 4], length, width)
            else:
                clear = map_clearance(self.occ_map, x_new[..., 0],
                                      x_new[..., 1], self.car_radius)
            crashed = crashed | (clear < 0)
        t_new = jnp.where(sim.done, sim.t, sim.t + self.substeps * self.sim_dt)
        return SimState(x_new, t_new, s_unwrapped, laps, sim.done | crashed)

    def rollout(self, sim: SimState, policy: Callable, n_steps: int):
        """Run ``policy(obs) -> action`` closed loop for n_steps (jittable if
        the policy is). Returns (final SimState, StepRecord trajectory);
        terminated episodes are frozen in place, and the StepRecord `done`
        flags let metrics mask out post-termination steps."""

        def body(s, _):
            obs = self.observe(s)
            action = policy(obs)
            s_next = self.step(s, action, obs.scan)
            return s_next, StepRecord(obs, s_next.done, s_next.laps)

        return jax.lax.scan(body, sim, None, length=n_steps)

    def rollout_stateful(self, sim: SimState, policy: Callable,
                         policy_state, n_steps: int):
        """Closed loop for a STATEFUL policy: ``policy(policy_state, obs) ->
        (action, new_policy_state)`` — e.g. an online grip observer whose
        estimate is part of the rollout carry (planning/grip.py). Returns
        ``(final SimState, final policy_state, StepRecord trajectory)``."""

        def body(carry, _):
            s, ps = carry
            obs = self.observe(s)
            action, ps = policy(ps, obs)
            s_next = self.step(s, action, obs.scan)
            return (s_next, ps), StepRecord(obs, s_next.done, s_next.laps)

        (final, ps), traj = jax.lax.scan(body, (sim, policy_state), None,
                                         length=n_steps)
        return final, ps, traj


_OBS_TYPES = {
    # reference observation_factory presets (observation.py:266-285; the
    # frenet_dynamic_state type is the v1.0.0 gym surface the frenet
    # planners consume, nonlinear_dmpc_frenet.py:472-487)
    "kinematic_state": ["pose_x", "pose_y", "delta", "linear_vel_x",
                        "pose_theta"],
    "dynamic_state": ["pose_x", "pose_y", "delta", "linear_vel_x",
                      "pose_theta", "ang_vel_z", "beta"],
    "frenet_dynamic_state": ["pose_x", "pose_y", "delta", "linear_vel_x",
                             "linear_vel_y", "pose_theta", "ang_vel_z",
                             "beta", "s", "ey", "epsi"],
}


def observation_factory(obs: Observation, obs_type: str = "original",
                        features=None, sim: SimState | None = None,
                        scan=None) -> dict:
    """Select an observation dict by type — the reference's observation
    factory (observation.py:266-285) over this env's batched Observation.

    ``features`` overrides the preset field list (type 'features');
    'original' returns every field. ``sim``/``scan`` optionally add the
    reference's collision / lap_time / lap_count / scan entries."""
    d = obs._asdict()
    if d.get("scan") is None:  # scanless env: drop the empty leaf
        d.pop("scan", None)
    if sim is not None:
        d["collision"] = sim.done.astype(obs.ey.dtype)
        d["lap_time"] = sim.t
        d["lap_count"] = sim.laps
    if scan is not None:
        d["scan"] = scan
    if features is None:
        if obs_type == "features":
            # the reference factory requires an explicit list for this type
            # (observation.py:266-285); silently returning everything would
            # hand callers an over-wide observation
            raise ValueError("obs_type='features' requires a features list")
        if obs_type == "original":
            return d
        if obs_type not in _OBS_TYPES:
            raise ValueError(f"Invalid observation type {obs_type}.")
        features = _OBS_TYPES[obs_type]
    missing = [k for k in features if k not in d]
    if missing:
        raise KeyError(f"observation features not available: {missing}")
    return {k: d[k] for k in features}


def deviation_metrics(traj):
    """Mean absolute lateral / heading deviation over a trajectory — the
    reference's robustness-sweep metrics (plot_eval_dnmpc.ipynb cells 3-7).

    Accepts a StepRecord (masks steps after episode termination) or a bare
    Observation trajectory (averages every step)."""
    if isinstance(traj, StepRecord):
        obs, done = traj.obs, traj.done
        # obs[t] was observed BEFORE step t; it is live iff the episode had
        # not terminated by the end of step t-1.
        alive = jnp.concatenate(
            [jnp.ones_like(done[:1]), ~done[:-1]], axis=0)
        w = alive.astype(obs.ey.dtype)
        n = jnp.maximum(jnp.sum(w, axis=0), 1.0)
        return (jnp.sum(jnp.abs(obs.ey) * w, axis=0) / n,
                jnp.sum(jnp.abs(obs.epsi) * w, axis=0) / n)
    return (jnp.mean(jnp.abs(traj.ey), axis=0),
            jnp.mean(jnp.abs(traj.epsi), axis=0))
