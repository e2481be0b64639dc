"""Multi-agent racing simulation.

Capability match for f1tenth_gym's multi-agent ``Simulator``
(envs/base_classes.py:359-542: per-agent RaceCar stepping + pairwise
collision checks via njit GJK on rotated footprint vertices,
collision_models.py:1-273).

TPU-first: agents are just another batch axis. States are (..., A, 7); all
agents step in one fused RK4. Pairwise collision is EXACT
rectangle-vs-rectangle via the separating-axis theorem — for two oriented
2-D rectangles SAT over the 4 edge normals is equivalent to GJK but
branchless and fixed-shape (GJK's data-dependent simplex loop doesn't map
to the VPU); a two-disc proxy remains as ``collision_model="discs"``."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import VehicleParams
from irbfn_tpu.dynamics.single_track import blended_deriv, rk4_step
from irbfn_tpu.sim.track import Track


class MultiAgentState(NamedTuple):
    x: jnp.ndarray  # (..., A, 7)
    t: jnp.ndarray  # (...,)
    collided: jnp.ndarray  # (..., A) sticky collision flags


def footprint_vertices(x, length: float, width: float):
    """Oriented-rectangle corner vertices of each car: (..., A, 4, 2).

    Corner order is counter-clockwise starting front-left (the reference's
    get_vertices order, collision_models.py:221-243)."""
    c = x[..., :2]
    th = x[..., 4]
    hl, hw = length / 2.0, width / 2.0
    local = jnp.asarray([[hl, hw], [hl, -hw], [-hl, -hw], [-hl, hw]],
                        c.dtype)  # (4, 2)
    co, si = jnp.cos(th), jnp.sin(th)
    rot = jnp.stack([jnp.stack([co, -si], -1),
                     jnp.stack([si, co], -1)], axis=-2)  # (..., A, 2, 2)
    return c[..., None, :] + jnp.einsum("...ij,kj->...ki", rot, local)


def ray_segment_distance(ox, oy, beam_theta, va, vb, eps: float = 1e-12):
    """Distance from (ox, oy) along world-frame angle ``beam_theta`` to the
    segment va->vb; +inf when the ray misses.

    Branchless port of the gym's per-(beam, edge) intersection
    (laser_models.py:316-346 get_range): with the beam normal
    n = (-sin t, cos t), d1 = cross(vb-va, o-va) / ((vb-va).n) is the range
    along the beam and d2 = (o-va).n / ((vb-va).n) the parameter on the
    segment; a hit needs d1 >= 0 and d2 in [0, 1]. The reference's exactly-
    collinear special case (beam grazing along the edge) is measure-zero
    and returns inf here.

    All args broadcast; returns the broadcast shape.
    """
    v1x = ox - va[..., 0]
    v1y = oy - va[..., 1]
    v2x = vb[..., 0] - va[..., 0]
    v2y = vb[..., 1] - va[..., 1]
    n_x = -jnp.sin(beam_theta)
    n_y = jnp.cos(beam_theta)
    denom = v2x * n_x + v2y * n_y
    safe = jnp.where(jnp.abs(denom) > eps, denom, 1.0)
    d1 = (v2x * v1y - v2y * v1x) / safe
    d2 = (v1x * n_x + v1y * n_y) / safe
    valid = ((jnp.abs(denom) > eps) & (d1 >= 0.0)
             & (d2 >= 0.0) & (d2 <= 1.0))
    return jnp.where(valid, d1, jnp.inf)


def ray_cast_footprints(x, scan, angles, car_length: float = 0.58,
                        car_width: float = 0.31):
    """Shorten each agent's scan by every opponent's rectangle footprint.

    The gym modifies each agent's map scan by ray casting onto all other
    agents' four footprint edges and keeping the per-beam min
    (base_classes.py:210-231 ray_cast_agents + laser_models.py:388-410
    ray_cast). TPU-first: ALL (scanning agent, beam, opponent, edge)
    intersections are computed in one branchless broadcast and min-reduced
    — no blocked-view index windows (that's a CPU loop-pruning trick; the
    VPU evaluates the full grid faster than it could branch).

    Args:
        x: (..., A, 7) agent states.
        scan: (..., A, B) base scans (map scan, or max-range in open space).
        angles: (B,) beam angles relative to each agent's heading.
    Returns:
        (..., A, B) shortened scans.
    """
    verts = footprint_vertices(x, car_length, car_width)  # (..., A, 4, 2)
    # axes of the intersection grid: (..., Ai, B, Aj, 4)
    va = jnp.expand_dims(verts, (-5, -4))  # (..., 1(Ai), 1(B), Aj, 4, 2)
    vb = jnp.expand_dims(jnp.roll(verts, -1, axis=-2), (-5, -4))
    ox = x[..., 0][..., None, None, None]  # (..., Ai, 1, 1, 1)
    oy = x[..., 1][..., None, None, None]
    bt = (x[..., :, None, 4] + angles)[..., :, :, None, None]  # (...,Ai,B,1,1)
    d = ray_segment_distance(ox, oy, bt, va, vb)  # (..., Ai, B, Aj, 4)
    n_agents = x.shape[-2]
    eye = jnp.eye(n_agents, dtype=bool)[:, None, :]  # (Ai, 1(B), Aj)
    d = jnp.where(eye[..., None], jnp.inf, d)
    return jnp.minimum(scan, jnp.min(d, axis=(-1, -2)))


def _disc_centers(x, p: VehicleParams):
    """Two collision discs per car at the axle positions: (..., A, 2, 2)."""
    pos = x[..., :2]
    psi = x[..., 4]
    heading = jnp.stack([jnp.cos(psi), jnp.sin(psi)], axis=-1)
    front = pos + p.lf * heading
    rear = pos - p.lr * heading
    return jnp.stack([front, rear], axis=-2)


def rects_overlap(c1, th1, c2, th2, length: float, width: float):
    """Exact oriented-rectangle overlap via the separating-axis theorem.

    Two rectangles of the same (length, width), centered at c1/c2 (..., 2)
    with headings th1/th2 (...): they overlap iff NO axis among the 4 edge
    normals separates the projections. Equivalent to the reference's GJK on
    `get_vertices` footprints (collision_models.py:121-218) — for convex
    polygons SAT and GJK decide the same predicate — but fixed-shape and
    branchless, so it vmaps over the (A, A) pair grid.
    """
    half = jnp.asarray([length / 2.0, width / 2.0])
    # body axes (..., 2, 2): rows are the two unit edge normals
    def axes(th):
        c, s = jnp.cos(th), jnp.sin(th)
        return jnp.stack([jnp.stack([c, s], -1),
                          jnp.stack([-s, c], -1)], axis=-2)

    a1, a2 = jnp.broadcast_arrays(axes(th1), axes(th2))
    axes_all = jnp.concatenate([a1, a2], axis=-2)  # (..., 4, 2)
    d = (c2 - c1)[..., None, :]  # (..., 1, 2)
    dist = jnp.abs(jnp.sum(axes_all * d, axis=-1))  # (..., 4)
    # projection radius of each rect on each axis: sum_j half_j |a . e_j|
    r1 = jnp.sum(half * jnp.abs(jnp.einsum("...kd,...jd->...kj",
                                           axes_all, a1)), axis=-1)
    r2 = jnp.sum(half * jnp.abs(jnp.einsum("...kd,...jd->...kj",
                                           axes_all, a2)), axis=-1)
    return jnp.all(dist <= r1 + r2, axis=-1)


def pairwise_collisions(x, p: VehicleParams, car_width: float = 0.31,
                        car_length: float = 0.58,
                        collision_model: str = "rect"):
    """Boolean (..., A) collision flags.

    ``collision_model="rect"``: exact SAT on the oriented car footprints
    (the reference's GJK-accuracy check); ``"discs"``: the two-disc proxy
    (cheaper, ~10 cm conservative at close corners).
    """
    n_agents = x.shape[-2]
    eye = jnp.eye(n_agents, dtype=bool)
    if collision_model == "rect":
        c = x[..., :2]
        th = x[..., 4]
        hit = rects_overlap(c[..., :, None, :], th[..., :, None],
                            c[..., None, :, :], th[..., None, :],
                            car_length, car_width)
        hit = hit & ~eye
        return jnp.any(hit, axis=-1)
    discs = _disc_centers(x, p)  # (..., A, 2, 2)
    radius = 0.5 * car_width + 0.1
    a = discs[..., :, None, :, None, :]  # (..., A, 1, 2, 1, 2)
    b = discs[..., None, :, None, :, :]  # (..., 1, A, 1, 2, 2)
    d = jnp.linalg.norm(a - b, axis=-1)  # (..., A, A, 2, 2)
    min_d = jnp.min(d, axis=(-1, -2))  # (..., A, A)
    hit = (min_d < 2 * radius) & ~eye
    return jnp.any(hit, axis=-1)


class MultiAgentEnv:
    """A-agent closed-loop env over a track; batched over leading axes."""

    def __init__(self, track: Track, params: VehicleParams, n_agents: int,
                 sim_dt: float = 0.01, control_dt: float = 0.1,
                 car_width: float = 0.31, car_length: float = 0.58,
                 collision_model: str = "rect", occ_map=None,
                 scan_spec=None, enable_ttc: bool = False,
                 ttc_thresh: float = 0.005):
        """``scan_spec`` (sim.map.ScanSpec) adds per-agent lidar to
        ``observe``: the map scan (sphere-traced on ``occ_map``, or
        max-range open space without one) shortened by every opponent's
        footprint — the gym Simulator's agent-aware scans
        (base_classes.py:210-231). ``enable_ttc`` applies the per-agent
        iTTC emergency stop in ``step`` using those scans, so an agent
        about to rear-end an opponent brakes exactly like the gym's
        check_ttc (laser_models.py:252-279)."""
        self.track = track
        self.params = params
        self.n_agents = n_agents
        self.car_width = car_width
        self.car_length = car_length
        self.collision_model = collision_model
        self.substeps = max(1, int(round(control_dt / sim_dt)))
        self._p_sim = params._replace(
            dt=jnp.asarray(sim_dt, jnp.result_type(params.dt)))
        self.occ_map = occ_map
        if enable_ttc and scan_spec is None:
            from irbfn_tpu.sim.map import ScanSpec

            scan_spec = ScanSpec()
        self.scan_spec = scan_spec
        self.enable_ttc = enable_ttc
        self.ttc_thresh = ttc_thresh
        if scan_spec is not None:
            self._angles = jnp.linspace(-scan_spec.fov / 2, scan_spec.fov / 2,
                                        scan_spec.n_beams, dtype=jnp.float32)
        if enable_ttc:
            from irbfn_tpu.sim.safety import beam_geometry

            _, self._ttc_cos, self._ttc_side = beam_geometry(
                n_beams=scan_spec.n_beams, fov=scan_spec.fov,
                width=car_width, lf=car_length / 2.0, lr=car_length / 2.0)

    def reset(self, s0, ey0=None, speed0=0.5, batch_shape=()) -> MultiAgentState:
        """s0: per-agent start arc lengths (A,) (staggered grid start)."""
        dtype = jnp.result_type(self.params.dt)
        s0 = jnp.broadcast_to(jnp.asarray(s0, dtype),
                              batch_shape + (self.n_agents,))
        ey0 = (jnp.zeros_like(s0) if ey0 is None
               else jnp.broadcast_to(jnp.asarray(ey0, dtype), s0.shape))
        x, y, th = self.track.frenet_to_cartesian(s0, ey0, jnp.zeros_like(s0))
        zeros = jnp.zeros_like(s0)
        state = jnp.stack([x, y, zeros, jnp.full_like(s0, speed0), th,
                           zeros, zeros], axis=-1)
        return MultiAgentState(state, jnp.zeros(batch_shape, dtype),
                               jnp.zeros(s0.shape, bool))

    def scan(self, x):
        """Per-agent lidar (..., A, n_beams): map scan (max-range open space
        without an occ_map) shortened by opponents' footprints."""
        spec = self.scan_spec
        if self.occ_map is not None:
            from irbfn_tpu.sim.map import trace_rays

            base = trace_rays(self.occ_map, x[..., 0], x[..., 1], x[..., 4],
                              spec)
        else:
            base = jnp.full(x.shape[:-1] + (spec.n_beams,), spec.max_range,
                            x.dtype)
        return ray_cast_footprints(x, base, self._angles, self.car_length,
                                   self.car_width)

    @partial(jax.jit, static_argnums=(0,))
    def step(self, state: MultiAgentState, actions: jnp.ndarray,
             scan=None):
        """actions (..., A, 2); collided agents freeze (crash semantics).

        With ``enable_ttc``, an agent whose scan shows imminent impact
        (opponent or wall) stops where it stands and its collided flag
        sticks — the gym's per-step check_ttc emergency stop. Pass the
        observation's scan to reuse its trace (recomputed here if None).
        """
        actions = jnp.asarray(actions, state.x.dtype)

        ttc_hit = None
        if self.enable_ttc:
            from irbfn_tpu.sim.safety import ttc_in_collision

            if scan is None:
                scan = self.scan(state.x)
            ttc_hit = ttc_in_collision(scan, state.x[..., 3], self._ttc_cos,
                                       self._ttc_side, self.ttc_thresh)

        def sub(x, _):
            return rk4_step(blended_deriv, x, actions, self._p_sim), None

        x_new, _ = jax.lax.scan(sub, state.x, None, length=self.substeps)
        if ttc_hit is not None:
            stopped = state.x.at[..., 3].set(0.0).at[..., 5].set(0.0)
            stopped = stopped.at[..., 6].set(0.0)
            x_new = jnp.where(ttc_hit[..., None], stopped, x_new)
        x_new = jnp.where(state.collided[..., None], state.x, x_new)
        collided = state.collided | pairwise_collisions(
            x_new, self.params, self.car_width, self.car_length,
            self.collision_model)
        if ttc_hit is not None:
            collided = collided | ttc_hit
        return MultiAgentState(x_new, state.t + self.substeps * float(self._p_sim.dt),
                               collided)

    def observe(self, state: MultiAgentState):
        """Per-agent frenet observations (s, ey, epsi) + raw states +
        opponent relative positions (+ agent-aware lidar with a scan_spec)."""
        x = state.x
        s, ey, epsi = self.track.cartesian_to_frenet(x[..., 0], x[..., 1],
                                                     x[..., 4])
        rel = x[..., None, :, :2] - x[..., :, None, :2]  # (..., A, A, 2)
        out = {"s": s, "ey": ey, "epsi": epsi, "states": x,
               "opponent_offsets": rel, "collided": state.collided}
        if self.scan_spec is not None:
            out["scan"] = self.scan(x)
        return out
