"""Planner-layer tests: explicit tables, bandits, learned planners."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.models import WCRBFNet, get_basis
from irbfn_tpu.planning import (
    EXP3,
    ExplicitFrenetPlanner,
    IRBFNFrenetPlanner,
    grid_lookup,
    grid_table_from_arrays,
    nn_lookup,
    nn_table_from_arrays,
)
from irbfn_tpu.sim import oval_track


# ------------------------------------------------------------------- tables

def _toy_table():
    """3-D regular lattice with outputs = function of inputs."""
    a = np.linspace(-1, 1, 5)
    b = np.linspace(0, 2, 4)
    c = np.linspace(-3, 3, 7)
    A, B, C = np.meshgrid(a, b, c, indexing="ij")
    inputs = np.stack([A, B, C], axis=-1).reshape(-1, 3)
    outputs = np.stack([inputs.sum(1), inputs[:, 0] * 2], axis=-1)
    return inputs, outputs


def test_grid_lookup_exact_on_lattice():
    inputs, outputs = _toy_table()
    table = grid_table_from_arrays(inputs, outputs)
    out, valid = grid_lookup(table, jnp.asarray(inputs, jnp.float32))
    np.testing.assert_allclose(out, outputs, rtol=1e-5)
    assert bool(valid.all())


def test_grid_lookup_snaps_to_nearest():
    inputs, outputs = _toy_table()
    table = grid_table_from_arrays(inputs, outputs)
    # query slightly off a lattice point snaps to it
    q = jnp.asarray([[0.51, 0.6, 1.1]], jnp.float32)  # nearest: (0.5, 0.666, 1.0)
    out, _ = grid_lookup(table, q)
    expect_point = np.array([0.5, 2 / 3, 1.0])
    np.testing.assert_allclose(out[0, 0], expect_point.sum(), atol=1e-5)


def test_grid_lookup_invalid_rows():
    inputs, outputs = _toy_table()
    outputs = outputs.copy()
    outputs[10] = -999.0
    table = grid_table_from_arrays(inputs, outputs)
    out, valid = grid_lookup(table, jnp.asarray(inputs[10:11], jnp.float32))
    assert not bool(valid[0])


def test_nn_lookup_matches_grid():
    inputs, outputs = _toy_table()
    gt = grid_table_from_arrays(inputs, outputs)
    nt = nn_table_from_arrays(inputs, outputs)
    rng = np.random.default_rng(0)
    q = jnp.asarray(inputs + rng.normal(scale=0.01, size=inputs.shape),
                    jnp.float32)
    out_g, _ = grid_lookup(gt, q)
    out_n, _ = nn_lookup(nt, q)
    np.testing.assert_allclose(out_g, out_n, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------- bandit

def test_exp3_converges_to_best_arm():
    bandit = EXP3(3, gamma=0.3, seed=0)
    rewards = [0.1, 2.0, 0.3]
    rng = np.random.default_rng(1)
    pulls = []
    for _ in range(300):
        arm = bandit.pull_arm()
        pulls.append(arm)
        bandit.update_dist(arm, rewards[arm] + rng.normal(scale=0.05))
    # best arm dominates late pulls
    late = np.asarray(pulls[-100:])
    assert (late == 1).mean() > 0.5
    assert np.argmax(bandit.weights) == 1


def test_exp3_raw_rewards_converge_fast():
    """rew_scale=None ([0,1] lap-progress rewards): the arm gap must
    separate within the ~40 episodes a closed-loop adaptation run affords;
    the sigmoid default provably cannot (gap shrinks ~8x)."""
    bandit = EXP3(3, gamma=0.3, seed=0)
    rewards = [0.70, 0.69, 0.23]  # measured fixed-arm profile at sim mu=0.6
    rng = np.random.default_rng(2)
    pulls = []
    for _ in range(40):
        arm = bandit.pull_arm()
        pulls.append(arm)
        r = np.clip(rewards[arm] + rng.normal(scale=0.02), 0.0, 1.0)
        bandit.update_dist(arm, float(r), rew_scale=None)
    late = np.asarray(pulls[-20:])
    # the bad arm must be visibly suppressed late
    assert (late == 2).mean() < 0.35
    assert np.argmax(bandit.weights) != 2


def test_exp3_reset():
    bandit = EXP3(4, gamma=0.2)
    bandit.pull_arm()
    bandit.update_dist(0, 5.0)
    bandit.reset()
    np.testing.assert_allclose(bandit.weights, 1.0)


# ------------------------------------------------------- learned planners

@pytest.fixture(scope="module")
def frenet_planner():
    track = oval_track(n_samples=256)
    model = WCRBFNet(
        in_features=8, out_features=10, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=[[-2.0, 0.0]], upper_bounds=[[0.0, 2.0]],
        dimension_ranges=[[0], [1]], activation_idx=[0], delta=[15.0])
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8)))
    return IRBFNFrenetPlanner(model, params, track)


def test_frenet_planner_batch_shapes(frenet_planner):
    B = 64
    rng = np.random.default_rng(0)
    res = frenet_planner.plan_batch(
        s=jnp.asarray(rng.uniform(0, 50, B)),
        ey=jnp.asarray(rng.uniform(-0.5, 0.5, B)),
        epsi=jnp.asarray(rng.uniform(-0.3, 0.3, B)),
        delta=jnp.zeros(B), vx=jnp.full(B, 3.0), vy=jnp.zeros(B),
        wz=jnp.zeros(B))
    assert res.accel.shape == (B,)
    assert res.pred_controls.shape == (B, 5, 2)
    assert res.pred_states.shape == (B, 5, 7)


def test_frenet_planner_mirror_consistency(frenet_planner):
    """Mirrored state gives mirrored steering (the half-table trick).

    The planner applies the dynamics' EXACT reflection — every lateral
    quantity flips, including the track curvature — so the symmetry holds
    only where the two poses see opposite-sign curvature. Probe at a
    zero-curvature point of the oval (straight) where +-curv coincide."""
    rl = frenet_planner.track.raceline
    ks = np.asarray(rl.ks)
    s_straight = float(np.asarray(rl.ss)[np.argmin(np.abs(ks))])
    common = dict(delta=jnp.asarray([0.05, -0.05]), vx=jnp.full(2, 3.0),
                  vy=jnp.asarray([0.1, -0.1]), wz=jnp.asarray([0.2, -0.2]))
    res = frenet_planner.plan_batch(
        s=jnp.full(2, s_straight), ey=jnp.asarray([0.4, -0.4]),
        epsi=jnp.asarray([0.1, -0.1]), **common)
    np.testing.assert_allclose(res.accel[0], res.accel[1], rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(res.steer_vel[0], -res.steer_vel[1],
                               rtol=1e-4, atol=1e-6)


def test_frenet_planner_obs_api(frenet_planner):
    obs = {"pose_x": 0.0, "pose_y": -7.4, "pose_theta": 0.0, "delta": 0.0,
           "linear_vel_x": 3.0, "linear_vel_y": 0.0, "ang_vel_z": 0.0}
    a, sv = frenet_planner.plan(obs)
    assert np.isfinite(a) and np.isfinite(sv)


def test_explicit_frenet_planner():
    track = oval_track(n_samples=256)
    # tiny synthetic frenet table on the 8-D grid layout
    ey = np.linspace(-0.5, 0.5, 3)
    other = [np.linspace(-0.1, 0.1, 2)] * 7
    grids = np.meshgrid(ey, *other, indexing="ij")
    inputs = np.stack([g.reshape(-1) for g in grids], axis=-1)
    outputs = np.tile(inputs[:, :1], (1, 10))  # accel pattern = ey
    table = grid_table_from_arrays(inputs, outputs)
    planner = ExplicitFrenetPlanner(table, track)
    out, valid = planner.plan_batch(
        s=jnp.asarray([5.0]), ey=jnp.asarray([0.5]), epsi=jnp.asarray([0.0]),
        delta=jnp.zeros(1), vx=jnp.zeros(1), vy=jnp.zeros(1), wz=jnp.zeros(1))
    assert bool(valid[0])
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-6)


def test_cartesian_planner_obs_api():
    """IRBFNPlanner (cartesian): lookahead goal, mirror trick, rollout."""
    import jax

    from irbfn_tpu.planning import IRBFNPlanner
    from irbfn_tpu.sim import oval_track

    track = oval_track(n_samples=256)
    model = WCRBFNet(
        in_features=7, out_features=10, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=[[0.0, 3.5]], upper_bounds=[[3.5, 7.0]],
        dimension_ranges=[[0], [1]], activation_idx=[0], delta=[15.0])
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 7)))
    planner = IRBFNPlanner(model, params, track, mirror=True, sv_ind=5)
    obs = {"pose_x": 0.0, "pose_y": -7.4, "pose_theta": 0.0, "delta": 0.0,
           "linear_vel_x": 3.0, "beta": 0.0, "ang_vel_z": 0.0}
    a, sv = planner.plan(obs)
    assert np.isfinite(a) and np.isfinite(sv)
    assert planner.last.pred_states.shape[-2:] == (5, 7)

    # batched serving
    B = 32
    rng = np.random.default_rng(0)
    res = planner.plan_batch(
        x=jnp.asarray(rng.uniform(-10, 10, B)),
        y=jnp.asarray(rng.uniform(-5, 5, B)),
        theta=jnp.zeros(B), delta=jnp.zeros(B),
        v=jnp.full(B, 3.0), beta=jnp.zeros(B), angv=jnp.zeros(B))
    assert res.accel.shape == (B,)
    assert res.goal.shape == (B, 4)


def test_cartesian_setpoint_execution():
    """Setpoint mode tracks the plan's implied steer-angle profile: the
    emitted sv must equal clip(gain * (cumsum(plan sv)*dt at frac - delta))
    and differ from rate mode's raw first rate. Rate mode (the reference's
    plan() return) is delta-blind and measurably spins the car in corners —
    see IRBFNPlanner.__init__."""
    import jax

    from irbfn_tpu.dynamics.params import f1tenth_params
    from irbfn_tpu.planning import IRBFNPlanner
    from irbfn_tpu.sim import oval_track

    track = oval_track(n_samples=256)
    model = WCRBFNet(
        in_features=7, out_features=10, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=[[0.0, 3.5]], upper_bounds=[[3.5, 7.0]],
        dimension_ranges=[[0], [1]], activation_idx=[0], delta=[15.0])
    params = model.init(jax.random.PRNGKey(1), jnp.ones((1, 7)))
    kw = dict(mirror=False, sv_ind=5)
    frac, gain = 0.4, 10.0
    sp = IRBFNPlanner(model, params, track, steer_mode="setpoint",
                      setpoint_frac=frac, setpoint_gain=gain, **kw)
    rt = IRBFNPlanner(model, params, track, steer_mode="rate", **kw)
    delta0 = 0.2
    args = dict(x=jnp.zeros(4), y=jnp.full(4, -7.4), theta=jnp.zeros(4),
                delta=jnp.full(4, delta0), v=jnp.full(4, 3.0),
                beta=jnp.zeros(4), angv=jnp.zeros(4))
    res_sp = sp.plan_batch(**args)
    res_rt = rt.plan_batch(**args)
    # same plan (same net), different execution
    np.testing.assert_allclose(np.asarray(res_sp.pred_controls),
                               np.asarray(res_rt.pred_controls), rtol=1e-6)
    d_prof = np.cumsum(np.asarray(res_sp.pred_controls)[..., 1], axis=-1) * 0.1
    k = int(round(frac * d_prof.shape[-1])) - 1
    sv_max = float(f1tenth_params().sv_max)
    want = np.clip(gain * (d_prof[..., k] - delta0), -sv_max, sv_max)
    np.testing.assert_allclose(np.asarray(res_sp.steer_vel), want, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_rt.steer_vel),
                               np.asarray(res_rt.pred_controls)[..., 0, 1],
                               rtol=1e-6)

    with pytest.raises(ValueError):
        IRBFNPlanner(model, params, track, steer_mode="nope")


def test_frenet_planner_input_clamp():
    """Off-table states clamp to the grid edge: an absurd query returns the
    same controls as the grid-edge query (no RBF-tail extrapolation), while
    in-range queries are unaffected by the clamp."""
    from irbfn_tpu.train import input_bounds_from_config

    track = oval_track(n_samples=256)
    model = WCRBFNet(
        in_features=8, out_features=10, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=[[-2.0, 0.0]], upper_bounds=[[0.0, 2.0]],
        dimension_ranges=[[0], [1]], activation_idx=[0], delta=[15.0])
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8)))
    config = {"in_features": 8, "activation_idx": [0, 2],
              "lower_bounds": [[-2.0, 0.0], [1.0]],
              "upper_bounds": [[0.0, 2.0], [7.0]]}
    bounds = input_bounds_from_config(config)
    clamped = IRBFNFrenetPlanner(model, params, track, input_bounds=bounds)
    free = IRBFNFrenetPlanner(model, params, track)

    args = dict(s=0.0, ey=0.1, epsi=0.0, delta=0.0, vy=0.0, wz=0.0)
    lo, hi = bounds[2]  # vx dim
    a_in = clamped.plan_batch(vx=(lo + hi) / 2, **args)
    b_in = free.plan_batch(vx=(lo + hi) / 2, **args)
    np.testing.assert_allclose(np.asarray(a_in.accel),
                               np.asarray(b_in.accel), rtol=1e-6)
    a_out = clamped.plan_batch(vx=hi + 50.0, **args)
    a_edge = clamped.plan_batch(vx=hi, **args)
    np.testing.assert_allclose(np.asarray(a_out.accel),
                               np.asarray(a_edge.accel), rtol=1e-6)


def test_grid_lookup_linear_interpolates():
    """Multilinear lookup: exact for a function linear in the inputs,
    matches nearest-cell at grid points, and infeasible corners don't leak
    (-999 never appears; all-infeasible neighborhoods flag invalid)."""
    from irbfn_tpu.planning.explicit import (grid_lookup, grid_lookup_linear,
                                             grid_table_from_arrays)

    xs = np.linspace(0.0, 1.0, 5)
    ys = np.linspace(-2.0, 2.0, 4)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    inputs = np.stack([gx.reshape(-1), gy.reshape(-1)], -1).astype(np.float32)
    out = (3.0 * inputs[:, :1] - 0.5 * inputs[:, 1:] + 1.0).astype(np.float32)
    table = grid_table_from_arrays(inputs, out)

    q = np.asarray([[0.3, 0.7], [0.99, -1.99], [0.5, 0.0]], np.float32)
    got, valid = grid_lookup_linear(table, jnp.asarray(q))
    want = 3.0 * q[:, :1] - 0.5 * q[:, 1:] + 1.0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    assert bool(jnp.all(valid))
    # at grid points: equals nearest-cell
    gpt = inputs[7:9]
    a, _ = grid_lookup_linear(table, jnp.asarray(gpt))
    b, _ = grid_lookup(table, jnp.asarray(gpt))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    # poison one cell: its weight is excluded, output stays finite & sane
    out_bad = out.copy()
    out_bad[6] = -999.0
    table2 = grid_table_from_arrays(inputs, out_bad)
    got2, valid2 = grid_lookup_linear(table2, jnp.asarray(q))
    assert np.all(np.asarray(got2) > -100)
    assert bool(jnp.all(valid2))
    # all corners infeasible -> invalid flag
    out_all = out.copy()
    out_all[:] = -999.0
    table3 = grid_table_from_arrays(inputs, out_all)
    _, valid3 = grid_lookup_linear(table3, jnp.asarray(q))
    assert not bool(jnp.any(valid3))


def test_grid_lookup_linear_singleton_axis():
    """A table with a single-value dimension (e.g. one swept vy) must
    interpolate the remaining dims and pin the singleton dim — the old
    clip-to--1 base index silently blended an aliased far row."""
    from irbfn_tpu.planning.explicit import (grid_lookup_linear,
                                             grid_table_from_arrays)

    xs = np.linspace(0.0, 1.0, 5)
    ys = np.asarray([2.0])  # singleton axis
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    inputs = np.stack([gx.reshape(-1), gy.reshape(-1)], -1).astype(np.float32)
    out = (10.0 * inputs[:, :1] + inputs[:, 1:]).astype(np.float32)
    table = grid_table_from_arrays(inputs, out)
    # queries on, below, and above the singleton value
    q = np.asarray([[0.5, 2.0], [0.9, 1.0], [0.1, 3.0]], np.float32)
    got, valid = grid_lookup_linear(table, jnp.asarray(q))
    want = 10.0 * q[:, :1] + 2.0  # singleton dim pinned at its grid value
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    assert bool(jnp.all(valid))


def test_stack_grid_tables_selects_arm_exactly():
    """Stacked multi-arm table: an integer arm coordinate selects exactly
    that arm's rows under both lookups, including the last arm, and arm
    feasibility stays separated."""
    from irbfn_tpu.planning.explicit import (grid_lookup, grid_lookup_linear,
                                             grid_table_from_arrays,
                                             stack_grid_tables)

    xs = np.linspace(0.0, 1.0, 5)
    ys = np.linspace(-1.0, 1.0, 3)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    inputs = np.stack([gx.reshape(-1), gy.reshape(-1)], -1).astype(np.float32)
    tables = []
    for k in range(3):  # arm k: f_k = k*100 + linear
        out = (100.0 * k + 2.0 * inputs[:, :1] + inputs[:, 1:]).astype(
            np.float32)
        if k == 1:  # arm 1 has an infeasible row; others don't
            out = out.copy()
            out[0] = -999.0
        tables.append(grid_table_from_arrays(inputs, out))
    stacked = stack_grid_tables(tables)

    q = np.asarray([[0.0, 0.3, 0.5], [1.0, 0.3, 0.5], [2.0, 0.3, 0.5],
                    [2.0, 0.99, -0.99]], np.float32)
    got, valid = grid_lookup_linear(stacked, jnp.asarray(q))
    want = 100.0 * q[:, :1] + 2.0 * q[:, 1:2] + q[:, 2:]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)
    assert bool(jnp.all(valid))
    gn, _ = grid_lookup(stacked, jnp.asarray(q[:3]))
    assert np.allclose(np.asarray(gn)[:, 0] // 100, [0, 1, 2])
    # arm 1's infeasible corner doesn't leak into arms 0/2
    q0 = np.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, -1.0], [2.0, 0.0, -1.0]],
                    np.float32)
    _, v0 = grid_lookup_linear(stacked, jnp.asarray(q0))
    assert bool(v0[0]) and not bool(v0[1]) and bool(v0[2])


def test_stacked_net_bank_selects_arm_exactly():
    """Learned multi-arm bank (scripts/eval_adaptive.py --nets, the
    reference's AdaptiveIRBFNPlanner over N checkpoints,
    irbfn_planner.py:563-631): same-architecture per-arm params stacked on a
    leading axis, ALL arms evaluated as one vmapped forward, per-row arm
    index gathering the pulled arm — must equal each arm's own forward."""
    model = WCRBFNet(
        in_features=3, out_features=4, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=[[-2.0, 0.0]], upper_bounds=[[0.0, 2.0]],
        dimension_ranges=[[0], [1]], activation_idx=[0], delta=[15.0])
    from irbfn_tpu.planning import stack_net_bank

    plist = [model.init(jax.random.PRNGKey(k), jnp.ones((1, 3)))
             for k in range(3)]
    net_apply, stacked = stack_net_bank(model, plist)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (6, 3)), jnp.float32)
    arm = jnp.asarray([0, 1, 2, 2, 1, 0], jnp.int32)
    out_all = net_apply(stacked, x)                     # (A, B, out)
    got = jnp.take_along_axis(out_all, arm[None, :, None], axis=0)[0]
    for a in range(3):
        want = model.apply(plist[a], x)
        rows = np.asarray(arm) == a
        np.testing.assert_allclose(np.asarray(got)[rows],
                                   np.asarray(want)[rows], rtol=1e-6)


def test_cluster_net_serves_through_planner():
    """ClusterWCRBFNet (learned gate, returns (out, logits)) must serve
    through the planner plan step as controls only — the reference loads
    its cluster checkpoints into the same planner (irbfn_planner.py:286-326).
    Also checks the input_scale extension roundtrips via from_config."""
    from irbfn_tpu.models import ClusterWCRBFNet, from_config
    from irbfn_tpu.planning import IRBFNFrenetPlanner

    track = oval_track(n_samples=256)
    scale = (1.0, 2.0, 0.5, 1.0, 1.0, 0.3, 1.0, 2.0)
    model = ClusterWCRBFNet(in_features=8, out_features=10, num_kernels=8,
                            basis_func=get_basis("gaussian"), num_regions=4,
                            input_scale=scale)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8)))
    planner = IRBFNFrenetPlanner(model, params, track)
    res = planner.plan_batch(
        s=jnp.asarray([0.0, 5.0]), ey=jnp.asarray([0.1, -0.2]),
        epsi=jnp.zeros(2), delta=jnp.zeros(2), vx=jnp.full(2, 3.0),
        vy=jnp.zeros(2), wz=jnp.zeros(2))
    assert res.accel.shape == (2,)
    assert np.all(np.isfinite(np.asarray(res.pred_controls)))

    config = {"model_class": "ClusterWCRBFNet", "in_features": 8,
              "out_features": 10, "num_kernels": 8,
              "basis_func": "gaussian", "num_regions": 4,
              "input_scale": list(scale)}
    rebuilt = from_config(config)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4, 8)),
                    jnp.float32)
    a, la = model.apply(params, x)
    b, lb_ = rebuilt.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb_), rtol=1e-6)
