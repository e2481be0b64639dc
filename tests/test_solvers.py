"""Solver-layer tests: clothoid G1 BVP, generic LM, batched NMPC.

The clothoid tests enforce the <=1e-6 endpoint-error bar from BASELINE.json
(in f64 the solver reaches ~1e-14).  The NMPC tests check optimality (KKT),
constraint activation, feasibility masks, and physical symmetry — the
assertion-based analogue of the reference's notebook spot checks
(scripts/test_dynamics.ipynb, deprecated/test_irbfn.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics import integrate_endpoint_gl
from irbfn_tpu.dynamics.params import fullscale_params
from irbfn_tpu.solvers.clothoid import solve_g1_hermite, solve_g1_lattice, wrap_angle
from irbfn_tpu.solvers.lm import levenberg_marquardt
from irbfn_tpu.solvers.nmpc import NMPCConfig, solve_lattice_point, solve_nmpc_batch


# ------------------------------------------------------------------- clothoid

def test_clothoid_straight_line():
    sol = solve_g1_hermite(jnp.asarray(10.0), jnp.asarray(0.0), jnp.asarray(0.0))
    np.testing.assert_allclose(sol.k0, 0.0, atol=1e-12)
    np.testing.assert_allclose(sol.dk, 0.0, atol=1e-12)
    np.testing.assert_allclose(sol.length, 10.0, rtol=1e-12)
    assert bool(sol.converged)


def test_clothoid_quarter_circle():
    """Goal on a quarter circle of radius R: exact arc solution."""
    R = 5.0
    gx, gy, gth = R, R, np.pi / 2
    sol = solve_g1_hermite(jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gth))
    np.testing.assert_allclose(sol.k0, 1.0 / R, rtol=1e-9)
    np.testing.assert_allclose(sol.dk, 0.0, atol=1e-9)
    np.testing.assert_allclose(sol.length, R * np.pi / 2, rtol=1e-9)


def test_clothoid_lattice_endpoint_error():
    """North-star bar: <=1e-6 endpoint error across the genlut-style lattice
    (deprecated/genlut.py:33-46 ranges, coarsened)."""
    xs = np.linspace(5.0, 30.0, 9)
    ys = np.linspace(-8.0, 8.0, 9)
    ts = np.linspace(-1.57, 1.57, 9)
    X, Y, T = np.meshgrid(xs, ys, ts, indexing="ij")
    goals = jnp.asarray(np.stack([X, Y, T], axis=-1).reshape(-1, 3))
    params = solve_g1_lattice(goals)
    end = integrate_endpoint_gl(params)
    pos_err = np.hypot(np.asarray(end[:, 0] - goals[:, 0]),
                       np.asarray(end[:, 1] - goals[:, 1]))
    th_err = np.abs(np.asarray(wrap_angle(end[:, 2] - goals[:, 2])))
    assert pos_err.max() < 1e-6
    assert th_err.max() < 1e-6


def test_clothoid_matches_lut_param_layout():
    """Output rows are [k0, k1, k2, k3, s] with k_i on the linear-curvature
    line (genlut.py:62-65)."""
    p = solve_g1_lattice(jnp.asarray([[10.0, 3.0, 0.5]]))[0]
    k0, k1, k2, k3, s = [float(v) for v in p]
    np.testing.assert_allclose(k1 - k0, (k3 - k0) / 3.0, rtol=1e-9)
    np.testing.assert_allclose(k2 - k0, 2.0 * (k3 - k0) / 3.0, rtol=1e-9)
    assert s > 10.0  # curve is longer than the chord


# ------------------------------------------------------------------------- LM

def test_lm_solves_rosenbrock_batch():
    def residual(x, args):
        a, b = args
        return jnp.stack([a - x[0], jnp.sqrt(b) * (x[1] - x[0] ** 2)])

    x0 = jnp.tile(jnp.asarray([-1.2, 1.0]), (16, 1))
    args = (jnp.ones(16), 100.0 * jnp.ones(16))
    out = levenberg_marquardt(residual, x0, args, max_iters=100)
    np.testing.assert_allclose(out.x, 1.0, atol=1e-6)
    assert bool(out.converged.all())


def test_lm_spiral_bvp():
    """LM shooting on the generic cubic-spiral BVP reproduces a clothoid."""
    from irbfn_tpu.dynamics.spiral import clothoid_to_params

    goal = jnp.asarray([12.0, 2.0, 0.3])

    def residual(z, g):
        # z = [k0, dk, s_raw]; softplus keeps arc length positive
        s = 1.0 + jnp.logaddexp(0.0, z[2])
        params = clothoid_to_params(z[0], z[1], s)
        end = integrate_endpoint_gl(params)
        return jnp.stack([end[0] - g[0], end[1] - g[1],
                          wrap_angle(end[2] - g[2])])

    # init: straight segment of roughly chord length
    chord = float(jnp.hypot(goal[0], goal[1]))
    z0 = jnp.asarray([0.0, 0.0, np.log(np.expm1(chord - 1.0))])
    out = levenberg_marquardt(residual, z0, goal, max_iters=60)
    assert float(out.residual_norm) < 1e-8


# ----------------------------------------------------------------------- NMPC

@pytest.fixture(scope="module")
def nmpc_setup():
    return fullscale_params(mu=1.0, cs=5.0, dtype=jnp.float64), NMPCConfig()


# One shared-batch solve serves every default-config NMPC test below: the
# f64 solve_lattice_point compile is the heaviest XLA:CPU program in the
# suite and each distinct batch shape recompiles it, so all deterministic
# test rows are stacked into ONE (39, 8) lattice (suite profile: six
# per-test shapes cost ~700 s; shared-batch is one ~100 s compile).
_I_AT_GOAL, _I_SAT, _I_MIRROR, _I_MIRROR_NEG, _I_WARM = 0, 1, 2, 3, 4
_I_RNG = slice(5, 37)    # 32 random constraint-satisfaction rows (seed 7)
_I_PERT = slice(37, 39)  # perturbation-optimality rows


def _shared_rows() -> np.ndarray:
    mirror = np.array([0.4, 0.1, 5.0, 0.2, 6.0, 0.5, 0.3, 0.05])
    rng = np.random.default_rng(7)
    n = 32
    rng_rows = np.column_stack([
        rng.uniform(-0.2, 2.0, n),  # ey
        rng.uniform(-0.3, 0.3, n),  # delta
        rng.uniform(1.0, 7.0, n),  # vx
        rng.uniform(-1.0, 1.0, n),  # vy
        rng.uniform(3.0, 7.0, n),  # vx_goal
        rng.uniform(-2.6, 2.6, n),  # wz
        rng.uniform(-1.0, 1.0, n),  # epsi
        rng.uniform(-0.1, 0.1, n),  # curv
    ])
    return np.vstack([
        [0.0, 0.0, 5.0, 0.0, 5.0, 0.0, 0.0, 0.0],   # at goal
        [0.0, 0.0, 3.0, 0.0, 7.0, 0.0, 0.0, 0.0],   # accel saturation
        mirror,
        mirror * np.array([-1, -1, 1, -1, 1, -1, -1, -1]),
        [0.5, 0.0, 5.0, 0.0, 6.0, 0.0, 0.1, 0.02],  # warm-start row
        rng_rows,
        [[0.3, 0.05, 4.0, -0.1, 5.0, 0.4, 0.15, 0.03],   # perturbation
         [1.0, -0.1, 2.5, 0.3, 6.0, -1.0, -0.4, -0.08]],
    ])


@pytest.fixture(scope="module")
def shared_sol(nmpc_setup):
    p, cfg = nmpc_setup
    rows = jnp.asarray(_shared_rows())
    return rows, solve_lattice_point(rows, p, cfg)


def test_nmpc_at_goal_zero_controls(shared_sol):
    _, sol = shared_sol
    np.testing.assert_allclose(sol.accel[_I_AT_GOAL], 0.0, atol=1e-8)
    np.testing.assert_allclose(sol.steer_vel[_I_AT_GOAL], 0.0, atol=1e-8)
    assert bool(sol.feasible[_I_AT_GOAL])


def test_nmpc_accel_saturation_and_onehot(nmpc_setup, shared_sol):
    _, cfg = nmpc_setup
    _, sol = shared_sol
    a = np.asarray(sol.accel[_I_SAT])
    assert a[0] == pytest.approx(cfg.max_accel, abs=1e-6)
    assert a[1] == pytest.approx(cfg.max_accel, abs=1e-6)
    # one-hot layout: entries 42..46 are "a_k > -a_max" (slack -> 1),
    # 47..51 are "a_k < a_max" (tight for k=0,1 -> 0)
    onehot = np.asarray(sol.active_onehot[_I_SAT])
    assert onehot.shape == (86,)
    np.testing.assert_array_equal(onehot[42:47], 1)
    assert onehot[47] == 0 and onehot[48] == 0


def test_nmpc_full_mirror_symmetry(shared_sol):
    """Negating every lateral quantity flips steer and keeps accel."""
    _, sol = shared_sol
    np.testing.assert_allclose(sol.accel[_I_MIRROR], sol.accel[_I_MIRROR_NEG],
                               atol=1e-5)
    np.testing.assert_allclose(sol.steer_vel[_I_MIRROR],
                               -sol.steer_vel[_I_MIRROR_NEG], atol=1e-5)


def test_nmpc_batch_constraint_satisfaction(nmpc_setup, shared_sol):
    """Random lattice rows: solutions respect control and state boxes."""
    _, cfg = nmpc_setup
    _, sol = shared_sol
    a = np.asarray(sol.accel[_I_RNG])
    sv = np.asarray(sol.steer_vel[_I_RNG])
    assert (np.abs(a) <= cfg.max_accel + 1e-9).all()
    assert (np.abs(sv) <= cfg.max_dsteer + 1e-9).all()
    xs = np.asarray(sol.states[_I_RNG])
    feas = np.asarray(sol.feasible[_I_RNG])
    # most random points are solvable; the feasibility flag is conservative
    # (KKT-based) and the tuned default iteration budget trades a few
    # flagged stragglers for 2.4x datagen throughput
    assert feas.mean() >= 0.85
    # feasible points keep delta / vx inside their boxes
    assert (np.abs(xs[feas, 1:, 2]) <= cfg.max_steer + 1e-3).all()
    assert (xs[feas, 1:, 3] <= cfg.max_speed + 1e-3).all()
    assert (xs[feas, 1:, 3] >= cfg.min_speed - 1e-3).all()
    # relative stationarity at the solution
    assert np.asarray(sol.kkt_residual[_I_RNG])[feas].max() < 1e-2


def test_nmpc_cheap_cap_certificate_is_budget_independent(nmpc_setup):
    """Rows the 12-cap cheap pass certifies feasible satisfy the SAME
    tolerances the full-budget pass certifies (KKT residual < kkt_tol,
    state-box violation < 1e-3 recomputed from the returned trajectory) —
    the property the tiered datagen pipeline (gen_nmpc_table_frenet
    --phase1_iters, bench nmpc_tiered) rests on."""
    p, _ = nmpc_setup
    cfg1 = NMPCConfig(gn_iters=12)
    rng = np.random.default_rng(3)
    n = 24
    rows = np.column_stack([
        rng.uniform(-0.2, 2.0, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(1.0, 7.0, n), rng.uniform(-1.0, 1.0, n),
        rng.uniform(3.0, 7.0, n), rng.uniform(-2.6, 2.6, n),
        rng.uniform(-1.0, 1.0, n), rng.uniform(-0.1, 0.1, n)])
    sol = solve_lattice_point(jnp.asarray(rows), p, cfg1)
    feas = np.asarray(sol.feasible)
    assert feas.mean() >= 0.7  # the cheap cap still certifies most rows
    assert np.asarray(sol.kkt_residual)[feas].max() < cfg1.kkt_tol
    xs = np.asarray(sol.states)[feas]
    assert (np.abs(xs[:, 1:, 2]) <= cfg1.max_steer + 1e-3).all()
    assert (xs[:, 1:, 3] <= cfg1.max_speed + 1e-3).all()
    assert (xs[:, 1:, 3] >= cfg1.min_speed - 1e-3).all()


def test_nmpc_warm_start_consistency(nmpc_setup, shared_sol):
    """Warm-starting feasible rows from their own solution returns the same
    solution (solved fixed point)."""
    p, cfg = nmpc_setup
    rows, sol = shared_sol
    x0 = jnp.stack([jnp.zeros(rows.shape[0]), rows[:, 0], rows[:, 1],
                    rows[:, 2], rows[:, 3], rows[:, 5], rows[:, 6]], axis=-1)
    goal = jnp.zeros((rows.shape[0], 7)).at[:, 3].set(rows[:, 4])
    u_init = jnp.stack([sol.accel, sol.steer_vel], axis=-1)
    sol2 = solve_nmpc_batch(x0, goal, rows[:, 7], p, cfg, u_init=u_init)
    feas = np.asarray(sol.feasible) & np.asarray(sol2.feasible)
    assert feas.sum() >= 30
    # The designated easy row is a strict fixed point; across the whole
    # batch a couple of marginal nonconvex rows may basin-hop when the AL
    # multipliers are re-estimated from the warm point, so the batch-wide
    # claim is "almost all rows are fixed points", not "all".
    du = np.abs(np.asarray(sol2.accel) - np.asarray(sol.accel)).max(-1)
    dsv = np.abs(np.asarray(sol2.steer_vel)
                 - np.asarray(sol.steer_vel)).max(-1)
    assert du[_I_WARM] < 1e-6 and dsv[_I_WARM] < 1e-6
    match = (du[feas] < 1e-6) & (dsv[feas] < 1e-6)
    assert match.mean() >= 0.9, f"only {match.mean():.2f} warm-consistent"


def test_multi_params_sweep_matches_single(nmpc_setup, shared_sol):
    """One-dispatch mu sweep == per-mu solves. The mu=1.0 lane must equal
    the shared-batch solution bitwise-tight; the mu=0.6 lane is checked
    against a fresh single solve (same compiled program as the shared
    fixture — params are a traced operand, so no recompile)."""
    import jax

    from irbfn_tpu.dynamics.params import fullscale_params
    from irbfn_tpu.solvers import solve_lattice_multi_params

    p, cfg = nmpc_setup
    rows, sol = shared_sol
    mus = [0.6, 1.0]
    pb = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[fullscale_params(mu=m, cs=5.0, dtype=jnp.float64)
                        for m in mus])
    multi = solve_lattice_multi_params(rows, pb, cfg)
    assert multi.accel.shape == (2, rows.shape[0], 5)
    single06 = solve_lattice_point(
        rows, fullscale_params(mu=0.6, cs=5.0, dtype=jnp.float64), cfg)
    # atol 2e-6: the vmap-over-params program orders reductions differently
    # from the direct program, and on marginal rows the iterative solver
    # amplifies that to ~1e-7-level control differences (solver tolerance)
    for i, single in enumerate([single06, sol]):
        np.testing.assert_allclose(multi.accel[i], single.accel,
                                   rtol=1e-6, atol=2e-6)
        np.testing.assert_allclose(multi.steer_vel[i], single.steer_vel,
                                   rtol=1e-6, atol=2e-6)


def test_nmpc_perturbation_optimality_gold(shared_sol):
    """Fast stored-oracle form of the perturbation-optimality check: the
    gold npz (scripts/gen_test_oracles.py:derive_perturbation_gold) proved
    at derivation time that no feasible random perturbation improves the
    solver's objective; here we (a) re-verify that stored property from the
    committed candidate evaluations (pure numpy) and (b) assert the LIVE
    solver still reproduces the proven-optimal gold controls.  This removes
    the two per-row f64 _smooth_cost/rollout jit compiles (~8 min of suite
    wall clock); ``--runslow`` runs the full live derivation below."""
    from pathlib import Path

    gold = np.load(Path(__file__).parent / "oracles" / "nmpc_pert_gold.npz")
    rows, sol = shared_sol
    np.testing.assert_allclose(np.asarray(rows[_I_PERT]), gold["rows"],
                               rtol=0, atol=0)
    # stored property: no candidate is feasible AND improving
    improving = ((gold["v_cand"] <= gold["v_star"][:, None] + 1e-6)
                 & (gold["f_cand"] < gold["f_star"][:, None] - 1e-6))
    assert not improving.any()
    u_live = np.asarray(jnp.stack(
        [sol.accel[_I_PERT], sol.steer_vel[_I_PERT]], -1
    ).reshape(gold["u_star"].shape))
    assert np.asarray(sol.feasible[_I_PERT]).all()
    np.testing.assert_allclose(u_live, gold["u_star"], atol=1e-5)


@pytest.mark.slow
def test_nmpc_perturbation_optimality(nmpc_setup, shared_sol):
    """Direct optimality check: no random feasible perturbation of the
    returned controls improves the true AL-free objective (tracking +
    control cost with state boxes enforced by rejection)."""
    from functools import partial

    import jax

    from irbfn_tpu.solvers import nmpc as M

    p, cfg = nmpc_setup
    all_rows, sol = shared_sol
    rows = all_rows[_I_PERT]
    rng = np.random.default_rng(0)
    for b0 in range(rows.shape[0]):
        b = _I_PERT.start + b0
        if not bool(sol.feasible[b]):
            continue
        x0 = jnp.concatenate([jnp.zeros(1), rows[b0, :4], rows[b0, 5:7]])
        goal = jnp.zeros(7).at[3].set(rows[b0, 4])
        # jitted probes: eager _rollout_rk4 dispatches hundreds of ops per
        # call (120+ calls here) and its eager-scan compile is the single
        # heaviest XLA:CPU compile in the suite
        smooth_j = jax.jit(partial(M._smooth_cost, x0=x0, goal=goal,
                                   curv=rows[b0, 7], p=p, cfg=cfg))

        def smooth(u_flat):
            return float(smooth_j(u_flat))

        @jax.jit
        def viol_j(u_flat):
            xs = M._rollout_rk4(x0, u_flat.reshape(5, 2), rows[b0, 7], p, cfg)
            return jnp.max(jnp.maximum(
                M._state_box_violations(xs, cfg), 0.0))

        def viol(u_flat):
            return float(viol_j(u_flat))

        u_star = jnp.stack([sol.accel[b], sol.steer_vel[b]], -1).reshape(-1)
        f_star = float(smooth(u_star))

        v_star = viol(u_star)
        lo = jnp.tile(jnp.asarray([-cfg.max_accel, -cfg.max_dsteer]), 5)
        improved = 0
        for _ in range(60):
            scale = rng.choice([1e-3, 1e-2, 1e-1])
            cand = jnp.clip(u_star + scale * rng.standard_normal(10), lo, -lo)
            # only count feasible perturbations that beat the solution
            if (viol(cand) <= v_star + 1e-6
                    and float(smooth(cand)) < f_star - 1e-6):
                improved += 1
        assert improved == 0, f"point {b}: {improved} improving perturbations"
