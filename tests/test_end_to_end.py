"""End-to-end minimum slice (SURVEY.md §7.2 / BASELINE.json configs #1-#3):

1. solve a clothoid G1-Hermite goal lattice (datagen),
2. fit an RBFN to the (goal -> spiral params) map — both the direct
   Cholesky path and the gradient path,
3. batched forward eval of a goal grid; integrate predicted spirals and
   check endpoint error against the goals (the traj_out.png fan,
   deprecated/evaluate.py:119-155 analogue).

Plus the sharded-datagen path on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics import integrate_endpoint_gl
from irbfn_tpu.models import WCRBFNet, get_basis
from irbfn_tpu.models.fit import choose_centers, fit_direct, rbf_features
from irbfn_tpu.models.wcrbf import build_region_bounds
from irbfn_tpu.parallel import GridSpec, build_lattice, solve_lattice_sharded
from irbfn_tpu.solvers.clothoid import solve_g1_lattice, wrap_angle
from irbfn_tpu.train import create_train_state


def _lattice_and_table(nx=9, ny=9, nt=9):
    grid = (GridSpec("x", 8.0, 20.0, nx), GridSpec("y", -4.0, 4.0, ny),
            GridSpec("theta", -0.8, 0.8, nt))
    goals = build_lattice(grid, dtype=np.float64)
    params = np.asarray(solve_g1_lattice(jnp.asarray(goals)))
    return goals, params


@pytest.fixture(scope="module")
def table():
    return _lattice_and_table()


def test_sharded_datagen_matches_direct(table):
    """shard_map datagen over the 8-device CPU mesh == direct solve."""
    goals, params_direct = table
    out = solve_lattice_sharded(
        lambda rows: solve_g1_lattice(rows), goals.astype(np.float64),
        batch_per_device=128)
    np.testing.assert_allclose(out, params_direct, rtol=1e-10, atol=1e-12)


def test_direct_cholesky_fit_interpolates(table):
    """Single-region gaussian RBFN via closed-form fit: small train error and
    endpoint error through the integrator (config #1/#3)."""
    goals, params = table
    x = jnp.asarray(goals)
    y = jnp.asarray(params)
    centers, log_sigs = choose_centers(x, num_kernels=128, num_regions=1,
                                       seed=0)
    # pad region bounds beyond the data so the tanh gates don't taper the
    # features at the lattice edges
    lb = jnp.asarray([[goals[:, 0].min() - 1.0]])
    ub = jnp.asarray([[goals[:, 0].max() + 1.0]])
    delta = jnp.asarray([5.0])
    fit = fit_direct(x, y, centers, log_sigs, lb, ub, delta, (0,),
                     get_basis("gaussian"), reg=1e-8, chunk=1024)
    pred = fit.predict(x, lb, ub, delta, (0,), get_basis("gaussian"))
    train_err = float(jnp.abs(pred - y).mean())
    assert train_err < 0.02

    # integrate predicted spirals -> endpoint error vs the goal poses
    end = integrate_endpoint_gl(pred)
    pos_err = np.hypot(np.asarray(end[:, 0] - x[:, 0]),
                       np.asarray(end[:, 1] - x[:, 1]))
    th_err = np.abs(np.asarray(wrap_angle(end[:, 2] - x[:, 2])))
    assert np.median(pos_err) < 0.2
    assert np.median(th_err) < 0.05


def test_gradient_fit_reduces_loss(table):
    """Adam path on the same table: loss decreases substantially."""
    import optax

    goals, params = table
    x = jnp.asarray(goals, jnp.float32)
    y = jnp.asarray(params, jnp.float32)
    # standardize targets (arc length dominates the raw scale)
    y_mu, y_sd = y.mean(0), y.std(0) + 1e-6
    y = (y - y_mu) / y_sd
    model = WCRBFNet(
        in_features=3, out_features=5, num_kernels=64,
        basis_func=get_basis("gaussian_wide"), num_regions=1,
        lower_bounds=[[8.0]], upper_bounds=[[20.0]],
        dimension_ranges=[[0]], activation_idx=[0], delta=[5.0])
    state = create_train_state(model, jax.random.PRNGKey(0), x[:8], lr=1e-2)

    @jax.jit
    def step(state, x, y):
        def loss_fn(p):
            pred = state.apply_fn(p, x)
            return jnp.abs(pred - y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    losses = []
    for i in range(500):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]


def test_direct_fit_per_region_mode(table):
    goals, params = table
    x = jnp.asarray(goals)
    y = jnp.asarray(params)
    centers, log_sigs = choose_centers(x, num_kernels=32, num_regions=2,
                                       seed=1)
    lb = jnp.asarray([[8.0], [14.0]])
    ub = jnp.asarray([[14.0], [20.0]])
    delta = jnp.asarray([5.0])
    fit = fit_direct(x, y, centers, log_sigs, lb, ub, delta, (0,),
                     get_basis("gaussian"), reg=1e-8, mode="per_region",
                     chunk=1024)
    pred = fit.predict(x, lb, ub, delta, (0,), get_basis("gaussian"))
    assert float(jnp.abs(pred - y).mean()) < 0.05


def test_fit_with_external_cluster_centers(table):
    """The --use_centers direct-fit path: an externally supplied shared
    (K, F) center bank (constraint-cluster warm starts,
    nmpc_constraint_regions.ipynb -> irbfn_planner.py:258-261) broadcast
    per region with widths_from_centers widths interpolates the table."""
    from irbfn_tpu.models.fit import widths_from_centers

    goals, params = table
    x = jnp.asarray(goals)
    y = jnp.asarray(params)
    rng = np.random.default_rng(3)
    bank = np.asarray(goals)[rng.choice(goals.shape[0], 96, replace=False)]
    c_np = np.broadcast_to(bank.astype(np.float32), (1,) + bank.shape).copy()
    log_sigs = widths_from_centers(c_np)
    # widths follow center spacing: scaling the bank 2x shifts log_sig
    # by exactly log(2) (nearest-neighbor distances scale linearly)
    np.testing.assert_allclose(widths_from_centers(2.0 * c_np),
                               log_sigs + np.log(2.0), rtol=1e-6)
    lb = jnp.asarray([[goals[:, 0].min() - 1.0]])
    ub = jnp.asarray([[goals[:, 0].max() + 1.0]])
    delta = jnp.asarray([5.0])
    fit = fit_direct(x, y, jnp.asarray(c_np), jnp.asarray(log_sigs),
                     lb, ub, delta, (0,), get_basis("gaussian"),
                     reg=1e-8, chunk=1024)
    pred = fit.predict(x, lb, ub, delta, (0,), get_basis("gaussian"))
    assert float(jnp.abs(pred - y).mean()) < 0.05


def test_per_region_fit_matches_model_and_beats_shared():
    """fit_per_region (R independent local solves) loads into a
    WCRBFNet(head_mode='per_region') head exactly, and on a target with a
    control-style discontinuity it beats the shared-head fit (the braking
    wall: a shared gaussian bank rings at the jump; per-region local models
    with a seam at the jump don't)."""
    from irbfn_tpu.models.fit import fit_per_region
    from irbfn_tpu.models.wcrbf import overlapping_segments

    xs = np.linspace(-1.0, 1.0, 41)
    zs = np.linspace(-1.0, 1.0, 9)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    x = np.stack([gx.reshape(-1), gz.reshape(-1)], -1).astype(np.float32)
    # discontinuous in dim 0 (like accel across the feasibility wall)
    y = (np.where(x[:, :1] > 0, 2.0, -2.0) + 0.3 * x[:, 1:]).astype(np.float32)

    lo, hi = overlapping_segments(xs, 2, num_overlap=1)
    lb, ub = jnp.asarray([[v] for v in lo]), jnp.asarray([[v] for v in hi])
    delta = jnp.asarray([4.0 / (xs[1] - xs[0])])
    basis = get_basis("gaussian")
    centers, log_sigs = choose_centers(x, num_kernels=24, num_regions=2,
                                       seed=1, lb=lb, ub=ub,
                                       activation_idx=(0,))

    fit_pr = fit_per_region(x, y, centers, log_sigs, lb, ub, delta, (0,),
                            basis, chunk=1024)
    pred_pr = fit_pr.predict(jnp.asarray(x), lb, ub, delta, (0,), basis)
    fit_sh = fit_direct(x, y, centers, log_sigs, lb, ub, delta, (0,),
                        basis, chunk=1024)
    pred_sh = fit_sh.predict(jnp.asarray(x), lb, ub, delta, (0,), basis)
    err_pr = np.abs(np.asarray(pred_pr) - y)
    err_sh = np.abs(np.asarray(pred_sh) - y)
    assert err_pr.mean() < err_sh.mean(), (err_pr.mean(), err_sh.mean())
    # the structural win: both fits blur AT the seam (a smooth blend across
    # a jump must), but the shared head RINGS far from it while per-region
    # local models contain the damage to the seam cell
    away = np.abs(x[:, 0]) >= 0.2
    assert err_pr[away].mean() < 0.15
    assert err_pr[away].mean() < 0.7 * err_sh[away].mean()

    # install into the flax model: forward must match DirectFit.predict
    model = WCRBFNet(
        in_features=2, out_features=1, num_kernels=24,
        basis_func=basis, num_regions=2,
        lower_bounds=[lo], upper_bounds=[hi],
        dimension_ranges=[[0], [1]], activation_idx=[0],
        delta=[float(delta[0])], head_mode="per_region")
    params = model.init(jax.random.PRNGKey(0), jnp.ones((4, 2)))
    p = dict(params["params"])
    p["core"] = {"centers": fit_pr.centers, "log_sigs": fit_pr.log_sigs}
    p["head"] = {"kernel": fit_pr.weights, "bias": fit_pr.bias}
    out_model = model.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_model), np.asarray(pred_pr),
                               rtol=1e-4, atol=1e-4)


def test_tube_weights_and_weighted_fit():
    """tube_weights: rows near the visited states get ~1, far rows get the
    floor; a tube-weighted fit is more accurate on-tube than unweighted."""
    from irbfn_tpu.models.fit import tube_weights

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(4000, 2)).astype(np.float32)
    # the "tube": a thin band around x1 = 0
    tube = np.stack([np.linspace(-1, 1, 200),
                     np.zeros(200)], -1).astype(np.float32)
    w = tube_weights(x, tube, bandwidth=0.1, floor=0.05, chunk=1024)
    assert w.shape == (4000,)
    near = np.abs(x[:, 1]) < 0.02
    far = np.abs(x[:, 1]) > 0.6
    assert w[near].min() > 0.5
    assert w[far].max() < 0.1

    # weighted shared fit: better on-tube accuracy for a hard target
    y = np.sin(6 * x[:, :1]) * np.cos(3 * x[:, 1:]).astype(np.float32)
    lb, ub = jnp.asarray([[-1.5]]), jnp.asarray([[1.5]])
    delta = jnp.asarray([5.0])
    basis = get_basis("gaussian")
    centers, log_sigs = choose_centers(x, num_kernels=32, num_regions=1,
                                       seed=0, probs=w)
    fit_w = fit_direct(x, y, centers, log_sigs, lb, ub, delta, (0,), basis,
                       chunk=1024, sample_weight=w)
    fit_u = fit_direct(x, y, centers, log_sigs, lb, ub, delta, (0,), basis,
                       chunk=1024)
    pred_w = fit_w.predict(jnp.asarray(x[near]), lb, ub, delta, (0,), basis)
    pred_u = fit_u.predict(jnp.asarray(x[near]), lb, ub, delta, (0,), basis)
    err_w = float(jnp.abs(pred_w - y[near]).mean())
    err_u = float(jnp.abs(pred_u - y[near]).mean())
    assert err_w < err_u, (err_w, err_u)


def test_device_resident_fit_matches_host_path():
    """device_table + index-gather fit_per_region / tube_weights ==
    the host-upload path (predictions; the ill-conditioned gram means raw
    weights differ benignly with accumulation precision)."""
    from irbfn_tpu.models.fit import (device_table, fit_per_region,
                                      tube_weights)
    from irbfn_tpu.models.wcrbf import overlapping_segments

    xs = np.linspace(-1.0, 1.0, 41)
    zs = np.linspace(-1.0, 1.0, 9)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    x = np.stack([gx.reshape(-1), gz.reshape(-1)], -1).astype(np.float32)
    y = (np.where(x[:, :1] > 0, 2.0, -2.0) + 0.3 * x[:, 1:]).astype(np.float32)
    lo, hi = overlapping_segments(xs, 2, num_overlap=1)
    lb, ub = jnp.asarray([[v] for v in lo]), jnp.asarray([[v] for v in hi])
    delta = jnp.asarray([4.0 / (xs[1] - xs[0])])
    basis = get_basis("gaussian")
    c, ls = choose_centers(x, 24, 2, seed=1, lb=lb, ub=ub,
                           activation_idx=(0,))
    tube = x[np.abs(x[:, 1]) < 0.1]
    w = tube_weights(x, tube, bandwidth=0.2, floor=0.05, chunk=64)
    x_dev, y_dev, _ = device_table(x, y, chunk=64)
    w2 = tube_weights(x, tube, bandwidth=0.2, floor=0.05, chunk=64,
                      x_dev=x_dev)
    np.testing.assert_allclose(w, w2, rtol=1e-5, atol=1e-6)
    f_host = fit_per_region(x, y, c, ls, lb, ub, delta, (0,), basis,
                            chunk=64, sample_weight=w)
    f_dev = fit_per_region(x, y, c, ls, lb, ub, delta, (0,), basis,
                           chunk=64, sample_weight=w,
                           x_dev=x_dev, y_dev=y_dev)
    p_host = f_host.predict(jnp.asarray(x), lb, ub, delta, (0,), basis)
    p_dev = f_dev.predict(jnp.asarray(x), lb, ub, delta, (0,), basis)
    np.testing.assert_allclose(np.asarray(p_dev), np.asarray(p_host),
                               atol=0.05)
    err_h = float(jnp.abs(p_host - y).mean())
    err_d = float(jnp.abs(p_dev - y).mean())
    assert err_d < 1.3 * err_h + 1e-3
