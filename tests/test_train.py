"""Trainer-layer tests: losses, mirror augmentation, train step, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.models import ClusterWCRBFNet, WCRBFNet, from_config, get_basis
from irbfn_tpu.train import (
    cluster_fullint_loss,
    create_train_state,
    frenet_fullint_loss,
    frenet_oneint_loss,
    make_train_step,
    mirror_frenet_table,
    restore_params,
    save_checkpoint,
    save_config,
    load_config,
)


def _frenet_model(out_features=10):
    return WCRBFNet(
        in_features=8, out_features=out_features, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=[[-2.0, 0.0]], upper_bounds=[[0.0, 2.0]],
        dimension_ranges=[[0], [1]], activation_idx=[0], delta=[15.0])


def _batch(n=16, t=5, seed=0):
    rng = np.random.default_rng(seed)
    x = np.column_stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(1, 7, n), rng.uniform(-1, 1, n), rng.uniform(3, 7, n),
        rng.uniform(-2, 2, n), rng.uniform(-0.5, 0.5, n),
        rng.uniform(-0.1, 0.1, n)]).astype(np.float32)
    y = rng.uniform(-1, 1, (n, 2 * t)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_mirror_frenet_table():
    x, y = _batch(4)
    xn, yn = np.asarray(x), np.asarray(y)
    # exact reflection (default): every lateral quantity flips — the
    # dynamics symmetry validated by test_nmpc_full_mirror_symmetry
    xm, ym = mirror_frenet_table(xn, yn)
    assert xm.shape[0] == 8 and ym.shape[0] == 8
    np.testing.assert_allclose(
        xm[4:], xn * np.array([-1, -1, 1, -1, 1, -1, -1, -1]))
    np.testing.assert_allclose(ym[4:, :5], yn[:, :5])  # accel kept
    np.testing.assert_allclose(ym[4:, 5:], -yn[:, 5:])  # sv flipped
    # reference-parity mode: only ey/epsi flip (train_nmpc_frenet.py:89-101)
    xr, yr = mirror_frenet_table(xn, yn, exact=False)
    np.testing.assert_allclose(xr[4:, 0], -xn[:, 0])
    np.testing.assert_allclose(xr[4:, 6], -xn[:, 6])
    np.testing.assert_allclose(xr[4:, 1], xn[:, 1])  # delta kept (ref quirk)
    np.testing.assert_allclose(yr[4:, 5:], -yn[:, 5:])


def test_fullint_train_step_decreases_loss():
    model = _frenet_model()
    x, y = _batch(32)
    state = create_train_state(model, jax.random.PRNGKey(0), x, lr=1e-2)
    dyn = f1tenth_params(dtype=jnp.float32).to_vector()
    step = make_train_step(frenet_fullint_loss, dyn, donate=False)
    _, m0 = step(state, x, y)
    for _ in range(50):
        state, m = step(state, x, y)
    assert float(m.loss) < float(m0.loss)
    assert m.cluster_loss is None
    assert np.isfinite(float(m.pred_loss)) and np.isfinite(float(m.int_loss))


def test_oneint_loss_weighting():
    """x100 one-step integration weight (train_nmpc_frenet.py:372)."""
    model = _frenet_model(out_features=2)
    x, _ = _batch(8)
    y = jnp.zeros((8, 2))
    state = create_train_state(model, jax.random.PRNGKey(0), x)
    dyn = f1tenth_params(dtype=jnp.float32).to_vector()
    loss, (pred, inte) = frenet_oneint_loss(state.apply_fn, state.params, x,
                                            y, dyn)
    np.testing.assert_allclose(float(loss), float(pred) + float(inte),
                               rtol=1e-6)


def test_cluster_loss_path():
    model = ClusterWCRBFNet(in_features=8, out_features=10, num_kernels=8,
                            basis_func=get_basis("gaussian"), num_regions=4)
    x, y = _batch(8)
    # integer CE labels (trainer.py cluster_fullint_loss: one-hot uploads
    # were 40 MB/step through the dev tunnel)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 4, 8), jnp.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), x)
    dyn = f1tenth_params(dtype=jnp.float32).to_vector()
    step = make_train_step(cluster_fullint_loss, dyn, donate=False)
    state, m = step(state, x, y, ids)
    assert m.cluster_loss is not None and np.isfinite(float(m.cluster_loss))


def test_checkpoint_roundtrip(tmp_path):
    model = _frenet_model()
    x, y = _batch(4)
    state = create_train_state(model, jax.random.PRNGKey(0), x)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=0)
    restored = restore_params(ckpt_dir)
    ref_flat, _ = jax.tree_util.tree_flatten(state.params)
    got_flat, _ = jax.tree_util.tree_flatten(restored)
    for a, b in zip(ref_flat, got_flat):
        np.testing.assert_allclose(a, b)


def test_checkpoint_overwrites_existing_step(tmp_path):
    # re-running a trainer with the same run_name must replace the old
    # checkpoint, not silently keep it (orbax skips duplicate steps by
    # default and raises StepAlreadyExistsError with force=True)
    model = _frenet_model()
    x, _ = _batch(4)
    state = create_train_state(model, jax.random.PRNGKey(0), x)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=0)
    bumped = jax.tree.map(lambda a: a + 1.0, state.params)
    save_checkpoint(ckpt_dir, state.replace(params=bumped), step=0)
    restored = restore_params(ckpt_dir)
    ref_flat, _ = jax.tree_util.tree_flatten(bumped)
    got_flat, _ = jax.tree_util.tree_flatten(restored)
    for a, b in zip(ref_flat, got_flat):
        np.testing.assert_allclose(a, b)


def test_config_roundtrip(tmp_path):
    config = {
        "in_features": 8, "out_features": 10, "num_kernels": 8,
        "basis_func": "gaussian", "num_regions": 2,
        "lower_bounds": [[-2.0, 0.0]], "upper_bounds": [[0.0, 2.0]],
        "dimension_ranges": [[0], [1]], "activation_idx": [0],
        "delta": [15.0], "lr": 1e-3, "seed": 0, "mu": 1.0, "cs": 5.0,
    }
    path = str(tmp_path / "conf.yaml")
    save_config(path, config)
    loaded = load_config(path)
    assert loaded["basis_func"] == "gaussian"
    model = from_config(loaded)
    x, _ = _batch(2)
    p = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(p, x).shape == (2, 10)


def test_mirror_cartesian_table_exact_symmetry():
    """The cartesian mirror is the ST dynamics' exact reflection: rolling
    out the mirrored controls from the mirrored initial state produces the
    mirrored trajectory."""
    import jax.numpy as jnp

    from irbfn_tpu.dynamics.params import f1tenth_params
    from irbfn_tpu.dynamics.single_track import rollout
    from irbfn_tpu.train import mirror_cartesian_table

    rng = np.random.default_rng(5)
    n = 16
    inputs = np.column_stack([
        rng.uniform(1.0, 6.0, n),    # v
        rng.uniform(0.5, 3.0, n),    # x_g
        rng.uniform(-2.0, 2.0, n),   # y_g
        rng.uniform(-1.0, 1.0, n),   # t_g
        rng.uniform(1.0, 6.0, n),    # v_g
        rng.uniform(-0.3, 0.3, n),   # beta
        rng.uniform(-1.0, 1.0, n),   # angv
    ]).astype(np.float32)
    outputs = rng.uniform(-2.0, 2.0, (n, 10)).astype(np.float32)
    in_all, out_all = mirror_cartesian_table(inputs, outputs)
    assert in_all.shape == (2 * n, 7) and out_all.shape == (2 * n, 10)

    p = f1tenth_params()

    def roll(x_in, u_blk):
        # start at origin, heading 0, with the table's (v, beta, angv)
        x0 = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                        jnp.asarray(x_in[:, 0]), jnp.zeros(n),
                        jnp.asarray(x_in[:, 6]), jnp.asarray(x_in[:, 5])],
                       axis=-1)
        u = jnp.stack([jnp.asarray(u_blk[:, :5]),
                       jnp.asarray(u_blk[:, 5:])], axis=-1)
        return rollout(x0, u, p)

    base = np.asarray(roll(inputs, outputs))
    mirr = np.asarray(roll(in_all[n:], out_all[n:]))
    # y, psi, psidot, beta flip; x, delta, v match
    np.testing.assert_allclose(mirr[..., 1], -base[..., 1], atol=1e-5)
    np.testing.assert_allclose(mirr[..., 4], -base[..., 4], atol=1e-5)
    np.testing.assert_allclose(mirr[..., 5], -base[..., 5], atol=1e-5)
    np.testing.assert_allclose(mirr[..., 6], -base[..., 6], atol=1e-5)
    np.testing.assert_allclose(mirr[..., 0], base[..., 0], atol=1e-5)
    np.testing.assert_allclose(mirr[..., 3], base[..., 3], atol=1e-5)
