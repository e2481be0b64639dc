"""Dynamics-layer tests.

Oracle style follows the reference's f1tenth_gym test suite
(deprecated/f1tenth_gym/tests/test_dynamics.py): closed-form scenarios with
hand-derivable outcomes, plus ABI-parity checks of the batched rollouts
against straightforward per-sample Python reimplementations of the reference
equations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics import (
    f1tenth_params,
    frenet_onestep,
    frenet_rollout,
    integrate_endpoint_gl,
    integrate_frenet,
    integrate_path,
    integrate_st,
    kinematic_onestep,
    params_to_coefs,
    rollout,
    st_deriv,
    ks_deriv,
    clothoid_to_params,
)


@pytest.fixture
def params():
    return f1tenth_params(dtype=jnp.float64)


# ---------------------------------------------------------------- single track

def test_straight_line_constant_speed(params):
    """v>3 dynamic model, zero steering: straight-line motion."""
    x0 = jnp.array([0.0, 0.0, 0.0, 5.0, 0.0, 0.0, 0.0])
    u = jnp.zeros((10, 2))
    states = rollout(x0, u, params)
    np.testing.assert_allclose(states[-1, 0], 5.0 * 0.1 * 10, rtol=1e-12)
    np.testing.assert_allclose(states[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(states[:, 3], 5.0, atol=1e-12)


def test_braking_decelerates(params):
    x0 = jnp.array([0.0, 0.0, 0.0, 5.0, 0.0, 0.0, 0.0])
    u = jnp.tile(jnp.array([-2.0, 0.0]), (5, 1))
    states = rollout(x0, u, params)
    np.testing.assert_allclose(states[-1, 3], 5.0 - 2.0 * 0.1 * 5, rtol=1e-12)


def test_low_speed_uses_kinematic(params):
    """Below the v=3 blend the yaw rate must follow the kinematic model."""
    x0 = jnp.array([0.0, 0.0, 0.2, 1.0, 0.0, 0.5, 0.1])
    u = jnp.zeros((1, 2))
    nxt = rollout(x0, u, params)[0]
    dt = 0.1
    expected_psi = 0.0 + (1.0 / (0.15875 + 0.17145)) * np.tan(0.2) * dt
    np.testing.assert_allclose(nxt[4], expected_psi, rtol=1e-12)
    # kinematic model freezes psi_dot and beta
    np.testing.assert_allclose(nxt[5], 0.5, rtol=1e-12)
    np.testing.assert_allclose(nxt[6], 0.1, rtol=1e-12)


def test_st_deriv_matches_reference_equations(params):
    """Spot-check the dynamic ST derivative against a direct transliteration
    of the CommonRoad equations (reference dynamics.py:49-76)."""
    g = 9.81
    x = np.array([1.0, -2.0, 0.1, 5.0, 0.3, 0.4, 0.05])
    u = np.array([1.5, 0.2])
    p = {k: float(getattr(params, k)) for k in
         ("mu", "m", "I", "lf", "lr", "C_Sf", "C_Sr", "h")}
    X, Y, DELTA, V, PSI, PSI_DOT, BETA = x
    ACCL, SV = u
    lf, lr, C_Sf, C_Sr, h, mu, m, I = (p["lf"], p["lr"], p["C_Sf"], p["C_Sr"],
                                       p["h"], p["mu"], p["m"], p["I"])
    expected_psiddot = ((mu * m) / (I * (lf + lr))) * (
        lf * C_Sf * (g * lr - ACCL * h) * DELTA
        + (lr * C_Sr * (g * lf + ACCL * h) - lf * C_Sf * (g * lr - ACCL * h)) * BETA
        - (lf * lf * C_Sf * (g * lr - ACCL * h) + lr * lr * C_Sr * (g * lf + ACCL * h))
        * (PSI_DOT / V)
    )
    expected_betadot = (mu / (V * (lr + lf))) * (
        C_Sf * (g * lr - ACCL * h) * DELTA
        - (C_Sr * (g * lf + ACCL * h) + C_Sf * (g * lr - ACCL * h)) * BETA
        + (C_Sr * (g * lf + ACCL * h) * lr - C_Sf * (g * lr - ACCL * h) * lf)
        * (PSI_DOT / V)
    ) - PSI_DOT
    d = st_deriv(jnp.asarray(x), jnp.asarray(u), params)
    np.testing.assert_allclose(d[0], V * np.cos(PSI + BETA), rtol=1e-12)
    np.testing.assert_allclose(d[1], V * np.sin(PSI + BETA), rtol=1e-12)
    np.testing.assert_allclose(d[5], expected_psiddot, rtol=1e-10)
    np.testing.assert_allclose(d[6], expected_betadot, rtol=1e-10)


def test_integrate_st_reference_abi(params):
    """Column-major control tail layout: [x(7), a0..a4, sv0..sv4]."""
    batch = 4
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(batch, 7)) * 0.2
    x0[:, 3] = 5.0  # dynamic regime
    a = rng.uniform(-1, 1, size=(batch, 5))
    sv = rng.uniform(-0.5, 0.5, size=(batch, 5))
    rows = np.concatenate([x0, a, sv], axis=1)
    out = integrate_st(jnp.asarray(rows), params.to_vector())
    assert out.shape == (batch, 5, 7)
    # manual per-sample euler with the blended model
    for b in range(batch):
        x = jnp.asarray(x0[b])
        for t in range(5):
            u = jnp.array([a[b, t], sv[b, t]])
            use_dyn = float(jnp.clip(x[3], -7.0, 7.0)) > 3.0
            d = st_deriv(x, u, params) if use_dyn else ks_deriv(x, u, params)
            x = x + d * 0.1
            np.testing.assert_allclose(out[b, t], x, rtol=1e-10, atol=1e-12)


def test_batched_matches_unbatched(params):
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(16, 7)))
    u = jnp.asarray(rng.normal(size=(16, 5, 2)))
    batched = rollout(x0, u, params)
    single = jnp.stack([rollout(x0[i], u[i], params) for i in range(16)])
    np.testing.assert_allclose(batched, single, rtol=1e-12)


def test_kinematic_onestep_abi(params):
    rows = jnp.array([[0.0, 0.0, 0.1, 2.0, 0.5, 0.3, 0.2, 1.0, 0.1]])
    nxt = kinematic_onestep(rows, params.to_vector())
    assert nxt.shape == (1, 7)
    np.testing.assert_allclose(nxt[0, 3], 2.0 + 1.0 * 0.1, rtol=1e-12)
    np.testing.assert_allclose(nxt[0, 2], 0.1 + 0.1 * 0.1, rtol=1e-12)
    # kinematic: psi_dot / beta untouched
    np.testing.assert_allclose(nxt[0, 5], 0.3, rtol=1e-12)
    np.testing.assert_allclose(nxt[0, 6], 0.2, rtol=1e-12)


# --------------------------------------------------------------------- frenet

def test_frenet_straight(params):
    """Zero curvature, zero heading error: s advances at vx."""
    x0 = jnp.array([0.0, 0.0, 0.0, 4.0, 0.0, 0.0, 0.0])
    u = jnp.zeros((5, 2))
    states = frenet_rollout(x0, u, jnp.asarray(0.0), params, blend="ls")
    np.testing.assert_allclose(states[-1, 0], 4.0 * 0.1 * 5, rtol=1e-12)
    np.testing.assert_allclose(states[:, 1], 0.0, atol=1e-12)


def test_frenet_onestep_abi(params):
    # rows: [ey, delta, vx, vy, wz, epsi, curv, pad, a, sv]
    rows = jnp.array([[0.1, 0.05, 3.0, 0.1, 0.2, 0.02, 0.01, 0.0, 1.0, 0.3]])
    nxt = frenet_onestep(rows, params.to_vector())
    assert nxt.shape == (1, 6)
    dt = 0.1
    ey, delta, vx, vy, wz, epsi, curv = 0.1, 0.05, 3.0, 0.1, 0.2, 0.02, 0.01
    np.testing.assert_allclose(nxt[0, 0], ey + vx * np.sin(epsi) * dt, rtol=1e-10)
    np.testing.assert_allclose(nxt[0, 1], delta + 0.3 * dt, rtol=1e-12)
    np.testing.assert_allclose(nxt[0, 2], vx + 1.0 * dt, rtol=1e-12)
    np.testing.assert_allclose(nxt[0, 3], vy, rtol=1e-12)  # ls model: frozen
    np.testing.assert_allclose(nxt[0, 4], wz, rtol=1e-12)
    epsi_dot = vx * np.tan(delta) / (0.15875 + 0.17145) - curv * (
        vx * np.cos(epsi) / (1 - curv * ey))
    np.testing.assert_allclose(nxt[0, 5], epsi + epsi_dot * dt, rtol=1e-10)


def test_integrate_frenet_abi(params):
    batch = 3
    rng = np.random.default_rng(2)
    x0 = rng.normal(size=(batch, 7)) * 0.1
    x0[:, 3] = 4.0
    curv = rng.uniform(-0.1, 0.1, size=(batch, 1))
    a = rng.uniform(-1, 1, size=(batch, 5))
    sv = rng.uniform(-0.5, 0.5, size=(batch, 5))
    rows = np.concatenate([x0, curv, a, sv], axis=1)
    out = integrate_frenet(jnp.asarray(rows), params.to_vector())
    assert out.shape == (batch, 5, 8)
    # curvature column constant through rollout
    np.testing.assert_allclose(out[..., 7], np.broadcast_to(curv, (batch, 5)),
                               rtol=1e-12)


# --------------------------------------------------------------------- spiral

def test_params_to_coefs_linear_curvature():
    """A clothoid's knots must recover exactly linear coefficients."""
    p = clothoid_to_params(jnp.asarray(0.1), jnp.asarray(0.4), jnp.asarray(2.0))
    coefs = params_to_coefs(p)
    np.testing.assert_allclose(coefs[0], 0.1, atol=1e-12)
    np.testing.assert_allclose(coefs[1], 0.4, atol=1e-12)
    np.testing.assert_allclose(coefs[2], 0.0, atol=1e-10)
    np.testing.assert_allclose(coefs[3], 0.0, atol=1e-10)


def test_integrate_path_straight():
    params = jnp.array([0.0, 0.0, 0.0, 0.0, 10.0])
    states = integrate_path(params)
    np.testing.assert_allclose(states[-1, 0], 10.0, rtol=1e-12)
    np.testing.assert_allclose(states[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(states[:, 2], 0.0, atol=1e-12)


def test_integrate_endpoint_circle():
    """Constant curvature k over arc s: endpoint has closed form."""
    k, s = 0.2, 5.0
    params = jnp.array([k, k, k, k, s])
    end = integrate_endpoint_gl(params)
    np.testing.assert_allclose(end[0], np.sin(k * s) / k, rtol=1e-12)
    np.testing.assert_allclose(end[1], (1 - np.cos(k * s)) / k, rtol=1e-12)
    np.testing.assert_allclose(end[2], k * s, rtol=1e-12)


def test_integrate_path_converges_to_gl():
    """Reference-parity trapezoid recursion converges to the GL endpoint.

    NOTE: the reference's running-average recursion (planner_utils.py:44-59)
    divides by the sample count including a degenerate first interval, making
    it first-order; we reproduce that semantics, so assert O(h) convergence.
    """
    params = jnp.array([0.01, 0.05, -0.02, 0.08, 8.0])
    end_gl = integrate_endpoint_gl(params)

    def err(n):
        s = integrate_path(params, n_points=n)
        return float(jnp.hypot(s[-1, 0] - end_gl[0], s[-1, 1] - end_gl[1]))

    e1, e2 = err(513), err(1025)
    assert e1 < 5e-3
    assert e2 < 0.7 * e1  # converging


def test_sample_path_machine_precision():
    """The framework's own GL path sampler hits the endpoint to ~1e-12."""
    from irbfn_tpu.dynamics.spiral import sample_path

    params = jnp.array([0.01, 0.05, -0.02, 0.08, 8.0], dtype=jnp.float64)
    end_gl = integrate_endpoint_gl(params)
    samples = sample_path(params, n_points=9)
    np.testing.assert_allclose(samples[-1, 0], end_gl[0], atol=1e-11)
    np.testing.assert_allclose(samples[-1, 1], end_gl[1], atol=1e-11)
    np.testing.assert_allclose(samples[-1, 2], end_gl[2], atol=1e-12)
    # batched agrees with single
    batch = jnp.stack([params, params * 0.5])
    out = sample_path(batch, n_points=9)
    np.testing.assert_allclose(out[0], samples, atol=1e-14)


def test_integrate_path_batched():
    rng = np.random.default_rng(3)
    params = jnp.asarray(
        np.column_stack([rng.uniform(-0.2, 0.2, (8, 4)), rng.uniform(2, 10, (8, 1))]))
    batched = integrate_path(params)
    single = jnp.stack([integrate_path(params[i]) for i in range(8)])
    np.testing.assert_allclose(batched, single, rtol=1e-12)
