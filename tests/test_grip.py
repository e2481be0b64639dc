"""Grip-observer tests: the estimator must recover mu*cs/(mu0*cs0) from
closed-loop driving, because the adaptive planner's arm and pace selection
(planning/planner.py:GripAdaptiveFrenetPlanner) hang off that estimate."""

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.dynamics.params import VehicleParams, f1tenth_params
from irbfn_tpu.planning.grip import (GripConfig, grip_init, grip_record,
                                     grip_update)
from irbfn_tpu.sim import TrackEnv, oval_track


def _batched_params(mus, css, base=None):
    base = base or f1tenth_params()
    B = len(mus)
    full = lambda v: jnp.full((B,), v)  # noqa: E731
    return VehicleParams(
        mu=jnp.asarray(mus, jnp.float32), m=full(base.m), I=full(base.I),
        lf=full(base.lf), lr=full(base.lr),
        C_Sf=jnp.asarray(css, jnp.float32),
        C_Sr=jnp.asarray(css, jnp.float32), h=full(base.h), dt=full(0.01),
        sv_max=full(base.sv_max), a_max=full(base.a_max),
        s_max=full(base.s_max), v_max=full(base.v_max))


def test_grip_estimate_converges_to_true_gain():
    """Drive the oval with a simple tracking policy at 4 (mu, cs) combos in
    one batch; the EMA estimate must land near mu*cs/(mu0*cs0) for each."""
    mus = [1.0, 0.7, 1.0, 0.5]
    css = [5.0, 5.0, 2.5, 5.0]
    g_true = np.array([m * c / 5.0 for m, c in zip(mus, css)])

    track = oval_track(length=30.0, width=15.0, n_samples=512, speed=3.8)
    env = TrackEnv(track, _batched_params(mus, css), half_width=3.0)
    cfg = GripConfig()
    p_nom = f1tenth_params().astype(jnp.float32)._replace(
        mu=jnp.asarray(1.0, jnp.float32),
        C_Sf=jnp.asarray(5.0, jnp.float32),
        C_Sr=jnp.asarray(5.0, jnp.float32))

    def policy(gs, obs):
        gs = grip_update(gs, obs, cfg, 0.1)
        sv = jnp.clip(-1.0 * obs.ey - 1.5 * obs.epsi - 0.8 * obs.delta,
                      -3.2, 3.2)
        a = jnp.clip(2.0 * (3.8 - obs.linear_vel_x), -9.51, 9.51)
        action = jnp.stack([a, sv], axis=-1)
        gs = grip_record(gs, obs, action, p_nom, cfg)
        return action, gs

    final, gs, traj = env.rollout_stateful(
        env.reset(s0=jnp.zeros(4), speed0=1.0, batch_shape=(4,)),
        jax.jit(policy), grip_init((4,), cfg), n_steps=400)
    assert not bool(np.asarray(final.done).any()), "test policy crashed"
    g_hat = np.asarray(gs.g)
    # measured on this protocol the estimate is ~exact (1.00/0.70/0.50/0.50);
    # 8% relative headroom covers platform jitter — far inside what the
    # 0.1-spaced mu arms and the sqrt pace law need
    np.testing.assert_allclose(g_hat, g_true, rtol=0.08)


def test_grip_estimate_freezes_without_excitation():
    """On a straight (no steering, no lateral force) the gate must hold the
    estimate at its prior instead of dividing by noise."""
    track = oval_track(length=400.0, width=200.0, n_samples=512, speed=4.5)
    env = TrackEnv(track, _batched_params([0.5], [5.0]))
    cfg = GripConfig()
    p_nom = f1tenth_params().astype(jnp.float32)

    def policy(gs, obs):
        gs = grip_update(gs, obs, cfg, 0.1)
        action = jnp.stack([jnp.clip(4.5 - obs.linear_vel_x, -9.51, 9.51),
                            jnp.zeros_like(obs.ey)], axis=-1)
        gs = grip_record(gs, obs, action, p_nom, cfg)
        return action, gs

    _, gs, _ = env.rollout_stateful(
        env.reset(s0=jnp.zeros(1), speed0=1.0, batch_shape=(1,)),
        jax.jit(policy), grip_init((1,), cfg), n_steps=100)
    assert float(np.asarray(gs.g)[0]) == cfg.g0


def test_grip_adaptive_planner_policy_shapes():
    """GripAdaptiveFrenetPlanner's jitted policy step: arm gather + pace
    scaling + mirrored bank forward produce finite (B, 2) actions and a
    carried GripState."""
    from irbfn_tpu.planning import GripAdaptiveFrenetPlanner

    from tests.test_train import _frenet_model

    model = _frenet_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 8), jnp.float32)
    plist = [model.init(rng, x) for _ in range(3)]
    track = oval_track(length=30.0, width=15.0, n_samples=256, speed=4.0)
    planner = GripAdaptiveFrenetPlanner(model, plist, [0.5, 0.8, 1.0], track)

    env = TrackEnv(track, _batched_params([1.0, 0.6], [5.0, 5.0]))
    obs = env.observe(env.reset(s0=jnp.zeros(2), speed0=4.0,
                                batch_shape=(2,)))
    gs = planner.init_state((2,))
    action, gs2 = planner.policy()(gs, obs)
    assert action.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(action)))
    assert gs2.g.shape == (2,)


def test_mu_cs_product_confound_in_sim_dynamics():
    """The one-scalar observer model is the INFORMATION-THEORETIC limit of
    the lateral signal in this sim (VERDICT r4 'prove the bound' ask): the
    CommonRoad linear-tire ST model carries mu and C_S ONLY as the product
    mu*C_S in every lateral term, so same-product (mu, cs) pairs are
    near-indistinguishable — (0.5, 10) vs (1.0, 5) is EXACT; pairs that
    differ in mu at fixed product deviate only through the mu-only
    longitudinal friction clamp (measured ~5e-4 on derivative magnitudes
    ~1-10, i.e. ~1e-4 relative).  Consequence: no second observer dimension
    can separate cs from mu here, and the cs<=4 grid failures are arm-bank
    COVERAGE holes (grid products 0.5-2.2 vs the original bank floor 2.5),
    not estimator deficiencies — which is why the bank extends down to
    mu=0.1 (products >= 0.5) instead of growing the observer."""
    from irbfn_tpu.dynamics.single_track import st_deriv

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, (64, 7))
        * np.array([5, 5, 0.3, 6, 3, 2.5, 0.3])
        + np.array([0, 0, 0, 4, 0, 0, 0]))
    u = jnp.asarray(rng.uniform(-1, 1, (64, 2)) * 3.0)

    def dmax(p1, p2):
        return float(jnp.max(jnp.abs(
            st_deriv(x, u, f1tenth_params(mu=p1[0], cs=p1[1]))
            - st_deriv(x, u, f1tenth_params(mu=p2[0], cs=p2[1])))))

    # same product, same mu-split of lateral vs longitudinal: bit-exact
    assert dmax((0.5, 10.0), (1.0, 5.0)) == 0.0
    assert dmax((0.8, 2.5), (0.4, 5.0)) == 0.0
    # same product, different mu: only the longitudinal clamp leaks mu
    assert dmax((0.4, 5.0), (1.0, 2.0)) < 5e-3
    # different product: clearly distinguishable (sanity scale check)
    assert dmax((1.0, 5.0), (0.5, 5.0)) > 1.0
