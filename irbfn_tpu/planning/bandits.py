"""EXP3 adversarial bandit for online model/table selection.

Same algorithm as reference ``src/irbfn_mpc/bandits.py`` (arm weights with
exponential updates, gamma-mixed sampling, sigmoid reward squashing), used by
the adaptive planners to pick among models trained for different (mu, cs)
dynamics.  Implemented functionally over jax PRNG keys so arm pulls can run
jitted alongside the planner; a small stateful wrapper mirrors the reference
object API.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class EXP3State(NamedTuple):
    weights: jnp.ndarray  # (n_arms,)
    gamma: jnp.ndarray  # exploration rate (scalar)
    last_probs: jnp.ndarray  # sampling distribution of the latest pull


def exp3_init(n_arms: int, gamma: float, dtype=jnp.float32) -> EXP3State:
    return EXP3State(jnp.ones((n_arms,), dtype),
                     jnp.asarray(gamma, dtype),
                     jnp.full((n_arms,), 1.0 / n_arms, dtype))


def exp3_probs(state: EXP3State) -> jnp.ndarray:
    n = state.weights.shape[0]
    return ((1.0 - state.gamma) * state.weights / jnp.sum(state.weights)
            + state.gamma / n)


def exp3_pull(state: EXP3State, key) -> tuple:
    probs = exp3_probs(state)
    arm = jax.random.choice(key, probs.shape[0], p=probs)
    return arm, state._replace(last_probs=probs)


def exp3_update(state: EXP3State, arm, reward,
                rew_scale: Optional[float] = 0.5) -> EXP3State:
    """Exponential weight update (reference bandits.py:3-5, 25-31).

    ``rew_scale`` selects the reward map. The reference squashes through
    ``sigmoid(rew_scale * r)`` so unbounded scores land in (0, 1) — kept as
    the default for parity. But for rewards ALREADY normalized to [0, 1]
    (e.g. lap-progress fractions) the sigmoid maps the whole range into
    [0.5, 0.62]: a 0.5 reward gap shrinks to ~0.06 and the weights never
    separate (measured: 40-episode runs stay within noise of uniform
    pulls). Pass ``rew_scale=None`` to use the raw [0, 1] reward — the
    standard EXP3 estimator with its regret guarantee intact.
    """
    n = state.weights.shape[0]
    if rew_scale is None:
        r = jnp.clip(reward, 0.0, 1.0)
    else:
        r = jax.nn.sigmoid(jnp.clip(rew_scale * reward, -100.0, 100.0))
    adj = jnp.where(jnp.arange(n) == arm, r / state.last_probs[arm], 0.0)
    weights = state.weights * jnp.exp(state.gamma * adj / n)
    # renormalize to keep weights bounded over long runs (pure scaling —
    # exp3_probs is invariant to it)
    weights = weights / jnp.max(weights)
    return state._replace(weights=weights)


class EXP3:
    """Stateful wrapper with the reference's object API (bandits.py:7-31)."""

    def __init__(self, n: int, gamma: float, seed: int = 0):
        self.n = n
        self.gamma = gamma
        self._key = jax.random.PRNGKey(seed)
        self.state = exp3_init(n, gamma)

    def reset(self):
        self.state = exp3_init(self.n, self.gamma)

    @property
    def weights(self):
        return np.asarray(self.state.weights)

    def pull_arm(self) -> int:
        self._key, sub = jax.random.split(self._key)
        arm, self.state = exp3_pull(self.state, sub)
        return int(arm)

    def update_dist(self, i: int, r: float,
                    rew_scale: Optional[float] = 0.5):
        self.state = exp3_update(self.state, i, r, rew_scale)
