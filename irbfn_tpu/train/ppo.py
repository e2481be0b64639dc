"""PPO over a trajectory lattice (reference deprecated/ppo.py capability).

The reference trains a categorical PPO policy that picks among
WCRBFN-generated candidate trajectories (ppo.py:42-58, 170-199, flax +
distrax + gym loop).  Here the whole algorithm is a single jitted update:

- envs are the batched ``TrackEnv`` (episodes vectorized on device),
- the discrete action picks a lattice goal; a proportional tracker converts
  the selected goal into (accel, steer-vel) controls for one control step,
- rollout -> GAE -> clipped-surrogate epochs runs inside one ``lax.scan``
  program (no Python stepping, no distrax dependency — categorical
  log-probs/entropy in plain jnp).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from irbfn_tpu.sim.env import TrackEnv


class ActorCritic(nn.Module):
    n_actions: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        h = obs
        for w in self.hidden:
            h = jnp.tanh(nn.Dense(w)(h))
        logits = nn.Dense(self.n_actions)(h)
        value = nn.Dense(1)(h)
        return logits, value.squeeze(-1)


class PPOConfig(NamedTuple):
    n_envs: int = 64
    n_steps: int = 64
    n_epochs: int = 4
    n_minibatch: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    s0_spread: float = 50.0
    speed0: float = 2.0


def _obs_vector(obs):
    """Track-relative observation features (8,)."""
    return jnp.stack([obs.ey, obs.epsi, obs.delta, obs.linear_vel_x,
                      obs.linear_vel_y, obs.ang_vel_z, obs.beta,
                      jnp.sin(obs.pose_theta)], axis=-1)


def make_lattice_actions(n_lat: int = 7, max_ey_target: float = 1.0):
    """Discrete action set: target lateral offsets across the lattice."""
    return jnp.linspace(-max_ey_target, max_ey_target, n_lat)


def _action_controls(obs, ey_target, track=None, wheelbase: float = 0.33,
                     v_target: float = 3.0):
    """Low-level tracker toward the selected lattice offset.

    Curvature feedforward + steer-angle-SETPOINT tracking: a pure
    proportional steering-rate law with no feedforward is only marginally
    stable on a closed track — measured limit cycle at |ey| ~ 1.5 m with
    zero forward progress after ~5 s (the same delta-blind instability the
    cartesian planner hit; see IRBFNPlanner steer_mode="setpoint")."""
    if track is not None:
        kappa = track.curvature_at(obs.s)
        delta_ff = jnp.arctan(wheelbase * kappa)
    else:
        delta_ff = jnp.zeros_like(obs.ey)
    delta_des = jnp.clip(
        delta_ff - 0.35 * (obs.ey - ey_target) - 0.9 * obs.epsi, -0.4, 0.4)
    sv = jnp.clip(6.0 * (delta_des - obs.delta), -3.2, 3.2)
    a = jnp.clip(2.0 * (v_target - obs.linear_vel_x), -9.51, 9.51)
    return jnp.stack([a, sv], axis=-1).astype(obs.ey.dtype)


def _reward(obs, prev_s, new_s):
    """Progress along the raceline minus deviation penalties (the shaping
    used by the reference's lattice PPO)."""
    return (new_s - prev_s) - 0.5 * jnp.abs(obs.ey) - 0.2 * jnp.abs(obs.epsi)


class PPOTrainer:
    def __init__(self, env: TrackEnv, cfg: PPOConfig = PPOConfig(),
                 n_lattice: int = 7, seed: int = 0):
        self.env = env
        self.cfg = cfg
        sim_dtype = jnp.result_type(env.params.dt)
        self.offsets = make_lattice_actions(n_lattice).astype(sim_dtype)
        self.net = ActorCritic(n_actions=n_lattice)
        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(rng)
        params = self.net.init(init_rng, jnp.zeros((1, 8)))
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                         optax.adam(cfg.lr))
        self.params = params
        self.opt_state = tx.init(params)
        self.tx = tx
        self._update = self._build_update()

    def _build_update(self):
        env, cfg, net, offsets, tx = (self.env, self.cfg, self.net,
                                      self.offsets, self.tx)

        def rollout(params, sim, key):
            def step_fn(carry, _):
                sim, key = carry
                obs = env.observe(sim)
                ov = _obs_vector(obs)
                logits, value = net.apply(params, ov)
                key, sub = jax.random.split(key)
                action = jax.random.categorical(sub, logits)
                logp = jnp.take_along_axis(
                    jax.nn.log_softmax(logits), action[:, None], 1).squeeze(1)
                controls = _action_controls(obs, offsets[action],
                                            track=env.track)
                sim_next = env.step(sim, controls)
                reward = _reward(obs, sim.s, sim_next.s)
                return (sim_next, key), (ov, action, logp, value, reward)

            (sim, key), traj = jax.lax.scan(step_fn, (sim, key), None,
                                            length=cfg.n_steps)
            obs = env.observe(sim)
            _, last_value = net.apply(params, _obs_vector(obs))
            return sim, key, traj, last_value

        def gae(rewards, values, last_value):
            def body(carry, t):
                adv_next, v_next = carry
                delta = rewards[t] + cfg.gamma * v_next - values[t]
                adv = delta + cfg.gamma * cfg.gae_lambda * adv_next
                return (adv, values[t]), adv

            _, advs = jax.lax.scan(
                body, (jnp.zeros_like(last_value), last_value),
                jnp.arange(cfg.n_steps - 1, -1, -1))
            return advs[::-1]

        def loss_fn(params, batch):
            ov, action, logp_old, value_old, adv, ret = batch
            logits, value = net.apply(params, ov)
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, action[:, None], 1).squeeze(1)
            ratio = jnp.exp(logp - logp_old)
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
            surrogate = jnp.minimum(
                ratio * adv_n,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n)
            pg_loss = -surrogate.mean()
            v_loss = jnp.mean((value - ret) ** 2)
            entropy = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
            loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
            return loss, (pg_loss, v_loss, entropy)

        @jax.jit
        def update(params, opt_state, sim, key):
            # auto-reset crashed envs: episodes freeze on done
            # (env.py:208-218), so without this the live pool shrinks
            # monotonically across updates and the policy only ever sees
            # (and is punished by) its own frozen wrecks — rewards DEGRADE
            # with training. Reset between rollouts, standard vectorized
            # PPO truncation semantics.
            crashed = sim.done
            key, rk = jax.random.split(key)
            s0 = jax.random.uniform(rk, (cfg.n_envs,),
                                    maxval=cfg.s0_spread)
            fresh = env.reset(s0=s0, speed0=cfg.speed0,
                              batch_shape=(cfg.n_envs,))

            def merge(f, o):
                d = crashed.reshape(crashed.shape
                                    + (1,) * (o.ndim - crashed.ndim))
                return jnp.where(d, f, o)

            sim = jax.tree.map(merge, fresh, sim)
            sim, key, traj, last_value = rollout(params, sim, key)
            ov, action, logp, value, reward = traj
            adv = gae(reward, value, last_value)
            ret = adv + value
            flat = lambda a: a.reshape((-1,) + a.shape[2:])
            data = tuple(flat(a) for a in (ov, action, logp, value, adv, ret))
            n = data[0].shape[0]
            mb = n // cfg.n_minibatch

            def epoch_body(carry, _):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                perm = jax.random.permutation(sub, n)

                def mb_body(carry, i):
                    params, opt_state = carry
                    idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                    batch = tuple(a[idx] for a in data)
                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params, batch)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    mb_body, (params, opt_state), jnp.arange(cfg.n_minibatch))
                return (params, opt_state, key), losses.mean()

            (params, opt_state, key), losses = jax.lax.scan(
                epoch_body, (params, opt_state, key), None,
                length=cfg.n_epochs)
            metrics = {"loss": losses.mean(), "reward": reward.mean(),
                       "mean_progress": (sim.s).mean(),
                       "crash_rate": crashed.mean()}
            return params, opt_state, sim, key, metrics

        return update

    def train(self, n_updates: int = 10):
        key = self.rng
        key, reset_key = jax.random.split(key)
        s0 = jax.random.uniform(reset_key, (self.cfg.n_envs,),
                                maxval=self.cfg.s0_spread)
        sim = self.env.reset(s0=s0, speed0=self.cfg.speed0,
                             batch_shape=(self.cfg.n_envs,))
        history = []
        for _ in range(n_updates):
            self.params, self.opt_state, sim, key, metrics = self._update(
                self.params, self.opt_state, sim, key)
            history.append({k: float(v) for k, v in metrics.items()})
        return history
