"""Soft Actor-Critic in JAX (replaces stable-baselines3 SAC; reference:
configs/sb3/sac.yaml, train_sb3.py:97 getattr(sb3, ...) — used for the
continuous-action CausalWorld tasks).

SB3-1.5 semantics: squashed-gaussian actor, twin Q critics with polyak-
averaged targets (tau per config, updated every gradient step), fixed or
auto-tuned entropy coefficient (target entropy -dim(A)), uniform replay
buffer with learning_starts random warmup, train_freq/gradient_steps
scheduling.

TPU-native design: actor+critics+OCR extractor are one flax module; action
sampling and the combined actor/critic/alpha update are single jitted
programs with donated buffers.  Separate-optimizer semantics (actor loss must
not update critic or shared-extractor params and vice versa) are reproduced
by computing per-loss gradients and selecting by parameter group on device —
no Python-side parameter surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class SACConfig:
    learning_rate: float = 1e-4
    buffer_size: int = 1_000_000
    learning_starts: int = 1000
    batch_size: int = 256
    tau: float = 0.001
    gamma: float = 0.95
    train_freq: int = 1
    gradient_steps: int = 1
    ent_coef: Any = 1e-3          # float, or "auto" / "auto_0.1"

    @classmethod
    def from_algo_kwargs(cls, kwargs: dict) -> "SACConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        clean = {k: v for k, v in dict(kwargs).items()
                 if k in known and v is not None}
        return cls(**clean)


LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class SACPolicy(nn.Module):
    """OCR extractor + pooling + squashed-gaussian actor + twin Q critics."""

    ocr_module: Any
    pooling_module: Any
    action_dim: int
    net_arch: tuple = (256, 256)
    freeze_ocr: bool = True

    def setup(self):
        def mlp(out_dim, name):
            layers = []
            for i, h in enumerate(self.net_arch):
                layers += [nn.Dense(h, name=f"{name}_{i}"), nn.relu]
            layers.append(nn.Dense(out_dim, name=f"{name}_out"))
            return nn.Sequential(layers)

        self.actor_net = mlp(2 * self.action_dim, "actor")
        self.q1_net = mlp(1, "q1")
        self.q2_net = mlp(1, "q2")

    def extract(self, obs):
        rep = self.ocr_module(obs)
        if self.freeze_ocr:
            rep = jax.lax.stop_gradient(rep)
        return self.pooling_module(rep)

    def actor(self, features):
        out = self.actor_net(features)
        mu, log_std = jnp.split(out, 2, axis=-1)
        return mu, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)

    def critics(self, features, action):
        x = jnp.concatenate([features, action], axis=-1)
        return self.q1_net(x)[..., 0], self.q2_net(x)[..., 0]

    def __call__(self, obs, action):
        """Init-path: touches extractor, actor and critics."""
        features = self.extract(obs)
        mu, log_std = self.actor(features)
        q1, q2 = self.critics(features, action)
        return mu, log_std, q1, q2


def sample_squashed(mu, log_std, key):
    """a = tanh(u), u ~ N(mu, std); returns (action, log_prob) with the
    tanh-correction SB3 uses (sum log(1 - a^2 + eps))."""
    std = jnp.exp(log_std)
    u = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
    a = jnp.tanh(u)
    logp = -0.5 * (((u - mu) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
    logp = logp.sum(-1) - jnp.log(1 - a ** 2 + 1e-6).sum(-1)
    return a, logp


class ReplayBuffer:
    """Uniform ring buffer; image observations stored uint8."""

    def __init__(self, capacity: int, obs_shape, action_dim: int,
                 is_image_obs: bool):
        self.capacity = capacity
        self.is_image_obs = is_image_obs
        obs_dtype = np.uint8 if is_image_obs else np.float32
        self.obs = np.empty((capacity,) + tuple(obs_shape), obs_dtype)
        self.next_obs = np.empty((capacity,) + tuple(obs_shape), obs_dtype)
        self.actions = np.empty((capacity, action_dim), np.float32)
        self.rewards = np.empty((capacity,), np.float32)
        self.dones = np.empty((capacity,), np.float32)
        self.pos = 0
        self.full = False

    def add(self, obs, next_obs, action, reward, done) -> None:
        n = len(obs)
        idx = (self.pos + np.arange(n)) % self.capacity
        self.obs[idx] = obs
        self.next_obs[idx] = next_obs
        self.actions[idx] = action.reshape(n, -1)
        self.rewards[idx] = reward
        self.dones[idx] = done
        self.pos = int((self.pos + n) % self.capacity)
        self.full = self.full or self.pos < n

    def __len__(self) -> int:
        return self.capacity if self.full else self.pos

    def sample(self, batch_size: int, rng: np.random.Generator) -> dict:
        idx = rng.integers(0, len(self), size=batch_size)
        scale = 255.0 if self.is_image_obs else 1.0
        return {
            "obs": self.obs[idx].astype(np.float32) / scale,
            "next_obs": self.next_obs[idx].astype(np.float32) / scale,
            "actions": self.actions[idx],
            "rewards": self.rewards[idx],
            "dones": self.dones[idx],
        }


class SAC:
    def __init__(self, policy_module: SACPolicy, obs_shape, is_image_obs: bool,
                 num_envs: int, config: SACConfig, seed: int = 0,
                 freeze_ocr: bool = False, action_low=-1.0, action_high=1.0):
        self.policy = policy_module
        self.cfg = config
        self.obs_shape = tuple(obs_shape)
        self.is_image_obs = is_image_obs
        self.num_envs = num_envs
        self.action_dim = policy_module.action_dim
        self.action_low = np.asarray(action_low, np.float32)
        self.action_high = np.asarray(action_high, np.float32)
        self._rng = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)

        init_rng, self._rng = jax.random.split(self._rng)
        dummy_obs = jnp.zeros((1,) + self.obs_shape, jnp.float32)
        dummy_act = jnp.zeros((1, self.action_dim), jnp.float32)
        variables = jax.jit(self.policy.init)(
            {"params": init_rng, "noise": jax.random.fold_in(init_rng, 1),
             "noise2": jax.random.fold_in(init_rng, 2),
             "dropout": jax.random.fold_in(init_rng, 3)}, dummy_obs, dummy_act)
        self.params = variables["params"]
        # real copies: params and target_params are both donated to the
        # jitted update, so they must not alias the same buffers
        self.target_params = jax.tree.map(jnp.copy, self.params)

        # entropy coefficient (SB3: fixed float, or "auto[_init]")
        ent = config.ent_coef
        self.auto_alpha = isinstance(ent, str) and ent.startswith("auto")
        if self.auto_alpha:
            init_alpha = float(ent.split("_", 1)[1]) if "_" in ent else 1.0
            self.log_alpha = jnp.asarray(np.log(init_alpha), jnp.float32)
            self.target_entropy = -float(self.action_dim)
            self.alpha_tx = optax.adam(config.learning_rate, eps=1e-5)
            self.alpha_opt_state = self.alpha_tx.init(self.log_alpha)
        else:
            self.log_alpha = jnp.asarray(np.log(float(ent)), jnp.float32)
            self.target_entropy = 0.0
            self.alpha_tx = None
            self.alpha_opt_state = None

        # one Adam per parameter group (actor / critic+shared-extractor),
        # selected on device -- reproduces SB3's two optimizers in one tree
        def group_of(top_key: str) -> str:
            # setup() names the head layers actor_*/q1_*/q2_*; they sit at the
            # top level of the param tree (flax scopes by construction site)
            if top_key.startswith("actor"):
                return "actor"
            if top_key.startswith(("q1", "q2")):
                return "critic"
            return "frozen" if freeze_ocr else "critic"  # shared extractor

        def labels(params):
            return {k: jax.tree.map(lambda _: group_of(k), sub)
                    for k, sub in params.items()}

        self._labels = labels(self.params)
        self.tx = optax.multi_transform(
            {"actor": optax.adam(config.learning_rate, eps=1e-5),
             "critic": optax.adam(config.learning_rate, eps=1e-5),
             "frozen": optax.set_to_zero()},
            param_labels=labels)
        self.opt_state = self.tx.init(self.params)
        self.num_timesteps = 0
        self._build_fns()

    # -- jitted programs ---------------------------------------------------------

    def _rngs(self, rng):
        return {"noise": rng, "noise2": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2)}

    def _build_fns(self):
        policy = self.policy
        cfg = self.cfg
        labels = self._labels

        def features_of(params, obs, rng):
            return policy.apply({"params": params}, obs, rngs=self._rngs(rng),
                                method="extract")

        def act(params, obs, rng, deterministic: bool):
            feats = features_of(params, obs, rng)
            mu, log_std = policy.apply({"params": params}, feats, method="actor")
            if deterministic:
                return jnp.tanh(mu)
            a, _ = sample_squashed(mu, log_std, jax.random.fold_in(rng, 7))
            return a

        self._act = jax.jit(act, static_argnums=(3,))

        def update(params, target_params, opt_state, log_alpha, alpha_opt_state,
                   batch, rng):
            alpha = jnp.exp(log_alpha)

            # --- targets (no gradient) ---
            feats_next = features_of(params, batch["next_obs"],
                                     jax.random.fold_in(rng, 1))
            mu_n, log_std_n = policy.apply({"params": params}, feats_next,
                                           method="actor")
            a_next, logp_next = sample_squashed(mu_n, log_std_n,
                                                jax.random.fold_in(rng, 2))
            tfeats_next = features_of(target_params, batch["next_obs"],
                                      jax.random.fold_in(rng, 1))
            tq1, tq2 = policy.apply({"params": target_params}, tfeats_next,
                                    a_next, method="critics")
            target_q = jnp.minimum(tq1, tq2) - alpha * logp_next
            target = batch["rewards"] + cfg.gamma * (1 - batch["dones"]) * target_q
            target = jax.lax.stop_gradient(target)

            def critic_loss_fn(p):
                feats = features_of(p, batch["obs"], jax.random.fold_in(rng, 3))
                q1, q2 = policy.apply({"params": p}, feats, batch["actions"],
                                      method="critics")
                return 0.5 * (((q1 - target) ** 2).mean()
                              + ((q2 - target) ** 2).mean())

            def actor_loss_fn(p):
                feats = features_of(p, batch["obs"], jax.random.fold_in(rng, 3))
                mu, log_std = policy.apply({"params": p}, feats, method="actor")
                a_pi, logp_pi = sample_squashed(mu, log_std,
                                                jax.random.fold_in(rng, 4))
                q1, q2 = policy.apply({"params": p}, feats, a_pi,
                                      method="critics")
                q_pi = jnp.minimum(q1, q2)
                return (alpha * logp_pi - q_pi).mean(), logp_pi

            critic_loss, critic_grads = jax.value_and_grad(critic_loss_fn)(params)
            (actor_loss, logp_pi), actor_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True)(params)

            # SB3 separate-optimizer semantics: each group only sees its own
            # loss's gradient
            grads = jax.tree.map(
                lambda lbl, cg, ag: ag if lbl == "actor" else cg,
                labels, critic_grads, actor_grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            # polyak target update (every gradient step, SB3
            # target_update_interval=1)
            target_params = jax.tree.map(
                lambda t, s: (1 - cfg.tau) * t + cfg.tau * s,
                target_params, params)

            metrics = {"critic_loss": critic_loss, "actor_loss": actor_loss,
                       "alpha": alpha, "entropy": -logp_pi.mean()}
            if self.auto_alpha:
                def alpha_loss_fn(la):
                    return -(la * jax.lax.stop_gradient(
                        logp_pi + self.target_entropy)).mean()

                alpha_loss, alpha_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
                a_updates, alpha_opt_state = self.alpha_tx.update(
                    alpha_grad, alpha_opt_state, log_alpha)
                log_alpha = optax.apply_updates(log_alpha, a_updates)
                metrics["alpha_loss"] = alpha_loss
            return (params, target_params, opt_state, log_alpha,
                    alpha_opt_state, metrics)

        self._update = jax.jit(update, donate_argnums=(0, 1, 2))

    def _next_rng(self):
        self._rng, rng = jax.random.split(self._rng)
        return rng

    # -- acting -------------------------------------------------------------------

    def _scale_action(self, a: np.ndarray) -> np.ndarray:
        return self.action_low + 0.5 * (a + 1.0) * (self.action_high - self.action_low)

    def predict(self, obs, deterministic: bool = False):
        obs = np.asarray(obs, np.float32)
        if self.is_image_obs:
            obs = obs / 255.0
        squeeze = obs.ndim == len(self.obs_shape)
        if squeeze:
            obs = obs[None]
        a = np.asarray(self._act(self.params, jnp.asarray(obs),
                                 self._next_rng(), deterministic))
        a = self._scale_action(a)
        return a[0] if squeeze else a

    # -- learning -------------------------------------------------------------------

    def learn(self, vec_env, total_timesteps: int,
              iteration_callback: Optional[Callable] = None,
              step_callback: Optional[Callable] = None):
        cfg = self.cfg
        buffer = ReplayBuffer(cfg.buffer_size, self.obs_shape, self.action_dim,
                              self.is_image_obs)
        obs = vec_env.reset()
        metrics = {}
        vec_steps = 0
        while self.num_timesteps < total_timesteps:
            if self.num_timesteps < cfg.learning_starts:
                raw = self._np_rng.uniform(
                    -1, 1, size=(vec_env.num_envs, self.action_dim)).astype(np.float32)
            else:
                proc = obs.astype(np.float32) / (255.0 if self.is_image_obs else 1.0)
                raw = np.asarray(self._act(self.params, jnp.asarray(proc),
                                           self._next_rng(), False))
            action = self._scale_action(raw)
            next_obs, rewards, dones, infos = vec_env.step(action)
            # store the true next obs (pre-reset) like SB3's replay buffer
            stored_next = np.array(next_obs)
            ep_infos = []
            for i, info in enumerate(infos):
                if "terminal_observation" in info:
                    stored_next[i] = info["terminal_observation"]
                    ep_infos.append(info)
            buffer.add(obs, stored_next, raw, rewards, dones)
            obs = next_obs
            self.num_timesteps += vec_env.num_envs
            vec_steps += 1
            if step_callback is not None:
                step_callback(self)

            if (self.num_timesteps >= cfg.learning_starts
                    and vec_steps % cfg.train_freq == 0):
                for _ in range(cfg.gradient_steps):
                    batch = buffer.sample(min(cfg.batch_size, len(buffer)),
                                          self._np_rng)
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                    (self.params, self.target_params, self.opt_state,
                     self.log_alpha, self.alpha_opt_state, metrics) = self._update(
                        self.params, self.target_params, self.opt_state,
                        self.log_alpha, self.alpha_opt_state, batch,
                        self._next_rng())
                if iteration_callback is not None:
                    host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                    iteration_callback(self, host, ep_infos)
        return self

    # -- persistence -----------------------------------------------------------------

    def save(self) -> dict:
        return {"policy_params": self.params, "target_params": self.target_params,
                "opt_state": self.opt_state, "log_alpha": self.log_alpha,
                "num_timesteps": self.num_timesteps}

    def load(self, ckpt: dict) -> None:
        self.params = ckpt["policy_params"]
        self.target_params = ckpt.get("target_params", self.params)
        if "opt_state" in ckpt:
            self.opt_state = ckpt["opt_state"]
        if "log_alpha" in ckpt:
            self.log_alpha = jnp.asarray(ckpt["log_alpha"])
        self.num_timesteps = int(ckpt.get("num_timesteps", 0))
