"""PPO and A2C in JAX (replaces stable-baselines3; reference: train_sb3.py,
configs/sb3/ppo.yaml, configs/sb3/a2c.yaml).

Matches SB3 1.5 semantics the reference relies on: rollouts of
n_steps//num_envs per env, GAE(lambda), n_epochs of shuffled minibatches with
per-minibatch advantage normalisation, clipped ratio + value loss + entropy
bonus, max_grad_norm 0.5, Adam (A2C: RMSprop, no clipping epochs).

TPU-native: the policy (OCR -> pooling -> AC heads) is one flax module;
action sampling and minibatch updates are jitted programs, so rollout
inference never leaves the device except for the env step itself.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class PPOConfig:
    n_steps: int = 2048            # TOTAL steps per rollout (split over envs)
    batch_size: int = 32
    learning_rate: float = 3e-4
    n_epochs: int = 10
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    target_kl: Optional[float] = None
    normalize_advantage: bool = True

    @classmethod
    def from_algo_kwargs(cls, kwargs: dict) -> "PPOConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        clean = {k: v for k, v in dict(kwargs).items()
                 if k in known and v is not None}
        return cls(**clean)


@dataclasses.dataclass
class A2CConfig:
    n_steps: int = 5
    learning_rate: float = 7e-4
    gamma: float = 0.99
    gae_lambda: float = 1.0
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    rms_eps: float = 1e-5

    @classmethod
    def from_algo_kwargs(cls, kwargs: dict) -> "A2CConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        clean = {k: v for k, v in dict(kwargs).items()
                 if k in known and v is not None}
        return cls(**clean)


def _preprocess(obs: np.ndarray, is_image: bool) -> np.ndarray:
    if is_image:
        return obs.astype(np.float32) / 255.0
    return obs.astype(np.float32)


class OnPolicyAlgo:
    """Shared machinery for PPO/A2C."""

    def __init__(self, policy_module, obs_shape, is_image_obs: bool,
                 num_envs: int, seed: int = 0, freeze_ocr: bool = False,
                 learning_rate: float = 3e-4, max_grad_norm: float = 0.5,
                 use_rmsprop: bool = False, rms_eps: float = 1e-5):
        self.policy = policy_module
        self.obs_shape = tuple(obs_shape)
        self.is_image_obs = is_image_obs
        self.num_envs = num_envs
        self._rng = jax.random.PRNGKey(seed)

        init_rng, self._rng = jax.random.split(self._rng)
        dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.float32)
        variables = jax.jit(self.policy.init)(
            {"params": init_rng, "noise": jax.random.fold_in(init_rng, 1),
             "noise2": jax.random.fold_in(init_rng, 2),
             "dropout": jax.random.fold_in(init_rng, 3)}, dummy)
        self.params = variables["params"]

        if use_rmsprop:  # SB3 A2C uses RMSprop(alpha=0.99, eps=1e-5)
            base = optax.rmsprop(learning_rate, decay=0.99, eps=rms_eps)
        else:
            base = optax.adam(learning_rate, eps=1e-5)
        chain = [optax.clip_by_global_norm(max_grad_norm), base]
        tx = optax.chain(*chain)
        if freeze_ocr and "ocr_module" in self.params:
            def labels(params):
                return {k: jax.tree.map(
                    lambda _: "frozen" if k == "ocr_module" else "train", sub)
                    for k, sub in params.items()}
            tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()},
                                       param_labels=labels)
        self.tx = tx
        self.opt_state = tx.init(self.params)
        self.num_timesteps = 0
        self._build_fns()

    def _rngs(self, rng):
        return {"noise": rng, "noise2": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2)}

    def _build_fns(self):
        policy = self.policy
        is_image = self.is_image_obs

        def prep(obs):
            # observations cross the host->device boundary raw (uint8 for
            # images: 4x less transfer on the latency-bound rollout path);
            # the [0,1] cast happens in-jit
            obs = jnp.asarray(obs, jnp.float32)
            return obs / 255.0 if is_image else obs

        def act(params, obs, rng):
            logits, value = policy.apply({"params": params}, prep(obs),
                                         rngs=self._rngs(rng))
            action = jax.random.categorical(jax.random.fold_in(rng, 7), logits)
            logprob = jax.nn.log_softmax(logits)[
                jnp.arange(logits.shape[0]), action]
            return action, logprob, value

        def act_deterministic(params, obs, rng):
            logits, value = policy.apply({"params": params}, prep(obs),
                                         rngs=self._rngs(rng))
            return jnp.argmax(logits, -1), logits, value

        def values(params, obs, rng):
            _, value = policy.apply({"params": params}, prep(obs),
                                    rngs=self._rngs(rng))
            return value

        self._prep = prep

        self._act = jax.jit(act)
        self._act_det = jax.jit(act_deterministic)
        self._values = jax.jit(values)

    def _next_rng(self):
        self._rng, rng = jax.random.split(self._rng)
        return rng

    def predict(self, obs, deterministic: bool = False):
        obs = jnp.asarray(np.asarray(obs))  # raw dtype; cast happens in-jit
        squeeze = obs.ndim == len(self.obs_shape)
        if squeeze:
            obs = obs[None]
        if deterministic:
            action, _, _ = self._act_det(self.params, obs, self._next_rng())
        else:
            action, _, _ = self._act(self.params, obs, self._next_rng())
        action = np.asarray(action)
        return action[0] if squeeze else action

    # -- rollouts -------------------------------------------------------------

    def collect_rollout(self, vec_env, obs, n_steps: int, gamma: float,
                        gae_lambda: float, step_callback: Optional[Callable] = None):
        E = vec_env.num_envs
        obs_dtype = np.uint8 if self.is_image_obs else np.float32
        buf_obs = np.empty((n_steps, E) + obs.shape[1:], obs_dtype)
        buf_actions = np.empty((n_steps, E), np.int32)
        buf_logprobs = np.empty((n_steps, E), np.float32)
        buf_values = np.empty((n_steps, E), np.float32)
        buf_rewards = np.empty((n_steps, E), np.float32)
        buf_dones = np.empty((n_steps, E), np.float32)
        ep_infos = []

        # one rng split for the whole rollout + a single device_get per step:
        # the env step is the only host round-trip that has to be synchronous
        # (matters when the device sits behind a high-latency transport)
        self._rng, sub = jax.random.split(self._rng)
        step_keys = jax.random.split(sub, n_steps + 1)

        for t in range(n_steps):
            outs = self._act(self.params, jnp.asarray(obs), step_keys[t])
            action, logprob, value = jax.device_get(outs)
            buf_obs[t] = obs
            buf_actions[t] = action
            buf_logprobs[t] = logprob
            buf_values[t] = value
            next_obs, rewards, dones, infos = vec_env.step(action)
            buf_rewards[t] = rewards
            buf_dones[t] = dones
            for info in infos:
                if "is_success" in info and "terminal_observation" in info:
                    ep_infos.append(info)
            self.num_timesteps += E
            obs = next_obs
            if step_callback is not None:
                step_callback(self)

        last_values = np.asarray(self._values(
            self.params, jnp.asarray(obs), self._next_rng()))

        # GAE (SB3 buffers.py semantics; episodic -> no timeout bootstrapping)
        advantages = np.zeros_like(buf_rewards)
        gae = np.zeros(E, np.float32)
        for t in reversed(range(n_steps)):
            next_v = last_values if t == n_steps - 1 else buf_values[t + 1]
            nonterminal = 1.0 - buf_dones[t]
            delta = buf_rewards[t] + gamma * next_v * nonterminal - buf_values[t]
            gae = delta + gamma * gae_lambda * nonterminal * gae
            advantages[t] = gae
        returns = advantages + buf_values

        batch = {
            "obs": buf_obs.reshape((-1,) + buf_obs.shape[2:]),
            "actions": buf_actions.reshape(-1),
            "logprobs": buf_logprobs.reshape(-1),
            "values": buf_values.reshape(-1),
            "advantages": advantages.reshape(-1),
            "returns": returns.reshape(-1),
        }
        return obs, batch, ep_infos


class PPO(OnPolicyAlgo):
    def __init__(self, policy_module, obs_shape, is_image_obs, num_envs,
                 config: PPOConfig, seed: int = 0, freeze_ocr: bool = False):
        self.cfg = config
        super().__init__(policy_module, obs_shape, is_image_obs, num_envs,
                         seed=seed, freeze_ocr=freeze_ocr,
                         learning_rate=config.learning_rate,
                         max_grad_norm=config.max_grad_norm)
        self._build_update()

    def _build_update(self):
        cfg = self.cfg
        policy = self.policy
        prep = self._prep

        def loss_fn(params, batch, rng):
            logits, values = policy.apply({"params": params},
                                          prep(batch["obs"]),
                                          rngs=self._rngs(rng))
            logp_all = jax.nn.log_softmax(logits)
            logprob = logp_all[jnp.arange(logits.shape[0]), batch["actions"]]
            entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()

            adv = batch["advantages"]
            # SB3 skips normalisation for size-1 minibatches (static shape)
            if cfg.normalize_advantage and adv.shape[0] > 1:
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            ratio = jnp.exp(logprob - batch["logprobs"])
            unclipped = adv * ratio
            clipped = adv * jnp.clip(ratio, 1 - cfg.clip_range, 1 + cfg.clip_range)
            policy_loss = -jnp.minimum(unclipped, clipped).mean()
            value_loss = ((batch["returns"] - values) ** 2).mean()
            loss = policy_loss + cfg.vf_coef * value_loss - cfg.ent_coef * entropy
            approx_kl = ((ratio - 1) - jnp.log(ratio)).mean()
            return loss, {"policy_loss": policy_loss, "value_loss": value_loss,
                          "entropy": entropy, "approx_kl": approx_kl}

        def update(params, opt_state, data, idx, rng):
            # the full rollout stays resident on device; each minibatch is an
            # on-device gather, so the host ships only `idx` per update
            minibatch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, minibatch, rng)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if cfg.target_kl is not None:
                # SB3 semantics: an over-KL minibatch aborts the epoch loop
                # BEFORE its update is applied (sb3 ppo.py checks approx_kl
                # ahead of optimizer.step())
                ok = metrics["approx_kl"] <= 1.5 * cfg.target_kl
                new_params = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_params, params)
                new_opt_state = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state)
            metrics["loss"] = loss
            return new_params, new_opt_state, metrics

        self._update = jax.jit(update, donate_argnums=(0, 1))

    def train_on_rollout(self, batch: dict) -> dict:
        cfg = self.cfg
        n = batch["obs"].shape[0]
        data = {k: jnp.asarray(v) for k, v in batch.items()}  # one upload
        rng_np = np.random.default_rng(int(jax.random.randint(
            self._next_rng(), (), 0, 2 ** 31 - 1)))
        metrics = {}
        stop = False
        for _ in range(cfg.n_epochs):
            perm = rng_np.permutation(n)
            for start in range(0, n, cfg.batch_size):
                # SB3's RolloutBuffer yields the final partial minibatch too;
                # its size (n % batch_size) is fixed, so jit compiles at most
                # two program shapes
                idx = jnp.asarray(perm[start:start + cfg.batch_size])
                self.params, self.opt_state, metrics = self._update(
                    self.params, self.opt_state, data, idx, self._next_rng())
                if cfg.target_kl is not None and \
                        float(metrics["approx_kl"]) > 1.5 * cfg.target_kl:
                    stop = True
                    break
            if stop:
                break
        return {k: float(np.asarray(v)) for k, v in metrics.items()}

    def learn(self, vec_env, total_timesteps: int,
              iteration_callback: Optional[Callable] = None,
              step_callback: Optional[Callable] = None):
        obs = vec_env.reset()
        n_steps = max(self.cfg.n_steps // vec_env.num_envs, 1)
        while self.num_timesteps < total_timesteps:
            obs, batch, ep_infos = self.collect_rollout(
                vec_env, obs, n_steps, self.cfg.gamma, self.cfg.gae_lambda,
                step_callback)
            metrics = self.train_on_rollout(batch)
            if iteration_callback is not None:
                iteration_callback(self, metrics, ep_infos)
        return self

    # -- persistence -----------------------------------------------------------

    def save(self) -> dict:
        return {"policy_params": self.params, "opt_state": self.opt_state,
                "num_timesteps": self.num_timesteps}

    def load(self, ckpt: dict) -> None:
        self.params = ckpt["policy_params"]
        if "opt_state" in ckpt:
            self.opt_state = ckpt["opt_state"]
        self.num_timesteps = int(ckpt.get("num_timesteps", 0))


class A2C(OnPolicyAlgo):
    def __init__(self, policy_module, obs_shape, is_image_obs, num_envs,
                 config: A2CConfig, seed: int = 0, freeze_ocr: bool = False):
        self.cfg = config
        super().__init__(policy_module, obs_shape, is_image_obs, num_envs,
                         seed=seed, freeze_ocr=freeze_ocr,
                         learning_rate=config.learning_rate,
                         max_grad_norm=config.max_grad_norm,
                         use_rmsprop=True, rms_eps=config.rms_eps)
        self._build_update()

    def _build_update(self):
        cfg = self.cfg
        policy = self.policy
        prep = self._prep

        def loss_fn(params, batch, rng):
            logits, values = policy.apply({"params": params},
                                          prep(batch["obs"]),
                                          rngs=self._rngs(rng))
            logp_all = jax.nn.log_softmax(logits)
            logprob = logp_all[jnp.arange(logits.shape[0]), batch["actions"]]
            entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
            policy_loss = -(batch["advantages"] * logprob).mean()
            value_loss = ((batch["returns"] - values) ** 2).mean()
            loss = policy_loss + cfg.vf_coef * value_loss - cfg.ent_coef * entropy
            return loss, {"policy_loss": policy_loss, "value_loss": value_loss,
                          "entropy": entropy}

        def update(params, opt_state, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["loss"] = loss
            return params, opt_state, metrics

        self._update = jax.jit(update, donate_argnums=(0, 1))

    def train_on_rollout(self, batch: dict) -> dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, metrics = self._update(
            self.params, self.opt_state, batch, self._next_rng())
        return {k: float(np.asarray(v)) for k, v in metrics.items()}

    learn = PPO.learn
    save = PPO.save
    load = PPO.load
