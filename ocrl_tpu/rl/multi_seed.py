"""Vmapped multi-seed PPO: a seed sweep as ONE batched computation.

The reference scales seed sweeps by launching one process per (model, env,
seed) in a tmux pane (reference: run_sb3s.py:8-9,39-57).  On TPU the right
axis for independent seeds is `jax.vmap`: S policies initialise, act, and
update inside single jitted programs with a leading seed axis, so a 3-seed
benchmark run costs roughly the same number of device round-trips as one
seed (SURVEY §2.2: "Seed/model sweeps become jax.vmap ... instead of tmux").

Per-seed semantics are EXACTLY single-seed PPO: each seed has its own
parameters, optimizer state (including per-seed global-norm clipping — the
optax chain runs inside the vmap), minibatch permutations, env group, and
rng stream.  target_kl early-stopping is per-seed data-dependent control
flow and is not supported here (the benchmark configs leave it null).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ppo import PPOConfig


def _encode_chunk(n: int, target: int = 128) -> int:
    """Largest power-of-two chunk <= target dividing n (0 = no fit)."""
    c = target
    while c >= 8:
        if n % c == 0:
            return c
        c //= 2
    return 0


class MultiSeedPPO:
    def __init__(self, policy_module, obs_shape, is_image_obs: bool,
                 num_envs: int, config: PPOConfig, seeds,
                 freeze_ocr: bool = False, pipeline: bool = False,
                 cache_frozen_reps: bool = False):
        self.policy = policy_module
        self.cfg = config
        self.obs_shape = tuple(obs_shape)
        self.is_image_obs = is_image_obs
        self.num_envs = num_envs          # envs PER SEED
        self.seeds = [int(s) for s in seeds]
        self.S = len(self.seeds)
        # double-buffered rollout: env halves step while the other half's
        # policy call is in flight (pays when host env stepping is comparable
        # to the dispatch round trip, i.e. image-obs envs at high env counts)
        self.pipeline = bool(pipeline) and num_envs % 2 == 0
        # cached-frozen-reps update: with a frozen OCR, encode the rollout
        # ONCE on-device and run every epoch's minibatches on cached reps —
        # the encoder pass drops from n_epochs x minibatches to 1 per
        # rollout.  Deviation from the reference's recompute-per-minibatch:
        # stochastic encoders (slot-init noise) see ONE noise draw per
        # rollout instead of one per minibatch pass; deterministic encoders
        # are bit-identical (tested).
        self.cache_reps = bool(cache_frozen_reps) and freeze_ocr
        # Host-side key source: any uint32 pair is a valid threefry key, so
        # rollout/update keys are drawn with numpy — the per-step
        # jax.random.split device dispatches (one extra ~latency-bound round
        # trip per rollout step over the dev transport) disappear.
        self._np_rng = np.random.default_rng(int(self.seeds[0]) ^ 0x5EED)

        dummy = jnp.zeros((1,) + self.obs_shape, jnp.float32)

        def init_one(key):
            rngs = {"params": key, "noise": jax.random.fold_in(key, 1),
                    "noise2": jax.random.fold_in(key, 2),
                    "dropout": jax.random.fold_in(key, 3)}
            return policy_module.init(rngs, dummy)["params"]

        seed_keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        self.params = jax.jit(jax.vmap(init_one))(seed_keys)

        tx = optax.chain(optax.clip_by_global_norm(config.max_grad_norm),
                         optax.adam(config.learning_rate, eps=1e-5))
        if freeze_ocr and "ocr_module" in self.params:
            def labels(params):
                return {k: jax.tree.map(
                    lambda _: "frozen" if k == "ocr_module" else "train", sub)
                    for k, sub in params.items()}
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()},
                param_labels=labels)
        self.tx = tx
        self.opt_state = jax.jit(jax.vmap(tx.init))(self.params)
        self.num_timesteps = 0            # TOTAL env steps across all seeds
        self._build_fns()

    # -- jitted programs (single-seed bodies, vmapped over the seed axis) -----

    def _rngs(self, rng):
        return {"noise": rng, "noise2": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2)}

    def _build_fns(self):
        policy, cfg, is_image = self.policy, self.cfg, self.is_image_obs

        def prep(obs):
            obs = jnp.asarray(obs, jnp.float32)
            return obs / 255.0 if is_image else obs

        def act_one(params, obs, rng):
            logits, value = policy.apply({"params": params}, prep(obs),
                                         rngs=self._rngs(rng))
            action = jax.random.categorical(jax.random.fold_in(rng, 7), logits)
            logprob = jax.nn.log_softmax(logits)[
                jnp.arange(logits.shape[0]), action]
            return action, logprob, value

        def act_packed_one(params, obs, keys_all, t):
            """act_one with (a) the whole rollout's keys resident on device
            (one upload per rollout instead of one per vec step) and (b) the
            three outputs PACKED into one f32 array (one download per vec
            step instead of three) — on a high-RTT transport each saved
            transfer is a round trip off the rollout critical path."""
            rng = jax.lax.dynamic_index_in_dim(keys_all, t, keepdims=False)
            a, lp, v = act_one(params, obs, rng)
            return jnp.stack([a.astype(jnp.float32), lp, v])   # (3, E)

        def act_det_one(params, obs, rng):
            logits, _ = policy.apply({"params": params}, prep(obs),
                                     rngs=self._rngs(rng))
            return jnp.argmax(logits, -1)

        def act_sample_one(params, obs, rng):
            logits, _ = policy.apply({"params": params}, prep(obs),
                                     rngs=self._rngs(rng))
            return jax.random.categorical(jax.random.fold_in(rng, 7), logits)

        def values_one(params, obs, rng):
            _, value = policy.apply({"params": params}, prep(obs),
                                    rngs=self._rngs(rng))
            return value

        def loss_fn(params, batch, rng):
            if "rep" in batch:
                logits, values = policy.apply({"params": params},
                                              batch["rep"],
                                              rngs=self._rngs(rng),
                                              method="heads_from_rep")
            else:
                logits, values = policy.apply({"params": params},
                                              prep(batch["obs"]),
                                              rngs=self._rngs(rng))
            logp_all = jax.nn.log_softmax(logits)
            logprob = logp_all[jnp.arange(logits.shape[0]), batch["actions"]]
            entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
            adv = batch["advantages"]
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
                          "entropy": entropy, "approx_kl": approx_kl,
                          "loss": loss}

        def update_one(params, opt_state, data, idx, rng):
            minibatch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, minibatch, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        def epochs_update(params, opt_state, data, perm_idx, rng):
            """The WHOLE PPO update phase — n_epochs x n_minibatches steps,
            every seed — as ONE dispatch: lax.scan over the flattened
            minibatch schedule, vmapped single-seed update inside.  On a
            latency-bound transport this replaces ~n_epochs*n_mb host
            round-trips per rollout with one.

            target_kl (SB3: over-KL minibatch aborts the epoch loop BEFORE
            its update is applied) is per-seed data-dependent control flow;
            under the fixed scan schedule it becomes per-seed masking: once a
            seed's minibatch exceeds 1.5*target_kl, that update and every
            later one for that seed are where()'d away.  Stopped seeds waste
            their remaining schedule slots' FLOPs — semantics match SB3."""

            use_kl = cfg.target_kl is not None

            def body(carry, xs):
                params, opt_state, stopped, last_m = carry
                i, idx = xs          # idx: (S, B) per-seed minibatch rows
                keys = jax.random.split(jax.random.fold_in(rng, i),
                                        idx.shape[0])
                new_params, new_opt, metrics = jax.vmap(
                    update_one, in_axes=(0, 0, 0, 0, 0))(
                        params, opt_state, data, idx, keys)
                if use_kl:
                    ok = metrics["approx_kl"] <= 1.5 * cfg.target_kl  # (S,)
                    apply = jnp.logical_and(jnp.logical_not(stopped), ok)

                    def sel(mask, n, o):
                        m = mask.reshape((-1,) + (1,) * (n.ndim - 1))
                        return jnp.where(m, n, o)

                    params = jax.tree.map(
                        lambda n, o: sel(apply, n, o), new_params, params)
                    opt_state = jax.tree.map(
                        lambda n, o: sel(apply, n, o), new_opt, opt_state)
                    # metrics freeze at the stop-triggering minibatch (SB3
                    # logs that minibatch's approx_kl before breaking)
                    last_m = jax.tree.map(
                        lambda n, o: sel(jnp.logical_not(stopped), n, o),
                        metrics, last_m)
                    stopped = jnp.logical_or(stopped, jnp.logical_not(ok))
                else:
                    params, opt_state, last_m = new_params, new_opt, metrics
                return (params, opt_state, stopped, last_m), None

            n_total = perm_idx.shape[0]
            stopped0 = jnp.zeros((self.S,), bool)
            zeros_m = {k: jnp.zeros((self.S,), jnp.float32)
                       for k in ("policy_loss", "value_loss", "entropy",
                                 "approx_kl", "loss")}
            (params, opt_state, _, last), _ = jax.lax.scan(
                body, (params, opt_state, stopped0, zeros_m),
                (jnp.arange(n_total), perm_idx))
            return params, opt_state, last

        def rep_one(params, obs, rng, chunk):
            """Encode one seed's whole rollout, lax.map'd in chunks (a
            single-batch SLATE pass over n=2048 images would materialise
            ~19GB of CNN-token activations)."""
            n = obs.shape[0]

            def enc(c):
                return policy.apply({"params": params}, prep(c),
                                    rngs=self._rngs(rng), method="ocr_rep")

            chunks = obs.reshape((n // chunk, chunk) + obs.shape[1:])
            rep = jax.lax.map(enc, chunks)
            return rep.reshape((n,) + rep.shape[2:])

        def epochs_update_cached(params, opt_state, data, perm_idx, rng,
                                 chunk):
            keys = jax.random.split(rng, data["obs"].shape[0])
            rep = jax.vmap(rep_one, in_axes=(0, 0, 0, None))(
                params, data["obs"], keys, chunk)
            data = {k: v for k, v in data.items() if k != "obs"}
            data["rep"] = rep
            return epochs_update(params, opt_state, data, perm_idx,
                                 jax.random.fold_in(rng, 1))

        def update_gated(params, opt_state, data, idx, rng, stopped):
            """Vmapped single-minibatch update with per-seed target_kl
            masking, for the non-divisible (host-loop) update path."""
            new_p, new_o, metrics = jax.vmap(
                update_one, in_axes=(0, 0, 0, 0, 0))(
                    params, opt_state, data, idx, rng)
            ok = metrics["approx_kl"] <= 1.5 * cfg.target_kl
            apply = jnp.logical_and(jnp.logical_not(stopped), ok)

            def sel(n, o):
                m = apply.reshape((-1,) + (1,) * (n.ndim - 1))
                return jnp.where(m, n, o)

            params = jax.tree.map(sel, new_p, params)
            opt_state = jax.tree.map(sel, new_o, opt_state)
            stopped = jnp.logical_or(stopped, jnp.logical_not(ok))
            return params, opt_state, metrics, stopped

        self._update_gated = jax.jit(update_gated, donate_argnums=(0, 1))
        self._act = jax.jit(jax.vmap(act_one))
        self._act_packed = jax.jit(
            jax.vmap(act_packed_one, in_axes=(0, 0, 0, None)))
        self._act_det = jax.jit(jax.vmap(act_det_one))
        self._act_det_one = jax.jit(act_det_one)
        self._act_sample_one = jax.jit(act_sample_one)
        self._values = jax.jit(jax.vmap(values_one))
        self._update = jax.jit(jax.vmap(update_one), donate_argnums=(0, 1))
        self._epochs_update = jax.jit(epochs_update, donate_argnums=(0, 1))
        self._epochs_update_cached = jax.jit(
            epochs_update_cached, donate_argnums=(0, 1), static_argnums=(5,))
        self._prep = prep

    def _np_key(self, n: Optional[int] = None) -> np.ndarray:
        """Raw threefry key(s) drawn on the host — no device dispatch."""
        shape = (2,) if n is None else (n, 2)
        return self._np_rng.integers(0, 2 ** 32, size=shape, dtype=np.uint32)

    def _next_rng(self):
        return jnp.asarray(self._np_key())

    def _seed_keys(self, rng=None):
        return jnp.asarray(self._np_key(self.S))

    # -- rollout ---------------------------------------------------------------

    def collect_rollout(self, vec_env, obs, n_steps: int,
                        step_callback: Optional[Callable] = None):
        """vec_env has S*num_envs envs: envs [i*E .. (i+1)*E) belong to seed i."""
        S, E = self.S, self.num_envs
        cfg = self.cfg
        assert vec_env.num_envs == S * E
        obs_dtype = np.uint8 if self.is_image_obs else np.float32
        buf_obs = np.empty((n_steps, S, E) + obs.shape[1:], obs_dtype)
        buf_actions = np.empty((n_steps, S, E), np.int32)
        buf_logprobs = np.empty((n_steps, S, E), np.float32)
        buf_values = np.empty((n_steps, S, E), np.float32)
        buf_rewards = np.empty((n_steps, S, E), np.float32)
        buf_dones = np.empty((n_steps, S, E), np.float32)
        ep_infos = [[] for _ in range(S)]

        # all rollout keys drawn host-side up front AND staged to the device
        # ONCE: per env step the device interactions are ONE obs upload, ONE
        # act dispatch, ONE packed fetch (action|logprob|value in a single
        # array) — each eliminated transfer is a full transport round trip
        step_keys = self._np_key((n_steps + 1) * S).reshape(n_steps + 1, S, 2)
        keys_dev = jnp.asarray(
            np.ascontiguousarray(step_keys[:n_steps].swapaxes(0, 1)))  # (S,T,2)

        for t in range(n_steps):
            grouped = obs.reshape((S, E) + obs.shape[1:])
            packed = np.asarray(jax.device_get(self._act_packed(
                self.params, jnp.asarray(grouped), keys_dev, np.int32(t))))
            action = packed[:, 0].astype(np.int32)
            logprob, value = packed[:, 1], packed[:, 2]
            buf_obs[t] = grouped
            buf_actions[t] = action
            buf_logprobs[t] = logprob
            buf_values[t] = value
            next_obs, rewards, dones, infos = vec_env.step(action.reshape(-1))
            buf_rewards[t] = rewards.reshape(S, E)
            buf_dones[t] = dones.reshape(S, E)
            for i, info in enumerate(infos):
                if "is_success" in info and "terminal_observation" in info:
                    ep_infos[i // E].append(info)
            self.num_timesteps += S * E
            obs = next_obs
            if step_callback is not None:
                step_callback(self)

        grouped = obs.reshape((S, E) + obs.shape[1:])
        last_values = np.asarray(self._values(
            self.params, jnp.asarray(grouped),
            jnp.asarray(step_keys[n_steps])))

        advantages = np.zeros_like(buf_rewards)
        gae = np.zeros((S, E), np.float32)
        for t in reversed(range(n_steps)):
            next_v = last_values if t == n_steps - 1 else buf_values[t + 1]
            nonterminal = 1.0 - buf_dones[t]
            delta = buf_rewards[t] + cfg.gamma * next_v * nonterminal - buf_values[t]
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
            advantages[t] = gae
        returns = advantages + buf_values

        def per_seed(a):  # (n_steps, S, E, ...) -> (S, n_steps*E, ...)
            return np.ascontiguousarray(a.swapaxes(0, 1)).reshape(
                (S, n_steps * E) + a.shape[3:])

        batch = {"obs": per_seed(buf_obs), "actions": per_seed(buf_actions),
                 "logprobs": per_seed(buf_logprobs),
                 "values": per_seed(buf_values),
                 "advantages": per_seed(advantages),
                 "returns": per_seed(returns)}
        return obs, batch, ep_infos

    def collect_rollout_deep(self, vec_env, obs, n_steps: int,
                             step_callback: Optional[Callable] = None,
                             buckets: int = 8):
        """B-bucket software-pipelined rollout: envs are split into B
        buckets per seed and up to B policy dispatches ride the transport
        CONCURRENTLY (jax async dispatch; the host blocks only on the
        oldest bucket's result).  On a high-RTT transport this bounds the
        vec-step time by host work instead of the round trip — the 2-half
        variant below holds only ONE dispatch in flight and degenerates to
        ~2x the RTT per vec step when envs are few.  Trajectories are not
        bit-identical to the serial path (per-bucket rng streams), but
        per-env streams and all PPO semantics are unchanged."""
        S, E = self.S, self.num_envs
        B = buckets
        while B > 1 and E % B:
            B //= 2
        EB = E // B
        cfg = self.cfg
        assert vec_env.num_envs == S * E
        obs_dtype = np.uint8 if self.is_image_obs else np.float32
        buf_obs = np.empty((n_steps, S, E) + obs.shape[1:], obs_dtype)
        buf_actions = np.empty((n_steps, S, E), np.int32)
        buf_logprobs = np.empty((n_steps, S, E), np.float32)
        buf_values = np.empty((n_steps, S, E), np.float32)
        buf_rewards = np.empty((n_steps, S, E), np.float32)
        buf_dones = np.empty((n_steps, S, E), np.float32)
        ep_infos = [[] for _ in range(S)]

        slices = [slice(i * EB, (i + 1) * EB) for i in range(B)]
        idx = [np.array([s * E + e for s in range(S)
                         for e in range(sl.start, sl.stop)]) for sl in slices]
        grouped = obs.reshape((S, E) + obs.shape[1:])
        cur = [np.ascontiguousarray(grouped[:, sl]) for sl in slices]
        step_keys = self._np_key((n_steps + 1) * B * S).reshape(
            n_steps + 1, B, S, 2)
        inflight: list = [None] * B

        def dispatch(b, t):
            # returns immediately (async dispatch); result collected later
            inflight[b] = self._act(self.params, jnp.asarray(cur[b]),
                                    jnp.asarray(step_keys[t, b]))

        for b in range(B):
            dispatch(b, 0)
        for t in range(n_steps):
            for b in range(B):
                action, logprob, value = jax.device_get(inflight[b])
                sl = slices[b]
                buf_obs[t][:, sl] = cur[b]
                buf_actions[t][:, sl] = action
                buf_logprobs[t][:, sl] = logprob
                buf_values[t][:, sl] = value
                o, rewards, dones, infos = vec_env.step_indices(
                    idx[b], action.reshape(-1))
                cur[b] = o.reshape((S, EB) + o.shape[1:])
                buf_rewards[t][:, sl] = rewards.reshape(S, EB)
                buf_dones[t][:, sl] = dones.reshape(S, EB)
                for j, info in enumerate(infos):
                    if "is_success" in info and "terminal_observation" in info:
                        ep_infos[int(idx[b][j]) // E].append(info)
                if t + 1 < n_steps:
                    dispatch(b, t + 1)
            self.num_timesteps += S * E
            if step_callback is not None:
                step_callback(self)

        full = np.concatenate(cur, axis=1)                 # (S, E, ...)
        obs = full.reshape((S * E,) + full.shape[2:])
        last_values = np.asarray(self._values(
            self.params, jnp.asarray(full),
            jnp.asarray(step_keys[n_steps, 0])))

        advantages = np.zeros_like(buf_rewards)
        gae = np.zeros((S, E), np.float32)
        for t in reversed(range(n_steps)):
            next_v = last_values if t == n_steps - 1 else buf_values[t + 1]
            nonterminal = 1.0 - buf_dones[t]
            delta = buf_rewards[t] + cfg.gamma * next_v * nonterminal - buf_values[t]
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
            advantages[t] = gae
        returns = advantages + buf_values

        def per_seed(a):
            return np.ascontiguousarray(a.swapaxes(0, 1)).reshape(
                (S, n_steps * E) + a.shape[3:])

        batch = {"obs": per_seed(buf_obs), "actions": per_seed(buf_actions),
                 "logprobs": per_seed(buf_logprobs),
                 "values": per_seed(buf_values),
                 "advantages": per_seed(advantages),
                 "returns": per_seed(returns)}
        return obs, batch, ep_infos

    def collect_rollout_pipelined(self, vec_env, obs, n_steps: int,
                                  step_callback: Optional[Callable] = None):
        """Double-buffered variant of collect_rollout: envs are split into
        two halves per seed; while half X's policy call is in flight over the
        transport, half Y's envs step on the host.  Trajectories are NOT
        bit-identical to the serial path (each half draws from its own key),
        but per-env streams and all PPO semantics are unchanged."""
        S, E = self.S, self.num_envs
        E2 = E // 2
        cfg = self.cfg
        assert vec_env.num_envs == S * E and E % 2 == 0
        obs_dtype = np.uint8 if self.is_image_obs else np.float32
        buf_obs = np.empty((n_steps, S, E) + obs.shape[1:], obs_dtype)
        buf_actions = np.empty((n_steps, S, E), np.int32)
        buf_logprobs = np.empty((n_steps, S, E), np.float32)
        buf_values = np.empty((n_steps, S, E), np.float32)
        buf_rewards = np.empty((n_steps, S, E), np.float32)
        buf_dones = np.empty((n_steps, S, E), np.float32)
        ep_infos = [[] for _ in range(S)]

        halves = (slice(0, E2), slice(E2, E))
        idx = [np.array([s * E + e for s in range(S)
                         for e in range(h.start, h.stop)]) for h in halves]
        grouped = obs.reshape((S, E) + obs.shape[1:])
        cur = [np.ascontiguousarray(grouped[:, h]) for h in halves]  # (S,E2,..)
        step_keys = self._np_key((n_steps + 1) * 2 * S).reshape(
            n_steps + 1, 2, S, 2)

        def dispatch(h, t):
            return self._act(self.params, jnp.asarray(cur[h]),
                             jnp.asarray(step_keys[t, h]))

        def record_act(h, t, outs):
            action, logprob, value = jax.device_get(outs)
            buf_obs[t][:, halves[h]] = cur[h]
            buf_actions[t][:, halves[h]] = action
            buf_logprobs[t][:, halves[h]] = logprob
            buf_values[t][:, halves[h]] = value
            return action

        def step_half(h, t, action):
            o, rewards, dones, infos = vec_env.step_indices(
                idx[h], action.reshape(-1))
            cur[h] = o.reshape((S, E2) + o.shape[1:])
            buf_rewards[t][:, halves[h]] = rewards.reshape(S, E2)
            buf_dones[t][:, halves[h]] = dones.reshape(S, E2)
            for j, info in enumerate(infos):
                if "is_success" in info and "terminal_observation" in info:
                    ep_infos[int(idx[h][j]) // E].append(info)

        inflight_a = dispatch(0, 0)
        for t in range(n_steps):
            act_a = record_act(0, t, inflight_a)
            inflight_b = dispatch(1, t)
            step_half(0, t, act_a)          # overlaps half-B's round trip
            act_b = record_act(1, t, inflight_b)
            if t + 1 < n_steps:
                inflight_a = dispatch(0, t + 1)
            step_half(1, t, act_b)          # overlaps half-A's round trip
            self.num_timesteps += S * E
            if step_callback is not None:
                step_callback(self)

        full = np.concatenate(cur, axis=1)                 # (S, E, ...)
        obs = full.reshape((S * E,) + full.shape[2:])
        last_values = np.asarray(self._values(
            self.params, jnp.asarray(full),
            jnp.asarray(step_keys[n_steps, 0])))

        advantages = np.zeros_like(buf_rewards)
        gae = np.zeros((S, E), np.float32)
        for t in reversed(range(n_steps)):
            next_v = last_values if t == n_steps - 1 else buf_values[t + 1]
            nonterminal = 1.0 - buf_dones[t]
            delta = buf_rewards[t] + cfg.gamma * next_v * nonterminal - buf_values[t]
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
            advantages[t] = gae
        returns = advantages + buf_values

        def per_seed(a):
            return np.ascontiguousarray(a.swapaxes(0, 1)).reshape(
                (S, n_steps * E) + a.shape[3:])

        batch = {"obs": per_seed(buf_obs), "actions": per_seed(buf_actions),
                 "logprobs": per_seed(buf_logprobs),
                 "values": per_seed(buf_values),
                 "advantages": per_seed(advantages),
                 "returns": per_seed(returns)}
        return obs, batch, ep_infos

    # -- updates ---------------------------------------------------------------

    def train_on_rollout(self, batch: dict) -> dict:
        cfg, S = self.cfg, self.S
        n = batch["obs"].shape[1]
        data = {k: jnp.asarray(v) for k, v in batch.items()}
        rng_np = self._np_rng
        if n % cfg.batch_size == 0:
            # one dispatch for the whole update phase: precompute the
            # per-epoch per-seed minibatch schedule and scan it on device
            n_mb = n // cfg.batch_size
            perm_idx = np.stack([
                np.stack([rng_np.permutation(n) for _ in range(S)])
                for _ in range(cfg.n_epochs)])          # (E, S, n)
            perm_idx = perm_idx.reshape(
                cfg.n_epochs, S, n_mb, cfg.batch_size).swapaxes(1, 2).reshape(
                cfg.n_epochs * n_mb, S, cfg.batch_size)
            chunk = _encode_chunk(n) if self.cache_reps else 0
            if chunk:
                self.params, self.opt_state, metrics = \
                    self._epochs_update_cached(
                        self.params, self.opt_state, data,
                        jnp.asarray(perm_idx, jnp.int32), self._next_rng(),
                        chunk)
            else:
                self.params, self.opt_state, metrics = self._epochs_update(
                    self.params, self.opt_state, data,
                    jnp.asarray(perm_idx, jnp.int32), self._next_rng())
            return {k: np.asarray(v) for k, v in metrics.items()}
        metrics = {}
        stopped = jnp.zeros((S,), bool)
        for _ in range(cfg.n_epochs):
            perms = np.stack([rng_np.permutation(n) for _ in range(S)])
            for start in range(0, n, cfg.batch_size):
                idx = jnp.asarray(perms[:, start:start + cfg.batch_size])
                if cfg.target_kl is not None:
                    (self.params, self.opt_state, metrics,
                     stopped) = self._update_gated(
                        self.params, self.opt_state, data, idx,
                        self._seed_keys(self._next_rng()), stopped)
                    if bool(np.all(np.asarray(stopped))):
                        break
                else:
                    self.params, self.opt_state, metrics = self._update(
                        self.params, self.opt_state, data, idx,
                        self._seed_keys(self._next_rng()))
            if cfg.target_kl is not None and bool(np.all(np.asarray(stopped))):
                break
        return {k: np.asarray(v) for k, v in metrics.items()}  # (S,) per key

    def learn(self, vec_env, total_timesteps: int,
              iteration_callback: Optional[Callable] = None,
              step_callback: Optional[Callable] = None):
        obs = vec_env.reset()
        n_steps = max(self.cfg.n_steps // self.num_envs, 1)
        collect = (self.collect_rollout_deep if self.pipeline
                   else self.collect_rollout)
        while self.num_timesteps < total_timesteps * self.S:
            obs, batch, ep_infos = collect(
                vec_env, obs, n_steps, step_callback)
            metrics = self.train_on_rollout(batch)
            if iteration_callback is not None:
                iteration_callback(self, metrics, ep_infos)
        return self

    # -- per-seed views (eval / checkpointing) ---------------------------------

    def seed_view(self, i: int) -> "_SeedView":
        return _SeedView(self, i)

    def save(self) -> dict:
        return {"policy_params": self.params, "opt_state": self.opt_state,
                "num_timesteps": self.num_timesteps, "seeds": self.seeds}

    def load(self, ckpt: dict) -> None:
        saved = [int(s) for s in ckpt.get("seeds", self.seeds)]
        if saved != self.seeds:
            raise ValueError(
                f"checkpoint was trained with seeds={saved} but this run has "
                f"seeds={self.seeds} — per-seed params would be misattributed")
        self.params = ckpt["policy_params"]
        if "opt_state" in ckpt:
            self.opt_state = ckpt["opt_state"]
        self.num_timesteps = int(ckpt.get("num_timesteps", 0))

    # -- batched cross-seed evaluation ----------------------------------------

    def evaluate_all(self, env, n_episodes: int = 100,
                     deterministic: bool = False) -> list:
        """Evaluate EVERY seed at once on a multi-seed vec env (layout: envs
        [i*E, (i+1)*E) belong to seed i) — one vmapped policy call steps all
        seeds' eval episodes, so an S-seed eval costs the round trips of a
        single-seed one.  The reference evaluates stochastically
        (EvalCallback deterministic=False); SB3 per-env episode-count
        semantics as in evaluate.py."""
        S = self.S
        assert env.num_envs % S == 0
        E = env.num_envs // S
        targets = np.array([n_episodes // E + (1 if i < n_episodes % E else 0)
                            for i in range(E)])
        counts = np.zeros((S, E), np.int64)
        ep_return = np.zeros((S, E), np.float64)
        ep_len = np.zeros((S, E), np.int64)
        per_seed = [{"successes": [], "returns": [], "lengths": []}
                    for _ in range(S)]
        obs = env.reset()
        act_fn = self._act_det if deterministic else self._act
        while (counts < targets[None, :]).any():
            grouped = obs.reshape((S, E) + obs.shape[1:])
            out = act_fn(self.params, jnp.asarray(grouped),
                         jnp.asarray(self._np_key(S)))
            actions = np.asarray(out[0] if isinstance(out, tuple) else out)
            obs, rewards, dones, infos = env.step(actions.reshape(-1))
            ep_return += rewards.reshape(S, E)
            ep_len += 1
            for flat in np.nonzero(dones)[0]:
                s, i = divmod(int(flat), E)
                if counts[s, i] < targets[i]:
                    counts[s, i] += 1
                    acc = per_seed[s]
                    acc["returns"].append(ep_return[s, i])
                    acc["lengths"].append(ep_len[s, i])
                    acc["successes"].append(
                        float(infos[flat].get("is_success", False)))
                ep_return[s, i] = 0.0
                ep_len[s, i] = 0
        return [{"success_rate": float(np.mean(a["successes"])),
                 "mean_reward": float(np.mean(a["returns"])),
                 "mean_ep_length": float(np.mean(a["lengths"]))}
                for a in per_seed]


class _SeedView:
    """predict() facade for one seed of a MultiSeedPPO (used by the
    vectorised evaluator and test_sb3)."""

    def __init__(self, algo: MultiSeedPPO, i: int):
        self._algo = algo
        self._i = i
        self.obs_shape = algo.obs_shape

    def predict(self, obs, deterministic: bool = True):
        algo, i = self._algo, self._i
        obs = jnp.asarray(np.asarray(obs))
        squeeze = obs.ndim == len(algo.obs_shape)
        if squeeze:
            obs = obs[None]
        params_i = jax.tree.map(lambda x: x[i], algo.params)
        # the reference evaluates stochastically (EvalCallback
        # deterministic=False) — honor the flag rather than always argmaxing
        fn = algo._act_det_one if deterministic else algo._act_sample_one
        action = np.asarray(fn(params_i, obs, algo._next_rng()))
        return action[0] if squeeze else action
