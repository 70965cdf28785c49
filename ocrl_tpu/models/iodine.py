"""IODINE: iterative amortized variational inference
(reference: ocrs/iodine/iodine_module.py).

TPU-native structure: the refinement loop is a ``lax.scan`` whose body takes
gradients of the ELBO w.r.t. posterior parameters / reconstructions / masks
with inner ``jax.grad`` calls.  The reference detaches those gradients
immediately (iodine_module.py:138-143), so they are ``stop_gradient``-ed here
and the outer loss is first-order — and unlike torch (which needs
``torch.enable_grad`` and cannot use ``no_grad`` at eval,
reference: train_ocr.py:73), the same jitted function serves train and eval.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..utils.metrics import calculate_ari
from ..utils.viz import for_viz, visualize
from .base import ModelSpec


class MultiLayerConv(nn.Module):
    """ELU conv stack (reference: iodine_module.py:498-531)."""

    features: int
    n_layers: int
    kernel_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        for _ in range(self.n_layers):
            x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                        strides=self.stride,
                        padding=[(pad, pad), (pad, pad)])(x)
            x = nn.elu(x)
        return x


class Decoder(nn.Module):
    """Spatial-broadcast decoder -> RGB + mask logit per slot
    (reference: iodine_module.py:333-368)."""

    dim_hidden: int
    n_layers: int
    kernel_size: int
    img_size: int

    @nn.compact
    def __call__(self, slots):
        """slots: [B,K,L] -> (recons [B,K,H,W,3], mask_logits [B,K,H,W,1]).

        The first conv's input is `concat(broadcast(slot), coords)` — the
        slot half is spatially constant per (b,k) and the coord half is
        shared across (b,k) — so by linearity it is evaluated EXACTLY as
        conv1(slot-part on a (2p+1)^2 grid, tiled) + conv1(coord-part, once)
        - bias, skipping the [B*K,H,W,L] broadcast activation and its
        full-resolution conv (same restructure as the SLATE broadcast
        decoder; reference semantics iodine_module.py:333-368 unchanged —
        IODINE re-decodes 5x per step with second-order autodiff, so this
        activation would otherwise be materialised and re-read many times)."""
        B, K, L = slots.shape
        H = W = self.img_size
        pad = self.kernel_size // 2
        conv1 = nn.Conv(self.dim_hidden, (self.kernel_size, self.kernel_size),
                        padding=[(pad, pad), (pad, pad)])
        g = 2 * pad + 1
        small = conv1(jnp.concatenate([
            jnp.broadcast_to(slots.reshape(B * K, 1, 1, L), (B * K, g, g, L)),
            jnp.zeros((B * K, g, g, 2), slots.dtype)], axis=-1))
        yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                              indexing="ij")
        coords = jnp.stack([xx, yy], -1)[None]                    # [1,H,W,2]
        coordc = conv1(jnp.concatenate(
            [jnp.zeros((1, H, W, L), slots.dtype), coords], axis=-1))
        bias = conv1(jnp.zeros((1, 1, 1, L + 2), slots.dtype))
        idx = jnp.concatenate([jnp.arange(pad), jnp.full((H - 2 * pad,), pad),
                               jnp.arange(pad + 1, 2 * pad + 1)]).astype(jnp.int32)
        x = nn.elu(small[:, idx][:, :, idx] + coordc - bias)
        if self.n_layers > 1:
            x = MultiLayerConv(self.dim_hidden, self.n_layers - 1,
                               self.kernel_size)(x)
        x = nn.Conv(4, (self.kernel_size, self.kernel_size),
                    padding=[(pad, pad), (pad, pad)])(x)
        recons = x[..., :3].reshape(B, K, H, W, 3)
        mask_logits = x[..., 3:].reshape(B, K, H, W, 1)
        return recons, mask_logits


class RefinementNetwork(nn.Module):
    """conv -> pool -> MLP -> LSTM -> posterior deltas
    (reference: iodine_module.py:371-429)."""

    dim_conv: int
    dim_hidden: int
    dim_out: int
    n_layers: int
    kernel_size: int
    stride: int

    def setup(self):
        self.mlc = MultiLayerConv(self.dim_conv, self.n_layers,
                                  self.kernel_size, self.stride)
        self.mlp = nn.Dense(self.dim_hidden)
        self.lstm = nn.OptimizedLSTMCell(self.dim_hidden)
        self.mean_update = nn.Dense(self.dim_out)
        self.logsig_update = nn.Dense(self.dim_out)

    def __call__(self, x, latent, lstm_state):
        """x: [B,K,H,W,D], latent: [B,K,4L], lstm_state: ((c,h) each [B*K,hid])."""
        B, K = x.shape[:2]
        x = x.reshape((B * K,) + x.shape[2:])
        x = self.mlc(x)
        x = x.mean(axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.elu(self.mlp(x))
        x = jnp.concatenate([x, latent.reshape(B * K, -1)], axis=-1)
        lstm_state, h = self.lstm(lstm_state, x)
        mean_delta = self.mean_update(h).reshape(B, K, -1)
        logsig_delta = self.logsig_update(h).reshape(B, K, -1)
        return mean_delta, logsig_delta, lstm_state

    def init_state(self, batch_k: int):
        zeros = jnp.zeros((batch_k, self.dim_hidden))
        return (zeros, zeros)


def _kl_std_normal(mean, log_sigma):
    """KL(N(mean, sigma) || N(0,1)) elementwise."""
    var = jnp.exp(2 * log_sigma)
    return 0.5 * (mean ** 2 + var - 1.0) - log_sigma


def _gaussian_log_prob(value, mean, sigma: float):
    var = sigma ** 2
    return -0.5 * (((value - mean) ** 2) / var + math.log(var) + math.log(2 * math.pi))


def _layernorm_stat(x):
    """Per-slot stats normalisation of refinement inputs
    (reference: iodine_module.py:307-330)."""
    if x.ndim == 3:  # [B,K,L]
        mu = x.mean(axis=2, keepdims=True)
        std = x.std(axis=2, keepdims=True, ddof=1)
    else:  # [B,K,H,W,C]
        mu = x.mean(axis=(2, 3, 4), keepdims=True)
        std = jnp.sqrt(((x - mu) ** 2).mean(axis=(2, 3, 4), keepdims=True))
    return (x - mu) / (std + 1e-5)


class Iodine_Module(nn.Module):
    ocr_config: dict
    env_config: dict

    def setup(self):
        ocr = self.ocr_config
        self.slot_size = ocr.slot_size
        self.num_iterations = ocr.num_iterations
        self.num_slots = ocr.num_slots
        self.img_size = self.env_config.obs_size
        self.beta = ocr.beta
        self.sigma = ocr.sigma
        self.use_layernorm = ocr.layer_norm

        self.refine = RefinementNetwork(
            dim_conv=ocr.ref_cnn_hidden_size,
            dim_hidden=ocr.ref_mlp_hidden_size,
            dim_out=ocr.slot_size,
            n_layers=ocr.ref_cnn_layers,
            kernel_size=ocr.ref_cnn_kernel_size,
            stride=ocr.ref_cnn_stride_size,
        )
        self.decoder = Decoder(
            dim_hidden=ocr.dec_cnn_hidden_size,
            n_layers=ocr.dec_cnn_layers,
            kernel_size=ocr.dec_cnn_kernel_size,
            img_size=self.img_size,
        )
        self.slot_mean_init = self.param(
            "slot_mean_init", nn.initializers.zeros, (1, 1, self.slot_size))
        self.slot_logsig_init = self.param(
            "slot_logsig_init", nn.initializers.zeros, (1, 1, self.slot_size))

    # -- the refinement loop ------------------------------------------------------

    def _elbo_parts(self, image, means, logsigs, eps):
        """Everything the iteration needs, as a function of the posterior."""
        slots = means + jnp.exp(logsigs) * eps  # rsample
        recons, mask_logits = self.decoder(slots)
        masks = jax.nn.softmax(mask_logits, axis=1)
        return slots, recons, mask_logits, masks

    def _iteration_quantities(self, image, means, logsigs, eps):
        B = image.shape[0]
        slots, recons, mask_logits, masks = self._elbo_parts(image, means, logsigs, eps)

        def elbo_fn(means_, logsigs_, recons_, masks_):
            kl = _kl_std_normal(means_, logsigs_).sum() / B
            # log N(image | recons, sigma) per component
            comp_lp = _gaussian_log_prob(image[:, None], recons_, self.sigma)
            pixel_ll = jax.scipy.special.logsumexp(
                jnp.log(masks_ + 1e-12) + comp_lp, axis=1, keepdims=True)
            log_likelihood = pixel_ll.sum() / B
            return log_likelihood - self.beta * kl, (pixel_ll, comp_lp)

        # grads w.r.t. posterior params flow through decoder+rsample (recons
        # treated as function of means), grads w.r.t. recons/masks are direct.
        def elbo_wrt_post(m, ls):
            slots_, recons_, _, masks_ = self._elbo_parts(image, m, ls, eps)
            return elbo_fn(m, ls, recons_, masks_)[0]

        def elbo_wrt_maps(r, mk):
            return elbo_fn(means, logsigs, r, mk)[0]

        elbo, (pixel_ll, comp_lp) = elbo_fn(means, logsigs, recons, masks)
        return slots, recons, mask_logits, masks, elbo, pixel_ll, comp_lp, \
            elbo_wrt_post, elbo_wrt_maps

    def _build_encoding(self, image, recons, masks, mask_logits, comp_lp,
                        pixel_ll, recons_grad, masks_grad):
        """12-group refinement input (reference: iodine_module.py:145-229)."""
        B, K = recons.shape[:2]
        H = W = self.img_size
        ln = _layernorm_stat if self.use_layernorm else (lambda x: x)
        parts = []
        parts.append(jnp.broadcast_to(image[:, None], (B, K, H, W, 3)))      # image
        parts.append(recons)                                                  # means
        parts.append(masks)                                                   # mask
        parts.append(mask_logits)                                             # mask_logits
        comp_sum = comp_lp.sum(axis=-1, keepdims=True)                        # [B,K,H,W,1]
        parts.append(jax.nn.log_softmax(comp_sum, axis=1))                    # mask_posterior
        parts.append(ln(recons_grad))                                         # grad_means
        parts.append(ln(masks_grad))                                          # grad_mask
        a_ll = jnp.exp(pixel_ll.sum(axis=-1, keepdims=True))                  # [B,1,H,W,1]
        a_ll = jnp.broadcast_to(a_ll, (B, K, H, W, 1))
        parts.append(jax.lax.stop_gradient(ln(a_ll)))                         # likelihood
        comp_probs = jnp.exp(comp_sum)
        weighted = (masks * comp_probs).sum(axis=1, keepdims=True)
        leave_one_out = (weighted - masks * comp_probs) / (1 - masks + 1e-5)
        parts.append(jax.lax.stop_gradient(ln(leave_one_out)))                # loo likelihood
        yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                              indexing="ij")
        coords = jnp.broadcast_to(jnp.stack([xx, yy], -1)[None, None],
                                  (B, K, H, W, 2))
        parts.append(coords)                                                  # coordinate
        return jnp.concatenate(parts, axis=-1)

    def _forward(self, image, rng):
        B = image.shape[0]
        K, L = self.num_slots, self.slot_size
        means = jnp.broadcast_to(self.slot_mean_init, (B, K, L))
        logsigs = jnp.broadcast_to(self.slot_logsig_init, (B, K, L))
        lstm_state = self.refine.init_state(B * K)
        eps_all = jax.random.normal(rng, (self.num_iterations, B, K, L))

        def body(mdl, carry, eps):
            means, logsigs, lstm_state = carry
            (slots, recons, mask_logits, masks, elbo, pixel_ll, comp_lp,
             elbo_wrt_post, elbo_wrt_maps) = mdl._iteration_quantities(
                image, means, logsigs, eps)

            # gradient-based refinement inputs, detached like the reference
            g_means, g_logsigs = jax.grad(
                lambda m, ls: B * elbo_wrt_post(m, ls), argnums=(0, 1))(means, logsigs)
            g_recons, g_masks = jax.grad(
                lambda r, mk: B * elbo_wrt_maps(r, mk), argnums=(0, 1))(recons, masks)
            g_means, g_logsigs, g_recons, g_masks = map(
                jax.lax.stop_gradient, (g_means, g_logsigs, g_recons, g_masks))

            ln = _layernorm_stat if mdl.use_layernorm else (lambda x: x)
            latent = jnp.concatenate(
                [means, logsigs, ln(g_means), ln(g_logsigs)], axis=-1)
            encoding = mdl._build_encoding(
                image, recons, masks, mask_logits, comp_lp, pixel_ll,
                g_recons, g_masks)
            mean_delta, logsig_delta, lstm_state = mdl.refine(
                encoding, latent, lstm_state)
            new_carry = (means + mean_delta, logsigs + logsig_delta, lstm_state)
            return new_carry, (elbo, slots, recons, masks)

        (means, logsigs, _), (elbos, slots_seq, recons_seq, masks_seq) = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
        )(self, (means, logsigs, lstm_state), eps_all)

        # iteration-weighted loss: sum_i (i+1)/N * (-elbo_i)
        # (reference: iodine_module.py:238-240)
        N = self.num_iterations
        weights = (jnp.arange(N) + 1) / N
        loss = -(weights * elbos).sum()

        slots = slots_seq[-1]
        recons = recons_seq[-1]
        masks = masks_seq[-1]
        recon = jnp.clip((masks * recons).sum(axis=1), 0.0, 1.0)
        mse = jnp.sum((image - (masks * recons).sum(axis=1)) ** 2) / B
        kl = _kl_std_normal(means, logsigs).sum() / B
        return slots, recon, masks, loss, mse, kl, jnp.clip(recons, 0.0, 1.0)

    # -- API ------------------------------------------------------------------------

    def __call__(self, obs, with_masks=False):
        slots, recon, masks, *_ = self._forward(obs, self.make_rng("noise"))
        if with_masks:
            return slots, masks
        return slots

    def loss(self, obs, masks=None, step=0, train=False):
        del step, train
        _, _, attns, loss, mse, kl, _ = self._forward(obs, self.make_rng("noise"))
        metrics = {"loss": loss, "mse": mse, "kld": kl}
        if masks is not None:
            fg = 1.0 - masks[:, -1:]
            pred = jnp.concatenate([attns * fg, fg], axis=1)
            metrics["ari"] = jnp.mean(calculate_ari(masks, pred))
        return loss, metrics

    def sample_arrays(self, obs):
        slots, recon, masks, loss, mse, kl, recons = self._forward(
            obs, self.make_rng("noise"))
        masked = jnp.clip(recons * masks, 0.0, 1.0)
        return obs, recon, masked, jnp.repeat(masks, 3, axis=-1), recons

    @staticmethod
    def samples_grid(obs, recon, masked, masks3, recons) -> dict:
        return {"samples": for_viz(visualize([obs, recon, masked, masks3, recons]))}


def dims(ocr_config, env_config) -> tuple[int, int]:
    return ocr_config.slot_size, ocr_config.num_slots


def build_spec(ocr_config, env_config) -> ModelSpec:
    rep_dim, num_slots = dims(ocr_config, env_config)
    lr = ocr_config.learning
    return ModelSpec(
        name="Iodine",
        module=Iodine_Module(ocr_config, env_config),
        rep_dim=rep_dim, num_slots=num_slots,
        optimizer=optax.adam(lr.lr),
        obs_shape=(env_config.obs_size, env_config.obs_size, env_config.obs_channels),
        clip=lr.get("clip"), clip_ord=float(lr.get("clip_norm_type", 2.0)),
        rng_streams=("noise",),
        uses_masks=True,
    )
