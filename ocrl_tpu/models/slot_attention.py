"""Slot Attention (reference: ocrs/common/slot_attn.py).

The iterative routing loop runs under ``lax.scan`` (K/V projected once,
iterations share weights), keeping the whole encoder a single fused XLA
computation.  Softmax is taken jointly over heads x slots — the inverted
"competition among slots" direction — then renormalised over inputs, exactly
as the reference (slot_attn.py:75-87), which is the subtle part flagged in
SURVEY.md §7 ("hard parts").
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import FusedGRUCell, linear, xavier_uniform


class SlotAttention(nn.Module):
    """reference: slot_attn.py:9-102."""

    num_iterations: int
    num_slots: int
    input_size: int
    slot_size: int
    mlp_hidden_size: int
    num_heads: int
    epsilon: float = 1e-8
    # chunked Pallas routing sweep (ops/slot_routing.py): "auto" uses it
    # whenever eligible (single head, N divisible by a power-of-two chunk);
    # "always" asserts eligibility; "never" (default) keeps the pure-jnp
    # einsum path.  The sweep streams k/v from HBM in [chunk, D] tiles, so
    # VMEM use is independent of N (round 2's whole-N kernel OOM'd at
    # N=4096); it is nevertheless DEFAULT-OFF on measurement: XLA fuses the
    # slot-softmax chain into the surrounding matmuls better than the
    # hand-split kernel boundary allows (1855 vs 1482 imgs/s fixed-batch on
    # the full SLATE step, v5e, see docs/PARITY.md round 3).
    fused: str = "never"

    def setup(self):
        self.norm_inputs = nn.LayerNorm()
        self.norm_slots = nn.LayerNorm()
        self.norm_mlp = nn.LayerNorm()
        self.project_q = linear(self.slot_size, bias=False)
        self.project_k = linear(self.slot_size, bias=False)
        self.project_v = linear(self.slot_size, bias=False)
        self.gru = FusedGRUCell(self.slot_size)
        self.mlp = nn.Sequential([
            linear(self.mlp_hidden_size, weight_init="kaiming"),
            nn.relu,
            linear(self.slot_size),
        ])

    def __call__(self, inputs, slots):
        """inputs: [B, N_kv, D_in]; slots: [B, N_q, D_slot] initial slots.

        k/v keep their natural [B, N, H, hd] layout — no materialised head
        transposes of the (large) token tensors; einsums contract in place.
        """
        B, N_kv, _ = inputs.shape
        N_q, H = self.num_slots, self.num_heads
        hd = self.slot_size // H

        inputs = self.norm_inputs(inputs)
        k = self.project_k(inputs).reshape(B, N_kv, H, hd) * hd ** -0.5
        v = self.project_v(inputs).reshape(B, N_kv, H, hd)

        from ocrl_tpu.ops.slot_routing import pick_chunk, route_sweep

        chunk = pick_chunk(N_kv)
        use_fused = (H == 1 and chunk > 0 and not self.is_initializing()
                     and self.fused in ("auto", "always"))
        if self.fused == "always" and not use_fused and not self.is_initializing():
            raise ValueError(
                f"fused=always but routing is ineligible (heads={H}, "
                f"N={N_kv}, chunk={chunk})")
        if use_fused:
            # the sweep only needs sum_n v once for the epsilon shift:
            # upd = (a^T v + eps * v_sum) / (sum_n a + N * eps)
            v_sum = v.reshape(B, N_kv, self.slot_size).sum(axis=1)  # [B, D]

        def iteration(mdl, slots):
            slots_prev = slots
            normed = mdl.norm_slots(slots)
            q = mdl.project_q(normed).reshape(B, N_q, H, hd)
            if use_fused:
                # Pallas chunk sweep for the token-dimension reductions; the
                # renorm stays in jnp so the sweep's VJP is one pass
                sa, av, attn_vis = route_sweep(
                    chunk, k.reshape(B, N_kv, hd), v.reshape(B, N_kv, hd),
                    q.reshape(B, N_q, hd))
                denom = sa + N_kv * self.epsilon                   # [B,S]
                updates = (av + self.epsilon * v_sum[:, None, :]) \
                    / denom[..., None]                             # [B,S,D]
            else:
                # logits over (input, head, slot)
                attn_logits = jnp.einsum("bnhd,bshd->bnhs", k, q)
                # softmax jointly over heads*slots (competition among slots)
                attn = jax.nn.softmax(
                    attn_logits.reshape(B, N_kv, H * N_q), axis=-1)
                attn = attn.reshape(B, N_kv, H, N_q)
                attn_vis = attn.sum(2)  # [B,N_kv,N_q]
                # weighted mean over inputs
                attn = attn + self.epsilon
                attn = attn / jnp.sum(attn, axis=1, keepdims=True)
                updates = jnp.einsum("bnhs,bnhd->bshd", attn, v)
                updates = updates.reshape(B, N_q, self.slot_size)
            # GRU update + residual MLP
            _, slots = mdl.gru(slots_prev.reshape(-1, mdl.slot_size),
                               updates.reshape(-1, mdl.slot_size))
            slots = slots.reshape(B, N_q, mdl.slot_size)
            slots = slots + mdl.mlp(mdl.norm_mlp(slots))
            return slots, attn_vis

        # Unrolled Python loop: num_iterations is tiny and static (3), and a
        # lifted nn.scan here compiled ~40x slower at runtime (the scan
        # boundary blocks XLA fusion of the routing with its neighbours).
        attn_vis = None
        for _ in range(self.num_iterations):
            slots, attn_vis = iteration(self, slots)
        return slots, attn_vis


class SlotAttentionEncoder(nn.Module):
    """Feature-map -> slots (reference: slot_attn.py:105-161).

    Slot initialisation is sampled from a learned (mu, log_sigma) gaussian at
    every call, train and eval alike, via the 'noise' rng stream.
    """

    num_iterations: int
    num_slots: int
    input_channels: int
    slot_size: int
    mlp_hidden_size: int
    num_heads: int
    fused: str = "never"

    def setup(self):
        self.layer_norm = nn.LayerNorm()
        self.mlp = nn.Sequential([
            linear(self.input_channels, weight_init="kaiming"),
            nn.relu,
            linear(self.input_channels),
        ])
        self.slot_mu = self.param("slot_mu", xavier_uniform(),
                                  (1, 1, self.slot_size))
        self.slot_log_sigma = self.param("slot_log_sigma", xavier_uniform(),
                                         (1, 1, self.slot_size))
        self.slot_attention = SlotAttention(
            self.num_iterations, self.num_slots, self.input_channels,
            self.slot_size, self.mlp_hidden_size, self.num_heads,
            fused=self.fused)

    def __call__(self, x):
        """x: [B, N, input_channels] flattened feature map."""
        B = x.shape[0]
        x = self.mlp(self.layer_norm(x))
        noise = jax.random.normal(self.make_rng("noise"),
                                  (B, self.num_slots, self.slot_size), x.dtype)
        slots = self.slot_mu + jnp.exp(self.slot_log_sigma) * noise
        return self.slot_attention(x, slots)
