"""Mixture-of-Experts FFN with expert parallelism — the Swin-MoE layer.

The reference's Swin-MoE uses tutel's CUDA ``moe_layer`` (reference:
mvuld/models/swin_transformer_moe.py:17,71-87; selectable via
MODEL.TYPE='swin_moe' but unused in the paper pipeline). TPU-native
equivalent: dense top-k gating with capacity dropping, experts laid out as a
leading axis that shards over the mesh's "mp" axis (expert parallelism via
jax.sharding constraints — XLA inserts the all-to-alls).

Implements the config surface the reference exposes: TOP_VALUE (top-1/2),
CAPACITY_FACTOR, NUM_LOCAL_EXPERTS, gate noise, and the load-balancing aux
loss (GShard-style) with AUX_LOSS_WEIGHT.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoEFFN(nn.Module):
    """MoE feed-forward: gate → dispatch (capacity-dropped) → expert MLPs →
    combine. Expert weights have shape [E, ...]; shard the leading axis over
    the mesh "mp" axis for expert parallelism."""

    hidden: int
    out: int
    num_experts: int = 4
    top_k: int = 1
    capacity_factor: float = 1.25
    gate_noise: float = 1.0
    aux_weight: float = 0.01
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        orig_shape = x.shape
        D = orig_shape[-1]
        tokens = x.reshape(-1, D)                      # [T, D]
        T = tokens.shape[0]
        E = self.num_experts
        C = max(int(self.capacity_factor * self.top_k * T / E), 1)

        gate_w = self.param("gate", nn.initializers.lecun_normal(), (D, E))
        logits = (tokens @ gate_w).astype(jnp.float32)           # [T, E]
        if not deterministic and self.gate_noise > 0:
            noise = jax.random.normal(self.make_rng("dropout"), logits.shape)
            logits = logits + noise * self.gate_noise / E
        probs = jax.nn.softmax(logits, axis=-1)

        # load-balance aux loss (GShard): E * Σ_e mean(probs_e) * mean(mask_e)
        top1 = jnp.argmax(probs, axis=-1)
        me = probs.mean(axis=0)
        ce = jax.nn.one_hot(top1, E).mean(axis=0)
        aux = self.aux_weight * E * jnp.sum(me * ce)

        # top-k dispatch with per-expert capacity. Pass-k slot counters are
        # offset by the per-expert assignment counts of earlier passes
        # (GShard top-2 gating) so 1st- and 2nd-choice tokens never collide
        # in the same (expert, slot).
        topk_p, topk_e = jax.lax.top_k(probs, self.top_k)        # [T, K]
        combine = jnp.zeros((T, E, C), probs.dtype)
        dispatch = jnp.zeros((T, E, C), bool)
        prior_counts = jnp.zeros((E,), jnp.int32)                 # from passes <k
        for k in range(self.top_k):
            e_k = topk_e[:, k]                                    # [T]
            onehot = jax.nn.one_hot(e_k, E, dtype=jnp.int32)      # [T, E]
            pos = jnp.cumsum(onehot, axis=0) * onehot - 1         # slot per token
            slot = (pos * onehot).sum(axis=-1) + prior_counts[e_k]  # [T]
            keep = slot < C
            prior_counts = prior_counts + onehot.sum(axis=0)
            w = topk_p[:, k] * keep
            combine = combine + (jax.nn.one_hot(e_k, E)[..., None]
                                 * jax.nn.one_hot(jnp.clip(slot, 0, C - 1), C)[:, None, :]
                                 * w[:, None, None])
            dispatch = dispatch | ((jax.nn.one_hot(e_k, E, dtype=bool)[..., None])
                                   & (jax.nn.one_hot(jnp.clip(slot, 0, C - 1), C,
                                                     dtype=bool)[:, None, :])
                                   & keep[:, None, None])

        # expert inputs [E, C, D]
        xe = jnp.einsum("tec,td->ecd", dispatch.astype(tokens.dtype), tokens)
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (E, D, self.hidden))
        b1 = self.param("b1", nn.initializers.zeros, (E, 1, self.hidden))
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (E, self.hidden, self.out))
        b2 = self.param("b2", nn.initializers.zeros, (E, 1, self.out))
        h = jnp.einsum("ecd,edh->ech", xe.astype(self.dtype),
                       w1.astype(self.dtype)) + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.drop)(h, deterministic=deterministic)
        ye = jnp.einsum("ech,eho->eco", h, w2.astype(self.dtype)) + b2.astype(self.dtype)

        y = jnp.einsum("tec,eco->to", combine.astype(ye.dtype), ye)
        return y.reshape(orig_shape[:-1] + (self.out,)), aux


def make_moe_mlp_layer(num_experts: int, top_k: int, capacity_factor: float,
                       gate_noise: float, aux_weight: float):
    """Adapter matching SwinBlockV1's ``mlp_layer(hidden, out, drop, dtype,
    name)`` constructor signature."""

    def factory(hidden, out, drop, dtype, name):
        moe = MoEFFN(hidden=hidden, out=out, num_experts=num_experts,
                     top_k=top_k, capacity_factor=capacity_factor,
                     gate_noise=gate_noise, aux_weight=aux_weight,
                     drop=drop, dtype=dtype, name=name)

        def call(x, deterministic=True):
            return moe(x, deterministic)

        return call

    return factory
