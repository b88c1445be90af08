"""GPipe-style pipeline parallelism over a mesh axis — exceeds the reference.

The reference is single-GPU torch and has NO pipeline parallelism (SURVEY
§2.5: "Pipeline parallel: none"). This module adds it the TPU-native way: a
uniform transformer stack is partitioned over a mesh axis ("pp"), microbatches
stream stage-to-stage via ``jax.lax.ppermute`` inside ``shard_map``, and
``lax.scan`` expresses the whole fill→steady-state→drain schedule as ONE
compiled program — no host-side scheduling, no per-stage dispatches.
Differentiation comes for free: the transpose of ``scan``+``ppermute`` IS the
reverse pipeline schedule (activations recomputed under ``remat=True``), so
``jax.grad`` through :func:`gpipe` yields a working pipelined backward.

Applied here to the UniXcoder text encoder (models/roberta.py — 12 identical
post-LN layers, the natural pipeline target in this system; the reference
loads the same stack via HF transformers, mvuld/models/unixcoder.py:100-117).
The per-layer math reuses ``TransformerLayer.apply`` verbatim, so pipeline
output is bit-identical to the sequential encoder (tests/test_pipeline_parallel.py).

Schedule (S stages, M microbatches, T = M+S-1 ticks)::

    tick t: stage s computes microbatch (t - s) when 0 <= t-s < M,
            then ppermutes its activation to stage s+1.

Stage 0 reads microbatch t from the (replicated) input buffer; the last
stage's outputs for ticks S-1..S-1+M-1 are the result, broadcast to every
device with a masked psum so downstream (replicated or dp-sharded) consumers
never need to know which device held the last stage.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _smap(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map  # jax >= 0.7 style
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def stack_layer_params(params: dict, num_layers: int,
                       prefix: str = "layer_") -> Any:
    """Stack per-layer param trees ``{prefix}0..{prefix}{L-1}`` into one tree
    whose leaves carry a leading layer axis [L, ...] — the layout lax.scan
    iterates and the pipeline shards over its mesh axis. Differentiable
    (jnp.stack), so gradients flow back to the original per-layer trees."""
    layers = [params[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def gpipe(layer_fn: Callable, stacked_params: Any, x: jnp.ndarray,
          extras: Any, mesh, axis: str, num_microbatches: int,
          remat: bool = False, rng: Optional[jnp.ndarray] = None
          ) -> jnp.ndarray:
    """Run ``x`` through L stacked layers pipelined over ``mesh.shape[axis]``
    stages.

    ``layer_fn(layer_params, h, extras, key) -> h`` applies ONE layer
    (unstacked params). ``stacked_params`` leaves are [L, ...] with L
    divisible by the stage count; each stage holds L/S consecutive layers
    and scans them. ``extras`` is a pytree of per-example side inputs
    ([B, ...], e.g. the additive attention bias) delivered to every stage
    with the matching microbatch. ``remat=True`` recomputes each stage's
    layer scan in the backward instead of storing per-tick activations.
    ``rng`` (a PRNGKey) enables stochastic layers: each layer invocation
    receives ``fold_in(fold_in(rng, microbatch), global_layer_index)`` —
    independent per (microbatch, layer), deterministic given the key, and
    independent of how the stack is partitioned into stages. Without it,
    ``key`` is None (deterministic layers).
    """
    S = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"pipeline: {L} layers must divide into {S} stages")
    B = x.shape[0]
    M = num_microbatches
    if B % M != 0:
        raise ValueError(f"pipeline: batch {B} must be a multiple of the "
                         f"microbatch count {M}")
    mb = B // M
    Lp = L // S
    x_mb = x.reshape((M, mb) + x.shape[1:])
    extras_mb = jax.tree_util.tree_map(
        lambda a: a.reshape((M, mb) + a.shape[1:]), extras)
    # the rng travels as an explicit shard_map operand (replicated) — a
    # zero dummy when unused so the staged function has a fixed signature
    rng_arr = (jnp.zeros((2,), jnp.uint32) if rng is None
               else jnp.asarray(rng, jnp.uint32))

    def stage(local_stack, x_mb, extras_mb, rng_arr):
        sid = jax.lax.axis_index(axis)
        layer_ids = sid * Lp + jnp.arange(Lp)     # global layer indices

        def apply_stack(h, extra, mb_idx):
            mb_key = (None if rng is None
                      else jax.random.fold_in(rng_arr, mb_idx))

            def body(hh, xs):
                lp, lid = xs
                key = (None if rng is None
                       else jax.random.fold_in(mb_key, lid))
                return layer_fn(lp, hh, extra, key), None
            h, _ = jax.lax.scan(body, h, (local_stack, layer_ids))
            return h

        fn = jax.checkpoint(apply_stack) if remat else apply_stack

        def tick(act, t):
            idx = jnp.clip(t - sid, 0, M - 1)
            x0 = jax.lax.dynamic_index_in_dim(x_mb, idx, 0, keepdims=False)
            extra = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0,
                                                       keepdims=False),
                extras_mb)
            h_in = jnp.where(sid == 0, x0, act)
            h_out = fn(h_in, extra, idx)
            # hand the activation to the next stage; the S-1 -> 0 wrap
            # carries drain-phase garbage that stage 0 never reads (it
            # always takes the x0 branch)
            nxt = jax.lax.ppermute(h_out, axis,
                                   [(i, (i + 1) % S) for i in range(S)])
            return nxt, h_out

        init = jnp.zeros((mb,) + x_mb.shape[2:], x_mb.dtype)
        _, outs = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # microbatch m leaves the last stage at tick (S-1) + m
        res = jax.lax.slice_in_dim(outs, S - 1, S - 1 + M, axis=0)
        res = jnp.where(sid == S - 1, res, jnp.zeros_like(res))
        res = jax.lax.psum(res, axis)          # broadcast to all stages
        return res.reshape((B,) + x.shape[1:])

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stacked_params),
        P(),
        jax.tree_util.tree_map(lambda _: P(), extras_mb),
        P(),
    )
    return _smap(stage, mesh, in_specs, P())(stacked_params, x_mb,
                                             extras_mb, rng_arr)


def roberta_pipeline_forward(config, params: dict, input_ids: jnp.ndarray,
                             attention_mask: Optional[jnp.ndarray],
                             mesh, axis: str, num_microbatches: int = 4,
                             remat: bool = False,
                             dropout_rng: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
    """Pipelined RobertaEncoder forward: embeddings replicated (tiny next to
    the stack), the ``num_layers`` TransformerLayers pipelined over ``axis``.
    Numerically identical to ``RobertaEncoder.apply`` in deterministic mode —
    the per-layer math IS ``TransformerLayer.apply`` on the same param tree.
    ``dropout_rng`` enables train-mode dropout inside the layers (independent
    masks per microbatch×layer via gpipe's fold_in schedule; the embedding
    dropout, like the sequential encoder's, would sit before the pipeline —
    apply it to ``input_ids``' embeddings upstream if needed).
    """
    import flax.linen as nn

    from mvuld_tpu.models.roberta import (TransformerLayer,
                                          roberta_position_ids)

    c = config
    if attention_mask is None:
        attention_mask = (input_ids != c.pad_token_id).astype(jnp.int32)

    # embeddings through the SAME flax modules the sequential encoder uses
    word = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype).apply(
        {"params": params["word_embeddings"]}, input_ids)
    pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                   dtype=c.dtype).apply(
        {"params": params["position_embeddings"]},
        roberta_position_ids(input_ids, c.pad_token_id))
    ttype = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=c.dtype).apply(
        {"params": params["token_type_embeddings"]},
        jnp.zeros_like(input_ids))
    hidden = word + pos + ttype
    hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype).apply(
        {"params": params["embeddings_norm"]}, hidden)
    if dropout_rng is not None and c.dropout_rate > 0:
        # the sequential encoder's embedding dropout; keyed off the layer
        # index space's far end so it never collides with a microbatch key
        emb_key = jax.random.fold_in(jnp.asarray(dropout_rng, jnp.uint32),
                                     1 << 20)
        keep = 1.0 - c.dropout_rate
        hidden = hidden * jax.random.bernoulli(
            emb_key, keep, hidden.shape).astype(hidden.dtype) / keep

    attn_bias = jnp.where(attention_mask[:, None, None, :] > 0,
                          0.0, -1e9).astype(jnp.float32)

    layer = TransformerLayer(c)

    def layer_fn(lp, h, bias, key):
        if key is None:
            return layer.apply({"params": lp}, h, bias, True)
        return layer.apply({"params": lp}, h, bias, False,
                           rngs={"dropout": key})

    stacked = stack_layer_params(params, c.num_layers)
    return gpipe(layer_fn, stacked, hidden, attn_bias, mesh, axis,
                 num_microbatches, remat=remat, rng=dropout_rng)


def make_pp_mesh(n_stages: int, devices=None):
    """A 1-axis ("pp") mesh over the first ``n_stages`` devices."""
    from jax.sharding import Mesh

    devices = list(jax.devices() if devices is None else devices)[:n_stages]
    return Mesh(np.asarray(devices).reshape(n_stages), ("pp",))
