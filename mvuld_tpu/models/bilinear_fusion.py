"""Bilinear multimodal pooling library (VQA-literature fusion operators).

Re-implementation of the reference's fusion toolbox (reference:
mvuld/models/fusion.py:7-662, from the block.bootstrap/VQA line of work):
Block, BlockTucker, Mutan, Tucker, MLB, MFB, MFH, LinearSum, ConcatMLP,
RelationalNetwork. The shipped MVulD models use simple concat/dot, but the
library is part of the model zoo's surface — all operators are registered
under ``BILINEAR_FUSIONS`` and usable as fusion heads.

All modules take a list/tuple of two inputs [B, D0], [B, D1] → [B, output_dim]
(RelationalNetwork takes [B, N, D] sets), matching the reference call shape.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvuld_tpu.core.registry import Registry

BILINEAR_FUSIONS = Registry("bilinear_fusions")


def _pair(x: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    assert len(x) == 2, "fusion operators take exactly two inputs"
    return x[0], x[1]


class _FusionBase(nn.Module):
    input_dims: Tuple[int, int] = (512, 512)
    output_dim: int = 512
    mm_dim: int = 512
    dropout_input: float = 0.0
    dropout_output: float = 0.0


@BILINEAR_FUSIONS.register("linear_sum")
class LinearSum(_FusionBase):
    """proj each → sum → proj out (reference: fusion.py LinearSum)."""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        z = (nn.Dense(self.mm_dim, name="linear0")(x0)
             + nn.Dense(self.mm_dim, name="linear1")(x1))
        z = nn.Dropout(self.dropout_input)(z, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="linear_out")(z)


@BILINEAR_FUSIONS.register("concat_mlp")
class ConcatMLP(_FusionBase):
    hidden: int = 512

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        z = jnp.concatenate(list(x), axis=-1)
        z = nn.relu(nn.Dense(self.hidden, name="fc1")(z))
        z = nn.Dropout(self.dropout_input)(z, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="fc2")(z)


@BILINEAR_FUSIONS.register("mlb")
class MLB(_FusionBase):
    """Multimodal low-rank bilinear: elementwise product of projections."""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        z0 = nn.Dense(self.mm_dim, name="linear0")(x0)
        z1 = nn.Dense(self.mm_dim, name="linear1")(x1)
        z = jnp.tanh(z0) * jnp.tanh(z1)
        z = nn.Dropout(self.dropout_input)(z, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="linear_out")(z)


@BILINEAR_FUSIONS.register("mfb")
class MFB(_FusionBase):
    """Multimodal factorized bilinear: expand ×factor, elementwise product,
    sum-pool factor groups, signed-sqrt + l2 normalize."""

    factor: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        z0 = nn.Dense(self.mm_dim * self.factor, name="linear0")(x0)
        z1 = nn.Dense(self.mm_dim * self.factor, name="linear1")(x1)
        z = z0 * z1
        z = nn.Dropout(self.dropout_input)(z, deterministic=deterministic)
        z = z.reshape(z.shape[0], self.mm_dim, self.factor).sum(-1)
        z = jnp.sign(z) * jnp.sqrt(jnp.abs(z) + 1e-12)
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        return nn.Dense(self.output_dim, name="linear_out")(z)


@BILINEAR_FUSIONS.register("mfh")
class MFH(_FusionBase):
    """Two chained MFB stages, outputs concatenated (reference:
    fusion.py MFH:422-545)."""

    factor: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        e = self.mm_dim * self.factor
        z0 = nn.Dense(e, name="linear0_0")(x0)
        z1 = nn.Dense(e, name="linear1_0")(x1)
        inter1 = z0 * z1
        inter1 = nn.Dropout(self.dropout_input)(inter1,
                                                deterministic=deterministic)
        z0b = nn.Dense(e, name="linear0_1")(x0)
        z1b = nn.Dense(e, name="linear1_1")(x1)
        inter2 = inter1 * z0b * z1b
        outs = []
        for inter, name in ((inter1, "out_0"), (inter2, "out_1")):
            p = inter.reshape(inter.shape[0], self.mm_dim, self.factor).sum(-1)
            p = jnp.sign(p) * jnp.sqrt(jnp.abs(p) + 1e-12)
            p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)
            outs.append(nn.Dense(self.output_dim // 2, name=name)(p))
        return jnp.concatenate(outs, axis=-1)


@BILINEAR_FUSIONS.register("mutan")
class Mutan(_FusionBase):
    """Tucker with rank-R low-rank core (reference: fusion.py Mutan)."""

    rank: int = 10

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        z0 = nn.Dense(self.mm_dim * self.rank, name="merge0")(
            nn.Dense(self.mm_dim, name="linear0")(x0))
        z1 = nn.Dense(self.mm_dim * self.rank, name="merge1")(
            nn.Dense(self.mm_dim, name="linear1")(x1))
        B = z0.shape[0]
        z = (z0 * z1).reshape(B, self.mm_dim, self.rank).sum(-1)
        z = nn.Dropout(self.dropout_input)(z, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="linear_out")(z)


@BILINEAR_FUSIONS.register("tucker")
class Tucker(_FusionBase):
    """Full Tucker core tensor (small mm dims only)."""

    core_dim: int = 64

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        z0 = nn.Dense(self.core_dim, name="linear0")(x0)
        z1 = nn.Dense(self.core_dim, name="linear1")(x1)
        core = self.param("core", nn.initializers.normal(0.02),
                          (self.core_dim, self.core_dim, self.core_dim))
        z = jnp.einsum("bi,ijk,bj->bk", z0, core, z1)
        z = nn.Dropout(self.dropout_input)(z, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="linear_out")(z)


@BILINEAR_FUSIONS.register("block")
class Block(_FusionBase):
    """Block-superdiagonal bilinear fusion (reference: fusion.py Block:31-110):
    project to mm_dim, split into ``chunks``, per-chunk rank-limited bilinear
    via expand→product→sum-pool, concat, signed-sqrt-l2."""

    chunks: int = 8
    rank: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        z0 = nn.Dense(self.mm_dim, name="linear0")(x0)
        z1 = nn.Dense(self.mm_dim, name="linear1")(x1)
        z0 = nn.Dropout(self.dropout_input)(z0, deterministic=deterministic)
        z1 = nn.Dropout(self.dropout_input)(z1, deterministic=deterministic)
        cs = self.mm_dim // self.chunks
        outs = []
        for c in range(self.chunks):
            a = z0[:, c * cs:(c + 1) * cs]
            b = z1[:, c * cs:(c + 1) * cs]
            ea = nn.Dense(cs * self.rank, name=f"merge0_{c}")(a)
            eb = nn.Dense(cs * self.rank, name=f"merge1_{c}")(b)
            m = (ea * eb).reshape(-1, cs, self.rank).sum(-1)
            outs.append(m)
        z = jnp.concatenate(outs, axis=-1)
        z = jnp.sign(z) * jnp.sqrt(jnp.abs(z) + 1e-12)
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        return nn.Dense(self.output_dim, name="linear_out")(z)


@BILINEAR_FUSIONS.register("block_tucker")
class BlockTucker(_FusionBase):
    """Block with a Tucker core per chunk."""

    chunks: int = 8

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x0, x1 = _pair(x)
        z0 = nn.Dense(self.mm_dim, name="linear0")(x0)
        z1 = nn.Dense(self.mm_dim, name="linear1")(x1)
        cs = self.mm_dim // self.chunks
        outs = []
        for c in range(self.chunks):
            a = z0[:, c * cs:(c + 1) * cs]
            b = z1[:, c * cs:(c + 1) * cs]
            core = self.param(f"core_{c}", nn.initializers.normal(0.02),
                              (cs, cs, cs))
            outs.append(jnp.einsum("bi,ijk,bj->bk", a, core, b))
        z = jnp.concatenate(outs, axis=-1)
        z = jnp.sign(z) * jnp.sqrt(jnp.abs(z) + 1e-12)
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        z = nn.Dropout(self.dropout_input)(z, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="linear_out")(z)


@BILINEAR_FUSIONS.register("relational_network")
class RelationalNetwork(nn.Module):
    """Sum of a shared MLP over all object pairs (reference: fusion.py
    RelationalNetwork). Input [B, N, D] → [B, output_dim]."""

    output_dim: int = 512
    hidden: int = 512

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, D = x.shape
        a = jnp.repeat(x[:, :, None, :], N, axis=2)      # [B, N, N, D]
        b = jnp.repeat(x[:, None, :, :], N, axis=1)
        pairs = jnp.concatenate([a, b], axis=-1).reshape(B, N * N, 2 * D)
        h = nn.relu(nn.Dense(self.hidden, name="g1")(pairs))
        h = nn.relu(nn.Dense(self.hidden, name="g2")(h))
        h = h.sum(axis=1)
        h = nn.relu(nn.Dense(self.hidden, name="f1")(h))
        return nn.Dense(self.output_dim, name="f2")(h)


def build_bilinear_fusion(name: str, **kwargs):
    return BILINEAR_FUSIONS.build(name, **kwargs)
