import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.config import default_config
from mvuld_tpu.models.moe import MoEFFN
from mvuld_tpu.models.swin_variants import build_model


def _tiny_cfg(mtype):
    cfg = default_config()
    cfg.MODEL.TYPE = mtype
    cfg.DATA.IMG_SIZE = 32
    cfg.PARALLEL.DTYPE = "float32"
    for sec in ("SWIN", "SWINV2", "SWIN_MOE", "SWIN_MLP"):
        s = cfg.MODEL[sec]
        s.EMBED_DIM = 16
        s.DEPTHS = [1, 1]
        s.NUM_HEADS = [2, 2]
        s.WINDOW_SIZE = 4
        if "PRETRAINED_WINDOW_SIZES" in s:
            s.PRETRAINED_WINDOW_SIZES = [0, 0]
    cfg.MODEL.SWIN_MOE.MOE_BLOCKS = [[0], [-1]]
    cfg.MODEL.SWIN_MOE.NUM_LOCAL_EXPERTS = 2
    return cfg


@pytest.mark.parametrize("mtype", ["swin", "swinv2", "swin_mlp"])
def test_variants_forward(mtype):
    cfg = _tiny_cfg(mtype)
    model = build_model(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 2)
    feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (2, 32)      # embed 16 × 2^(layers-1)


def test_swin2_alias():
    cfg = _tiny_cfg("swin2")
    model = build_model(cfg)
    assert model is not None


def test_moe_forward_and_aux():
    cfg = _tiny_cfg("swin_moe")
    model = build_model(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, aux = model.apply(variables, x)
    assert logits.shape == (2, 2)
    assert np.isfinite(float(aux)) and float(aux) >= 0
    # MoE params exist with a leading expert axis
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    moe_w1 = [leaf for path, leaf in flat
              if any("w1" == getattr(p, "key", None) for p in path)]
    assert moe_w1 and moe_w1[0].shape[0] == 2      # 2 experts


@pytest.mark.slow
def test_moe_ffn_routes_all_capacity():
    """With generous capacity every token is dispatched exactly top_k times."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 8).astype(np.float32))
    m = MoEFFN(hidden=16, out=8, num_experts=2, top_k=1, capacity_factor=4.0)
    variables = m.init(jax.random.PRNGKey(0), x)
    y, aux = m.apply(variables, x)
    assert y.shape == (1, 16, 8)
    assert np.isfinite(np.asarray(y)).all()
    # output is a convex-ish combination: gate probs in (0,1) ⇒ nonzero
    assert np.abs(np.asarray(y)).sum() > 0
