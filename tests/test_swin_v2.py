import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.models.swin_convert import interpolate_bias_table, swinv2_torch_to_flax
from mvuld_tpu.models.swin_v2 import (SwinTransformerV2, SwinV2Config,
                                      relative_coords_table,
                                      relative_position_index,
                                      shifted_window_mask, window_partition,
                                      window_reverse)

TINY = SwinV2Config(img_size=32, patch_size=4, in_chans=3, num_classes=2,
                    embed_dim=16, depths=(1, 2), num_heads=(2, 4),
                    window_size=4, drop_rate=0.0, attn_drop_rate=0.0,
                    drop_path_rate=0.0)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_geometry():
    tbl = relative_coords_table(4, 0)
    assert tbl.shape == (49, 2)
    # log-scaled: max = log2(8·(ws-1)/(ws-1) + 1)/log2(8) = log2(9)/3 ≈ 1.057
    assert np.abs(tbl).max() <= np.log2(9.0) / 3.0 + 1e-6
    idx = relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 49
    assert idx[0, 0] == idx[5, 5]               # same relative offset


def test_shift_mask():
    m = shifted_window_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert shifted_window_mask(8, 8, 4, 0) is None


def test_forward_shapes():
    model = SwinTransformerV2(TINY)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 2)
    feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (2, TINY.num_features)


def _stub_timm():
    """Provide the three timm.models.layers symbols the reference module
    imports, so it can run read-only for parity checking."""
    import torch
    import torch.nn as tnn
    layers = types.ModuleType("timm.models.layers")

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(t, std=1.0, **kw):
        return tnn.init.trunc_normal_(t, std=std)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm.models = models
    injected = {}
    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers)):
        if name not in sys.modules:
            sys.modules[name] = mod
            injected[name] = mod
    return injected


@pytest.fixture(scope="module")
def reference_swin():
    """Reference torch SwinV2 behind a SCOPED timm stub: the fake modules are
    removed at teardown so later tests (e.g. transformers imports probing
    timm) see the real environment regardless of test order."""
    torch = pytest.importorskip("torch")
    injected = _stub_timm()
    sys.path.insert(0, "/root/reference/mvuld/models")
    import importlib
    ref_mod = importlib.import_module("swin_transformer_v2")
    torch.manual_seed(0)
    model = ref_mod.SwinTransformerV2(
        img_size=32, patch_size=4, in_chans=3, num_classes=2, embed_dim=16,
        depths=[1, 2], num_heads=[2, 4], window_size=4, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0,
        pretrained_window_sizes=[0, 0]).eval()
    yield torch, model
    for name in injected:
        sys.modules.pop(name, None)
    sys.modules.pop("swin_transformer_v2", None)
    try:
        sys.path.remove("/root/reference/mvuld/models")
    except ValueError:
        pass


def test_parity_with_reference_torch(reference_swin):
    """Convert the reference torch SwinV2 (random init) and compare logits.
    This validates windows, shift masks, cosine attention, CPB MLP, merging,
    and the converter in one shot."""
    torch, ref = reference_swin
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want_logits = ref(torch.tensor(x)).numpy()
        want_feats = ref.forward_features(torch.tensor(x)).numpy()

    params = {"params": swinv2_torch_to_flax(ref.state_dict(), TINY,
                                             strict_head=True)}
    model = SwinTransformerV2(TINY)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_feats = np.asarray(model.apply(params, x_nhwc, return_features=True))
    np.testing.assert_allclose(got_feats, want_feats, atol=3e-5, rtol=1e-4)
    got_logits = np.asarray(model.apply(params, x_nhwc))
    np.testing.assert_allclose(got_logits, want_logits, atol=3e-5, rtol=1e-4)


def test_head_reinit_on_class_mismatch(reference_swin):
    torch, ref = reference_swin
    cfg5 = SwinV2Config(**{**TINY.__dict__, "num_classes": 5})
    params = swinv2_torch_to_flax(ref.state_dict(), cfg5)
    assert params["head"]["kernel"].shape == (TINY.num_features, 5)


@pytest.mark.slow
def test_scan_blocks_parity():
    """scan_blocks=True with repacked params must match the per-block model
    exactly (it is the fast-compile path used by bench/production)."""
    from mvuld_tpu.models.swin_convert import to_scan_layout

    cfg = SwinV2Config(**{**TINY.__dict__, "depths": (2, 2), "num_heads": (2, 4)})
    model = SwinTransformerV2(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x, return_features=True))

    scan_model = SwinTransformerV2(cfg, scan_blocks=True)
    scan_params = {"params": to_scan_layout(variables["params"], cfg)}
    got = np.asarray(scan_model.apply(scan_params, x, return_features=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_bias_table_interpolation_shape():
    rng = np.random.RandomState(0)
    tbl = rng.randn((2 * 12 - 1) ** 2, 4).astype(np.float32)
    out = interpolate_bias_table(tbl, 12, 28)
    assert out.shape == ((2 * 28 - 1) ** 2, 4)
    # identity when windows match scale: interpolating to the same size
    same = interpolate_bias_table(tbl, 12, 12)
    np.testing.assert_allclose(same, tbl, atol=1e-5)


def test_converted_checkpoint_through_scan_layout(reference_swin):
    """torch checkpoint → converter → scan layout → scanned model must match
    the torch reference (the train_swin --pretrained path)."""
    from mvuld_tpu.models.swin_convert import to_scan_layout

    torch, ref = reference_swin
    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_features(torch.tensor(x)).numpy()

    params = swinv2_torch_to_flax(ref.state_dict(), TINY, strict_head=True)
    cfg2 = SwinV2Config(**{**TINY.__dict__, "depths": (1, 2)})
    # depths (1, 2): stage 1 has odd depth → per-block; only even stages scan.
    scan_params = to_scan_layout(params, cfg2)
    model = SwinTransformerV2(cfg2, scan_blocks=True)
    got = np.asarray(model.apply({"params": scan_params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 return_features=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_head_22k_to_1k_remap():
    """21841-class pretrained head + 1000-class target selects the mapped
    rows instead of re-initializing (reference: mvuld/utils.py:115-127 via
    data/map22kto1k.txt). Fake 21841-class head, injected fake map."""
    from mvuld_tpu.models.swin_convert import _convert_head, load_map22kto1k

    rng = np.random.RandomState(3)
    head_w = rng.randn(21841, 16).astype(np.float32)
    head_b = rng.randn(21841).astype(np.float32)
    fake_map = rng.choice(21841, size=1000, replace=False)

    out = _convert_head(head_w, head_b, 1000, strict_head=True,
                        map22kto1k=fake_map)
    np.testing.assert_array_equal(out["kernel"], head_w[fake_map].T)
    np.testing.assert_array_equal(out["bias"], head_b[fake_map])

    # exact-match and mismatch paths unchanged
    exact = _convert_head(head_w[:2], head_b[:2], 2, strict_head=True)
    np.testing.assert_array_equal(exact["kernel"], head_w[:2].T)
    reinit = _convert_head(head_w, head_b, 2, strict_head=False)
    assert reinit["kernel"].shape == (16, 2)

    # the shipped map file is well-formed: 1000 in-range indices
    idx = load_map22kto1k()
    assert idx.shape == (1000,)
    assert idx.min() >= 0 and idx.max() < 21841
    assert len(np.unique(idx)) == 1000


def test_22k_configs_load():
    """The two 22K fine-tune YAMLs (reference configs/mySwin/) resolve
    through get_config with the right window/img-size surgery targets."""
    from mvuld_tpu.config import get_config

    class Args:
        cfg = "configs/swinv2_base_patch4_window12to24_192to384_22ktoMYDATA_ft.yaml"
        opts = None

    c1 = get_config(Args())
    assert c1.MODEL.SWINV2.WINDOW_SIZE == 24 and c1.DATA.IMG_SIZE == 384

    class Args2:
        cfg = "configs/swinv2_base_patch4_window24to32_384to512_22kto1ktoMYDATA_ft.yaml"
        opts = None

    c2 = get_config(Args2())
    assert c2.MODEL.SWINV2.WINDOW_SIZE == 32 and c2.DATA.IMG_SIZE == 512
    assert tuple(c2.MODEL.SWINV2.PRETRAINED_WINDOW_SIZES) == (12, 12, 12, 6)
