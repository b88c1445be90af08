"""SwinV2 torch checkpoint → Flax params, with the reference's surgery.

Handles the released SwinV2 ImageNet checkpoints the reference fine-tunes from
(reference: mvuld/utils.py load_pretrained:31-141):

  * drops relative_position_index / relative_coords_table / attn_mask buffers
    (regenerated as static constants here),
  * bicubic-interpolates SwinV1-style ``relative_position_bias_table`` across
    window sizes (utils.py:72-90) — needed when converting V1 checkpoints,
  * bicubic-interpolates the absolute position embedding (utils.py:92-112),
  * reinitializes/reshapes the classification head on class-count mismatch
    (utils.py:22-28, 115-135).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from mvuld_tpu.models.swin_v2 import SwinV2Config


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_map22kto1k(path: str | None = None) -> np.ndarray:
    """ImageNet-22K→1K class-index mapping (1000 row indices into the
    21841-class head), as shipped in ``configs/map22kto1k.txt`` — the same
    public index list the reference reads from ``data/map22kto1k.txt``
    (reference: mvuld/utils.py:115-127)."""
    if path is None:
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "..",
                            "configs", "map22kto1k.txt")
    with open(path) as f:
        idx = np.array([int(line.strip()) for line in f if line.strip()],
                       dtype=np.int64)
    if idx.shape[0] != 1000:
        raise ValueError(f"map22kto1k has {idx.shape[0]} entries, want 1000")
    return idx


def _convert_head(head_w: np.ndarray, head_b: np.ndarray, num_classes: int,
                  strict_head: bool, map22kto1k=None) -> Dict:
    """Classifier-head surgery on class-count mismatch (reference:
    mvuld/utils.py:112-135): exact match → transpose; 21841→1000 → select
    the mapped rows; anything else → xavier re-init (utils.py:22-28)."""
    n_src = head_w.shape[0]
    if n_src == num_classes:
        return {"kernel": head_w.T, "bias": head_b}
    if n_src == 21841 and num_classes == 1000:
        idx = (np.asarray(map22kto1k, dtype=np.int64)
               if map22kto1k is not None else load_map22kto1k())
        return {"kernel": head_w[idx].T, "bias": head_b[idx]}
    if strict_head:
        raise ValueError(
            f"head has {n_src} classes, config wants {num_classes}")
    rng = np.random.RandomState(0)
    fan_in, fan_out = head_w.shape[1], num_classes
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return {"kernel": rng.uniform(-limit, limit,
                                  (fan_in, fan_out)).astype(np.float32),
            "bias": np.zeros((fan_out,), np.float32)}


def interpolate_bias_table(table: np.ndarray, src_window: int, dst_window: int
                           ) -> np.ndarray:
    """Bicubic-resample a [(2S-1)², H] relative-position bias table to
    [(2D-1)², H] (reference: utils.py:72-90 uses F.interpolate bicubic)."""
    S1 = 2 * src_window - 1
    S2 = 2 * dst_window - 1
    H = table.shape[1]
    img = table.reshape(S1, S1, H)
    try:
        import cv2
        out = cv2.resize(img, (S2, S2), interpolation=cv2.INTER_CUBIC)
        if out.ndim == 2:
            out = out[:, :, None]
    except ImportError:                       # scipy fallback
        from scipy.ndimage import zoom
        out = zoom(img, (S2 / S1, S2 / S1, 1), order=3)
    return out.reshape(S2 * S2, H)


def interpolate_ape(ape: np.ndarray, src_patches: int, dst_patches: int
                    ) -> np.ndarray:
    """[1, S², C] → [1, D², C] bicubic (reference: utils.py:92-112)."""
    import cv2
    C = ape.shape[-1]
    S = int(np.sqrt(ape.shape[1]))
    D = int(np.sqrt(dst_patches))
    img = ape.reshape(S, S, C).astype(np.float32)
    out = cv2.resize(img, (D, D), interpolation=cv2.INTER_CUBIC)
    return out.reshape(1, D * D, C)


def swinv1_torch_to_flax(state_dict: Mapping[str, object], config,
                         strict_head: bool = False, map22kto1k=None) -> Dict:
    """Map a torch SwinV1 ``state_dict`` onto SwinTransformerV1 params,
    bicubic-interpolating each block's relative_position_bias_table when the
    checkpoint window differs from the target window — the load-bearing
    384→448 surgery (reference: mvuld/utils.py:72-90)."""
    import numpy as np

    sd = {k: v for k, v in state_dict.items()
          if "relative_position_index" not in k and "attn_mask" not in k}

    def W(key):
        return _np(sd[key])

    def dense(key):
        out = {"kernel": W(key + ".weight").T}
        if key + ".bias" in sd:
            out["bias"] = W(key + ".bias")
        return out

    def norm(key):
        return {"scale": W(key + ".weight"), "bias": W(key + ".bias")}

    params: Dict = {
        "patch_embed": {
            "proj": {"kernel": W("patch_embed.proj.weight").transpose(2, 3, 1, 0),
                     "bias": W("patch_embed.proj.bias")}}}
    if config.patch_norm:
        params["patch_embed"]["norm"] = norm("patch_embed.norm")
    for i, depth in enumerate(config.depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}."
            table = W(p + "attn.relative_position_bias_table")
            src_ws = (int(np.sqrt(table.shape[0])) + 1) // 2
            if src_ws != config.window_size:
                table = interpolate_bias_table(table, src_ws,
                                               config.window_size)
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": norm(p + "norm1"),
                "norm2": norm(p + "norm2"),
                "attn": {
                    "qkv": dense(p + "attn.qkv"),
                    "proj": dense(p + "attn.proj"),
                    "relative_position_bias_table": table,
                },
                "mlp": {"fc1": dense(p + "mlp.fc1"),
                        "fc2": dense(p + "mlp.fc2")},
            }
        if i < len(config.depths) - 1:
            d = f"layers.{i}.downsample."
            params[f"layers_{i}_downsample"] = {
                "reduction": {"kernel": W(d + "reduction.weight").T},
                "norm": norm(d + "norm"),
            }
    params["norm"] = norm("norm")
    if "head.weight" in sd:
        params["head"] = _convert_head(W("head.weight"), W("head.bias"),
                                       config.num_classes, strict_head,
                                       map22kto1k)
    return params


def to_scan_layout(params: Dict, config: SwinV2Config) -> Dict:
    """Repack per-block params (``layers_{i}_blocks_{j}``) into the scanned
    layout (``layers_{i}_scan/block{0,1}`` with a leading pair axis) used when
    ``SwinTransformerV2(scan_blocks=True)``."""
    import numpy as np

    def tree_stack(trees):
        import jax
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)

    out = dict(params)
    for i, depth in enumerate(config.depths):
        if depth % 2 != 0 or depth < 2:
            continue               # odd-depth stages stay per-block
        evens = [params[f"layers_{i}_blocks_{2 * p}"] for p in range(depth // 2)]
        odds = [params[f"layers_{i}_blocks_{2 * p + 1}"] for p in range(depth // 2)]
        out[f"layers_{i}_scan"] = {"block0": tree_stack(evens),
                                   "block1": tree_stack(odds)}
        for j in range(depth):
            out.pop(f"layers_{i}_blocks_{j}", None)
    return out


def swinv2_torch_to_flax(state_dict: Mapping[str, object], config: SwinV2Config,
                         strict_head: bool = False, map22kto1k=None) -> Dict:
    """Map a torch SwinV2 ``state_dict`` (reference module layout,
    mvuld/models/swin_transformer_v2.py) onto our Flax param tree."""
    sd = {k: v for k, v in state_dict.items()
          if not any(s in k for s in ("relative_position_index",
                                      "relative_coords_table", "attn_mask"))}

    def W(key):
        return _np(sd[key])

    def dense(key):
        out = {"kernel": W(key + ".weight").T}
        if key + ".bias" in sd:
            out["bias"] = W(key + ".bias")
        return out

    def norm(key):
        return {"scale": W(key + ".weight"), "bias": W(key + ".bias")}

    params: Dict = {}
    # patch embed: torch conv [C_out, C_in, kh, kw] → flax [kh, kw, C_in, C_out]
    params["patch_embed"] = {
        "proj": {"kernel": W("patch_embed.proj.weight").transpose(2, 3, 1, 0),
                 "bias": W("patch_embed.proj.bias")},
    }
    if config.patch_norm:
        params["patch_embed"]["norm"] = norm("patch_embed.norm")
    if config.ape and "absolute_pos_embed" in sd:
        ape = W("absolute_pos_embed")
        dst = (config.img_size // config.patch_size) ** 2
        if ape.shape[1] != dst:
            ape = interpolate_ape(ape, ape.shape[1], dst)
        params["absolute_pos_embed"] = ape

    for i, depth in enumerate(config.depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}."
            blk = {
                "norm1": norm(p + "norm1"),
                "norm2": norm(p + "norm2"),
                "attn": {
                    "qkv_kernel": W(p + "attn.qkv.weight").T,
                    "q_bias": W(p + "attn.q_bias"),
                    "v_bias": W(p + "attn.v_bias"),
                    "logit_scale": W(p + "attn.logit_scale"),
                    "cpb_fc1": {"kernel": W(p + "attn.cpb_mlp.0.weight").T,
                                "bias": W(p + "attn.cpb_mlp.0.bias")},
                    "cpb_fc2": {"kernel": W(p + "attn.cpb_mlp.2.weight").T},
                    "proj": dense(p + "attn.proj"),
                },
                "mlp": {"fc1": dense(p + "mlp.fc1"),
                        "fc2": dense(p + "mlp.fc2")},
            }
            params[f"layers_{i}_blocks_{j}"] = blk
        if i < len(config.depths) - 1:
            d = f"layers.{i}.downsample."
            params[f"layers_{i}_downsample"] = {
                "reduction": {"kernel": W(d + "reduction.weight").T},
                "norm": norm(d + "norm"),
            }
    params["norm"] = norm("norm")

    if "head.weight" in sd:
        params["head"] = _convert_head(W("head.weight"), W("head.bias"),
                                       config.num_classes, strict_head,
                                       map22kto1k)
    return params
