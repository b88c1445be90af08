"""Convert reference torch fusion-model weights → MultiDefectAblation params.

The reference's fusion checkpoints (``mymodel.pth`` / ``pytorch_model.bin``,
saved by mvuld/main_bigvul.py:250-260) hold a torch ``state_dict`` of one of
the Multi_DefectModel_* classes (mvuld/models/GraphModel.py / new_model.py /
myModels.py / MotivationModel.py). This module maps those tensors onto the
parameterized :class:`~mvuld_tpu.models.fusion_zoo.MultiDefectAblation`
pytree, driven by the SAME spec flags the registry sets — so any registry
key's reference counterpart converts with one call.

Layout rules:
  torch Linear  weight [out, in]      → flax Dense  kernel [in, out]
  torch Conv1d  weight [out, in, 1]   → flax Dense  kernel [in, out]
  torch BatchNorm1d weight/bias       → flax BatchNorm scale/bias
        running_mean/var              → batch_stats mean/var
  dgl GATConv fc.weight [H*D, in], attn_l/attn_r [1, H, D], bias [H*D]
                                      → DenseGATConv fc.kernel [in, H*D],
                                        attn_l/attn_r [H, D], bias [H, D]
  torch nn.GRU (1 layer): gate order (r, z, n) in weight_ih_l0 [3H, in] /
        weight_hh_l0 [3H, H]; b_ir+b_hr fold into the flax ``ir`` bias
        (flax hr/hz have no bias), b_hn stays on ``hn`` (both frameworks
        compute n = tanh(W_in x + b_in + r*(W_hn h + b_hn))).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _linear(sd, prefix) -> Dict:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _conv1d(sd, prefix) -> Dict:
    w = _np(sd[f"{prefix}.weight"])           # [out, in, 1]
    return {"kernel": w[:, :, 0].T, "bias": _np(sd[f"{prefix}.bias"])}


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    return ({"scale": _np(sd[f"{prefix}.weight"]),
             "bias": _np(sd[f"{prefix}.bias"])},
            {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])})


def _gatconv(sd, prefix, num_heads) -> Dict:
    fc_w = _np(sd[f"{prefix}.fc.weight"])     # [H*D, in]
    hd = fc_w.shape[0]
    d = hd // num_heads
    out = {"fc": {"kernel": fc_w.T},
           "attn_l": _np(sd[f"{prefix}.attn_l"]).reshape(num_heads, d),
           "attn_r": _np(sd[f"{prefix}.attn_r"]).reshape(num_heads, d)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).reshape(num_heads, d)
    else:
        out["bias"] = np.zeros((num_heads, d), np.float32)
    return out


def _gru(sd, prefix, hidden) -> Dict:
    w_ih = _np(sd[f"{prefix}.weight_ih_l0"])  # [3H, in] gates (r, z, n)
    w_hh = _np(sd[f"{prefix}.weight_hh_l0"])  # [3H, H]
    b_ih = _np(sd[f"{prefix}.bias_ih_l0"])
    b_hh = _np(sd[f"{prefix}.bias_hh_l0"])
    H = hidden
    wir, wiz, win = w_ih[:H], w_ih[H:2 * H], w_ih[2 * H:]
    whr, whz, whn = w_hh[:H], w_hh[H:2 * H], w_hh[2 * H:]
    bir, biz, bin_ = b_ih[:H], b_ih[H:2 * H], b_ih[2 * H:]
    bhr, bhz, bhn = b_hh[:H], b_hh[H:2 * H], b_hh[2 * H:]
    return {
        "ir": {"kernel": wir.T, "bias": bir + bhr},
        "iz": {"kernel": wiz.T, "bias": biz + bhz},
        "in": {"kernel": win.T, "bias": bin_},
        "hr": {"kernel": whr.T},
        "hz": {"kernel": whz.T},
        "hn": {"kernel": whn.T, "bias": bhn},
    }


def fusion_torch_to_flax(sd: Dict, model) -> Dict:
    """``sd``: reference torch state_dict; ``model``: the MultiDefectAblation
    instance whose spec mirrors the reference class. Returns
    {"params": ..., "batch_stats": ...} ready for ``model.apply``."""
    sd = {k: v for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    def put_bn(t_prefix, f_name, tree_p, tree_s):
        p, s = _bn(sd, t_prefix)
        tree_p[f_name] = p
        tree_s[f_name] = s

    if model.use_image and model.project_modalities:
        params["img_proj"], stats["img_proj"] = {}, {}
        put_bn("swinbn", "bn", params["img_proj"], stats["img_proj"])
        params["img_proj"]["fc"] = _linear(sd, "swinfc")
    if model.use_text and model.project_modalities:
        params["text_proj"], stats["text_proj"] = {}, {}
        put_bn("bn_text", "bn", params["text_proj"], stats["text_proj"])
        params["text_proj"]["fc"] = _linear(sd, "fc_text")

    if model.use_graph:
        g: Dict = {}
        gs: Dict = {}
        heads = 4  # every reference class uses numheads=4
        if model.pos_mode == "pre_gat":
            g["fc_gat_pre"] = _linear(sd, "fc_gat")
            g["fc_bbox_pre"] = _linear(sd, "fc_bbox")
        if model.node_net == "gat":
            g["gats"] = {"gat": _gatconv(sd, "gat", heads),
                         "gat2": _gatconv(sd, "gat2", heads),
                         "fc": _linear(sd, "fc")}
        elif model.node_net == "mlp":
            g["fconly"] = _linear(sd, "fconly")
        if model.pos_mode == "pre_hidden":
            g["fc_bbox_pre"] = _linear(sd, "fc_bbox")
        if model.pos_mode == "deep":
            g["fc_bbox"] = _linear(sd, "fc_bbox")
            for i in range(model.num_hidden):
                g[f"pos_hidden_{i}"] = _linear(sd, f"pos_hidden.{i}")
        if model.num_hidden > 0 and model.node_net != "none":
            g["hidden"] = {f"fc_{i}": _linear(sd, f"hidden.{i}")
                           for i in range(model.num_hidden)}
        if model.readout == "mean_valid":
            put_bn("hbn", "hbn", g, gs)
            g["hfc"] = _linear(sd, "hfc")
        else:
            if model.post_proj in ("split", "full"):
                put_bn("bn_gat", "bn_gat", g, gs)
                g["fc_gat"] = _linear(sd, "fc_gat")
                if model.post_proj == "split":
                    put_bn("bn_bbox", "bn_bbox", g, gs)
                    key = "fc_bbox2" if model.pos_mode == "deep" else "fc_bbox"
                    g[key] = _linear(sd, key)
            elif model.post_proj == "bn_only":
                put_bn("bn_gat", "bn_gat", g, gs)
            elif model.post_proj == "hfc":
                put_bn("bn_gat", "bn_gat", g, gs)
                g["hfc"] = _linear(sd, "hfc")
            if model.use_rsgcn:
                for i in range(model.num_rs_gcn):
                    t = f"Rs_GCN_{i + 1}"
                    blk = {"g": _conv1d(sd, f"{t}.g"),
                           "theta": _conv1d(sd, f"{t}.theta"),
                           "phi": _conv1d(sd, f"{t}.phi"),
                           "W": _conv1d(sd, f"{t}.W.0")}
                    bn_p, bn_s = _bn(sd, f"{t}.W.1")
                    blk["bn"] = bn_p
                    g[f"rs_gcn_{i}"] = blk
                    gs[f"rs_gcn_{i}"] = {"bn": bn_s}
            if model.readout in ("mean_padded_hfc", "gru"):
                put_bn("hbn", "hbn", g, gs)
                g["hfc"] = _linear(sd, "hfc")
            if model.readout == "gru":
                g["gru"] = _gru(sd, "gru_local", model.hidden)
        params["graph"] = g
        if gs:
            stats["graph"] = gs

    if model.final_bn:
        bn_key = "final_fc_bn" if "final_fc_bn.weight" in sd else "final_bn"
        p, s = _bn(sd, bn_key)
        params["final_bn"] = p
        stats["final_bn"] = s
    params["final_fc"] = _linear(sd, "final_fc")
    return {"params": params, "batch_stats": stats}
