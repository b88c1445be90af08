"""Converters from released torch checkpoints to Flax parameter pytrees.

The reference ships torch weights (SwinV2 ImageNet checkpoints, fine-tuned
UniXcoder ``pytorch_model.bin``). The TPU framework consumes them after a
one-time offline conversion. Conversion accepts either a live torch
``state_dict`` (values with ``.numpy()``) or a dict of numpy arrays, so tests
can run without torch and real conversions can stream from ``torch.load``.

Reference checkpoint-surgery behaviors replicated here:
  * relative-position bias-table bicubic interpolation across window sizes
    (mvuld/utils.py:72-90) lives in ``mvuld_tpu/models/swin_convert.py``,
  * classifier-head reshape/reinit on class-count mismatch (utils.py:22-28).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def roberta_torch_to_flax(state_dict: Mapping[str, object], num_layers: int,
                          prefix: str = "") -> Dict:
    """Map an HF RobertaModel ``state_dict`` onto ``RobertaEncoder`` params.

    ``prefix`` strips a leading module path (e.g. ``"roberta."`` or
    ``"encoder."`` depending on how the checkpoint was saved).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def W(key):
        return _np(sd[key])

    params = {
        "word_embeddings": {"embedding": W("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": W("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": W("embeddings.token_type_embeddings.weight")},
        "embeddings_norm": {"scale": W("embeddings.LayerNorm.weight"),
                            "bias": W("embeddings.LayerNorm.bias")},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": W(p + "attention.self.query.weight").T,
                          "bias": W(p + "attention.self.query.bias")},
                "key": {"kernel": W(p + "attention.self.key.weight").T,
                        "bias": W(p + "attention.self.key.bias")},
                "value": {"kernel": W(p + "attention.self.value.weight").T,
                          "bias": W(p + "attention.self.value.bias")},
                "output": {"kernel": W(p + "attention.output.dense.weight").T,
                           "bias": W(p + "attention.output.dense.bias")},
            },
            "attention_norm": {"scale": W(p + "attention.output.LayerNorm.weight"),
                               "bias": W(p + "attention.output.LayerNorm.bias")},
            "intermediate": {"kernel": W(p + "intermediate.dense.weight").T,
                             "bias": W(p + "intermediate.dense.bias")},
            "mlp_output": {"kernel": W(p + "output.dense.weight").T,
                           "bias": W(p + "output.dense.bias")},
            "output_norm": {"scale": W(p + "output.LayerNorm.weight"),
                            "bias": W(p + "output.LayerNorm.bias")},
        }
    return params


def linear_torch_to_flax(state_dict: Mapping[str, object], key: str) -> Dict:
    """torch ``nn.Linear`` → Flax Dense params ({kernel: W.T, bias})."""
    out = {"kernel": _np(state_dict[key + ".weight"]).T}
    if key + ".bias" in state_dict:
        out["bias"] = _np(state_dict[key + ".bias"])
    return out


def load_unixcoder_checkpoint(state_dict: Mapping[str, object]):
    """Convert a released UniXcoder checkpoint of EITHER layout:

      * bare ``RobertaModel`` (microsoft/unixcoder-base-nine
        ``pytorch_model.bin``): keys ``embeddings.*``, ``encoder.layer.{i}.*``;
      * fine-tuned cunixcoder ``DefectModel`` (reference:
        baselines/models/cunixcoder/model.py:15-21 — ``self.encoder`` holds
        the RobertaModel, plus ``classifier`` Linear(hidden, 2)): keys
        ``encoder.embeddings.*``, ``classifier.weight``;
      * either of the above under an ``nn.DataParallel`` ``module.`` prefix
        (the reference trains under DataParallel, cunixcoder main.py:262).

    Returns ``(encoder_params, classifier_params_or_None, num_layers)``.
    """
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state_dict.items()}
    if any(k.startswith("encoder.embeddings.") for k in sd):
        prefix = "encoder."
    elif any(k.startswith("roberta.embeddings.") for k in sd):
        prefix = "roberta."
    else:
        prefix = ""
    layer_pre = f"{prefix}encoder.layer."
    layers = {int(k[len(layer_pre):].split(".")[0])
              for k in sd if k.startswith(layer_pre)}
    if not layers:
        raise ValueError("no encoder.layer.{i} keys found — not a RobertaModel"
                         " checkpoint")
    num_layers = max(layers) + 1
    encoder = roberta_torch_to_flax(sd, num_layers, prefix=prefix)
    classifier = (linear_torch_to_flax(sd, "classifier")
                  if "classifier.weight" in sd else None)
    return encoder, classifier, num_layers
