"""The one-command pipeline: corpus → text encoder → caches (trained
encoder) → fusion → test metrics. The flagship end-to-end slice."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the -m 'not slow' quick lane


def test_full_pipeline(tmp_path):
    from mvuld_tpu.train.pipeline import main
    out = str(tmp_path / "run")
    res = main([
        "--synthetic", "160",
        "--out", out,
        "--batch-size", "16",
        "--text-epochs", "4",
        "--fusion-epochs", "5",
        "--opts",
        "MODEL.UNIXCODER.LAYERS", "2",
        "MODEL.UNIXCODER.HIDDEN", "64",
        "MODEL.UNIXCODER.HEADS", "2",
        "MODEL.UNIXCODER.INTERMEDIATE", "128",
        "DATA.FUNC_TOKENS", "96",
        "DATA.NODE_TOKENS", "24",
        "DATA.MAX_NODES", "32",
        "MODEL.MULTI.HIDDEN", "64",
        "MODEL.MULTI.NUM_RS_GCN", "1",
        "MODEL.MULTI.NUM_HIDDEN_FC", "1",
        "TRAIN.WARMUP_EPOCHS", "1",
        "TRAIN.BASE_LR", "5e-3",
        "TRAIN.WARMUP_LR", "1e-4",
        "TRAIN.MIN_LR", "1e-4",
        "TRAIN.EARLY_STOP_PATIENCE", "20",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "50",
    ])
    assert np.isfinite(res["text_best_f1"])
    assert np.isfinite(res["fusion_best_f1"])
    assert res["fusion_test"] is not None
    # with a TRAINED text encoder feeding the caches, fusion should beat
    # chance on the synthetic task
    assert res["fusion_best_f1"] > 0.5
    summary = json.load(open(os.path.join(out, "pipeline_summary.json")))
    assert summary["arch"] == "multi_defect_new_gcn"
    assert summary["image_encoder"] == "random_projection"
    # caches exist and are reusable
    for part in ("train", "val", "test"):
        assert os.path.exists(os.path.join(out, "cache", f"{part}.npz"))


def test_pipeline_with_trained_swin(tmp_path):
    """--swin-epochs: the image modality comes from a FINE-TUNED SwinV2's
    forward_features (reference: load_bestf1_swin + cache_swin_features),
    not a random projection; IMG_DIM follows the encoder width."""
    from mvuld_tpu.train.pipeline import main
    out = str(tmp_path / "run")
    res = main([
        "--synthetic", "96",
        "--out", out,
        "--batch-size", "8",
        "--text-epochs", "2",
        "--swin-epochs", "1",
        "--fusion-epochs", "3",
        "--opts",
        "MODEL.UNIXCODER.LAYERS", "1",
        "MODEL.UNIXCODER.HIDDEN", "32",
        "MODEL.UNIXCODER.HEADS", "2",
        "MODEL.UNIXCODER.INTERMEDIATE", "64",
        "MODEL.SWINV2.EMBED_DIM", "16",
        "MODEL.SWINV2.DEPTHS", "[1, 1]",
        "MODEL.SWINV2.NUM_HEADS", "[2, 2]",
        "MODEL.SWINV2.WINDOW_SIZE", "4",
        "MODEL.SWINV2.PRETRAINED_WINDOW_SIZES", "[0, 0]",
        "DATA.IMG_SIZE", "32",
        "DATA.FUNC_TOKENS", "64",
        "DATA.NODE_TOKENS", "16",
        "DATA.MAX_NODES", "24",
        "MODEL.MULTI.HIDDEN", "48",
        "MODEL.MULTI.NUM_RS_GCN", "1",
        "MODEL.MULTI.NUM_HIDDEN_FC", "1",
        "TRAIN.WARMUP_EPOCHS", "0",
        "TRAIN.BASE_LR", "5e-3",
        "TRAIN.WARMUP_LR", "1e-4",
        "TRAIN.MIN_LR", "1e-4",
        "TRAIN.EARLY_STOP_PATIENCE", "20",
        "AUG.MIXUP", "0.0",
        "AUG.CUTMIX", "0.0",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "50",
    ])
    assert np.isfinite(res["fusion_best_f1"])
    summary = json.load(open(os.path.join(out, "pipeline_summary.json")))
    assert summary["image_encoder"] == "trained"
    # cached img_emb really is the 2*EMBED_DIM-wide swin feature, and the
    # trained-encoder best-F1 checkpoint exists on disk for reuse
    cache = np.load(os.path.join(out, "cache", "train.npz"))
    assert cache["img_emb"].shape[1] == 32          # num_features = 16 * 2
    assert np.abs(cache["img_emb"]).sum() > 0
    # best-F1 checkpoint exists under the OUTPUT/MODEL.NAME/TAG convention
    import glob
    assert glob.glob(os.path.join(out, "swin", "**", "checkpoint-best-f1"),
                     recursive=True)


def test_pipeline_with_ocr_positions(tmp_path):
    """--east-ckpt: node positions come from EAST detection + line-number
    recognition over the rendered PNGs (the reference's production OCR path)
    instead of the renderer oracle. A random-init EAST detects ~nothing, so
    this exercises the plumbing end to end (separate cache_ocr npz dir,
    recovery stats in the summary) with near-empty position dicts."""
    import jax
    import jax.numpy as jnp

    from mvuld_tpu.core.checkpoint import save_checkpoint
    from mvuld_tpu.ocr.east import EAST
    from mvuld_tpu.train.pipeline import main

    east_dir = str(tmp_path / "east")
    model = EAST()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    save_checkpoint(east_dir, 1, {"params": variables["params"],
                                  "batch_stats": variables["batch_stats"]})

    out = str(tmp_path / "run")
    res = main([
        "--synthetic", "48",
        "--out", out,
        "--batch-size", "8",
        "--text-epochs", "1",
        "--fusion-epochs", "2",
        "--east-ckpt", east_dir,
        "--opts",
        "MODEL.UNIXCODER.LAYERS", "1",
        "MODEL.UNIXCODER.HIDDEN", "32",
        "MODEL.UNIXCODER.HEADS", "2",
        "MODEL.UNIXCODER.INTERMEDIATE", "64",
        "DATA.FUNC_TOKENS", "64",
        "DATA.NODE_TOKENS", "16",
        "DATA.MAX_NODES", "24",
        "MODEL.MULTI.HIDDEN", "48",
        "MODEL.MULTI.NUM_RS_GCN", "1",
        "MODEL.MULTI.NUM_HIDDEN_FC", "1",
        "TRAIN.WARMUP_EPOCHS", "0",
        "TRAIN.EARLY_STOP_PATIENCE", "20",
        "AUG.MIXUP", "0.0",
        "AUG.CUTMIX", "0.0",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "50",
    ])
    assert np.isfinite(res["fusion_best_f1"])
    summary = json.load(open(os.path.join(out, "pipeline_summary.json")))
    assert summary["positions"] == "ocr"
    assert 0.0 <= summary["ocr_node_recovery"] <= 1.0
    assert summary["ocr_images"] > 0
    # OCR-positioned npz caches live in their own dir (no oracle shadowing)
    for part in ("train", "val", "test"):
        assert os.path.exists(os.path.join(out, "cache_ocr", f"{part}.npz"))
    # per-image norm-pos pickles were written by the detector
    import glob
    assert glob.glob(os.path.join(out, "cache", "pos_ocr", "*.pkl"))
