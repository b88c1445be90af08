"""EAST crop augmentation parity (reference OCR/dataset.py crop_img:197-248)
and the held-out visual style (VERDICT r2 items 2-3)."""

import numpy as np
import pytest
from PIL import Image


def _mk_img_quads(W=320, H=300):
    img = Image.new("RGB", (W, H), "white")
    quads = np.array([
        [[40, 50], [120, 50], [120, 80], [40, 80]],
        [[150, 100], [260, 100], [260, 130], [150, 130]],
    ], np.float32)
    return img, quads


def test_crop_covers_text_extent_when_it_fits():
    from mvuld_tpu.ocr.gt import crop_with_text
    rng = np.random.RandomState(0)
    img, quads = _mk_img_quads()       # no upscale: both sides ≥ 256
    for _ in range(20):
        region, q = crop_with_text(img, quads, 256, rng)
        assert region.size == (256, 256)
        # reference semantics: crop start chosen so the full text extent
        # (x 40..260, y 50..130 — both spans < 256) stays inside
        assert q[..., 0].min() >= 0 and q[..., 0].max() <= 256
        assert q[..., 1].min() >= 0 and q[..., 1].max() <= 256


def test_crop_upscales_small_images():
    from mvuld_tpu.ocr.gt import crop_with_text
    rng = np.random.RandomState(1)
    img = Image.new("RGB", (100, 80), "white")   # both sides < length
    quads = np.array([[[20, 20], [60, 20], [60, 40], [20, 40]]], np.float32)
    region, q = crop_with_text(img, quads, 128, rng)
    assert region.size == (128, 128)
    # upscale ratio 128/80 = 1.6: the 40-px-wide box is now 64 px and the
    # crop start range keeps it fully inside
    np.testing.assert_allclose(q[0, 1, 0] - q[0, 0, 0], 40 * 1.6, atol=1e-3)
    assert q[..., 0].min() >= 0 and q[..., 0].max() <= 128


def test_crop_translates_gt_consistently():
    """Rasterized gt of the cropped quads must light pixels where the text
    actually is in the cropped image."""
    from mvuld_tpu.ocr.gt import SCALE, crop_with_text, rasterize_gt
    rng = np.random.RandomState(2)
    img, quads = _mk_img_quads()
    d = Image.new("RGB", img.size, "white")
    px = np.asarray(img).copy()
    px[50:80, 40:120] = (0, 0, 0)          # paint the first box black
    img = Image.fromarray(px)
    region, q = crop_with_text(img, quads, 256, rng)
    score, _geo, _ign = rasterize_gt(list(q), 256, 256)
    # the black pixels in the crop must fall inside the score-positive area
    reg = np.asarray(region)[::SCALE, ::SCALE].mean(axis=-1)
    black = reg < 64
    pos = score[..., 0] > 0
    assert black.sum() > 0
    assert (black & pos).sum() / black.sum() > 0.5


def test_held_out_style_renders_differently():
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import (DEFAULT_STYLE, HELD_OUT_STYLE,
                                        layout, render_cpg)
    code = "int f(int a)\n{\n    int x;\n    x = a + 1;\n    return x;\n}"
    cpg = extract_line_cpg(code).filtered("all")
    img_a, pos_a = render_cpg(cpg, style=DEFAULT_STYLE)
    img_b, pos_b = render_cpg(cpg, style=HELD_OUT_STYLE)
    assert set(pos_a) == set(pos_b)              # same nodes, both styles
    assert img_a.size != img_b.size              # spacing really differs
    la, lb = layout(cpg, DEFAULT_STYLE), layout(cpg, HELD_OUT_STYLE)
    assert any(la[k] != lb[k] for k in la)


@pytest.mark.slow
def test_train_with_crop_and_heldout_eval(tmp_path):
    """End-to-end slice: crop-augmented training runs and the held-out-style
    H-mean evaluation produces finite metrics (quality thresholds belong to
    the real-scale TPU demo, NOTES_r3)."""
    from mvuld_tpu.train.train_east import main
    res = main([
        "--synthetic", "10", "--img-size", "64", "--epochs", "3",
        "--batch-size", "4", "--eval-synthetic", "4",
        "--eval-style", "heldout", "--out-dir", str(tmp_path),
    ])
    assert np.isfinite(res["losses"]).all()
    assert res["losses"][-1] < res["losses"][0]
    ev = res["eval"]
    assert set(ev) >= {"precision", "recall", "hmean"}
    assert np.isfinite([ev["precision"], ev["recall"], ev["hmean"]]).all()
