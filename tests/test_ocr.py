import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.ocr.detect import (get_boxes, nms_locality, restore_polys,
                                  _poly_iou, _weighted_merge)
from mvuld_tpu.ocr.east import EAST, dice_loss, east_loss
from mvuld_tpu.ocr.gt import rasterize_gt, shrink_quad
from mvuld_tpu.ocr.recognize import (GlyphRecognizer, LinenoReader,
                                      lineno_from_text)


@pytest.mark.slow
def test_east_shapes():
    model = EAST()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    (score, geo), _ = model.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    assert score.shape == (1, 16, 16, 1)
    assert geo.shape == (1, 16, 16, 5)
    s, g = model.apply(variables, x, train=False)
    assert float(s.min()) >= 0 and float(s.max()) <= 1


def test_dice_and_loss():
    gt = jnp.ones((1, 8, 8, 1))
    assert float(dice_loss(gt, gt)) == pytest.approx(0.0, abs=1e-5)
    assert float(dice_loss(gt, jnp.zeros_like(gt))) == pytest.approx(1.0, abs=1e-4)
    geo = jnp.ones((1, 8, 8, 5)) * 4.0
    loss_same = east_loss(gt, gt, geo, geo, jnp.zeros_like(gt))
    assert float(loss_same) == pytest.approx(0.0, abs=1e-4)
    # empty gt → zero loss (reference loss.py:36-38)
    z = jnp.zeros_like(gt)
    assert float(east_loss(z, gt, geo, geo, z)) == 0.0


def test_rasterize_axis_aligned():
    quad = np.array([[16, 16], [48, 16], [48, 32], [16, 32]], np.float32)
    score, geo, ign = rasterize_gt([quad], 64, 64)
    assert score.shape == (16, 16, 1)
    assert score.sum() > 0
    # center pixel distances ≈ half box extents
    cy, cx = 6, 8          # pixel (24, 32) full-scale
    assert score[cy, cx, 0] == 1.0
    d = geo[cy, cx]
    assert d[0] + d[1] == pytest.approx(16, abs=1.0)   # height
    assert d[2] + d[3] == pytest.approx(32, abs=1.0)   # width
    assert abs(d[4]) < 0.2


def test_shrink_quad_moves_inward():
    quad = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    s = shrink_quad(quad)
    assert (s[:, 0].min() > 0) and (s[:, 0].max() < 10)


def test_restore_polys_roundtrip():
    # a pixel at (8, 8) (feature scale) with distances 8,8,16,16, angle 0
    valid_pos = np.array([[8.0, 8.0]], np.float32)
    valid_geo = np.array([[8.0], [8.0], [16.0], [16.0], [0.0]], np.float32)
    polys, idx = restore_polys(valid_pos.copy(), valid_geo, (32, 32))
    assert idx == [0]
    xs, ys = polys[0][0::2], polys[0][1::2]
    assert xs.min() == pytest.approx(16.0) and xs.max() == pytest.approx(48.0)
    assert ys.min() == pytest.approx(24.0) and ys.max() == pytest.approx(40.0)


def _box(x0, y0, x1, y1, s):
    return np.array([x0, y0, x1, y0, x1, y1, x0, y1, s], np.float32)


def test_poly_iou_and_merge():
    a = _box(0, 0, 10, 10, 1.0)
    b = _box(0, 0, 10, 10, 3.0)
    assert _poly_iou(a[:8], b[:8]) == pytest.approx(1.0, abs=1e-3)
    c = _box(20, 20, 30, 30, 1.0)
    assert _poly_iou(a[:8], c[:8]) == 0.0
    m = _weighted_merge(a, b)
    assert m[8] == 4.0
    np.testing.assert_allclose(m[:8], a[:8], atol=1e-5)


def test_nms_locality_merges_and_keeps():
    boxes = np.stack([
        _box(0, 0, 10, 10, 0.9),
        _box(1, 1, 11, 11, 0.8),     # overlaps → merged
        _box(50, 50, 60, 60, 0.95),  # separate
    ])
    kept = nms_locality(boxes, 0.2)
    assert len(kept) == 2


def test_native_lanms_matches_fallback():
    try:
        from mvuld_tpu.ocr import lanms_native
        native = lanms_native.merge_quadrangle_n9
    except Exception as e:
        pytest.skip(f"no native build: {e}")
    rng = np.random.RandomState(0)
    boxes = []
    for i in range(12):
        x0, y0 = rng.rand(2) * 100
        w, h = rng.rand(2) * 30 + 5
        boxes.append(_box(x0, y0, x0 + w, y0 + h, rng.rand()))
    boxes = np.stack(boxes)
    out = native(boxes.copy(), 0.2)
    assert out.shape[1] == 9
    assert 1 <= len(out) <= len(boxes)
    # scores of kept boxes are sums of merged constituents → >= max input
    assert out[:, 8].max() >= boxes[:, 8].max() - 1e-5


def test_get_boxes_from_synthetic_maps():
    """A clean synthetic score/geo map decodes to the planted box."""
    score = np.zeros((32, 32), np.float32)
    geo = np.zeros((32, 32, 5), np.float32)
    # plant a 32×16 box centered at (64, 48) full-scale
    for r in range(10, 14):
        for c in range(13, 19):
            score[r, c] = 0.99
            y, x = r * 4, c * 4
            geo[r, c] = [y - 40, 56 - y, x - 48, 80 - x, 0.0]
    boxes = get_boxes(score, geo, score_thresh=0.9)
    assert boxes is not None and len(boxes) == 1
    xs, ys = boxes[0][0:8:2], boxes[0][1:8:2]
    assert xs.min() == pytest.approx(48, abs=2) and xs.max() == pytest.approx(80, abs=2)
    assert ys.min() == pytest.approx(40, abs=2) and ys.max() == pytest.approx(56, abs=2)


def test_glyph_recognizer_on_rendered_label():
    from PIL import Image, ImageDraw, ImageFont
    try:
        font = ImageFont.load_default(size=14)
    except TypeError:
        font = ImageFont.load_default()
    img = Image.new("RGB", (220, 24), "white")
    d = ImageDraw.Draw(img)
    d.text((4, 2), "METHOD_17: INT F", fill="black", font=font)
    rec = GlyphRecognizer()
    text = rec.recognize(img)
    assert lineno_from_text(text) == 17, text
    assert LinenoReader().read(img) == 17


def test_lineno_from_text_variants():
    assert lineno_from_text("IF_12: IF (A > 0) {") == 12
    assert lineno_from_text("LOCAL_3:INT X;") == 3
    assert lineno_from_text("garbage") is None
    assert lineno_from_text("FOR 9 : X") == 9


def test_lineno_reader_on_real_render():
    """The structural reader recovers every node's line number from the
    renderer's output — the Tesseract-replacement acceptance test."""
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import render_cpg
    from mvuld_tpu.tools.synthetic import generate_dataset

    reader = LinenoReader()
    total, correct = 0, 0
    df = generate_dataset(5, seed=3)
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before)
        if cpg is None:
            continue
        g = cpg.filtered("all")
        img, gt_pos = render_cpg(g)
        W, H = img.size
        for ln, (sx, sy, ex, ey) in gt_pos.items():
            crop = img.crop((int(sx * W) - 2, int(sy * H) - 2,
                             int(ex * W) + 2, int(ey * H) + 2))
            total += 1
            correct += int(reader.read(crop) == ln)
    assert total >= 20
    assert correct / total >= 0.95, f"{correct}/{total}"


def test_detect_image_pad_to_matches_unpadded():
    """pad_to buckets the input shape for compile caching; detections on the
    original extent must be unchanged and padding-area hits dropped."""
    from PIL import Image

    from mvuld_tpu.ocr.detect import detect_image

    H, W = 128, 160                                  # /32-aligned already

    def fake_apply(_params, x):
        # plant a box only inside the original extent; score map is /4 scale
        h, w = x.shape[1] // 4, x.shape[2] // 4
        score = np.zeros((1, h, w, 1), np.float32)
        geo = np.zeros((1, h, w, 5), np.float32)
        for r in range(10, 14):
            for c in range(13, 19):
                score[0, r, c, 0] = 0.99
                y, xx = r * 4, c * 4
                geo[0, r, c] = [y - 40, 56 - y, xx - 48, 80 - xx, 0.0]
        return score, geo

    img = Image.new("RGB", (W, H), "white")
    base = detect_image(fake_apply, None, img)
    padded = detect_image(fake_apply, None, img, pad_to=256)
    assert base is not None and padded is not None
    assert len(base) == len(padded) == 1
    np.testing.assert_allclose(padded[0][:8], base[0][:8], atol=1e-4)

    def pad_only_apply(_params, x):
        # a detection entirely in the padding margin must be filtered out
        h, w = x.shape[1] // 4, x.shape[2] // 4
        score = np.zeros((1, h, w, 1), np.float32)
        geo = np.zeros((1, h, w, 5), np.float32)
        if h > H // 4 + 4:
            r, c = H // 4 + 3, 2
            score[0, r, c, 0] = 0.99
            y, xx = r * 4, c * 4
            geo[0, r, c] = [4.0, 4.0, 4.0, 4.0, 0.0]
        return score, geo

    assert detect_image(pad_only_apply, None, img, pad_to=256) is None


def test_lineno_reader_heldout_style():
    """The reader must survive a font face it wasn't tuned on: DejaVu glyph
    templates + connected-component structural parsing (the held-out style's
    underscore column-merges with its neighbor under kerning)."""
    from mvuld_tpu.ocr.recognize import LinenoReader
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import HELD_OUT_STYLE, layout, render_cpg
    from mvuld_tpu.tools.synthetic import generate_dataset

    reader = LinenoReader()
    df = generate_dataset(4, seed=123)
    ok = tot = 0
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before)
        if cpg is None:
            continue
        g = cpg.filtered("all")
        if len(g.nodes) < 2:
            continue
        img, _ = render_cpg(g, out_path=None, style=HELD_OUT_STYLE)
        for ln, (x0, y0, x1, y1) in layout(g, HELD_OUT_STYLE).items():
            crop = img.crop((max(x0 - 2, 0), max(y0 - 2, 0),
                             min(x1 + 2, img.width), min(y1 + 2, img.height)))
            tot += 1
            ok += reader.read(crop) == ln
    assert tot >= 10
    assert ok / tot >= 0.9, f"{ok}/{tot}"
