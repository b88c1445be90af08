"""EAST trainer smoke: gt corpus builds from the renderer, loss decreases."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the -m 'not slow' quick lane


def test_east_training_loss_decreases(tmp_path):
    from mvuld_tpu.train.train_east import main
    res = main([
        "--synthetic", "12",
        "--img-size", "64",
        "--epochs", "4",
        "--batch-size", "4",
        "--lr", "1e-3",
        "--out-dir", str(tmp_path),
    ])
    losses = res["losses"]
    assert len(losses) == 4
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_detect_dataset_map_with_gt_oracle(tmp_path):
    """detect_dataset_map writes norm-pos pickles; with an oracle 'detector'
    built from gt maps, the recovered linenos match the renderer's."""
    import jax.numpy as jnp

    from mvuld_tpu.ocr.detect import detect_dataset_map
    from mvuld_tpu.ocr.gt import rasterize_gt
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import layout, render_cpg

    code = "int f(int a)\n{\n    int x;\n    x = a;\n    return x;\n}"
    cpg = extract_line_cpg(code).filtered("all")
    img_path = str(tmp_path / "7.png")
    img, gt_pos = render_cpg(cpg, out_path=img_path)
    boxes_px = layout(cpg)

    # oracle apply_fn: return the rasterized gt of the resized image
    def oracle_apply(_params, x):
        H, W = int(x.shape[1]), int(x.shape[2])
        sx, sy = W / img.size[0], H / img.size[1]
        quads = [np.array([[x0 * sx, y0 * sy], [x1 * sx, y0 * sy],
                           [x1 * sx, y1 * sy], [x0 * sx, y1 * sy]], np.float32)
                 for (x0, y0, x1, y1) in boxes_px.values()]
        score, geo, _ = rasterize_gt(quads, H, W)
        return jnp.asarray(score[None]), jnp.asarray(geo[None])

    out = detect_dataset_map(oracle_apply, None, [img_path],
                             str(tmp_path / "pos"))
    import pickle
    with open(out["7"], "rb") as f:
        pos = pickle.load(f)
    found = set(pos) & set(gt_pos)
    assert len(found) >= max(len(gt_pos) - 2, 2), (sorted(pos), sorted(gt_pos))
    # recovered boxes overlap the gt boxes
    for ln in found:
        gx0, gy0, gx1, gy1 = gt_pos[ln]
        px0, py0, px1, py1 = pos[ln]
        ix = max(0.0, min(gx1, px1) - max(gx0, px0))
        iy = max(0.0, min(gy1, py1) - max(gy0, py0))
        assert ix > 0 and iy > 0, (ln, gt_pos[ln], pos[ln])


def test_east_eval_only_and_random_style(tmp_path):
    """--train-style random builds a domain-randomized corpus; --eval-only
    reloads the saved checkpoint and reruns evals without training."""
    from mvuld_tpu.train.train_east import main
    res = main([
        "--synthetic", "10",
        "--img-size", "64",
        "--epochs", "2",
        "--batch-size", "4",
        "--train-style", "random",
        "--out-dir", str(tmp_path),
    ])
    assert np.isfinite(res["losses"]).all()

    res2 = main([
        "--synthetic", "10",
        "--img-size", "64",
        "--epochs", "0",
        "--eval-only", str(tmp_path),
        "--eval-synthetic", "3",
        "--eval-style", "heldout",
        "--eval-recovery", "2",
        "--out-dir", str(tmp_path),
    ])
    assert "eval" in res2 and "hmean" in res2["eval"]
    assert "recovery" in res2 and 0 <= res2["recovery"]["recovery_rate"] <= 1
