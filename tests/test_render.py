import numpy as np

from mvuld_tpu.tools.cpg import extract_line_cpg
from mvuld_tpu.tools.render import (icdar_gt_lines, layout, load_norm_pos,
                                    render_cpg, save_norm_pos)
from mvuld_tpu.tools.synthetic import generate_dataset

CODE = """int f(int a, char *s)
{
    int x;
    x = 0;
    if (a > 0) {
        x = a + 1;
    }
    while (x > 0) {
        x--;
    }
    return x;
}"""


def test_render_produces_image_and_boxes(tmp_path):
    cpg = extract_line_cpg(CODE).filtered("all")
    out = str(tmp_path / "g.png")
    img, pos = render_cpg(cpg, out_path=out)
    assert img.size[0] > 100 and img.size[1] > 100
    assert (tmp_path / "g.png").exists()
    # one box per node, all normalized within [0,1]
    assert set(pos) == {n[0] for n in cpg.nodes}
    for (sx, sy, ex, ey) in pos.values():
        assert 0 <= sx < ex <= 1 and 0 <= sy < ey <= 1
    # image is mostly white with colored ink
    arr = np.asarray(img)
    assert (arr == 255).mean() > 0.5
    assert (arr != 255).any()


def test_boxes_line_up_with_text(tmp_path):
    cpg = extract_line_cpg(CODE).filtered("all")
    img, pos = render_cpg(cpg)
    arr = np.asarray(img.convert("L"))
    H, W = arr.shape
    for lineno, (sx, sy, ex, ey) in pos.items():
        x0, y0, x1, y1 = int(sx * W), int(sy * H), int(ex * W), int(ey * H)
        patch = arr[y0:y1, x0:x1]
        assert (patch < 128).any(), f"no dark text inside box of line {lineno}"


def test_norm_pos_roundtrip(tmp_path):
    cpg = extract_line_cpg(CODE).filtered("all")
    _, pos = render_cpg(cpg)
    p = str(tmp_path / "pos.pkl")
    save_norm_pos(pos, p)
    loaded = load_norm_pos(p)
    assert set(loaded) == set(pos)
    first = next(iter(pos))
    np.testing.assert_allclose(loaded[first], list(pos[first]))


def test_icdar_gt_format():
    cpg = extract_line_cpg(CODE).filtered("all")
    boxes = layout(cpg)
    lines = icdar_gt_lines(cpg, boxes)
    assert len(lines) == len(boxes)
    parts = lines[0].split(",")
    assert len(parts) >= 9
    assert all(p.strip().lstrip("-").isdigit() for p in parts[:8])


def test_render_corpus_determinism():
    df = generate_dataset(5, seed=3)
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before).filtered("all")
        img1, pos1 = render_cpg(cpg)
        img2, pos2 = render_cpg(cpg)
        np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
        assert pos1 == pos2
