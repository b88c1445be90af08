"""EAST ground-truth rasterization (score/geo maps from quad annotations).

Reference: OCR/dataset.py get_score_geo:319 + extract_vertices:375 — shrunk
polygons mark positive score pixels; each positive pixel stores its four
rotated-rect edge distances and the rect angle. This implementation is
numpy/cv2 (no shapely): general quads go through cv2.minAreaRect; the
renderer's axis-aligned boxes take the exact fast path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

SHRINK = 0.3
SCALE = 4            # gt maps are at 1/4 input resolution


def parse_icdar_line(line: str) -> Tuple[np.ndarray, str]:
    parts = line.strip().split(",")
    quad = np.asarray([float(p) for p in parts[:8]], np.float32).reshape(4, 2)
    label = ",".join(parts[8:])
    return quad, label


def shrink_quad(quad: np.ndarray, coef: float = SHRINK) -> np.ndarray:
    """Move each vertex toward the centroid by coef·(short side) — the EAST
    shrink that keeps score pixels off the boundary."""
    ctr = quad.mean(axis=0, keepdims=True)
    return quad + (ctr - quad) * coef


def rasterize_gt(quads: Sequence[np.ndarray], img_h: int, img_w: int,
                 ignored: Sequence[bool] | None = None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (score [h,w,1], geo [h,w,5], ignored_map [h,w,1]) at 1/4 scale."""
    import cv2

    h, w = img_h // SCALE, img_w // SCALE
    score = np.zeros((h, w, 1), np.float32)
    geo = np.zeros((h, w, 5), np.float32)
    ignored_map = np.zeros((h, w, 1), np.float32)
    if ignored is None:
        ignored = [False] * len(quads)

    ys, xs = np.mgrid[0:h, 0:w]
    px = xs.astype(np.float32) * SCALE    # full-scale pixel coordinates
    py = ys.astype(np.float32) * SCALE

    for quad, ign in zip(quads, ignored):
        quad = np.asarray(quad, np.float32).reshape(4, 2)
        shrunk = shrink_quad(quad)
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [np.round(shrunk / SCALE).astype(np.int32)], 1)
        if ign:
            ignored_map[mask > 0, 0] = 1.0
            continue
        rect = cv2.minAreaRect(quad)       # ((cx,cy),(rw,rh),angle_deg)
        (cx, cy), (rw, rh), ang_deg = rect
        theta = -np.deg2rad(ang_deg)       # EAST angle convention: CCW positive
        # normalize so the "width" is the long side and |theta| ≤ 45°
        if rw < rh:
            rw, rh = rh, rw
            theta += np.pi / 2
        while theta > np.pi / 2:
            theta -= np.pi
        while theta < -np.pi / 2:
            theta += np.pi
        cos, sin = np.cos(theta), np.sin(theta)
        # rotate pixels into the rect frame
        rx = (px - cx) * cos - (py - cy) * sin
        ry = (px - cx) * sin + (py - cy) * cos
        d_top = rh / 2 + ry                # distance to top edge
        d_bot = rh / 2 - ry
        d_left = rw / 2 + rx
        d_right = rw / 2 - rx
        m = mask > 0
        score[m, 0] = 1.0
        geo[m, 0] = np.maximum(d_top[m], 0)
        geo[m, 1] = np.maximum(d_bot[m], 0)
        geo[m, 2] = np.maximum(d_left[m], 0)
        geo[m, 3] = np.maximum(d_right[m], 0)
        geo[m, 4] = theta
    return score, geo, ignored_map


def crop_with_text(img, quads: np.ndarray, length: int,
                   rng: np.random.RandomState):
    """Text-region-aware random square crop — the reference's active EAST
    training augmentation (OCR/dataset.py crop_img:197-248, applied per
    __getitem__ at :415; the height/rotate variants there are commented out
    and intentionally not mirrored).

    Semantics preserved: (1) bilinear-upscale so the short side ≥ ``length``
    (quads scaled along); (2) choose the crop origin uniformly from the
    range that keeps the FULL text extent inside the window when it fits
    (otherwise the range degenerates toward covering as much as possible);
    (3) shift quads into crop coordinates.

    img: PIL Image; quads: [n, 4, 2] float pixels. Returns (PIL length²
    crop, shifted quads [n, 4, 2]).
    """
    from PIL import Image

    w, h = img.size
    if h >= w and w < length:
        img = img.resize((length, int(h * length / w)), Image.BILINEAR)
    elif h < w and h < length:
        img = img.resize((int(w * length / h), length), Image.BILINEAR)
    ratio_w = img.width / w
    ratio_h = img.height / h
    quads = np.asarray(quads, np.float32).reshape(-1, 4, 2).copy()
    quads[..., 0] *= ratio_w
    quads[..., 1] *= ratio_h

    remain_w = [0, img.width - length]
    remain_h = [0, img.height - length]
    if quads.size:
        x_lo, x_hi = quads[..., 0].min(), quads[..., 0].max()
        y_lo, y_hi = quads[..., 1].min(), quads[..., 1].max()
        if x_hi > length:
            remain_w[0] = x_hi - length
        if x_lo < remain_w[1]:
            remain_w[1] = x_lo
        if y_hi > length:
            remain_h[0] = y_hi - length
        if y_lo < remain_h[1]:
            remain_h[1] = y_lo
    start_w = int(rng.rand() * (remain_w[1] - remain_w[0])) + int(remain_w[0])
    start_h = int(rng.rand() * (remain_h[1] - remain_h[0])) + int(remain_h[0])
    region = img.crop((start_w, start_h, start_w + length, start_h + length))
    if quads.size:
        quads[..., 0] -= start_w
        quads[..., 1] -= start_h
    return region, quads


def gt_from_icdar(lines: List[str], img_h: int, img_w: int):
    quads, ignored = [], []
    for line in lines:
        quad, label = parse_icdar_line(line)
        quads.append(quad)
        ignored.append(label.strip() == "###")
    return rasterize_gt(quads, img_h, img_w, ignored)
