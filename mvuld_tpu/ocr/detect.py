"""EAST detection post-processing: decode, locality-aware NMS, box→lineno map.

Reference: OCR/detect.py:16-378 — threshold the score map (>0.9), restore
rotated rectangles from per-pixel distances+angle, locality-aware NMS
(pure-python nms_locality in the reference; a C++ lanms exists but is
bypassed — here the hot path has a C++ implementation in native/lanms.cpp
with a numpy fallback), then per-box text recognition to recover each node's
line number, producing ``norm_pos_dict/{id}.pkl`` ({lineno: [sx,sy,ex,ey]
normalized}; reference: detect_dataset_map:285-353).

Tesseract is replaced by a self-contained glyph-template recognizer
(mvuld_tpu/ocr/recognize.py) matched to the renderer's font.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np


def get_rotate_mat(theta: float) -> np.ndarray:
    return np.array([[np.cos(theta), -np.sin(theta)],
                     [np.sin(theta), np.cos(theta)]], np.float32)


def restore_polys(valid_pos: np.ndarray, valid_geo: np.ndarray,
                  score_shape: Tuple[int, int], scale: int = 4
                  ) -> Tuple[np.ndarray, List[int]]:
    """Vectorized rotated-rect restoration (reference: restore_polys:56-91)."""
    polys, index = [], []
    pos = valid_pos * scale
    d = valid_geo[:4]
    angle = valid_geo[4]
    for i in range(pos.shape[0]):
        x, y = float(pos[i, 0]), float(pos[i, 1])
        y_min, y_max = y - d[0, i], y + d[1, i]
        x_min, x_max = x - d[2, i], x + d[3, i]
        rot = get_rotate_mat(-float(angle[i]))
        tx = np.array([x_min, x_max, x_max, x_min]) - x
        ty = np.array([y_min, y_min, y_max, y_max]) - y
        res = rot @ np.stack([tx, ty])
        res[0] += x
        res[1] += y
        # at most one corner may fall outside (reference: is_valid_poly)
        out = ((res[0] < 0) | (res[0] >= score_shape[1] * scale) |
               (res[1] < 0) | (res[1] >= score_shape[0] * scale)).sum()
        if out <= 1:
            index.append(i)
            polys.append(res.T.reshape(-1))
    return (np.asarray(polys, np.float32) if polys else
            np.zeros((0, 8), np.float32)), index


def _poly_area(p: np.ndarray) -> float:
    x, y = p[0::2], p[1::2]
    return 0.5 * abs(float(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1))))


def _poly_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Polygon IoU via cv2 rotated-rect intersection (shapely-free)."""
    import cv2
    ra = cv2.minAreaRect(a.reshape(4, 2).astype(np.float32))
    rb = cv2.minAreaRect(b.reshape(4, 2).astype(np.float32))
    ok, inter_pts = cv2.rotatedRectangleIntersection(ra, rb)
    if inter_pts is None or ok == cv2.INTERSECT_NONE:
        return 0.0
    inter = cv2.contourArea(cv2.convexHull(inter_pts))
    union = _poly_area(a) + _poly_area(b) - inter
    return float(inter / union) if union > 0 else 0.0


def _weighted_merge(g: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Score-weighted vertex merge (lanms semantics)."""
    out = np.empty(9, np.float32)
    out[:8] = (g[8] * g[:8] + p[8] * p[:8]) / (g[8] + p[8])
    out[8] = g[8] + p[8]
    return out


def _standard_nms(polys: np.ndarray, thresh: float) -> np.ndarray:
    order = np.argsort(-polys[:, 8])
    keep = []
    suppressed = np.zeros(len(polys), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if _poly_iou(polys[i, :8], polys[j, :8]) > thresh:
                suppressed[j] = True
    return polys[keep]


_NATIVE = None


def _native_lanms():
    """Load the C++ locality-aware NMS if built (native/lanms.cpp)."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from mvuld_tpu.ocr import lanms_native
            _NATIVE = lanms_native
        except Exception:
            _NATIVE = False
    return _NATIVE or None


def nms_locality(polys: np.ndarray, thresh: float = 0.2) -> np.ndarray:
    """Locality-aware NMS: merge consecutive (row-ordered) overlapping boxes
    by score-weighted average, then standard NMS (reference:
    evaluate/test_lnms.py:46, used at detect.py:122)."""
    if len(polys) == 0:
        return polys
    native = _native_lanms()
    if native is not None:
        return native.merge_quadrangle_n9(polys.astype(np.float32), thresh)
    merged = []
    prev: Optional[np.ndarray] = None
    for g in polys:
        if prev is not None and _poly_iou(g[:8], prev[:8]) > thresh:
            prev = _weighted_merge(g, prev)
        else:
            if prev is not None:
                merged.append(prev)
            prev = g.copy()
    if prev is not None:
        merged.append(prev)
    return _standard_nms(np.asarray(merged, np.float32), thresh)


def get_boxes(score: np.ndarray, geo: np.ndarray, score_thresh: float = 0.9,
              nms_thresh: float = 0.2) -> Optional[np.ndarray]:
    """score [h,w] / geo [h,w,5] (channel-last) → [n, 9] boxes+score
    (reference: get_boxes:94-123)."""
    score = np.squeeze(score)
    xy = np.argwhere(score > score_thresh)          # [n, 2] (row, col)
    if xy.size == 0:
        return None
    xy = xy[np.argsort(xy[:, 0])]                   # row order (locality)
    valid_pos = xy[:, ::-1].astype(np.float32).copy()   # (x, y)
    valid_geo = geo[xy[:, 0], xy[:, 1]].T           # [5, n]
    polys, index = restore_polys(valid_pos, valid_geo, score.shape)
    if polys.shape[0] == 0:
        return None
    boxes = np.zeros((polys.shape[0], 9), np.float32)
    boxes[:, :8] = polys
    boxes[:, 8] = score[xy[index, 0], xy[index, 1]]
    return nms_locality(boxes, nms_thresh)


def adjust_ratio(boxes: Optional[np.ndarray], ratio_w: float, ratio_h: float
                 ) -> Optional[np.ndarray]:
    if boxes is None or boxes.size == 0:
        return None
    boxes[:, 0:8:2] /= ratio_w
    boxes[:, 1:8:2] /= ratio_h
    return boxes


def detect_image(apply_fn, params, img, score_thresh: float = 0.9,
                 pad_to: int = 0) -> Optional[np.ndarray]:
    """Run the detector on one PIL image (resized to /32 multiples,
    reference: resize_img:16-29 + detect:→ adjust_ratio).

    ``pad_to > 0`` pads the resized image bottom/right with white to the
    next multiple of ``pad_to``: on the TPU relay every distinct input
    shape is a separate (minutes-long) XLA compile, so bucketing corpus
    detection to a handful of shapes is the difference between one warm
    cache and hundreds of cold compiles. EAST is fully convolutional —
    padding with background only adds empty score-map area, which the
    >thresh cut discards."""
    import jax.numpy as jnp
    w, h = img.size
    rw = w if w % 32 == 0 else (w // 32) * 32
    rh = h if h % 32 == 0 else (h // 32) * 32
    rw, rh = max(rw, 32), max(rh, 32)
    resized = img.resize((rw, rh))
    x = np.asarray(resized, np.float32) / 255.0
    x = (x - 0.5) / 0.5                              # reference load_pil norm
    if pad_to:
        ph = -rh % pad_to
        pw = -rw % pad_to
        if ph or pw:
            # renderer canvases are white; +1.0 is white after the ±0.5 norm
            x = np.pad(x, ((0, ph), (0, pw), (0, 0)), constant_values=1.0)
    score, geo = apply_fn(params, jnp.asarray(x[None]))
    boxes = get_boxes(np.asarray(score)[0, :, :, 0], np.asarray(geo)[0],
                      score_thresh)
    if pad_to and boxes is not None and boxes.size:
        # drop detections that fell entirely in the padding margin
        keep = ((boxes[:, 0:8:2].min(axis=1) < rw) &
                (boxes[:, 1:8:2].min(axis=1) < rh))
        boxes = boxes[keep] if keep.any() else None
    return adjust_ratio(boxes, rw / w, rh / h)


def detect_dataset_map(apply_fn, params, img_paths: List[str], out_dir: str,
                       recognizer=None, score_thresh: float = 0.9,
                       logger=None, pad_to: int = 0) -> Dict[str, str]:
    """Detect every image, recognize each box's line number, and write
    ``{out_dir}/{img_id}.pkl`` norm-pos dicts (reference:
    detect_dataset_map:285-353 + Tesseract per padded box)."""
    from PIL import Image

    from mvuld_tpu.ocr.recognize import LinenoReader

    recognizer = recognizer or LinenoReader()
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for path in img_paths:
        img_id = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(out_dir, f"{img_id}.pkl")
        if os.path.exists(out_path):
            written[img_id] = out_path
            continue
        img = Image.open(path).convert("RGB")
        W, H = img.size
        boxes = detect_image(apply_fn, params, img, score_thresh,
                             pad_to=pad_to)
        pos: Dict[int, List[float]] = {}
        if boxes is not None:
            for b in boxes:
                xs, ys = b[0:8:2], b[1:8:2]
                x0, x1 = float(xs.min()), float(xs.max())
                y0, y1 = float(ys.min()), float(ys.max())
                pad = 2
                crop = img.crop((max(x0 - pad, 0), max(y0 - pad, 0),
                                 min(x1 + pad, W), min(y1 + pad, H)))
                lineno = recognizer.read(crop)
                if lineno is not None:
                    pos[lineno] = [x0 / W, y0 / H, x1 / W, y1 / H]
        with open(out_path, "wb") as f:
            pickle.dump(pos, f)
        written[img_id] = out_path
        if logger:
            logger.info(f"{img_id}: {len(pos)} node boxes")
    return written


def load_east_detector(ckpt_path: str):
    """Resolve + load a trained EAST checkpoint and return ``(apply_fn,
    params)`` ready for detect_image / detect_dataset_map.

    ``ckpt_path`` may be an orbax checkpoint path or a train_east output
    root, in which case the newest ``ckpt_epoch_*`` under it is picked
    (the reference loads a fixed epoch pth, OCR/eval.py:11-49). BatchNorm
    running stats ride as a closure constant — EAST's stats are a few KB,
    far below the relay's compile-request limit."""
    import glob

    import jax

    from mvuld_tpu.core.checkpoint import load_checkpoint
    from mvuld_tpu.ocr.east import EAST

    path = ckpt_path
    if os.path.isdir(path) and not os.path.basename(path).startswith(
            ("ckpt_epoch_", "best_f1_epoch_")):
        cands = glob.glob(os.path.join(path, "**", "ckpt_epoch_*"),
                          recursive=True)
        if not cands:
            raise FileNotFoundError(f"no ckpt_epoch_* under {path}")
        path = max(cands, key=lambda p: int(p.rsplit("_", 1)[1]))
    state = load_checkpoint(path)
    model = EAST()
    batch_stats = state["batch_stats"]

    @jax.jit
    def apply_fn(params, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)

    # device-resident ONCE: a host-numpy param tree as a jit argument is
    # re-uploaded on EVERY dispatch — ~25 MB × 2220 corpus images over the
    # ~5 MB/s relay turned the OCR stage into hours and fed the relay
    # client's per-transfer-byte RAM leak (r5 chain OOM).
    return apply_fn, jax.device_put(state["params"])
