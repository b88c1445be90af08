"""Glyph-template text recognizer — the self-contained Tesseract replacement.

The reference runs Tesseract over each detected node box and regex-extracts
the node's line-number label (reference: OCR/detect.py:285-353, pattern
``NTYPE_lineno: code``). Tesseract is not available in this environment, and
is unnecessary: the renderer draws labels in a known font, so recognition
reduces to per-glyph template correlation:

  1. binarize the crop, find text rows,
  2. segment glyphs by connected columns,
  3. classify each glyph against templates rendered with the SAME font the
     renderer uses (mvuld_tpu/tools/render.py),
  4. ``lineno_from_text`` extracts the ``_<digits>:`` label.

Accuracy is measured against the renderer's ground-truth boxes in the tests.
"""

from __future__ import annotations

import re
import string
from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageDraw, ImageFont

_CHARSET = string.digits + string.ascii_uppercase + string.ascii_lowercase + "_:();=+-*,[]{}<>"
_FONT_SIZE = 14
_NORM = 16     # glyphs are resize-normalized to _NORM×_NORM for matching


def _render_glyph(ch: str, font) -> np.ndarray:
    img = Image.new("L", (24, 24), 255)
    d = ImageDraw.Draw(img)
    d.text((2, 2), ch, fill=0, font=font)
    arr = 255 - np.asarray(img, np.float32)
    cols = arr.max(axis=0) > 32
    rows = arr.max(axis=1) > 32
    if not cols.any() or not rows.any():
        return np.zeros((1, 1), np.float32)
    arr = arr[np.ix_(rows.nonzero()[0], cols.nonzero()[0])]
    return arr / max(arr.max(), 1.0)


class GlyphRecognizer:
    def __init__(self, charset: str = _CHARSET, font_size: int = _FONT_SIZE):
        try:
            font = ImageFont.load_default(size=font_size)
        except TypeError:
            font = ImageFont.load_default()
        raw = {ch: _render_glyph(ch, font) for ch in charset}
        self.templates: Dict[str, tuple] = {
            ch: (self._norm_glyph(t), t.shape[1] / max(t.shape[0], 1))
            for ch, t in raw.items() if t.size > 1}

    # -- glyph classification -------------------------------------------------
    @staticmethod
    def _norm_glyph(g: np.ndarray) -> np.ndarray:
        import cv2
        g = (g > 0).astype(np.float32)     # shape, not stroke intensity
        g = cv2.resize(g, (_NORM, _NORM), interpolation=cv2.INTER_AREA)
        n = np.linalg.norm(g)
        return g / n if n > 0 else g

    def _match(self, glyph: np.ndarray) -> str:
        if glyph.size == 0 or glyph.max() <= 0:
            return ""
        g = self._norm_glyph(glyph)
        ar_g = glyph.shape[1] / max(glyph.shape[0], 1)
        best, best_score = "", -1.0
        for ch, (t, ar_t) in self.templates.items():
            score = float((g * t).sum())
            # aspect-ratio prior distinguishes e.g. '_' from '-' and ':' from ';'
            ar_penalty = min(ar_g, ar_t) / max(ar_g, ar_t)
            score *= 0.6 + 0.4 * ar_penalty
            if score > best_score:
                best, best_score = ch, score
        return best if best_score > 0.3 else ""

    def recognize(self, crop: Image.Image) -> str:
        """Recognize a single text line inside a crop.

        Node crops include the ellipse outline the renderer draws around the
        label; any ink component touching the crop border is structural (the
        ellipse/edges always reach the border) and is removed before glyph
        segmentation."""
        arr = 255 - np.asarray(crop.convert("L"), np.float32)
        if arr.size == 0:
            return ""
        # aggressive binarization breaks anti-aliasing bridges between glyphs
        arr = np.where(arr > 110, arr, 0.0)
        try:
            import cv2
            n, labels = cv2.connectedComponents((arr > 0).astype(np.uint8))
            border = set(np.unique(np.concatenate([
                labels[0], labels[-1], labels[:, 0], labels[:, -1]])))
            border.discard(0)
            if border and n - 1 > len(border):
                mask = ~np.isin(labels, list(border))
                arr = arr * mask
        except ImportError:
            pass
        rows = arr.max(axis=1) > 0
        if not rows.any():
            return ""
        r0, r1 = rows.nonzero()[0][[0, -1]]
        band = arr[r0: r1 + 1]
        col_ink = band.max(axis=0) > 0
        # split into glyphs at empty columns
        text = []
        in_glyph = False
        start = 0
        gaps: List[int] = []
        segments = []
        for i, on in enumerate(col_ink.tolist() + [False]):
            if on and not in_glyph:
                start = i
                in_glyph = True
            elif not on and in_glyph:
                segments.append((start, i))
                in_glyph = False
        # split over-wide segments (touching glyphs) at their weakest column
        med_w = np.median([e - s for (s, e) in segments]) if segments else 0
        refined = []
        for (s, e) in segments:
            seg = [(s, e)]
            while seg and med_w > 2 and (seg[-1][1] - seg[-1][0]) > 1.8 * med_w:
                a, b = seg.pop()
                ink = band[:, a:b].sum(axis=0)
                lo, hi = int(0.3 * (b - a)), int(0.7 * (b - a))
                cut = a + lo + int(np.argmin(ink[lo:hi])) if hi > lo else a + (b - a) // 2
                seg.extend([(a, cut), (cut, b)])
                seg.sort()
            refined.extend(seg)
        prev_end = None
        for (s, e) in refined:
            if e - s < 1:
                continue
            if prev_end is not None and s - prev_end > 4:
                text.append(" ")
            prev_end = e
            glyph = band[:, s:e]
            gr = glyph.max(axis=1) > 0
            if gr.any():
                g0, g1 = gr.nonzero()[0][[0, -1]]
                glyph = glyph[g0: g1 + 1]
            text.append(self._match(glyph))
        del gaps
        return "".join(text)


def _segments_of(band: np.ndarray):
    col_ink = band.max(axis=0) > 0
    segments, in_glyph, start = [], False, 0
    for i, on in enumerate(col_ink.tolist() + [False]):
        if on and not in_glyph:
            start, in_glyph = i, True
        elif not on and in_glyph:
            segments.append((start, i))
            in_glyph = False
    return segments


class LinenoReader(GlyphRecognizer):
    """Structural reader for the ``NTYPE_lineno:`` label prefix.

    Instead of full-text OCR, it finds the underscore (wide, flat, ink only
    near the baseline) and the following colon (narrow, two vertical blobs),
    then classifies the glyphs between them against DIGIT templates only —
    a 10-class problem the template matcher solves reliably."""

    def read(self, crop: Image.Image) -> Optional[int]:
        arr = 255 - np.asarray(crop.convert("L"), np.float32)
        if arr.size == 0:
            return None
        arr = np.where(arr > 110, arr, 0.0)
        try:
            import cv2
            n, labels = cv2.connectedComponents((arr > 0).astype(np.uint8))
            border = set(np.unique(np.concatenate([
                labels[0], labels[-1], labels[:, 0], labels[:, -1]])))
            border.discard(0)
            if border and n - 1 > len(border):
                arr = arr * (~np.isin(labels, list(border)))
        except ImportError:
            pass
        rows = arr.max(axis=1) > 0
        if not rows.any():
            return None
        r0, r1 = rows.nonzero()[0][[0, -1]]
        band = arr[r0: r1 + 1]
        Hb = band.shape[0]
        segments = _segments_of(band)
        if len(segments) < 3:
            return None

        def is_underscore(s, e):
            g = band[:, s:e]
            gr = (g.max(axis=1) > 0).nonzero()[0]
            if len(gr) == 0:
                return False
            top, height = gr[0], gr[-1] - gr[0] + 1
            return (top > 0.6 * Hb and height <= 0.35 * Hb
                    and (e - s) >= height)

        def is_colon(s, e):
            g = band[:, s:e]
            gr = (g.max(axis=1) > 0).astype(np.int8)
            runs = np.diff(np.r_[0, (g.max(axis=1) > 0).astype(np.int8), 0])
            blobs = int((runs == 1).sum())
            return (e - s) <= 0.8 * Hb and blobs == 2

        digit_templates = {ch: t for ch, t in self.templates.items()
                           if ch.isdigit()}
        for ui, (s, e) in enumerate(segments):
            if not is_underscore(s, e):
                continue
            # find the colon within the next few glyphs
            for ci in range(ui + 2, min(ui + 6, len(segments))):
                if not is_colon(*segments[ci]):
                    continue
                digits = []
                ok = True
                for (ds, de) in segments[ui + 1: ci]:
                    g = band[:, ds:de]
                    gr = (g.max(axis=1) > 0).nonzero()[0]
                    g = g[gr[0]: gr[-1] + 1]
                    gn = self._norm_glyph(g)
                    best, score = "", -1.0
                    for ch, (t, _ar) in digit_templates.items():
                        sc = float((gn * t).sum())
                        if sc > score:
                            best, score = ch, sc
                    if score < 0.25:
                        ok = False
                        break
                    digits.append(best)
                if ok and digits:
                    return int("".join(digits))
        return None


_CONFUSIONS = str.maketrans({"O": "0", "o": "0", "D": "0", "l": "1", "I": "1",
                             "i": "1", "S": "5", "B": "8", "Z": "2", "g": "9"})
_LINENO_RE = re.compile(r"[_\-]([0-9OolIiSBZgD]+?)[:;Il|]")


def lineno_from_text(text: str) -> Optional[int]:
    """Extract the line number from an ``NTYPE_lineno: code`` label
    (reference regex semantics, OCR/detect.py:318-340). Applies the usual
    OCR digit-confusion mapping inside the ``_…:`` span."""
    compact = text.replace(" ", "")
    m = _LINENO_RE.search(compact)
    if m:
        digits = m.group(1).translate(_CONFUSIONS)
        if digits.isdigit():
            return int(digits)
    # fallback: digit run before the first colon-ish separator
    head = re.split(r"[:;]", compact)[0]
    m = re.search(r"([0-9]+)$", head.translate(_CONFUSIONS))
    return int(m.group(1)) if m else None
