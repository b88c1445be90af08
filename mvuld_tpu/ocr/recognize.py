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
_NORM = 24     # glyphs are resize-normalized to _NORM×_NORM for matching


def _render_glyph(ch: str, font) -> np.ndarray:
    img = Image.new("L", (28, 28), 255)
    d = ImageDraw.Draw(img)
    d.text((2, 2), ch, fill=0, font=font)
    arr = 255 - np.asarray(img, np.float32)
    # identical preprocessing to recognize()'s crops: faint anti-aliased
    # pixels below the binarization floor never reach the matcher
    arr = np.where(arr > 110, arr, 0.0)
    cols = arr.max(axis=0) > 32
    rows = arr.max(axis=1) > 32
    if not cols.any() or not rows.any():
        return np.zeros((1, 1), np.float32)
    arr = arr[np.ix_(rows.nonzero()[0], cols.nonzero()[0])]
    return arr / max(arr.max(), 1.0)


def _template_fonts(font_size: int) -> list:
    """Template font bank: like Tesseract's multi-font training data, the
    matcher carries every text face it may meet — the renderer's default
    bitmap face plus DejaVu (matplotlib ships it; tools/render.py
    HELD_OUT_STYLE draws with it) at a couple of sizes. More faces only add
    template variants; matching stays per-glyph max-correlation."""
    fonts = []
    try:
        fonts.append(ImageFont.load_default(size=font_size))
    except TypeError:
        fonts.append(ImageFont.load_default())
    try:
        import os

        import matplotlib
        p = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                         "fonts", "ttf", "DejaVuSans.ttf")
        if os.path.exists(p):
            for sz in (font_size, font_size + 3):
                fonts.append(ImageFont.truetype(p, sz))
    except ImportError:
        pass
    return fonts


class GlyphRecognizer:
    def __init__(self, charset: str = _CHARSET, font_size: int = _FONT_SIZE):
        self.templates: Dict[str, list] = {}
        for font in _template_fonts(font_size):
            for ch in charset:
                t = _render_glyph(ch, font)
                if t.size > 1:
                    self.templates.setdefault(ch, []).append(
                        (self._norm_glyph(t), t.shape[1] / max(t.shape[0], 1)))

    # -- glyph classification -------------------------------------------------
    @staticmethod
    def _norm_glyph(g: np.ndarray) -> np.ndarray:
        import cv2
        # grayscale (not binarized) matching: anti-aliased stroke intensity
        # carries shape detail the threshold destroys — measured margins
        # between confusable digits (6/8/9/0) are ~50% wider in gray
        g = g.astype(np.float32)
        g = g / max(float(g.max()), 1.0)
        g = cv2.resize(g, (_NORM, _NORM), interpolation=cv2.INTER_AREA)
        n = np.linalg.norm(g)
        return g / n if n > 0 else g

    def _match(self, glyph: np.ndarray) -> str:
        if glyph.size == 0 or glyph.max() <= 0:
            return ""
        g = self._norm_glyph(glyph)
        ar_g = glyph.shape[1] / max(glyph.shape[0], 1)
        best, best_score = "", -1.0
        for ch, variants in self.templates.items():
            for t, ar_t in variants:
                score = float((g * t).sum())
                # aspect-ratio prior distinguishes e.g. '_' from '-', ':' from ';'
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

    def _read_components(self, band: np.ndarray, Hb: int) -> Optional[int]:
        """Connected-component structural parse. Column segmentation (the
        fallback below) fails on proportional faces whose underscore advances
        UNDER the previous glyph (DejaVu kerning merges their column spans);
        components keep the underscore separate regardless of kerning."""
        try:
            import cv2
        except ImportError:
            return None
        n, _labels, stats, _cent = cv2.connectedComponentsWithStats(
            (band > 0).astype(np.uint8))
        if n < 4:
            return None
        comps = [tuple(int(v) for v in stats[i][:4]) for i in range(1, n)]
        comps.sort(key=lambda c: c[0])
        unders = [c for c in comps
                  if c[1] > 0.6 * Hb and c[3] <= 0.35 * Hb and c[2] >= c[3]]
        # colon = two small ink blobs stacked on (nearly) the same x-span
        small = [c for c in comps if c[2] <= 0.35 * Hb and c[3] <= 0.4 * Hb]
        colons = []
        for i, a in enumerate(small):
            for b in small[i + 1:]:
                if (abs(a[0] - b[0]) <= 1 and abs(a[2] - b[2]) <= 1
                        and (b[1] >= a[1] + a[3] or a[1] >= b[1] + b[3])):
                    colons.append((min(a[0], b[0]),
                                   min(a[1], b[1]), max(a[2], b[2])))
        digit_templates = {ch: v for ch, v in self.templates.items()
                           if ch.isdigit()}
        for u in unders:
            u_right = u[0] + u[2]
            for cx, _cy, _cw in sorted(c for c in colons if c[0] >= u_right):
                between = [c for c in comps
                           if c[0] >= u_right - 1 and c[0] + c[2] <= cx + 1
                           and c[3] > 0.4 * Hb]
                if not (0 < len(between) <= 4):
                    continue
                digits = []
                ok = True
                for (x, y, w, h) in sorted(between):
                    g = band[y: y + h, x: x + w]
                    gn = self._norm_glyph(g)
                    best, score = "", -1.0
                    for ch, variants in digit_templates.items():
                        for t, _ar in variants:
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
        got = self._read_components(band, Hb)
        if got is not None:
            return got
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

        digit_templates = {ch: v for ch, v in self.templates.items()
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
                    for ch, variants in digit_templates.items():
                        for t, _ar in variants:
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
