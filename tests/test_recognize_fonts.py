"""Recognizer font-generalization unit tests.

The reference relies on Tesseract's multi-font robustness
(/root/reference/OCR/detect.py:332); our LinenoReader must read the
``NTYPE_lineno:`` label in faces its template bank never saw. These tests
pin the mechanisms added for that (moment deslant, split/merge of broken
or fused digit components, the enclosed-counter topology prior, and the
degenerate-separator fallback for TeX-encoded faces) on a handful of
labels per face; tools/fontbench.py measures the full per-face rates.
"""

import os

import pytest
from PIL import Image, ImageDraw, ImageFont

from mvuld_tpu.ocr.recognize import (LinenoReader, _hole_count,
                                     _merge_split_components,
                                     _split_wide_components)

LABELS = ["CALL_42: foo(x)", "IF_7: x < y", "ASSIGNMENT_123: a = b",
          "LOCAL_4: int k;", "BUILTIN_10: memset(p, 0, n);"]
EXPECT = [42, 7, 123, 4, 10]


def _ttf(name):
    import matplotlib
    p = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                     "fonts", "ttf", name)
    return p if os.path.exists(p) else None


def _read_all(reader, font):
    got = []
    for label in LABELS:
        img = Image.new("L", (280, 30), 255)
        ImageDraw.Draw(img).text((3, 3), label, fill=0, font=font)
        got.append(reader.read(img))
    return got


@pytest.fixture(scope="module")
def reader():
    return LinenoReader()


@pytest.mark.parametrize("ttf,size", [
    ("DejaVuSans-Oblique.ttf", 15),   # slant → deslant normalization
    ("STIXGeneral.ttf", 16),          # thin strokes → '0' splits into arcs
    ("cmtt10.ttf", 16),               # fused monospace crossbars, 5/6/8
    ("cmr10.ttf", 16),                # TeX '_' renders as a tiny dot accent
    ("cmss10.ttf", 16),
])
def test_unseen_face_reads(reader, ttf, size):
    """Faces absent from the template bank still read every label."""
    from mvuld_tpu.ocr.recognize import _BANK_TTFS
    assert ttf not in _BANK_TTFS
    path = _ttf(ttf)
    if path is None:
        pytest.skip(f"{ttf} not shipped by this matplotlib")
    got = _read_all(reader, ImageFont.truetype(path, size))
    assert got == EXPECT


def test_bank_faces_still_read(reader):
    """The in-bank faces stay exact after the robustness changes."""
    got = _read_all(reader, ImageFont.load_default(size=14))
    assert got == EXPECT
    path = _ttf("DejaVuSans.ttf")
    if path:
        assert _read_all(reader, ImageFont.truetype(path, 15)) == EXPECT


def test_hole_count_topology():
    import numpy as np
    # counters must be wider than the 3x3 close's reach (real glyph
    # counters are; a 1-px moat would be healed shut)
    ring = np.ones((12, 12), np.float32)
    ring[3:9, 3:9] = 0.0          # 6x6 enclosed counter
    assert _hole_count(ring) == 1
    bar = np.ones((2, 9), np.float32)
    assert _hole_count(bar) == 0
    # a 1-px STROKE break in the ring is healed by the morphological close
    broken = ring.copy()
    broken[0, 6] = 0.0
    broken[1, 6] = 0.0
    assert _hole_count(broken) == 1


def test_merge_and_split_components():
    import numpy as np
    Hb = 12
    # two narrow x-adjacent arcs (a broken '0') merge ...
    arcs = [(10, 0, 3, 12), (14, 0, 3, 12)]
    assert _merge_split_components(arcs, Hb) == [(10, 0, 7, 12)]
    # ... two whole digits 1 px apart do NOT (width precondition)
    digits = [(10, 0, 7, 12), (18, 0, 7, 12)]
    assert _merge_split_components(digits, Hb) == digits
    # stacked halves of a stem-broken '5' merge by x-overlap
    halves = [(10, 0, 7, 5), (10, 6, 7, 6)]
    assert _merge_split_components(halves, Hb) == [(10, 0, 7, 12)]
    # a fused double-digit component splits at its weakest ink column
    band = np.ones((Hb, 40), np.float32)
    band[:, 18] = 0.02            # weak bridging column
    fused = [(10, 0, 16, 12)]
    out = _split_wide_components(fused, band, Hb)
    assert len(out) == 2 and out[0][0] == 10 and out[1][0] == 18
