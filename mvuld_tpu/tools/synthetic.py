"""Synthetic Big-Vul-like corpus generator.

There is no network egress in the build environment, so the framework ships a
deterministic generator of small C functions with injected vulnerability
patterns. It produces the same *shape* of data as the reference's cleaned
Big-Vul pickle (columns ``_id``, ``func_before``, ``vul``, ``label`` —
reference: baselines/scripts/process_dataset.py:22-174) so every downstream
stage (CPG extraction, rendering, tokenization, training) runs end-to-end.

Vulnerable variants inject classic CWE patterns: unbounded strcpy/sprintf,
missing length check before memcpy, off-by-one loop bounds, unchecked
malloc deref, format-string misuse, use-after-free. The clean twin of each
function performs the guarded/bounded equivalent, so the text/graph/image
signal is learnable but not trivial.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

_NAMES = ["buf", "dst", "src", "data", "msg", "tmp", "out", "line", "path", "name"]
_FUNCS = ["process", "handle", "parse", "copy", "read", "load", "fmt", "recv"]
_TYPES = ["char", "unsigned char"]


def _mk(rng: random.Random):
    v = {
        "fn": f"{rng.choice(_FUNCS)}_{rng.choice(_NAMES)}_{rng.randrange(1000)}",
        "buf": rng.choice(_NAMES),
        "src": rng.choice([n for n in _NAMES if n != "buf"]),
        "n": rng.choice([16, 32, 64, 128, 256]),
        "t": rng.choice(_TYPES),
        "i": rng.choice(["i", "j", "k"]),
    }
    v["big"] = v["n"] * 2
    return v


# each template: (vulnerable_body, fixed_body) — headers/footers shared
_TEMPLATES: List[Tuple[str, str]] = [
    # CWE-120 unbounded strcpy vs strncpy
    ("""int {fn}(const char *{src})
{{
    {t} {buf}[{n}];
    if ({src} == 0)
        return -1;
    strcpy({buf}, {src});
    printf("%s", {buf});
    return 0;
}}""",
     """int {fn}(const char *{src})
{{
    {t} {buf}[{n}];
    if ({src} == 0)
        return -1;
    strncpy({buf}, {src}, {n} - 1);
    {buf}[{n} - 1] = 0;
    printf("%s", {buf});
    return 0;
}}"""),
    # CWE-119 memcpy without bounds check vs with check
    ("""int {fn}(char *{src}, int len)
{{
    {t} {buf}[{n}];
    int {i};
    {i} = 0;
    memcpy({buf}, {src}, len);
    for ({i} = 0; {i} < len; {i}++) {{
        {buf}[{i}] = {buf}[{i}] + 1;
    }}
    return {buf}[0];
}}""",
     """int {fn}(char *{src}, int len)
{{
    {t} {buf}[{n}];
    int {i};
    {i} = 0;
    if (len > {n})
        return -1;
    memcpy({buf}, {src}, len);
    for ({i} = 0; {i} < len; {i}++) {{
        {buf}[{i}] = {buf}[{i}] + 1;
    }}
    return {buf}[0];
}}"""),
    # CWE-787 off-by-one loop bound
    ("""void {fn}(int *{src}, int count)
{{
    int {buf}[{n}];
    int {i};
    for ({i} = 0; {i} <= {n}; {i}++) {{
        {buf}[{i}] = {src}[{i} % count];
    }}
    while (count > 0) {{
        count--;
    }}
}}""",
     """void {fn}(int *{src}, int count)
{{
    int {buf}[{n}];
    int {i};
    for ({i} = 0; {i} < {n}; {i}++) {{
        {buf}[{i}] = {src}[{i} % count];
    }}
    while (count > 0) {{
        count--;
    }}
}}"""),
    # CWE-476 unchecked malloc deref
    ("""int {fn}(int size)
{{
    char *{buf};
    {buf} = malloc(size);
    {buf}[0] = 1;
    if (size > {n}) {{
        {buf}[size - 1] = 2;
    }}
    free({buf});
    return 0;
}}""",
     """int {fn}(int size)
{{
    char *{buf};
    {buf} = malloc(size);
    if ({buf} == 0)
        return -1;
    {buf}[0] = 1;
    if (size > {n}) {{
        {buf}[size - 1] = 2;
    }}
    free({buf});
    return 0;
}}"""),
    # CWE-134 format string
    ("""void {fn}(const char *{src})
{{
    char {buf}[{big}];
    snprintf({buf}, sizeof({buf}), "%s", "hdr");
    printf({src});
    fprintf(stderr, {src});
}}""",
     """void {fn}(const char *{src})
{{
    char {buf}[{big}];
    snprintf({buf}, sizeof({buf}), "%s", "hdr");
    printf("%s", {src});
    fprintf(stderr, "%s", {src});
}}"""),
    # CWE-416 use after free
    ("""int {fn}(int flag)
{{
    char *{buf};
    {buf} = malloc({n});
    if ({buf} == 0)
        return -1;
    {buf}[0] = 7;
    if (flag) {{
        free({buf});
    }}
    return {buf}[0];
}}""",
     """int {fn}(int flag)
{{
    char *{buf};
    {buf} = malloc({n});
    if ({buf} == 0)
        return -1;
    {buf}[0] = 7;
    if (flag) {{
        free({buf});
        return 0;
    }}
    return {buf}[0];
}}"""),
    # CWE-190 integer overflow before allocation
    ("""char *{fn}(int count)
{{
    char *{buf};
    int total;
    total = count * {n};
    {buf} = malloc(total);
    if ({buf} == 0) {{
        return 0;
    }}
    memset({buf}, 0, total);
    return {buf};
}}""",
     """char *{fn}(int count)
{{
    char *{buf};
    int total;
    if (count > 1024 / {n})
        return 0;
    total = count * {n};
    {buf} = malloc(total);
    if ({buf} == 0) {{
        return 0;
    }}
    memset({buf}, 0, total);
    return {buf};
}}"""),
    # CWE-129 unchecked array index
    ("""int {fn}(int idx, int *{src})
{{
    int {buf}[{n}];
    int {i};
    for ({i} = 0; {i} < {n}; {i}++) {{
        {buf}[{i}] = {i};
    }}
    {buf}[idx] = {src}[0];
    return {buf}[idx];
}}""",
     """int {fn}(int idx, int *{src})
{{
    int {buf}[{n}];
    int {i};
    for ({i} = 0; {i} < {n}; {i}++) {{
        {buf}[{i}] = {i};
    }}
    if (idx < 0 || idx >= {n})
        return -1;
    {buf}[idx] = {src}[0];
    return {buf}[idx];
}}"""),
]


def generate_function(rng: random.Random) -> Tuple[str, int]:
    """Return (source, vul_label)."""
    vul_body, fix_body = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
    v = _mk(rng)
    if rng.random() < 0.5:
        return vul_body.format(**v), 1
    return fix_body.format(**v), 0


def generate_dataset(n: int, seed: int = 42, vul_ratio: float | None = None):
    """Generate a DataFrame with columns _id, func_before, vul.

    With ``vul_ratio`` set, resamples labels to that positive rate (the
    Big-Vul natural rate is ≈4%; the reference balances train 1:1,
    getImages.py rebalanceData:80-99).
    """
    import pandas as pd
    rng = random.Random(seed)
    rows: List[Dict] = []
    while len(rows) < n:
        src, vul = generate_function(rng)
        if vul_ratio is not None:
            want_vul = rng.random() < vul_ratio
            if bool(vul) != want_vul:
                continue
        rows.append({"_id": len(rows) + 1, "func_before": src, "vul": vul})
    return pd.DataFrame(rows)
