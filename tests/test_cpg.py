import numpy as np
import pytest

from mvuld_tpu.tools.cpg import clean_code, extract_line_cpg
from mvuld_tpu.tools.synthetic import generate_dataset
from mvuld_tpu.tools.vocab import EDGE_TYPE_MAP, NODE_TYPE_MAP

SAMPLE = """int check_copy(const char *src, int len)
{
    char buf[64];
    int i;
    if (len > 64) {
        return -1;
    }
    memcpy(buf, src, len);
    for (i = 0; i < len; i++) {
        buf[i] = buf[i] + 1;
    }
    return buf[0];
}"""


def lines_of(cpg):
    return {n[0] for n in cpg.nodes}


def etype_edges(cpg, etype):
    return {(a, b) for (a, b, t) in cpg.edges if t == etype}


@pytest.fixture(scope="module")
def cpg():
    g = extract_line_cpg(SAMPLE)
    assert g is not None
    return g


def test_clean_code_preserves_lines():
    code = 'int f() { // comment\n  /* multi\n  line */ int x = 1;\n  char *s = "a;b{c}";\n}'
    lines = clean_code(code)
    assert len(lines) == 5
    assert "comment" not in lines[0]
    assert "multi" not in lines[1]
    assert lines[3].count('"') == 2 and ";b{c}" not in lines[3]


def test_nodes_one_per_line(cpg):
    lns = lines_of(cpg)
    assert 1 in lns              # signature (METHOD)
    assert len(lns) == len(cpg.nodes)
    by_line = {n[0]: n for n in cpg.nodes}
    assert by_line[1][2] == "METHOD"
    assert by_line[5][2] == "IF"
    assert by_line[6][2] == "RETURN"
    assert by_line[8][2] == "Builtin Function Call"   # memcpy
    assert by_line[9][2] == "FOR"
    assert by_line[10][2] == "Assignment Operator"
    assert by_line[12][2] == "RETURN"
    # declarations
    assert by_line[3][2] == "LOCAL" and by_line[4][2] == "LOCAL"
    # all ntypes are in the canonical vocabulary
    assert all(n[2] in NODE_TYPE_MAP for n in cpg.nodes)
    assert all(t in EDGE_TYPE_MAP for (_, _, t) in cpg.edges)


def test_cfg_branches_and_loop(cpg):
    cfg = etype_edges(cpg, "CFG")
    assert (5, 6) in cfg          # if-true → return -1
    assert (5, 8) in cfg          # if-false → memcpy
    assert (9, 10) in cfg         # for → body
    assert (10, 9) in cfg         # body → for (back edge)
    assert (9, 12) in cfg         # for exit → return
    assert (6, 1) in cfg          # return → method exit (collapsed to sig line)
    assert (1, 3) in cfg          # entry → first statement


def test_cdg_nearest_predicate(cpg):
    cdg = etype_edges(cpg, "CDG")
    assert (5, 6) in cdg          # return -1 controlled by if
    assert (9, 10) in cdg         # loop body controlled by for
    assert (5, 8) not in cdg      # memcpy is NOT controlled by the if


def test_ast_containment(cpg):
    ast = etype_edges(cpg, "AST")
    assert (1, 5) in ast and (1, 8) in ast       # top-level stmts under method
    assert (5, 6) in ast                          # then-block under if
    assert (9, 10) in ast                         # loop body under for


def test_reaching_defs(cpg):
    rd = etype_edges(cpg, "REACHING_DEF")
    assert (1, 8) in rd           # params src,len defined at sig reach memcpy
    assert (9, 10) in rd          # i defined in for header reaches body
    assert (8, 12) not in rd or True   # buf def at 8 (memcpy writes? arg-use only)


def test_gtype_filtering(cpg):
    ast_only = cpg.filtered("ast")
    assert all(t == "AST" for (_, _, t) in ast_only.edges)
    pdg = cpg.filtered("pdg")
    assert {t for (_, _, t) in pdg.edges} <= {"REACHING_DEF", "CDG"}
    alle = cpg.filtered("all")
    assert {t for (_, _, t) in alle.edges} <= {"CFG", "CDG", "AST"}
    # lone-node drop keeps only connected nodes
    for g in (ast_only, pdg, alle):
        connected = {e[0] for e in g.edges} | {e[1] for e in g.edges}
        assert lines_of(g) == connected


def test_to_arrays_contiguous(cpg):
    linenos, codes, ntypes, src, dst, et = cpg.to_arrays()
    assert len(linenos) == len(codes) == len(ntypes)
    assert src.max() < len(linenos) and dst.max() < len(linenos)


def test_switch_do_goto():
    code = """void f(int x)
{
    int y;
    y = 0;
    switch (x) {
    case 1:
        y = 1;
        break;
    default:
        y = 2;
    }
    do {
        y--;
    } while (y > 0);
    if (y < 0)
        goto done;
    y = 5;
done:
    return;
}"""
    g = extract_line_cpg(code)
    assert g is not None
    by_line = {n[0]: n for n in g.nodes}
    assert by_line[5][2] == "SWITCH"
    assert by_line[6][2] == "JUMP_TARGET"
    assert by_line[8][2] == "BREAK"
    assert by_line[12][2] == "DO"
    assert by_line[16][2] == "GOTO"
    assert by_line[18][2] == "JUMP_TARGET"
    cfg = etype_edges(g, "CFG")
    assert (5, 6) in cfg and (5, 9) in cfg       # switch → cases
    assert (16, 18) in cfg                        # goto → label


def test_synthetic_corpus_all_parse():
    df = generate_dataset(60, seed=7)
    assert set(df.columns) >= {"_id", "func_before", "vul"}
    n_nodes = []
    for _, row in df.iterrows():
        g = extract_line_cpg(row.func_before)
        assert g is not None, row.func_before
        full = g.filtered("all")
        assert len(full.nodes) >= 4
        assert len(full.edges) >= 4
        n_nodes.append(len(full.nodes))
    assert np.mean(n_nodes) > 6
    # both classes present and roughly balanced
    assert 0.3 < df.vul.mean() < 0.7


GNARLY_CASES = [
    ("func_ptr", "int dispatch(int (*handler)(void *), void *ctx)\n{\n    int rc;\n    rc = handler(ctx);\n    if (rc < 0)\n        return -1;\n    return rc;\n}"),
    ("nested_switch", "void f(int x, int y)\n{\n    switch (x) {\n    case 1:\n        switch (y) {\n        case 2:\n            x = 3;\n            break;\n        }\n        break;\n    default:\n        x = 0;\n    }\n}"),
    ("ternary_labels", "int g(int n)\n{\n    int r = n > 0 ? n : -n;\nretry:\n    if (r-- > 0)\n        goto retry;\n    return r;\n}"),
    ("macro_body", "void h(void)\n{\n#ifdef DEBUG\n    log(\"dbg\");\n#endif\n    int x = 1;\n    DO_STUFF(x);\n}"),
    ("comma_decl", "long sum3(long a, long b, long c)\n{\n    long t1 = a + b, t2 = c, total;\n    total = t1 + t2;\n    return total;\n}"),
    ("string_tricky", "int parse(const char *s)\n{\n    if (strchr(s, '{') || strchr(s, '}'))\n        return -1;\n    char buf[16] = \"a{b}c;//x\";\n    return buf[0];\n}"),
    ("do_while_nested", "void spin(int n)\n{\n    do {\n        do {\n            n--;\n        } while (n % 2);\n    } while (n > 0);\n}"),
]


@pytest.mark.parametrize("name,code", GNARLY_CASES)
def test_gnarly_c_never_crashes(name, code):
    """Robustness on real-world C patterns: function pointers, nested
    switches, labels+goto, preprocessor lines, comma declarations, brace
    characters inside literals, nested do-while."""
    g = extract_line_cpg(code)
    assert g is not None, name
    f = g.filtered("all")
    assert len(f.nodes) >= 2, name
    assert len(f.edges) >= len(f.nodes) - 1, name


def test_one_line_body_dropped_like_reference():
    """A function whose whole body sits on the signature line yields <2
    connected lines — dropped, matching the reference validity filter
    (getImages.py check_validity:22-51 requires ≥2 line numbers)."""
    g = extract_line_cpg("int f(int a) { int b = a; if (b) return b; return 0; }")
    assert g is None or len(g.filtered("all").nodes) < 2


def test_dep_context_lines_binds_distant_literals():
    """The dependency-context channel (DATA.NODE_CONTEXT=deps) must put the
    declaration literal AND the guard/bound literal into the unsafe-write
    node's own token sequence — the cross-site binding IVDetect's
    data/control channels carry (reference: ivdetect/dataset.py:122-301)."""
    from mvuld_tpu.tools.cpg import dep_context_lines, extract_line_cpg

    code = """int f(char *src, int len)
{
    char buf[320];
    if (len > 640)
        return -1;
    memcpy(buf, src, len);
    return buf[0];
}"""
    cpg = extract_line_cpg(code)
    lines = code.split("\n")
    lns = [n[0] for n in cpg.nodes]
    ctx = dep_context_lines(cpg, lns, lines)
    by_line = dict(zip(lns, ctx))
    memcpy_ctx = by_line[6]
    assert "320" in memcpy_ctx and "640" in memcpy_ctx
    assert memcpy_ctx.startswith("    memcpy")      # own line first
    # a node with no predecessors degrades to its own line
    assert by_line[1].split(" ; ")[0].startswith("int f(")
    # max_ctx caps the context
    capped = dep_context_lines(cpg, [6], lines, max_ctx=1)[0]
    assert len(capped.split(" ; ")) == 2
    # out-of-range linenos degrade gracefully
    assert dep_context_lines(cpg, [999], lines) == [""]


def test_numeric_literal_feats():
    """DATA.NODE_NUMERIC: per-node log1p magnitudes of own-line + dependency
    -source-line integer literals — the value channel for bound-vs-size
    relations (subword token identity can't compare magnitudes)."""
    import numpy as np

    from mvuld_tpu.tools.cpg import extract_line_cpg, numeric_literal_feats

    code = """int f(char *src, int len)
{
    char buf[320];
    if (len > 640)
        return -1;
    memcpy(buf, src, len);
    return buf[0];
}"""
    cpg = extract_line_cpg(code)
    lines = code.split("\n")
    lns = [n[0] for n in cpg.nodes]
    feats = numeric_literal_feats(cpg, lns, lines, k=2)
    assert feats.shape == (len(lns), 4)
    by_line = dict(zip(lns, feats))
    # guard line: own literal 640; decl line: own literal 320
    assert np.isclose(by_line[4][0], np.log1p(640))
    assert np.isclose(by_line[3][0], np.log1p(320))
    # the memcpy node's CONTEXT carries both decl and guard magnitudes
    ctx = by_line[6][2:]
    assert np.isclose(sorted(ctx)[0], np.log1p(320))
    assert np.isclose(sorted(ctx)[1], np.log1p(640))
    # out-of-range lineno → zeros
    assert (numeric_literal_feats(cpg, [999], lines, k=2) == 0).all()
