import json

import pytest

from mvuld_tpu.tools.joern_json import (get_node_edges, joern_type_to_bucket,
                                        parse_joern_json)

NODES = [
    {"id": 1, "_label": "METHOD", "name": "f", "code": "int f(int a)", "lineNumber": 1},
    {"id": 2, "_label": "META_DATA", "name": "", "code": "", "lineNumber": None},
    {"id": 3, "_label": "CALL", "name": "<operator>.assignment",
     "code": "x = a + 1", "lineNumber": 3},
    {"id": 4, "_label": "CALL", "name": "<operator>.addition", "code": "a + 1",
     "lineNumber": 3},
    {"id": 5, "_label": "CALL", "name": "memcpy", "code": "memcpy(b, a, 4)",
     "lineNumber": 4},
    {"id": 6, "_label": "RETURN", "name": "", "code": "return x;", "lineNumber": 5},
    {"id": 7, "_label": "COMMENT", "name": "", "code": "// hi", "lineNumber": 2},
    {"id": 8, "_label": "IDENTIFIER", "name": "x", "code": "x", "lineNumber": 3},
    {"id": 9, "_label": "METHOD", "name": "<global>", "code": "", "lineNumber": None},
]

# rows: [innode, outnode, etype, dataflow]; flow is outnode → innode
EDGES = [
    [3, 1, "AST", ""],
    [5, 1, "AST", ""],
    [6, 1, "AST", ""],
    [5, 3, "CFG", ""],
    [6, 5, "CFG", ""],
    [6, 3, "REACHING_DEF", "x"],
    [3, 1, "CONTAINS", ""],        # dropped
    [6, 5, "POST_DOMINATE", ""],   # dropped
    [8, 3, "AST", ""],             # same line 3→3, dropped as self edge
]


@pytest.fixture()
def json_pair(tmp_path):
    base = tmp_path / "42.c"
    with open(str(base) + ".nodes.json", "w") as f:
        json.dump(NODES, f)
    with open(str(base) + ".edges.json", "w") as f:
        json.dump(EDGES, f)
    return str(base)


def test_parse_collapses_to_lines(json_pair):
    cpg = get_node_edges(json_pair)
    assert cpg is not None
    by_line = {n[0]: n for n in cpg.nodes}
    assert set(by_line) == {1, 3, 4, 5}
    # longest-code node wins on line 3 (assignment beats addition/identifier)
    assert by_line[3][1] == "x = a + 1"
    assert by_line[3][2] == "Assignment Operator"
    assert by_line[4][2] == "Builtin Function Call"   # memcpy
    assert by_line[1][2] == "METHOD"


def test_parse_edge_semantics(json_pair):
    cpg = get_node_edges(json_pair)
    etypes = {(a, b, t) for (a, b, t) in cpg.edges}
    assert (1, 3, "AST") in etypes           # method → stmt (outnode→innode)
    assert (3, 4, "CFG") in etypes
    assert (3, 5, "REACHING_DEF") in etypes
    assert not any(t in ("CONTAINS", "POST_DOMINATE") for (_, _, t) in cpg.edges)


def test_gtype_filter_applies(json_pair):
    cpg = get_node_edges(json_pair)
    ast = cpg.filtered("ast")
    assert all(t == "AST" for (_, _, t) in ast.edges)
    pdg = cpg.filtered("pdg")
    assert {t for (_, _, t) in pdg.edges} == {"REACHING_DEF"}


def test_type_buckets():
    assert joern_type_to_bucket("CALL", "<operator>.assignment", "") == "Assignment Operator"
    assert joern_type_to_bucket("CALL", "<operator>.lessThan", "") == "Comparison Operator"
    assert joern_type_to_bucket("CALL", "<operator>.indirectIndexAccess", "") == "Access Operator"
    assert joern_type_to_bucket("CALL", "<operator>.logicalAnd", "") == "Logical Operator"
    assert joern_type_to_bucket("CALL", "<operator>.cast", "") == "Cast Operator"
    assert joern_type_to_bucket("CALL", "<operator>.sizeOf", "") == "Other Operator"
    assert joern_type_to_bucket("CALL", "strcpy", "") == "Builtin Function Call"
    assert joern_type_to_bucket("CALL", "my_helper", "") == "External Function Call"
    assert joern_type_to_bucket("CONTROL_STRUCTURE", "", "IF") == "IF"
    assert joern_type_to_bucket("LOCAL", "x", "") == "LOCAL"


def test_packs_into_dense_batch(json_pair):
    from mvuld_tpu.data.graph_batch import pack_graph
    cpg = get_node_edges(json_pair)
    pg = pack_graph(cpg, max_nodes=8)
    assert pg.num_nodes == 4
    assert pg.adj.sum() > 0
