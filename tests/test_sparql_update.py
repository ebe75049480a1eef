"""SPARQL 1.1 Update (operators/sparql_update.py) — ground data ops,
template rewrites, shorthands, CLEAR, quad scoping, sequencing, and
the set-semantics / incomplete-triple rules."""

from __future__ import annotations

import pytest

from sigraph_spark.operators.sparql_update import update_sparql


def _store(spark, rows, quad=False):
    schema = ("src string, predicate string, dst string"
              + (", g string" if quad else ""))
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return {tuple(r) for r in df.collect()}


BASE = [("a", "knows", "b"), ("b", "knows", "c"), ("a", "type", "Person")]


def test_insert_data_is_set_union(spark):
    out = update_sparql(
        _store(spark, BASE),
        "INSERT DATA { x knows y . a knows b }")
    assert _rows(out) == set(BASE) | {("x", "knows", "y")}


def test_delete_data_missing_is_noop(spark):
    out = update_sparql(
        _store(spark, BASE),
        "DELETE DATA { a knows b . nope knows nobody }")
    assert _rows(out) == set(BASE) - {("a", "knows", "b")}


def test_delete_insert_where_rewrites(spark):
    out = update_sparql(
        _store(spark, BASE),
        "DELETE { ?s knows ?o } INSERT { ?o knownBy ?s } "
        "WHERE { ?s knows ?o }")
    assert _rows(out) == {("b", "knownBy", "a"), ("c", "knownBy", "b"),
                          ("a", "type", "Person")}


def test_delete_where_shorthand(spark):
    out = update_sparql(_store(spark, BASE),
                        "DELETE WHERE { ?s knows ?o }")
    assert _rows(out) == {("a", "type", "Person")}


def test_insert_where_only(spark):
    out = update_sparql(
        _store(spark, BASE),
        "INSERT { ?s connected ?o } WHERE { ?s knows ?o }")
    assert _rows(out) == set(BASE) | {("a", "connected", "b"),
                                      ("b", "connected", "c")}


def test_where_sees_pre_op_state(spark):
    # inserting 'knows' rows while deleting from the SAME where: the
    # delete instantiates from the pre-op bindings, not the inserts
    out = update_sparql(
        _store(spark, BASE),
        "DELETE { ?s knows ?o } INSERT { ?s knows loop } "
        "WHERE { ?s knows ?o }")
    assert _rows(out) == {("a", "knows", "loop"), ("b", "knows", "loop"),
                          ("a", "type", "Person")}


def test_ops_apply_left_to_right(spark):
    out = update_sparql(
        _store(spark, BASE),
        "INSERT DATA { c knows d } ; "
        "INSERT { ?o reached ?s } WHERE { ?s knows ?o }")
    got = _rows(out)
    assert ("d", "reached", "c") in got  # op 2 sees op 1's insert


def test_optional_null_template_row_drops(spark):
    out = update_sparql(
        _store(spark, BASE),
        "INSERT { ?s hasFriendOfFriend ?z } "
        "WHERE { ?s knows ?o . OPTIONAL { ?o knows ?z } }")
    assert _rows(out) == set(BASE) | {("a", "hasFriendOfFriend", "c")}


def test_clear_default_and_all(spark):
    assert _rows(update_sparql(_store(spark, BASE), "CLEAR ALL")) == set()
    quad = _store(spark, [("a", "p", "b", None), ("a", "p", "b", "g1")],
                  quad=True)
    out = update_sparql(quad, "CLEAR DEFAULT")
    assert _rows(out) == {("a", "p", "b", "g1")}
    out = update_sparql(quad, "CLEAR GRAPH <g1>")
    assert _rows(out) == {("a", "p", "b", None)}


def test_quad_insert_data_graph_block(spark):
    quad = _store(spark, [("a", "p", "b", None)], quad=True)
    out = update_sparql(
        quad, "INSERT DATA { x p y . GRAPH <g2> { x p z } }")
    assert _rows(out) == {("a", "p", "b", None), ("x", "p", "y", None),
                          ("x", "p", "z", "g2")}


def test_loud_errors(spark):
    st = _store(spark, BASE)
    with pytest.raises(ValueError, match="ground"):
        update_sparql(st, "INSERT DATA { ?s knows b }")
    with pytest.raises(ValueError, match="3-column"):
        update_sparql(st, "INSERT DATA { GRAPH <g> { a p b } }")
    with pytest.raises(ValueError, match="not bound"):
        update_sparql(st, "INSERT { ?s knows ?zzz } WHERE { ?s knows ?o }")
    with pytest.raises(ValueError, match="unsupported update"):
        update_sparql(st, "MUNGE { }")
    with pytest.raises(ValueError, match="templates"):
        update_sparql(
            st, "INSERT { GRAPH <g> { ?s p ?o } } WHERE { ?s knows ?o }")


def test_graph_management_add_copy_move(spark):
    quad = _store(spark, [("a", "p", "b", None), ("c", "p", "d", "g1"),
                          ("e", "p", "f", "g2")], quad=True)
    # ADD: union into destination, source untouched
    out = update_sparql(quad, "ADD GRAPH <g1> TO DEFAULT")
    assert _rows(out) == {("a", "p", "b", None), ("c", "p", "d", None),
                          ("c", "p", "d", "g1"), ("e", "p", "f", "g2")}
    # COPY: destination replaced
    out = update_sparql(quad, "COPY DEFAULT TO GRAPH <g2>")
    assert _rows(out) == {("a", "p", "b", None), ("c", "p", "d", "g1"),
                          ("a", "p", "b", "g2")}
    # MOVE: copy then drop source
    out = update_sparql(quad, "MOVE GRAPH <g1> TO GRAPH <g2>")
    assert _rows(out) == {("a", "p", "b", None), ("c", "p", "d", "g2")}
    # same graph: no-op per spec
    assert _rows(update_sparql(quad, "MOVE GRAPH <g1> TO GRAPH <g1>")) \
        == _rows(quad)
    # triple store: loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quad store"):
        update_sparql(_store(spark, BASE), "ADD DEFAULT TO GRAPH <g>")


def test_duplicate_store_rows_collapse(spark):
    dup = _store(spark, BASE + [("a", "knows", "b")])
    out = update_sparql(dup, "INSERT DATA { q p r }")
    assert len(out.collect()) == len(set(BASE)) + 1


def test_quad_default_graph_delete(spark):
    # NULL g (the default graph) must match null-safely in the delete
    # anti-joins; plain = keeps the rows silently (r5 ADVICE, high).
    quad = _store(spark, [("a", "p", "b", None), ("c", "p", "d", "g1")],
                  quad=True)
    out = update_sparql(quad, "DELETE DATA { a p b }")
    assert _rows(out) == {("c", "p", "d", "g1")}
    # WHERE + templates are default-graph scoped: only the g-NULL row
    # binds and is deleted; the named-graph row survives
    out = update_sparql(quad, "DELETE WHERE { ?s p ?o }")
    assert _rows(out) == {("c", "p", "d", "g1")}
    # template-path delete with an INSERT: default-graph row rewritten
    out = update_sparql(
        quad, "DELETE { ?s p ?o } INSERT { ?o q ?s } WHERE { ?s p ?o }")
    assert _rows(out) == {("c", "p", "d", "g1"), ("b", "q", "a", None)}
