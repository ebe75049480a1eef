from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.bgp import _order_patterns, match_bgp


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("a", "LAUNCH", "b"),
        ("b", "LAUNCH", "c"),
        ("x", "LOAD", "c"),
        ("b", "CONNECT", "ip1"),
        ("b", "CONNECT", "ip2"),
        ("loop", "PING", "loop"),
        ("d", "LAUNCH", "e"),
    ]
    return spark.createDataFrame(rows, "src string, predicate string, dst string")


def test_conjunction(edges):
    out = match_bgp(
        edges,
        [("?p", "LAUNCH", "?c"), ("?q", "LOAD", "?c")],
        where=[F.col("p") != F.col("q")],
    )
    assert sorted(out.columns) == ["c", "p", "q"]
    assert [tuple(r) for r in out.collect()] == [("c", "b", "x")] or out.collect()[
        0
    ].asDict() == {"p": "b", "c": "c", "q": "x"}


def test_chain_three_patterns(edges):
    out = match_bgp(
        edges,
        [("?a", "LAUNCH", "?x"), ("?x", "LAUNCH", "?y"), ("?b", "LOAD", "?y")],
    )
    rows = [r.asDict() for r in out.collect()]
    assert rows == [{"a": "a", "x": "b", "y": "c", "b": "x"}]


def test_optional_null_when_unmatched(edges):
    out = match_bgp(
        edges, [("?p", "LAUNCH", "?c")], optional=[("?c", "CONNECT", "?ip")]
    )
    got = {(r["p"], r["c"], r["ip"]) for r in out.collect()}
    assert ("b", "c", None) in got  # c never connects
    assert ("a", "b", "ip1") in got and ("a", "b", "ip2") in got
    assert ("d", "e", None) in got


def test_optional_requires_shared_variable(edges):
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(edges, [("?p", "LAUNCH", "?c")], optional=[("?z", "LOAD", "?w")])


def test_repeated_variable_in_one_pattern(edges):
    out = match_bgp(edges, [("?x", "PING", "?x")])
    assert [r["x"] for r in out.collect()] == ["loop"]


def test_disconnected_bgp_is_cartesian(edges):
    out = match_bgp(edges, [("?a", "LOAD", "?f"), ("?p", "PING", "?q")])
    assert out.count() == 1  # 1 LOAD x 1 PING
    assert sorted(out.columns) == ["a", "f", "p", "q"]


def test_constant_only_pattern_gates_existence(edges):
    hit = match_bgp(edges, [("?a", "LAUNCH", "?x"), ("x", "LOAD", "c")])
    assert hit.count() == 3  # existence true: all LAUNCH bindings survive
    miss = match_bgp(edges, [("?a", "LAUNCH", "?x"), ("x", "LOAD", "zzz")])
    assert miss.count() == 0


def test_where_accepts_sql_string(edges):
    out = match_bgp(edges, [("?p", "LAUNCH", "?c")], where=["p = 'a'"])
    assert [r["c"] for r in out.collect()] == ["b"]


def test_greedy_order_starts_most_bound():
    pats = [("?a", "?p", "?b"), ("?a", "LAUNCH", "x"), ("?b", "LOAD", "?c")]
    order = _order_patterns(pats)
    assert order[0] == 1  # two constants first
    # then the pattern sharing ?a, then the rest
    assert order == [1, 0, 2]


def test_empty_patterns_rejected(edges):
    with pytest.raises(ValueError):
        match_bgp(edges, [])


# --- property paths --------------------------------------------------------

PATH_EDGES = [
    ("a", "L", "b"), ("b", "L", "c"), ("c", "L", "d"),
    ("b", "C", "ip1"), ("d", "C", "ip2"),
    ("x", "C", "ip1"), ("a", "M", "x"),
]


def _pairs(spark, path, edges=PATH_EDGES, max_depth=20):
    from sigraph_spark.operators.bgp import eval_path

    df = spark.createDataFrame(edges, "src string, predicate string, dst string")
    return {tuple(r) for r in eval_path(df, path, max_depth).collect()}


def test_path_plain_and_inverse(spark):
    assert _pairs(spark, "C") == {("b", "ip1"), ("d", "ip2"), ("x", "ip1")}
    assert _pairs(spark, "^C") == {("ip1", "b"), ("ip2", "d"), ("ip1", "x")}


def test_path_sequence_and_alternation(spark):
    assert _pairs(spark, "L/C") == {("a", "ip1"), ("c", "ip2")}
    assert _pairs(spark, "M|C") == {
        ("a", "x"), ("b", "ip1"), ("d", "ip2"), ("x", "ip1")}


def test_path_plus_closure(spark):
    assert _pairs(spark, "L+") == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d")}


def test_path_star_includes_identity(spark):
    got = _pairs(spark, "L*")
    all_nodes = {n for e in PATH_EDGES for n in (e[0], e[2])}
    assert got == _pairs(spark, "L+") | {(n, n) for n in all_nodes}


def test_path_opt_and_grouping(spark):
    # (L/L)? : zero-or-one double hop
    got = _pairs(spark, "(L/L)?")
    all_nodes = {n for e in PATH_EDGES for n in (e[0], e[2])}
    assert got == {("a", "c"), ("b", "d")} | {(n, n) for n in all_nodes}


def test_path_composed_closure_then_hop(spark):
    # the gate shape: transitive L descent then one C hop
    assert _pairs(spark, "L+/C") == {
        ("a", "ip1"), ("a", "ip2"), ("b", "ip2"), ("c", "ip2")}


def test_path_max_depth_bounds_closure(spark):
    assert _pairs(spark, "L+", max_depth=1) == {
        ("a", "b"), ("b", "c"), ("c", "d")}
    assert _pairs(spark, "L+", max_depth=2) == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")}


def test_match_path_bindings(spark):
    from sigraph_spark.operators.bgp import match_path

    df = spark.createDataFrame(
        PATH_EDGES, "src string, predicate string, dst string")
    # constant subject
    got = {r["ip"] for r in match_path(df, "a", "L+/C", "?ip").collect()}
    assert got == {"ip1", "ip2"}
    # constant object
    got = {r["p"] for r in match_path(df, "?p", "C", "ip1").collect()}
    assert got == {"b", "x"}
    # two constants -> existence
    assert match_path(df, "a", "L+", "d").collect()[0]["matched"] is True
    assert match_path(df, "a", "L+", "ip1").count() == 0
    # repeated variable -> cycles only (none in this DAG)
    assert match_path(df, "?x", "L+", "?x").count() == 0


def test_path_parser_errors(spark):
    import pytest as _pytest
    from sigraph_spark.operators.bgp import eval_path

    df = spark.createDataFrame(PATH_EDGES, "src string, predicate string, dst string")
    for bad in ("L/", "(L", "L)", "", "|L"):
        with _pytest.raises(ValueError):
            eval_path(df, bad)


# --- SPARQL SELECT text parser ----------------------------------------------

def _sq_edges(spark):
    return spark.createDataFrame(
        [("a", "LAUNCH", "b"), ("b", "CONNECT", "c"), ("c", "CONNECT", "d"),
         ("a", "LAUNCH", "a"), ("d", "LOAD", "e")],
        "src string, predicate string, dst string",
    )


def test_sparql_bgp_path_filter_order_limit(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?x ?z WHERE { ?x LAUNCH ?y . ?y CONNECT+ ?z . "
         "FILTER(?x != ?z) } ORDER BY ?x DESC(?z) LIMIT 1")
    assert [tuple(r) for r in select_sparql(_sq_edges(spark), q).collect()] == [
        ("a", "d")
    ]


def test_sparql_optional_and_star_projection(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = "SELECT ?x ?w WHERE { ?x LAUNCH ?y . OPTIONAL { ?y LOAD ?w } }"
    got = sorted((r["x"], r["w"]) for r in
                 select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", None), ("a", None)]
    q2 = "SELECT * WHERE { ?x (CONNECT|LOAD) ?y . FILTER(?y = 'd' || ?y = 'e') }"
    got2 = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q2).collect())
    assert got2 == [("c", "d"), ("d", "e")]


def test_sparql_constant_terms_and_quotes(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = "SELECT DISTINCT ?y WHERE { 'a' LAUNCH ?y }"
    assert sorted(r["y"] for r in select_sparql(_sq_edges(spark), q).collect()) \
        == ["a", "b"]


def test_sparql_errors(spark):
    import pytest

    from sigraph_spark.operators.bgp import select_sparql

    e = _sq_edges(spark)
    with pytest.raises(ValueError, match="SELECT"):
        select_sparql(e, "ASK { ?x ?p ?y }")
    with pytest.raises(ValueError, match="3 terms"):
        select_sparql(e, "SELECT ?x WHERE { ?x LAUNCH }")
    with pytest.raises(ValueError, match="aggregate"):
        select_sparql(e, "SELECT ?x WHERE { ?x LAUNCH ?y } GROUP BY ?x")
    with pytest.raises(ValueError, match="not in GROUP BY"):
        select_sparql(
            e,
            "SELECT ?x ?y (COUNT(*) AS ?n) WHERE { ?x LAUNCH ?y } GROUP BY ?x",
        )


def test_sparql_aggregates(spark):
    from sigraph_spark.operators.bgp import select_sparql

    e = _sq_edges(spark)
    q = (
        "SELECT ?x (COUNT(*) AS ?n) (COUNT(DISTINCT ?y) AS ?d) "
        "(MIN(?y) AS ?lo) (MAX(?y) AS ?hi) "
        "WHERE { ?x LAUNCH ?y } GROUP BY ?x"
    )
    got = [tuple(r) for r in select_sparql(e, q).collect()]
    # a LAUNCHes b and a: 2 rows, 2 distinct, min 'a', max 'b'
    assert got == [("a", 2, 2, "a", "b")]
    # global aggregate: no GROUP BY, one row
    q2 = "SELECT (COUNT(*) AS ?n) WHERE { ?x CONNECT ?y }"
    assert [r["n"] for r in select_sparql(e, q2).collect()] == [2]


def test_sparql_construct_templates_and_paths(spark):
    from sigraph_spark.operators.bgp import construct_sparql

    e = _sq_edges(spark)
    q = (
        "CONSTRUCT { ?y child_of ?x . ?x p 'proc' } "
        "WHERE { ?x LAUNCH ?y }"
    )
    got = sorted(tuple(r) for r in construct_sparql(e, q).collect())
    # ('a' p proc) emitted once despite two bindings — DISTINCT union
    assert got == [
        ("a", "child_of", "a"), ("a", "p", "proc"), ("b", "child_of", "a"),
    ]
    # path WHERE + both directions
    q2 = (
        "CONSTRUCT { ?x reaches ?z . ?z reached_by ?x } "
        "WHERE { ?x LAUNCH ?y . ?y CONNECT+ ?z }"
    )
    got2 = sorted(tuple(r) for r in construct_sparql(e, q2).collect())
    assert ("a", "reaches", "c") in got2 and ("d", "reached_by", "a") in got2
    assert len(got2) == 4  # a->c, a->d and the two inverses


def test_sparql_construct_optional_null_drop(spark):
    from sigraph_spark.operators.bgp import construct_sparql

    e = _sq_edges(spark)
    # OPTIONAL leaves ?z NULL for launches whose child has no CONNECT;
    # the template using ?z must drop those rows (incomplete-triple rule)
    q = (
        "CONSTRUCT { ?x next ?z } "
        "WHERE { ?x LAUNCH ?y . OPTIONAL { ?y CONNECT ?z } }"
    )
    got = sorted(tuple(r) for r in construct_sparql(e, q).collect())
    assert got == [("a", "next", "c")]


def test_sparql_construct_errors(spark):
    import pytest

    from sigraph_spark.operators.bgp import construct_sparql

    e = _sq_edges(spark)
    with pytest.raises(ValueError, match="CONSTRUCT"):
        construct_sparql(e, "SELECT ?x WHERE { ?x LAUNCH ?y }")
    with pytest.raises(ValueError, match="not bound"):
        construct_sparql(e, "CONSTRUCT { ?q p ?x } WHERE { ?x LAUNCH ?y }")


# --- UNION / VALUES / ASK / DESCRIBE -----------------------------------------

def test_sparql_union_standalone_null_fill(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?a ?b ?c WHERE "
         "{ { ?a LAUNCH ?b } UNION { ?a CONNECT ?c } }")
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in select_sparql(_sq_edges(spark), q).collect()
    )
    assert got == [
        ("a", "a", None), ("a", "b", None),
        ("b", None, "c"), ("c", None, "d"),
    ]


def test_sparql_union_joined_with_outer_triple(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # union binds (y, z); joins the required LAUNCH triple on y
    q = ("SELECT DISTINCT ?x ?z WHERE { ?x LAUNCH ?y . "
         "{ ?y CONNECT ?z } UNION { ?y LOAD ?z } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "c")]  # a->b, b CONNECT c; LOAD branch empty on b/a


def test_sparql_union_three_branches_and_filters_inside(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?s ?o WHERE { "
         "{ ?s LAUNCH ?o . FILTER(?s != ?o) } UNION { ?s LOAD ?o } "
         "UNION { ?s CONNECT+ ?o . FILTER(?o = 'd') } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "b"), ("b", "d"), ("c", "d"), ("d", "e")]


def test_sparql_bare_group_without_union_rejected(spark):
    import pytest as _pytest

    from sigraph_spark.operators.bgp import select_sparql

    with _pytest.raises(ValueError, match="without UNION"):
        select_sparql(_sq_edges(spark), "SELECT * WHERE { { ?a LAUNCH ?b } }")


def test_sparql_values_single_var_filters(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT ?x ?y WHERE { ?x LAUNCH ?y . VALUES ?y { 'b' 'zzz' } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "b")]


def test_sparql_values_multi_var_rows(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT ?x ?y WHERE { ?x CONNECT ?y . "
         "VALUES (?x ?y) { ('b' 'c') ('c' 'zzz') } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("b", "c")]


def test_sparql_values_undef_matches_anything(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # UNDEF x: second row admits every x with y='c'; first row pins (a,b)
    q = ("SELECT ?x ?y WHERE { ?x (LAUNCH|CONNECT) ?y . "
         "VALUES (?x ?y) { ('a' 'b') (UNDEF 'c') } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "b"), ("b", "c")]


def test_sparql_values_standalone_and_extra_column(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # values var 'label' is not bound by the pattern: carried through
    q = ("SELECT ?x ?label WHERE { ?x LAUNCH ?y . "
         "VALUES (?x ?label) { ('a' 'alpha') } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "alpha"), ("a", "alpha")]  # two LAUNCH rows for a


def test_ask_true_false_shape(spark):
    from sigraph_spark.operators.bgp import ask_sparql

    e = _sq_edges(spark)
    out = ask_sparql(e, "ASK { ?a LAUNCH ?b . ?b CONNECT ?c }")
    assert out.columns == ["matched"]
    assert [r["matched"] for r in out.collect()] == [True]
    out2 = ask_sparql(e, "ASK { ?a LOAD ?b . ?b LOAD ?c }")
    assert [r["matched"] for r in out2.collect()] == [False]
    out3 = ask_sparql(e, "ASK { ?a CONNECT+ ?b . FILTER(?b = 'e') }")
    assert [r["matched"] for r in out3.collect()] == [False]


def test_describe_constants_incident_edges(spark):
    from sigraph_spark.operators.bgp import describe_sparql

    got = sorted(
        tuple(r) for r in describe_sparql(_sq_edges(spark), "DESCRIBE b").collect()
    )
    assert got == [("a", "LAUNCH", "b"), ("b", "CONNECT", "c")]


def test_describe_var_with_where(spark):
    from sigraph_spark.operators.bgp import describe_sparql

    # every node that something LOADs: e -> incident edge d LOAD e only
    q = "DESCRIBE ?n WHERE { ?m LOAD ?n }"
    got = sorted(tuple(r) for r in describe_sparql(_sq_edges(spark), q).collect())
    assert got == [("d", "LOAD", "e")]


def test_describe_mixed_terms_and_errors(spark):
    import pytest as _pytest

    from sigraph_spark.operators.bgp import describe_sparql

    q = "DESCRIBE ?n 'e' WHERE { ?m CONNECT ?n . FILTER(?n = 'd') }"
    got = sorted(tuple(r) for r in describe_sparql(_sq_edges(spark), q).collect())
    assert got == [("c", "CONNECT", "d"), ("d", "LOAD", "e")]
    with _pytest.raises(ValueError, match="needs a WHERE"):
        describe_sparql(_sq_edges(spark), "DESCRIBE ?x")
    with _pytest.raises(ValueError, match="not bound"):
        describe_sparql(_sq_edges(spark), "DESCRIBE ?zz WHERE { ?a LOAD ?b }")


def test_sparql_variable_predicate_is_plain_bgp(spark):
    # '?p' must not read as a property path (leading '?' is not the
    # zero-or-one operator when the whole predicate is a variable)
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?p WHERE { ?s ?p ?o . "
         "VALUES ?p { 'LAUNCH' 'LOAD' } }")
    got = sorted(r["p"] for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == ["LAUNCH", "LOAD"]


# --- MINUS / FILTER [NOT] EXISTS / BIND --------------------------------------

def test_sparql_filter_not_exists(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # leaf LAUNCH targets: b never launches anything onward
    q = ("SELECT DISTINCT ?a ?b WHERE { ?a LAUNCH ?b . "
         "FILTER NOT EXISTS { ?b LAUNCH ?c } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "b")]  # a->a launches onward; b->? none


def test_sparql_filter_exists(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?a ?b WHERE { ?a LAUNCH ?b . "
         "FILTER EXISTS { ?b CONNECT ?c } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "b")]  # only b CONNECTs


def test_sparql_exists_uncorrelated_rejected(spark):
    import pytest as _pytest

    from sigraph_spark.operators.bgp import select_sparql

    with _pytest.raises(ValueError, match="uncorrelated EXISTS"):
        select_sparql(
            _sq_edges(spark),
            "SELECT * WHERE { ?a LAUNCH ?b . FILTER EXISTS { ?x LOAD ?y } }",
        )


def test_sparql_minus_shared_var(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?s ?o WHERE { ?s (LAUNCH|CONNECT) ?o . "
         "MINUS { ?s CONNECT ?z } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    # b and c CONNECT something -> all their rows removed
    assert got == [("a", "a"), ("a", "b")]


def test_sparql_minus_disjoint_domain_is_noop(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # the SPARQL 1.1 MINUS/NOT-EXISTS divergence: disjoint domains
    # remove NOTHING even though the inner pattern matches rows
    q = ("SELECT DISTINCT ?s ?o WHERE { ?s LAUNCH ?o . "
         "MINUS { ?x LOAD ?y } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "a"), ("a", "b")]


def test_sparql_bind_computed_column_and_filter(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT ?edge WHERE { ?s CONNECT ?o . "
         "BIND(CONCAT(?s, '->', ?o) AS ?edge) . "
         "FILTER(?edge != 'c->d') } ORDER BY ?edge")
    got = [r["edge"] for r in select_sparql(_sq_edges(spark), q).collect()]
    assert got == ["b->c"]


def test_sparql_bind_errors(spark):
    import pytest as _pytest

    from sigraph_spark.operators.bgp import select_sparql

    with _pytest.raises(ValueError, match="already bound"):
        select_sparql(
            _sq_edges(spark),
            "SELECT * WHERE { ?s CONNECT ?o . BIND(?s AS ?o) }",
        )
    with _pytest.raises(ValueError, match="expr AS"):
        select_sparql(
            _sq_edges(spark),
            "SELECT * WHERE { ?s CONNECT ?o . BIND(?s) }",
        )


def test_sparql_exists_unbound_var_matches_anything(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # SPARQL compatibility semantics: a row whose shared variable is
    # UNBOUND (NULL via OPTIONAL) is compatible with any EXISTS-group
    # row, so EXISTS keeps it and NOT EXISTS drops it (plain equality
    # joins would do the opposite).
    q = ("SELECT DISTINCT ?a ?c WHERE { ?a LAUNCH ?b . "
         "OPTIONAL { ?b CONNECT ?c } . "
         "FILTER EXISTS { ?x CONNECT ?c } }")
    got = sorted(
        (tuple(r) for r in select_sparql(_sq_edges(spark), q).collect()),
        key=lambda t: (t[0], t[1] or ""),
    )
    # a LAUNCH a -> ?c unbound -> compatible with every CONNECT row
    # a LAUNCH b -> ?c = c -> b CONNECT c exists
    assert got == [("a", None), ("a", "c")]
    q2 = ("SELECT DISTINCT ?a ?c WHERE { ?a LAUNCH ?b . "
          "OPTIONAL { ?b CONNECT ?c } . "
          "FILTER NOT EXISTS { ?x CONNECT ?c } }")
    got2 = sorted(
        tuple(r) for r in select_sparql(_sq_edges(spark), q2).collect()
    )
    assert got2 == []


def test_sparql_group_concat_separator_with_parens(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # a SEPARATOR containing parens must not derail the projection scan
    q = ("SELECT ?s (GROUP_CONCAT(?o ; SEPARATOR = ') (') AS ?objs) "
         "WHERE { ?s LAUNCH ?o } GROUP BY ?s")
    got = {(r["s"], r["objs"]) for r in
           select_sparql(_sq_edges(spark), q).collect()}
    assert got == {("a", "a) (b")}


def test_sparql_exists_group_with_path_inside(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # the EXISTS group itself uses a property path
    q = ("SELECT DISTINCT ?a WHERE { ?a LAUNCH ?b . "
         "FILTER EXISTS { ?b CONNECT+ ?z . FILTER(?z = 'd') } }")
    got = sorted(r["a"] for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == ["a"]


def test_path_negated_property_set(spark):
    from sigraph_spark.operators.bgp import eval_path

    e = _sq_edges(spark)
    got = sorted(tuple(r) for r in eval_path(e, "!LAUNCH").collect())
    assert got == [("b", "c"), ("c", "d"), ("d", "e")]
    got2 = sorted(tuple(r) for r in eval_path(e, "!(LAUNCH|CONNECT)").collect())
    assert got2 == [("d", "e")]
    # composes with inverse and closure
    got3 = sorted(tuple(r) for r in eval_path(e, "^(!(LAUNCH|LOAD))+").collect())
    assert got3 == [("c", "b"), ("d", "b"), ("d", "c")]


def test_path_negated_set_in_select(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = "SELECT ?x ?y WHERE { ?x !(CONNECT|LOAD) ?y . FILTER(?x != ?y) }"
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("a", "b")]


def test_path_negated_set_parse_errors(spark):
    import pytest as _pytest

    from sigraph_spark.operators.bgp import eval_path

    e = _sq_edges(spark)
    with _pytest.raises(ValueError, match="expected '\\|' or '\\)'"):
        eval_path(e, "!(A;B)")
    with _pytest.raises(ValueError, match="expected predicate"):
        eval_path(e, "!")


def test_sparql_offset_limit_slice(spark):
    from sigraph_spark.operators.bgp import select_sparql

    e = _sq_edges(spark)
    q = ("SELECT ?x ?y WHERE { ?x (LAUNCH|CONNECT|LOAD) ?y } "
         "ORDER BY ?x ?y OFFSET 1 LIMIT 2")
    got = [tuple(r) for r in select_sparql(e, q).collect()]
    assert got == [("a", "b"), ("b", "c")]  # sorted: (a,a) skipped
    # SPARQL applies OFFSET before LIMIT regardless of textual order
    q2 = ("SELECT ?x ?y WHERE { ?x (LAUNCH|CONNECT|LOAD) ?y } "
          "ORDER BY ?x ?y LIMIT 2 OFFSET 1")
    assert [tuple(r) for r in select_sparql(e, q2).collect()] == got


def test_sparql_optional_group_joins_before_leftjoin(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # multi-triple OPTIONAL: the block joins FIRST (y LOAD w AND w
    # CONNECT v must both hold), then left-joins once — NOT a chain of
    # per-triple left joins
    e = spark.createDataFrame(
        [("a", "LAUNCH", "b"), ("b", "LOAD", "x"), ("q", "CONNECT", "r")],
        "src string, predicate string, dst string",
    )
    q = ("SELECT ?x ?w ?v WHERE { ?x LAUNCH ?y . "
         "OPTIONAL { ?y LOAD ?w . ?w CONNECT ?v } }")
    got = [(r["x"], r["w"], r["v"]) for r in select_sparql(e, q).collect()]
    # b LOADs x but x CONNECTs nothing: the WHOLE group fails -> both NULL
    assert got == [("a", None, None)]


def test_sparql_optional_with_inner_filter_and_path(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?x ?z WHERE { ?x LAUNCH ?y . "
         "OPTIONAL { ?y CONNECT+ ?z . FILTER(?z = 'd') } }")
    got = sorted(
        ((r["x"], r["z"]) for r in select_sparql(_sq_edges(spark), q).collect()),
        key=lambda t: (t[0], t[1] or ""),
    )
    assert got == [("a", None), ("a", "d")]  # a->a (no conn), a->b (conn+ d)


def test_sparql_avg_sample_groupconcat_having(spark):
    from sigraph_spark.operators.bgp import select_sparql

    e = spark.createDataFrame(
        [("a", "CONNECT", "ip1"), ("a", "CONNECT", "ip2"),
         ("a", "CONNECT", "ip2"), ("b", "CONNECT", "ip9")],
        "src string, predicate string, dst string",
    )
    q = ("SELECT ?s (SAMPLE(?o) AS ?one) "
         "(GROUP_CONCAT(DISTINCT ?o; SEPARATOR=',') AS ?all) "
         "(COUNT(*) AS ?n) "
         "WHERE { ?s CONNECT ?o } GROUP BY ?s HAVING(?n >= 3) ORDER BY ?s")
    got = [tuple(r) for r in select_sparql(e, q).collect()]
    assert got == [("a", "ip1", "ip1,ip2", 3)]


def test_sparql_avg_numeric(spark):
    from sigraph_spark.operators.bgp import select_sparql

    e = spark.createDataFrame(
        [("a", "P", "2"), ("a", "P", "4"), ("b", "P", "10")],
        "src string, predicate string, dst string",
    )
    q = ("SELECT ?s (AVG(?o) AS ?m) WHERE { ?s P ?o } "
         "GROUP BY ?s ORDER BY ?s")
    got = [(r["s"], r["m"]) for r in select_sparql(e, q).collect()]
    assert got == [("a", 3.0), ("b", 10.0)]


def test_sparql_separator_only_in_group_concat(spark):
    import pytest as _pytest

    from sigraph_spark.operators.bgp import select_sparql

    with _pytest.raises(ValueError, match="SEPARATOR"):
        select_sparql(
            _sq_edges(spark),
            "SELECT (SUM(?o; SEPARATOR=',') AS ?x) WHERE { ?s CONNECT ?o }",
        )


def test_sparql_subquery_joins_on_projected_vars(spark):
    from sigraph_spark.operators.bgp import select_sparql

    e = spark.createDataFrame(
        [("a", "LAUNCH", "b"), ("a", "CONNECT", "c1"), ("a", "CONNECT", "c2"),
         ("b", "LAUNCH", "c"), ("d", "CONNECT", "c9")],
        "src string, predicate string, dst string",
    )
    q = ("SELECT ?x ?y ?n WHERE { ?x LAUNCH ?y . "
         "{ SELECT ?x (COUNT(*) AS ?n) WHERE { ?x CONNECT ?c } GROUP BY ?x } }"
         " ORDER BY ?x")
    got = [tuple(r) for r in select_sparql(e, q).collect()]
    assert got == [("a", "b", 2)]  # b launches but never connects -> dropped


def test_sparql_subquery_standalone(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT ?s ?m WHERE { "
         "{ SELECT ?s (MAX(?o) AS ?m) WHERE { ?s CONNECT ?o } GROUP BY ?s } }")
    got = sorted(tuple(r) for r in select_sparql(_sq_edges(spark), q).collect())
    assert got == [("b", "c"), ("c", "d")]


# --- named graphs (GRAPH) ----------------------------------------------------

def _quad_edges(spark):
    # g NULL = default graph; g1/g2 = named graphs
    return spark.createDataFrame(
        [("a", "LAUNCH", "b", None), ("b", "CONNECT", "c", None),
         ("a", "LAUNCH", "x", "g1"), ("x", "CONNECT", "y", "g1"),
         ("a", "LAUNCH", "z", "g2"), ("x", "CONNECT", "q", "g2")],
        "src string, predicate string, dst string, g string",
    )


def test_sparql_default_graph_excludes_named(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = "SELECT ?s ?o WHERE { ?s LAUNCH ?o }"
    got = sorted(tuple(r) for r in
                 select_sparql(_quad_edges(spark), q).collect())
    assert got == [("a", "b")]  # named-graph rows invisible by default


def test_sparql_graph_variable_binds_and_scopes(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # both triples must match within the SAME named graph: g1 chains
    # LAUNCH->CONNECT, g2 does not (its CONNECT starts elsewhere)
    q = ("SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s LAUNCH ?m . "
         "?m CONNECT ?o } }")
    got = sorted(tuple(r) for r in
                 select_sparql(_quad_edges(spark), q).collect())
    assert got == [("g1", "a", "y")]
    # single triple: binds every named graph it occurs in
    q2 = "SELECT ?g ?o WHERE { GRAPH ?g { ?s LAUNCH ?o } }"
    got2 = sorted(tuple(r) for r in
                  select_sparql(_quad_edges(spark), q2).collect())
    assert got2 == [("g1", "x"), ("g2", "z")]


def test_sparql_graph_constant_and_join_with_default(spark):
    from sigraph_spark.operators.bgp import select_sparql

    q = "SELECT ?s ?o WHERE { GRAPH <g2> { ?s LAUNCH ?o } }"
    got = sorted(tuple(r) for r in
                 select_sparql(_quad_edges(spark), q).collect())
    assert got == [("a", "z")]
    # GRAPH relation joins the default-graph pattern on shared ?s
    q2 = ("SELECT ?s ?b ?o WHERE { ?s LAUNCH ?b . "
          "GRAPH <g1> { ?s LAUNCH ?o } }")
    got2 = sorted(tuple(r) for r in
                  select_sparql(_quad_edges(spark), q2).collect())
    assert got2 == [("a", "b", "x")]
    # property paths compose inside a constant GRAPH
    q3 = "SELECT ?o WHERE { GRAPH <g1> { a LAUNCH/CONNECT ?o } }"
    assert [r["o"] for r in
            select_sparql(_quad_edges(spark), q3).collect()] == ["y"]


def test_sparql_graph_errors(spark):
    import pytest as _pytest

    from sigraph_spark.operators.bgp import select_sparql

    with _pytest.raises(ValueError, match="quad table"):
        select_sparql(
            _sq_edges(spark), "SELECT ?s WHERE { GRAPH ?g { ?s LAUNCH ?o } }"
        )
    # per-graph slicing inside a GRAPH ?var subquery stays a loud error
    with _pytest.raises(ValueError, match="per named graph"):
        select_sparql(
            _quad_edges(spark),
            "SELECT ?g ?s WHERE { GRAPH ?g { "
            "{ SELECT ?s WHERE { ?s LAUNCH ?o } LIMIT 1 } } }",
        )


def test_sparql_graph_variable_property_paths(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # closure composes WITHIN each named graph: g1 chains a->x->y,
    # g2's CONNECT starts at x (not reached from its LAUNCH dst z)
    q = "SELECT ?g ?o WHERE { GRAPH ?g { a LAUNCH/CONNECT ?o } }"
    got = sorted(tuple(r) for r in
                 select_sparql(_quad_edges(spark), q).collect())
    assert got == [("g1", "y")]
    # transitive closure per graph
    q2 = "SELECT ?g ?o WHERE { GRAPH ?g { a (LAUNCH|CONNECT)+ ?o } }"
    got2 = sorted(tuple(r) for r in
                  select_sparql(_quad_edges(spark), q2).collect())
    assert got2 == [("g1", "x"), ("g1", "y"), ("g2", "z")]
    # graph-scoped path joins a plain triple in the same GRAPH block
    q3 = ("SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s LAUNCH ?m . "
          "?s LAUNCH/CONNECT ?o } }")
    got3 = sorted(tuple(r) for r in
                  select_sparql(_quad_edges(spark), q3).collect())
    assert got3 == [("g1", "a", "y")]
    # inverse path, graph-scoped
    q4 = "SELECT ?g ?s WHERE { GRAPH ?g { y ^CONNECT ?s } }"
    got4 = sorted(tuple(r) for r in
                  select_sparql(_quad_edges(spark), q4).collect())
    assert got4 == [("g1", "x")]
    # constant endpoints: binds the graphs where the path holds
    q5 = "SELECT ?g WHERE { GRAPH ?g { a LAUNCH/CONNECT y } }"
    got5 = sorted(r["g"] for r in
                  select_sparql(_quad_edges(spark), q5).collect())
    assert got5 == ["g1"]


def test_sparql_graph_variable_star_is_graph_scoped(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # zero-length bindings come from each graph's OWN node set — a
    # node that only exists in g2 must not appear under g1
    q = "SELECT ?g ?o WHERE { GRAPH ?g { z CONNECT* ?o } }"
    got = sorted(tuple(r) for r in
                 select_sparql(_quad_edges(spark), q).collect())
    assert got == [("g2", "z")]  # z exists only in g2; no CONNECT from z


def test_sparql_graph_variable_subquery(spark):
    from sigraph_spark.operators.bgp import select_sparql

    # aggregate subquery inside GRAPH ?var groups per named graph
    q = ("SELECT ?g ?n WHERE { GRAPH ?g { "
         "{ SELECT (COUNT(?s) AS ?n) WHERE { ?s LAUNCH ?o } } } }")
    got = sorted(tuple(r) for r in
                 select_sparql(_quad_edges(spark), q).collect())
    assert got == [("g1", 1), ("g2", 1)]
    # plain subquery joins the outer GRAPH pattern per graph
    q2 = ("SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s CONNECT ?o . "
          "{ SELECT ?s WHERE { a LAUNCH ?s } } } }")
    got2 = sorted(tuple(r) for r in
                  select_sparql(_quad_edges(spark), q2).collect())
    # g1: a LAUNCH x, x CONNECT y; g2: a LAUNCH z but CONNECT is from x
    assert got2 == [("g1", "x", "y")]
