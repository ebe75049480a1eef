"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction query on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
training-data-pipeline operators); each takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-runnable SQL equivalents; keys without an entry
get the driver's weaker rows-only check (reserved for pandas-UDF /
LSH-probabilistic / iterative operators whose semantics SQL can't express
or whose hash functions DuckDB doesn't ship).

Graph queries run over the deterministic events->GraphNode mapping in
``sigraph_spark.sources.events_map`` (Spark + DuckDB renderings kept side
by side there). All aliases match between Spark and SQL exactly — the
driver hashes values under sorted column names.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sigraph_spark.sources.events_map import SEVENTS_CTE, sigraph_events


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _parsed(spark: SparkSession, sf_dir: str):
    """Parsed events, localCheckpointed: graph queries union/self-join the
    parse output, and without a materialization barrier Catalyst would
    re-execute the (wide) parse expression tree once per plan branch —
    the dominant cost at any scale. On a cluster this is the s1 stage
    checkpoint (plans/pipeline.py); localCheckpoint is its in-session
    equivalent."""
    from sigraph_spark.operators.graph import parse_events

    good, errors = parse_events(sigraph_events(_events(spark, sf_dir)))
    return good.localCheckpoint(eager=False), errors


def _edges_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped edge table, materialized once for multi-branch queries
    (neighborhood unions out/in views; BFS joins it every round)."""
    from sigraph_spark.operators.graph import build_edges

    good, _ = _parsed(spark, sf_dir)
    return build_edges(good).localCheckpoint(eager=False)


# ---------------------------------------------------------------------------
# entry: flagship query (driver smoke check, sf0.001)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full graph construction over the sf0.001 events table —
    parse -> direction flip -> last-writer-wins triple dedup (SURVEY.md
    §3.1 restated as one batch job)."""
    from sigraph_spark.operators.graph import build_edges

    good, _ = _parsed(spark, "/root/testdata/sf0.001")
    return build_edges(good)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_provenance_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    good, _ = _parsed(spark, sf_dir)
    return good.select("span_id", "node_id", "label", "action", "actor_type")


def q_provenance_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, errors = _parsed(spark, sf_dir)
    return errors.select("span_id", "error")


def q_graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_nodes

    good, _ = _parsed(spark, sf_dir)
    n = build_nodes(good)
    return n.select(
        "node_id",
        "label",
        F.coalesce("image", F.lit("")).alias("image"),
        F.array_join("related_span_ids", ",").alias("span_ids"),
        F.array_join("related_trace_ids", ",").alias("trace_ids"),
    )


def q_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_edges

    good, _ = _parsed(spark, sf_dir)
    # last_span_id is an internal merge key (delta-merge tie-break), not
    # part of the reference edge surface — project it away for the oracle
    return build_edges(good).select("src", "predicate", "dst", "start_time", "weight")


def q_graph_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_traces

    good, _ = _parsed(spark, sf_dir)
    return build_traces(good).select(
        "unit_id", "trace_id", "start_time",
        "representative_process_name",
        F.col("span_count").cast("long").alias("span_count"),
    )


def q_trace_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_trace_contains

    good, _ = _parsed(spark, sf_dir)
    return build_trace_contains(good)


def q_trace_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded span-membership side table: distinct (unit, trace, span)
    narrow rows replace the per-trace span_ids array, so a hot trace never
    becomes one fat array cell; span_count on traces is derived from this
    table under delta merges."""
    from sigraph_spark.operators.graph import build_trace_spans

    good, _ = _parsed(spark, sf_dir)
    return build_trace_spans(good)


def q_graph_merge_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged span membership after the half+delta(+replay) merge must equal
    the full-recompute distinct set — the set-union semilattice proof for
    the side table."""
    m = _merged_tables(spark, sf_dir)
    return m.trace_spans


def q_rule_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_rule_matches

    good, _ = _parsed(spark, sf_dir)
    return build_rule_matches(good)


def q_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_edges

    good, _ = _parsed(spark, sf_dir)
    e = build_edges(good)
    return e.groupBy("src").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.concat("predicate", F.lit("->"), "dst"))),
            ";",
        ).alias("out_edges"),
        F.count(F.lit(1)).cast("long").alias("out_degree"),
    )


def q_degree_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_trace_contains, degree_table

    good, _ = _parsed(spark, sf_dir)
    return degree_table(
        _edges_ckpt(spark, sf_dir), build_trace_contains(good)
    ).select(
        "node_id", F.col("degree").cast("long").alias("degree")
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (5 rounds, d=0.85) over the provenance
    edge relation. BIGINT micro-unit arithmetic makes the per-round
    reduction exactly associative — partition-order invariant on Spark and
    bit-identical in the DuckDB unrolled-CTE oracle (floats would drift in
    the last ulps per partitioning)."""
    from sigraph_spark.operators.pagerank import pagerank

    return pagerank(_edges_ckpt(spark, sf_dir))


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (round 5, pagerank.pagerank_weighted): mass
    flows proportionally to edge weight (the KG's observation counts)
    — rank * w DIV wsum per edge, same exact fixed-point contract,
    bit-identical to the weighted unrolled-CTE oracle."""
    from sigraph_spark.operators.pagerank import pagerank_weighted

    return pagerank_weighted(_edges_ckpt(spark, sf_dir))


def q_pagerank_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start PageRank (crawl-delta analytics): ranks computed on the
    base subgraph (predicate <> 'write') resume for 3 rounds over the
    full edge set — both phases exact fixed-point, so the two-phase
    unrolled-CTE oracle is bit-identical."""
    from sigraph_spark.operators.pagerank import pagerank, pagerank_resume

    edges = _edges_ckpt(spark, sf_dir)
    base = edges.filter(F.col("predicate") != "write")
    prior = pagerank(base, iterations=5).select("node", "rank_fp")
    return pagerank_resume(edges, prior.localCheckpoint(eager=True), iterations=3)


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle for the large-star/small-star connected components
    (SURVEY §4-custom-1): canonical id = component minimum, verified
    against a recursive-CTE transitive closure over the undirected edge
    graph. String min is lexicographic in both engines."""
    from sigraph_spark.operators.linking import connected_components

    e = _edges_ckpt(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    return connected_components(e)


def q_components_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CC: stored mapping (star forest) from the base
    subgraph (predicate <> 'write') + the 'write' delta edges — must
    equal the full-recompute closure, which is the oracle."""
    from sigraph_spark.operators.linking import (
        connected_components, connected_components_resume,
    )

    edges = _edges_ckpt(spark, sf_dir)
    base = edges.filter(F.col("predicate") != "write").select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    delta = edges.filter(F.col("predicate") == "write").select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    prior = connected_components(base).localCheckpoint(eager=True)
    return connected_components_resume(prior, delta)


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the trace co-occurrence graph
    (nodes sharing a trace — the triangle-dense companion to degree/
    PageRank for telling genuine clusters from boilerplate star hubs).
    Spark runs degree-oriented wedge counting (out-degree bounded by
    O(sqrt(E)) — no last-reducer hub); the oracle enumerates x<y<z
    triangles directly. Same exact counts."""
    from sigraph_spark.operators.graph import build_trace_contains
    from sigraph_spark.operators.graphalgo import triangle_count

    good, _ = _parsed(spark, sf_dir)
    tc = build_trace_contains(good)
    a = tc.select("unit_id", "trace_id", F.col("node_id").alias("src"))
    b = tc.select("unit_id", "trace_id", F.col("node_id").alias("dst"))
    co = (
        a.join(b, ["unit_id", "trace_id"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    return triangle_count(co)


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural link prediction over the KG edge table (KG-completion
    primitive): for every non-adjacent pair with ≥2 common neighbors,
    common-neighbor count, Adamic-Adar, and Jaccard. One adjacency
    self-join on the wedge center (hub-cappable via max_center_degree at
    web scale; exact here), broadcast degree lookups, one anti-join
    against the existing edge set. Floats at 6dp."""
    from sigraph_spark.operators.graphalgo import link_prediction

    return link_prediction(_edges_ckpt(spark, sf_dir), min_cn=2)


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (FW-BW-Trim coloring, Orzan) of a
    deterministically sparsified KG: forward-oriented edges (src < dst)
    plus LAUNCH back-edges — the full KG is one giant SCC (every READ/
    WRITE pair is mutual), so the sparsification yields the
    discriminating bow-tie shape (one cyclic core + tendril singletons)
    that actually exercises trim, coloring, and the backward sweep. The
    oracle is ground-truth mutual reachability via a recursive closure:
    scc_id(v) = min over {v} ∪ {u : u↔v}."""
    from sigraph_spark.operators.graphalgo import strongly_connected_components

    edges = _edges_ckpt(spark, sf_dir)
    sub = edges.filter(
        (F.col("src") < F.col("dst")) | (F.col("predicate") == "LAUNCH")
    )
    return strongly_connected_components(sub)


def q_condensation_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation DAG of the sparsified KG (same relation as the scc
    gate) + longest-path topological layering: (scc node, level). The
    scheduling view — components at one level are mutually unordered.
    Oracle: recursive longest-path-into-node over the ground-truth
    mutual-reachability condensation."""
    from sigraph_spark.operators.graphalgo import (
        condensation,
        strongly_connected_components,
        topo_levels,
    )

    edges = _edges_ckpt(spark, sf_dir)
    sub = edges.filter(
        (F.col("src") < F.col("dst")) | (F.col("predicate") == "LAUNCH")
    )
    scc = strongly_connected_components(sub)
    return topo_levels(condensation(sub, scc))


def q_bgp_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style conjunctive pattern over the KG edge table (the
    generalization of the reference's one-Cypher-per-endpoint query
    surface, src/db/query/*.py): a two-step LAUNCH chain whose endpoint is
    also the object of a LOAD from a different node. Three filtered scans
    (constant predicate pushed down) hash-joined on the shared variables;
    the oracle restates the same conjunction as SQL self-joins."""
    from sigraph_spark.operators.bgp import match_bgp

    return match_bgp(
        _edges_ckpt(spark, sf_dir),
        [("?a", "LAUNCH", "?x"), ("?x", "LAUNCH", "?y"), ("?b", "LOAD", "?y")],
        where=[F.col("a") != F.col("b")],
        distinct=True,
    )


def q_path_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 property path ``?p LAUNCH+/CONNECT ?ip``: transitive
    launch descent composed with a final CONNECT hop — "every address
    anything in this process tree talks to", the reference's var-length
    Cypher MATCH generalized. Closure = bounded frontier iteration with
    anti-join novelty; the oracle is a recursive CTE."""
    from sigraph_spark.operators.bgp import match_path

    return match_path(
        _edges_ckpt(spark, sf_dir), "?p", "LAUNCH+/CONNECT", "?ip"
    ).distinct()


def q_bgp_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BGP with a SPARQL OPTIONAL arm: every LAUNCH edge, left-extended by
    the child's CONNECT targets (NULL where the child never connects —
    exactly the 'processes that did NOT phone home' listing the reference
    cannot express without a second endpoint)."""
    from sigraph_spark.operators.bgp import match_bgp

    return match_bgp(
        _edges_ckpt(spark, sf_dir),
        [("?p", "LAUNCH", "?c")],
        optional=[("?c", "CONNECT", "?ip")],
        distinct=True,
    )


def _edge_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-dedup directed edge observations (the build_edges input relation
    — mirrors the oracle CTE's ``edges0``): every event's (src, predicate,
    dst, start_time, weight, span_id), direction-flipped."""
    good, _ = _parsed(spark, sf_dir)
    wp = good.filter(F.col("parent_id").isNotNull())
    return wp.select(
        F.when(F.col("actor_type") == "READ_RECV", F.col("node_id"))
        .otherwise(F.col("parent_id")).alias("src"),
        F.col("action").alias("predicate"),
        F.when(F.col("actor_type") == "READ_RECV", F.col("parent_id"))
        .otherwise(F.col("node_id")).alias("dst"),
        F.col("timestamp").alias("start_time"),
        F.col("weight").cast("long").alias("weight"),
        "span_id",
    )


def q_edge_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 compaction of the edge observation stream: one row per maximal
    run of identical weight per (src, predicate, dst), with exclusive
    [valid_from, valid_to) bounds — the temporal answer the reference's
    SET-overwrite graph (client.py:221) cannot give. Oracle restates the
    gaps-and-islands windows in SQL."""
    from sigraph_spark.operators.history import scd2_compact

    return scd2_compact(
        _edge_observations(spark, sf_dir),
        ["src", "predicate", "dst"],
        "start_time",
        ["weight"],
        tiebreak=["span_id"],
    )


def q_edge_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot read of the SCD2 edge history at a fixed mid-corpus
    timestamp (pure pushed-down filter over the history table)."""
    from sigraph_spark.operators.history import as_of, scd2_compact

    h = scd2_compact(
        _edge_observations(spark, sf_dir),
        ["src", "predicate", "dst"],
        "start_time",
        ["weight"],
        tiebreak=["span_id"],
    )
    return as_of(h, "2024-01-15 00:00:00")


def q_rdf_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Triples export of the KG edge table (W3C interchange — the sink
    the reference's Neo4j-captive graph lacks): 3 lines per edge (relation
    triple + weight/startTime attribute triples on the statement IRI). The
    node-id charset here is IRI-safe so the oracle is plain concat; the
    escaping chains themselves are pytest-pinned on hostile strings."""
    from sigraph_spark.operators.rdf import to_ntriples

    return to_ntriples(_edges_ckpt(spark, sf_dir))


def q_rdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip identity: parse(export(edges)) == edges — the oracle is
    the unexported edge relation itself, so any drift in either direction
    (encoding, regex parse, statement-IRI join, timestamp format) breaks
    the hash."""
    from sigraph_spark.operators.rdf import edges_from_ntriples, to_ntriples

    return edges_from_ntriples(to_ntriples(_edges_ckpt(spark, sf_dir)))


def q_rdf_star_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF-star round-trip identity (round 5, operators/rdf.py
    to_ntriples_star / edges_from_ntriples_star): edge attributes ride
    W3C RDF 1.2 quoted-triple annotation lines instead of statement
    IRIs; parse(export(edges)) == edges, the identity oracle."""
    from sigraph_spark.operators.rdf import (
        edges_from_ntriples_star,
        to_ntriples_star,
    )

    return edges_from_ntriples_star(
        to_ntriples_star(_edges_ckpt(spark, sf_dir)))


def q_neo4j_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neo4j bulk-import rendering of the node table: the reference's
    MERGE-per-node write path (graph_client/client.py:160-169) recast as
    ``neo4j-admin database import`` CSV shards — RFC-4180 quoting,
    ``;``-joined array properties, one narrow map. The oracle restates
    every quoting rule in ANSI SQL over the shared nodes CTE."""
    from sigraph_spark.operators.graph import build_nodes
    from sigraph_spark.operators.neo4j_csv import nodes_csv

    good, _ = _parsed(spark, sf_dir)
    return nodes_csv(build_nodes(good))


def q_neo4j_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neo4j bulk-import rendering of the edge table (client.py:215-224's
    three-way MERGE collapsed to one :START_ID/:END_ID/:TYPE importer row
    with weight/start_time properties)."""
    from sigraph_spark.operators.neo4j_csv import rels_csv

    return rels_csv(_edges_ckpt(spark, sf_dir))


def q_graphml_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphML rendering of the node table (operators/graphml.py — the
    Gephi/yEd/NetworkX import format): one <node> element per line,
    XML-escaped (& first), NULL -> empty data element; pure narrow map.
    The oracle restates the escape chain byte-for-byte in SQL."""
    from sigraph_spark.operators.graph import build_nodes
    from sigraph_spark.operators.graphml import nodes_xml

    good, _ = _parsed(spark, sf_dir)
    return nodes_xml(build_nodes(good))


def q_graphml_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphML <edge> elements (source/target attrs + type/weight/
    start_time data) for the edge table, one line per edge."""
    from sigraph_spark.operators.graphml import edges_xml

    return edges_xml(_edges_ckpt(spark, sf_dir))


def q_opensearch_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch ``_bulk`` NDJSON bodies for the raw event stream — the
    reference's streaming_bulk action+SyslogModel source pair
    (db_session.py:65, db_model.py:111-119) rendered as data, one
    action+source row per event, deterministic _id for idempotent retry.
    The oracle rebuilds both JSON lines byte-for-byte in SQL."""
    from sigraph_spark.operators.opensearch_bulk import bulk_index_lines
    from sigraph_spark.sources.events_map import sigraph_events

    return bulk_index_lines(sigraph_events(_events(spark, sf_dir)))


def q_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias-chain resolution (301/rel=canonical) by Wyllie pointer
    doubling over a synthesized alias graph on the corpus urls: chains of
    up to 12 hops toward each 13-multiple, 13-cycles at 91-multiples,
    conflicting declarations at 17-multiples. The oracle re-walks every
    chain step-by-step with a recursive CTE (terminal / capped-min /
    cycle-min semantics included) — so log-round doubling == linear walk
    is what the hash pins."""
    from sigraph_spark.operators.links import resolve_redirects

    return resolve_redirects(_webtext_alias_graph(spark), max_steps=16)


def _webtext_alias_graph(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Synthesized redirect/canonical alias edges over the corpus urls:
    chains toward 13-multiples, 13-cycles at 91-multiples, conflicting
    declarations at 17-multiples. Gate pins sf=0.01; bench scales it."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long").alias("i")
    pages = gen_pages(spark, sf=sf).select(i)

    def u(c) -> Column:
        return F.concat(F.lit("https://example.org/report/"), c.cast("string"))

    chain = pages.filter(F.col("i") % 13 != 0).select(
        u(F.col("i")).alias("src"), u(F.col("i") - 1).alias("dst")
    )
    cyc = pages.filter(F.col("i") % 91 == 0).select(
        u(F.col("i")).alias("src"), u(F.col("i") + 12).alias("dst")
    )
    conf = pages.filter((F.col("i") % 17 == 0) & (F.col("i") % 13 != 0)).select(
        u(F.col("i")).alias("src"), u(F.col("i") + 1).alias("dst")
    )
    return chain.unionByName(cyc).unionByName(conf)


def _webtext_table_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Pages carrying synthesized ``<table>`` markup (variable row counts,
    ragged rows, empty subjects/objects, ``<b>``-wrapped cells, a 2-col
    key/value table on every 4th page, a header-only decoy on every 7th).
    Gate pins sf=0.01 (the oracle enumerates the plant arithmetically);
    bench.py scales the same corpus by sf."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))

    def rowhtml(k: Column) -> Column:
        s = (F.col("i") * 3 + k) % 97
        subj = F.when((F.col("i") * 3 + k) % 31 == 0, F.lit("")).otherwise(
            F.concat(F.lit("srv-"), s.cast("string"))
        )
        subj = F.when(
            k == 0, F.concat(F.lit("<b>"), subj, F.lit("</b>"))
        ).otherwise(subj)
        cpu = ((F.col("i") + k) % 16).cast("string")
        osname = (
            F.when((F.col("i") + k) % 3 == 0, "linux")
            .when((F.col("i") + k) % 3 == 1, "windows")
            .otherwise("")
        )
        oscell = F.when((F.col("i") + k) % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("<td>"), osname, F.lit("</td>"))
        )
        return F.concat(
            F.lit("<tr><td>"), subj, F.lit("</td><td>"), cpu,
            F.lit("</td>"), oscell, F.lit("</tr>"),
        )

    rows = F.concat_ws(
        "", F.transform(F.sequence(F.lit(0), (F.col("i") % 3).cast("int")), rowhtml)
    )
    kv = F.when(
        F.col("i") % 4 == 0,
        F.concat(
            F.lit(
                "<table><tr><td>key</td><td>value</td></tr>"
                "<tr><th>owner</th><td>team-"
            ),
            (F.col("i") % 11).cast("string"),
            F.lit("</td></tr></table>"),
        ),
    ).otherwise(F.lit(""))
    decoy = F.when(
        F.col("i") % 7 == 0,
        F.lit("<table><tr><th>only</th><th>header</th></tr></table>"),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body><p>filler "), F.col("i").cast("string"),
        F.lit("</p><table><tr><th>host</th><th>cpu</th><th>os</th></tr>"),
        rows, F.lit("</table>"), kv, decoy, F.lit("</body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_table_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-table fact extraction: the operator PARSES the synthesized
    table markup while the oracle emits the planted facts arithmetically,
    so the full header-alignment semantics chain is what the hash pins."""
    from sigraph_spark.operators.htmltables import table_triples

    return table_triples(_webtext_table_pages(spark))


def _webtext_jsonld_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic structured-data corpus over the standard urls: every
    page carries a schema.org Product object block (with a @type ARRAY on
    even pages, an empty-string gtin and a name-less nested object — both
    must drop), every 3rd page adds a top-level-ARRAY block (Person with
    @id + a non-object noise element + a blank-node Organization), every
    5th an @graph wrapper (City with a NUMBER literal), and every 7th
    page leads with a MALFORMED block that must still consume block_idx 0
    (shifting every subject name on those pages — so the hash pins the
    indexing rule). OpenGraph/meta tags (with a viewport decoy and an
    empty og:locale) feed the ``meta_triples`` gate from the same corpus.
    The oracle enumerates the planted triples arithmetically — it never
    parses JSON — so the whole regex/from_json raw-capture chain is what
    the hash verifies."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    istr = F.col("i").cast("string")
    w = (F.col("i") % 53).cast("string")

    def ld(*parts: Column) -> Column:
        return F.concat(
            F.lit('<script type="application/ld+json">'), *parts, F.lit("</script>")
        )

    mal = F.when(
        F.col("i") % 7 == 0, ld(F.lit('{"@type":"Broken",'))
    ).otherwise(F.lit(""))
    ptype = F.when(
        F.col("i") % 2 == 0, F.lit('["Product","Thing"]')
    ).otherwise(F.lit('"Product"'))
    prod = ld(
        F.lit('{"@context":"https://schema.org","@type":'), ptype,
        F.lit(',"name":"widget-'), w,
        F.lit('","sku":"SKU-'), istr,
        F.lit('","gtin":"","offers":{"@type":"Offer","name":"offer-'),
        (F.col("i") % 5).cast("string"),
        F.lit('"},"manufacturer":{"@type":"Thing"},"sameAs":["https://a.example/w'),
        w, F.lit('","https://b.example/w'), w, F.lit('"]}'),
    )
    p = (F.col("i") % 41).cast("string")
    g = (F.col("i") % 11).cast("string")
    arr = F.when(
        F.col("i") % 3 == 0,
        ld(
            F.lit('[{"@id":"person:p'), p,
            F.lit('","@type":"Person","name":"Person '), p,
            F.lit('","worksFor":{"@id":"org:o'), g,
            F.lit('"}},"noise",{"@type":"Organization","name":"Org '), g,
            F.lit('"}]'),
        ),
    ).otherwise(F.lit(""))
    c = (F.col("i") % 13).cast("string")
    graph = F.when(
        F.col("i") % 5 == 0,
        ld(
            F.lit('{"@context":"https://schema.org","@graph":[{"@id":"city:c'), c,
            F.lit('","@type":"City","name":"City '), c,
            F.lit('","population":'), (F.col("i") + 1000).cast("string"),
            F.lit("}]}"),
        ),
    ).otherwise(F.lit(""))
    ogtype = F.when(
        F.col("i") % 2 == 0, F.lit('<meta property="og:type" content="article">')
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><meta property="og:title" content="Report '), istr,
        F.lit('">'), ogtype,
        F.lit('<meta name="twitter:card" content="summary">'
              '<meta name="viewport" content="width=device-width">'
              '<meta property="og:locale" content="">'
              '<meta name="description" content="page '), istr,
        F.lit(' desc"><script>var x=1;</script>'
              '<script type="text/javascript">var y=2;</script>'),
        mal, prod, arr, graph,
        F.lit("</head><body><p>filler "), istr, F.lit("</p></body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_jsonld_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD extraction over the planted structured-data
    corpus; hash pins block/element indexing, blank-node naming, nested
    flattening, array fan-out and the drop rules end-to-end."""
    from sigraph_spark.operators.jsonld import jsonld_triples

    return jsonld_triples(_webtext_jsonld_pages(spark))


def q_meta_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenGraph/meta-tag page triples from the same corpus; hash pins
    the pre-filter meta_idx numbering and the prefix/empty drop rules."""
    from sigraph_spark.operators.jsonld import meta_triples

    return meta_triples(_webtext_jsonld_pages(spark))


def _webtext_microdata_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic microdata corpus over the standard urls: every page
    carries a Product itemscope (itemid subject) holding a text prop, a
    meta content prop, href/src/datetime attribute props, a TWO-TOKEN
    itemprop (brand alternateName), an empty prop that must drop, and a
    nested Offer scope (blank-node subject #md1, entity edge from the
    parent). Every 3rd page leads with an ORPHAN itemprop tag (no scope
    yet — must drop but still consume tag_idx 0, shifting every index on
    those pages), every 2nd page adds a content-beats-href seller prop
    (shifting the offer indices), and every 5th page appends a typeless
    itemscope section (blank node #md2, no rdf:type row). The oracle
    enumerates the planted triples arithmetically — it never parses HTML
    — so tag/scope indexing, blank-node naming, the value priority chain
    and the drop rules are all pinned by the hash."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    istr = F.col("i").cast("string")
    w = (F.col("i") % 53).cast("string")
    orphan = F.when(
        F.col("i") % 3 == 0, F.lit('<p itemprop="stray">orphan</p>')
    ).otherwise(F.lit(""))
    seller = F.when(
        F.col("i") % 2 == 0,
        F.concat(
            F.lit('<a itemprop="seller" content="Seller'),
            (F.col("i") % 7).cast("string"),
            F.lit('" href="https://s.example/x">s</a>'),
        ),
    ).otherwise(F.lit(""))
    section = F.when(
        F.col("i") % 5 == 0,
        F.concat(
            F.lit('<section itemscope><span itemprop="note">note '),
            (F.col("i") % 13).cast("string"),
            F.lit("</span></section>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body>"), orphan,
        F.lit('<div itemscope itemtype="https://schema.org/Product"'
              ' itemid="prod:P'),
        (F.col("i") % 47).cast("string"),
        F.lit('"><h1 itemprop="name">Widget '), w,
        F.lit('</h1><meta itemprop="sku" content="SKU-'), istr,
        F.lit('"><a itemprop="url" href="https://shop.example/w'), w,
        F.lit('">buy</a><img itemprop="image" src="https://img.example/w'), w,
        F.lit('.png"><span itemprop="brand alternateName">Brand'),
        (F.col("i") % 19).cast("string"),
        F.lit('</span><span itemprop="empty"></span>'), seller,
        F.lit('<div itemprop="offers" itemscope'
              ' itemtype="https://schema.org/Offer">'
              '<time itemprop="validFrom" datetime="2026-01-0'),
        (F.col("i") % 9 + 1).cast("string"),
        F.lit('">jan</time><span itemprop="price">'),
        (F.col("i") % 997 + 1).cast("string"),
        F.lit("</span></div></div>"), section,
        F.lit("<p>filler "), istr, F.lit("</p></body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_microdata_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML microdata extraction over the planted corpus; hash pins
    document-order tag/scope indexing, itemid-else-blank-node subjects,
    the content > tag-attribute > text value priority, multi-token
    itemprop fan-out, nested-entity edges and the drop rules."""
    from sigraph_spark.operators.microdata import microdata_triples

    return microdata_triples(_webtext_microdata_pages(spark))


def _webtext_rdfa_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic RDFa Lite corpus over the standard urls, mirroring
    the microdata plant shape but pinning the RDFa-specific deltas: every
    page carries a Person scope with a RESOURCE subject holding a text
    prop, a meta content prop, href/src/datetime attribute props, a
    TWO-TOKEN property (givenName additionalName), an empty prop that
    must drop, and a nested property+typeof Organization scope (blank
    node #rd1, entity edge from the parent). Every 3rd page leads with an
    ORPHAN property tag (no scope yet — drops but consumes tag_idx 0),
    every 2nd page adds a content-beats-href award prop, and every 5th
    page appends a MULTI-TOKEN-typeof section ("schema:Event
    http://ex.org/v#Meetup") with an ABOUT subject — two rdf:type rows
    per section, CURIE and IRI both reduced to the last segment. The
    oracle enumerates the planted triples arithmetically."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    istr = F.col("i").cast("string")
    w = (F.col("i") % 53).cast("string")
    orphan = F.when(
        F.col("i") % 3 == 0, F.lit('<p property="stray">orphan</p>')
    ).otherwise(F.lit(""))
    award = F.when(
        F.col("i") % 2 == 0,
        F.concat(
            F.lit('<a property="award" content="Award'),
            (F.col("i") % 7).cast("string"),
            F.lit('" href="https://a.example/x">a</a>'),
        ),
    ).otherwise(F.lit(""))
    section = F.when(
        F.col("i") % 5 == 0,
        F.concat(
            F.lit('<section typeof="schema:Event http://ex.org/v#Meetup"'
                  ' about="#ev'),
            (F.col("i") % 13).cast("string"),
            F.lit('"><span property="note">note '),
            (F.col("i") % 13).cast("string"),
            F.lit("</span></section>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body>"), orphan,
        F.lit('<div vocab="https://schema.org/" typeof="Person"'
              ' resource="#p'),
        (F.col("i") % 47).cast("string"),
        F.lit('"><span property="name">Alice '), w,
        F.lit('</span><meta property="jobTitle" content="Job-'), istr,
        F.lit('"><a property="url" href="https://people.example/w'), w,
        F.lit('">home</a><img property="image" src="https://img.example/p'), w,
        F.lit('.png"><span property="givenName additionalName">Name'),
        (F.col("i") % 19).cast("string"),
        F.lit('</span><span property="empty"></span>'), award,
        F.lit('<div property="worksFor" typeof="Organization">'
              '<time property="foundingDate" datetime="2026-01-0'),
        (F.col("i") % 9 + 1).cast("string"),
        F.lit('">jan</time><span property="numberOfEmployees">'),
        (F.col("i") % 997 + 1).cast("string"),
        F.lit("</span></div></div>"), section,
        F.lit("<p>filler "), istr, F.lit("</p></body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_rdfa_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFa Lite extraction over the planted corpus; hash pins
    document-order tag/scope indexing, resource-else-about-else-blank
    subjects, multi-token typeof fan-out with CURIE/IRI last-segment
    reduction, the content > tag-attribute > text value priority,
    nested-entity edges and the drop rules."""
    from sigraph_spark.operators.rdfa import rdfa_triples

    return rdfa_triples(_webtext_rdfa_pages(spark))


def _webtext_list_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic list-page corpus over the standard urls: every page
    carries an "Operating <b>Systems</b>" heading over a 3-slot list
    (middle item EMPTY — drops but consumes item_idx 1), every 2nd page
    a "List of Data Centers" <ol> (prefix-strip + ol support), every 3rd
    page a LEADING orphan list (heading '' — shifts every list_idx),
    every 5th page an empty <ul></ul> (consumes a list_idx) plus a
    SINGLETON list inheriting the current heading (kept by list_items,
    cut by min_items in memberships), and every 7th page an EMPTY <h4>
    that resets the heading context before a 2-item list (heading '' —
    dropped from memberships). The oracle enumerates the planted rows
    arithmetically — it never parses HTML."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    istr = F.col("i").cast("string")
    orphan = F.when(
        F.col("i") % 3 == 0,
        F.concat(
            F.lit("<ul><li>orphan-"), (F.col("i") % 5).cast("string"),
            F.lit("</li><li>pre</li></ul>"),
        ),
    ).otherwise(F.lit(""))
    dc = F.when(
        F.col("i") % 2 == 0,
        F.concat(
            F.lit("<h3>List of Data Centers</h3><ol><li>dc-"),
            (F.col("i") % 7).cast("string"),
            F.lit("</li><li>dc-"), ((F.col("i") + 3) % 7).cast("string"),
            F.lit("</li></ol>"),
        ),
    ).otherwise(F.lit(""))
    solo = F.when(
        F.col("i") % 5 == 0,
        F.concat(
            F.lit("<ul></ul><ul><li>solo-"),
            (F.col("i") % 3).cast("string"), F.lit("</li></ul>"),
        ),
    ).otherwise(F.lit(""))
    lost = F.when(
        F.col("i") % 7 == 0,
        F.concat(
            F.lit("<h4></h4><ul><li>lost-"),
            (F.col("i") % 4).cast("string"),
            F.lit("</li><li>lost2</li></ul>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body>"), orphan,
        F.lit("<h2>Operating <b>Systems</b></h2><p>prose "), istr,
        F.lit("</p><ul><li>os-"), (F.col("i") % 13).cast("string"),
        F.lit('</li><li></li><li><a href="/x">os-'),
        ((F.col("i") + 1) % 13).cast("string"),
        F.lit("</a></li></ul>"), dc, solo, lost,
        F.lit("</body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_list_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML list extraction over the planted corpus; hash pins the
    heading-context fold, list/item indexing incl. empty-list and
    empty-item consumption, tag stripping and the '' heading rules."""
    from sigraph_spark.operators.htmllists import list_items

    return list_items(_webtext_list_pages(spark))


def q_list_memberships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List-page membership claims: min_items cut, lowercase + "list
    of" prefix strip, cross-page vote counts."""
    from sigraph_spark.operators.htmllists import list_items, list_memberships

    return list_memberships(list_items(_webtext_list_pages(spark)))


def _webtext_dl_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic definition-list corpus over the standard urls:
    every page carries a "Server <b>S-k</b>" heading over a dl with two
    good pairs, an EMPTY <dd> (drops, consumes pair_idx 2) and an
    UNPAIRED trailing <dt> (NULL dd — drops); every 2nd page a "Rack"
    dl with an EXTRA <dd> (ragged pad — drops); every 3rd page a
    LEADING unheaded dl (whole block drops but consumes dl_idx 0,
    shifting later indices); every 5th page a second dl INHERITING the
    current heading context. The oracle enumerates the planted facts
    arithmetically."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    orphan = F.when(
        F.col("i") % 3 == 0,
        F.concat(
            F.lit("<dl><dt>stray</dt><dd>x-"),
            (F.col("i") % 5).cast("string"), F.lit("</dd></dl>"),
        ),
    ).otherwise(F.lit(""))
    rack = F.when(
        F.col("i") % 2 == 0,
        F.concat(
            F.lit("<h3>Rack R-"), (F.col("i") % 23).cast("string"),
            F.lit("</h3><dl><dt>zone</dt><dd>z-"),
            (F.col("i") % 7).cast("string"),
            F.lit("</dd><dd>zz</dd></dl>"),
        ),
    ).otherwise(F.lit(""))
    power = F.when(
        F.col("i") % 5 == 0,
        F.concat(
            F.lit("<dl><dt>power</dt><dd>p-"),
            (F.col("i") % 9).cast("string"), F.lit("</dd></dl>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body>"), orphan,
        F.lit("<h2>Server <b>S-"), (F.col("i") % 47).cast("string"),
        F.lit("</b></h2><dl><dt>CPU</dt><dd>"),
        (F.col("i") % 64).cast("string"),
        F.lit('-core</dd><dt><i>RAM</i></dt><dd><a href="/r">'),
        (F.col("i") % 512).cast("string"),
        F.lit(" GiB</a></dd><dt>empty</dt><dd></dd><dt>tail</dt></dl>"),
        rack, power,
        F.lit("<p>filler "), F.col("i").cast("string"),
        F.lit("</p></body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_dl_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Definition-list infobox extraction over the planted corpus; hash
    pins heading subjects, positional dt/dd pairing with ragged and
    empty drops, unheaded-block drops and dl/pair indexing."""
    from sigraph_spark.operators.dlfacts import dl_facts

    return dl_facts(_webtext_dl_pages(spark))


def _fused_scan_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic ALL-CHANNELS corpus over the standard urls: every
    page plants one fact set in EVERY structured channel at once —
    JSON-LD (@id subject + type + os literal), an OpenGraph meta title,
    a microdata Server scope (itemid subject, rack literal), an RDFa
    Server scope (resource subject, owner literal), a headed 2-item
    rack list, a headed dc definition list, and a 2x2 host/os web
    table whose row REPEATS the JSON-LD os claim under the 'table'
    source (cross-channel corroboration). The meta tag precedes the
    RDFa scope so its property= attribute stays an ORPHAN for the RDFa
    engine (document-order rule) — the corpus exercises the channels'
    non-interference. Feeds the ``fused_struct_claims`` gate: 11 claims
    per page, enumerated arithmetically by the oracle."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    istr = F.col("i").cast("string")
    srv = F.concat(F.lit("srv-"), istr)
    osv = F.concat(F.lit("os-"), (F.col("i") % 5).cast("string"))
    rack = F.concat(F.lit("r-"), (F.col("i") % 23).cast("string"))
    rack2 = F.concat(F.lit("r-"), ((F.col("i") + 1) % 23).cast("string"))
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">{"@id":"'),
        srv, F.lit('","@type":"Server","os":"'), osv, F.lit('"}</script>'),
        F.lit('<meta property="og:title" content="Host '), istr, F.lit('">'),
        F.lit("</head><body>"),
        F.lit('<div itemscope itemtype="https://schema.org/Server" itemid="'),
        srv, F.lit('"><span itemprop="rack">'), rack, F.lit("</span></div>"),
        F.lit('<div typeof="Server" resource="'), srv,
        F.lit('"><span property="owner">team-'),
        (F.col("i") % 11).cast("string"), F.lit("</span></div>"),
        F.lit("<h2>List of Racks</h2><ul><li>"), rack, F.lit("</li><li>"),
        rack2, F.lit("</li></ul>"),
        F.lit("<h2>"), srv, F.lit("</h2><dl><dt>dc</dt><dd>dc-"),
        (F.col("i") % 7).cast("string"), F.lit("</dd></dl>"),
        F.lit("<table><tr><th>host</th><th>os</th></tr><tr><td>"), srv,
        F.lit("</td><td>"), osv, F.lit("</td></tr></table>"),
        F.lit("</body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_fused_struct_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused ONE-SCAN structured extraction (operators/fusedscan.py)
    over the all-channels corpus; hash pins the seven-channel kernel
    composition — every channel fires from a single pass over html and
    none disturbs the others."""
    from sigraph_spark.operators.fusedscan import fused_struct_claims

    return fused_struct_claims(_fused_scan_pages(spark))


def q_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio container metadata extraction (operators/multimodal.py +
    mediameta.py): PCM WAV fmt chunks, IMA ADPCM block math, the MPEG
    frame-header walk (incl. an ID3v2 skip on every 6th mp3), and —
    round 5, ids 300-399 — FLAC STREAMINFO (packed 64-bit rate/
    channels/total-samples window) and Ogg page walks (Vorbis id
    header + nominal bitrate; OpusHead with 48 kHz granules minus
    pre-skip; real page CRCs). Payloads are BUILT deterministically
    driver-side; the oracle enumerates the expected metadata
    arithmetically (PCM duration = n/rate; ADPCM frames pad to full
    505-sample blocks; mp3 duration = frames x 1152/44100)."""
    from sigraph_spark.operators.mediameta import (
        encode_flac_skeleton, encode_ogg_skeleton,
    )
    from sigraph_spark.operators.multimodal import (
        audio_metadata, encode_ima_adpcm_wav, encode_wav,
    )

    rows = []
    for i in range(300):
        n = 1000 + i
        if i % 3 == 0:
            payload = encode_wav(8000, [0.0] * n)
        elif i % 3 == 1:
            payload = encode_ima_adpcm_wav(8000, [0.0] * n)
        else:
            frames = i % 20 + 1
            frame = bytes([0xFF, 0xFB, 0x90, 0x40]) + b"\x00" * (417 - 4)
            body = frame * frames
            if i % 6 == 5:  # ID3v2 prefix, synchsafe size 100
                body = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) \
                    + b"\x00" * 100 + body
            payload = body
        rows.append((f"au-{i}", bytearray(payload)))
    for i in range(300, 400):
        if i % 2 == 0:
            payload = encode_flac_skeleton(
                8000 * (i % 3 + 1), (i % 6) // 2 + 1, 16,
                1000 * (i % 50 + 1),
            )
        elif i % 4 == 1:
            payload = encode_ogg_skeleton(
                "vorbis", 44100 if i % 8 == 1 else 48000, i % 3 + 1,
                4800 * (i % 30 + 1),
                nominal_bitrate=(64 + i % 128) * 1000,
            )
        else:
            payload = encode_ogg_skeleton(
                "opus", 48000, (i // 2) % 2 + 1, 4800 * (i % 30 + 1),
            )
        rows.append((f"au-{i}", bytearray(payload)))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return audio_metadata(df)


def q_video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video container metadata (round 5, operators/multimodal.py):
    ISO-BMFF (mp4_metadata — ftyp brand, 32- AND 64-bit mvhd every 7th
    file, tkhd 16.16 dimensions, hdlr/stsd codecs, size==1 largesize
    mdat every 11th) plus Matroska/WebM (mkv_metadata, every 5th≡2
    file — EBML vint walk, TimestampScale×float Duration, TrackEntry
    types/codecs/pixel dims, float64 Duration every 7th, live-mux
    unknown-size Segment every 11th); every 13th file is garbage ->
    'unknown' NULL row. Payloads are BUILT deterministically
    driver-side (encode_mp4/encode_mkv); the oracle enumerates the
    expected metadata arithmetically. Sample decode is a declared
    non-goal."""
    from sigraph_spark.operators.multimodal import (
        encode_mkv,
        encode_mp4,
        video_metadata,
    )

    rows = []
    for i in range(240):
        if i % 13 == 0:
            rows.append((f"vid-{i}", bytearray(b"\x00\x01garbage" * 3)))
            continue
        if i % 5 == 2:
            ts_ns = 2_000_000 if i % 4 == 0 else 1_000_000
            tracks = [{
                "type": 1,
                "codec": "V_VP9" if i % 3 == 0 else "V_AV1",
                "width": 256 + 32 * (i % 7), "height": 144 + 16 * (i % 4),
            }]
            if i % 2 == 0:
                tracks.append({"type": 2, "codec": "A_OPUS"})
            rows.append((f"vid-{i}", bytearray(encode_mkv(
                ts_ns, float(1000 * (i % 50 + 1)), tracks,
                doctype="webm" if i % 2 == 0 else "matroska",
                float64_duration=(i % 7 == 0),
                unknown_segment_size=(i % 11 == 0),
            ))))
            continue
        ts = 1000 if i % 2 == 0 else 600
        dur = 1000 * (i % 50 + 1)
        tracks = [{
            "handler": "vide",
            "codec": "hev1" if i % 3 == 0 else "avc1",
            "width": 320 + 16 * (i % 5), "height": 240 + 16 * (i % 3),
        }]
        if i % 2 == 0:
            tracks.append({"handler": "soun", "codec": "mp4a"})
        rows.append((f"vid-{i}", bytearray(encode_mp4(
            ts, dur, tracks, version=1 if i % 7 == 0 else 0,
            largesize_mdat=(i % 11 == 0),
        ))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return video_metadata(df)


def q_jpeg_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG entropy-codec cross-check (round 5, operators/jpeg.py +
    jpeg_arith.py): inside one mapInPandas stage, each deterministic
    image (noise / gradient / solid, mixed non-multiple-of-8 sizes,
    qualities 50/75/90, every 6th with an arithmetic restart interval,
    every 9th≡4 with non-default AC conditioning Kx=63) is encoded
    FOUR ways — Huffman baseline, progressive SOF2, arithmetic SOF9
    QM-coder, and (round 5) progressive-arithmetic SOF10 — and all
    four are decoded back. prog_ok / arith_ok / parith_ok assert
    BIT-IDENTICAL pixels vs the baseline decode (all encoders share
    the quantized-coefficient math); the oracle enumerates the
    expected dimensions + outcomes arithmetically. Blob never leaves
    the stage — the same scale shape as media_features."""
    import pandas as pd

    ids = spark.range(0, 36).select(F.col("id").cast("int").alias("img_id"))

    def run(batches):
        import numpy as np

        from sigraph_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )
        from sigraph_spark.operators.jpeg_arith import encode_jpeg_arithmetic
        from sigraph_spark.operators.jpeg_prog_arith import (
            encode_jpeg_progressive_arithmetic,
        )

        for pdf in batches:
            rows = []
            for i in pdf["img_id"]:
                i = int(i)
                w = 8 + (i % 4) * 8 + (i % 5)
                h = 8 + (i % 3) * 8 + (i % 7)
                kind = i % 3
                if kind == 0:
                    rng = np.random.default_rng(i)
                    rgb = rng.integers(
                        0, 256, size=(h, w, 3), dtype=np.uint8
                    ).tobytes()
                elif kind == 1:
                    x = np.linspace(0, 255, w)
                    g = np.stack(
                        [np.tile(x, (h, 1)),
                         np.tile(x[::-1], (h, 1)),
                         np.full((h, w), float(i * 5 % 256))],
                        axis=2,
                    )
                    rgb = g.astype(np.uint8).tobytes()
                else:
                    rgb = np.full((h, w, 3), (i * 37) % 256,
                                  dtype=np.uint8).tobytes()
                q = (50, 75, 90)[(i // 3) % 3]
                base = decode_jpeg(encode_jpeg(w, h, rgb, quality=q))
                prog = decode_jpeg(
                    encode_jpeg_progressive(w, h, rgb, quality=q)
                )
                ar = decode_jpeg(encode_jpeg_arithmetic(
                    w, h, rgb, quality=q,
                    ac_kx=63 if i % 9 == 4 else 5,
                    restart_interval=2 if i % 6 == 5 else 0,
                ))
                pa = decode_jpeg(encode_jpeg_progressive_arithmetic(
                    w, h, rgb, quality=q,
                    ac_kx=63 if i % 9 == 4 else 5,
                    restart_interval=2 if i % 6 == 5 else 0,
                ))
                rows.append({
                    "img_id": i, "width": base[0], "height": base[1],
                    "prog_ok": prog == base, "arith_ok": ar == base,
                    "parith_ok": pa == base,
                })
            yield pd.DataFrame(rows)

    return ids.mapInPandas(
        run,
        "img_id int, width int, height int, prog_ok boolean, "
        "arith_ok boolean, parith_ok boolean",
    )


def q_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC lossless-codec cross-check (round 5, operators/flac.py —
    closes the declared FLAC sample-decode stub): inside one
    mapInPandas stage each deterministic PCM signal (noise /
    tone+dither / constant / shared-low-zero-bits "wasted", mono and
    stereo, 8/16/24-bit, three block sizes, Rice partition orders
    0-2) is encoded to a real FLAC stream and decoded back; bit_ok
    asserts decode(encode(pcm)) == pcm ELEMENT-EXACT, with the
    decoder's CRC-8/CRC-16/MD5 self-checks armed (any mismatch raises
    rather than comparing). The oracle enumerates the expected
    rates/shapes/outcomes arithmetically. Payload bytes never leave
    the stage — the same scale shape as jpeg_codecs."""
    import pandas as pd

    ids = spark.range(0, 32).select(F.col("id").cast("int").alias("aud_id"))

    def run(batches):
        import numpy as np

        from sigraph_spark.operators.flac import decode_flac, encode_flac

        for pdf in batches:
            rows = []
            for i in pdf["aud_id"]:
                i = int(i)
                channels = 2 if i % 2 else 1
                bits = (8, 16, 24)[i % 3]
                rate = (8000, 44100, 48000, 32000)[i % 4]
                n = 500 + 137 * (i % 5)
                lim = 1 << (bits - 1)
                rng = np.random.default_rng(i)
                kind = i % 4
                if kind == 0:
                    x = rng.integers(-lim, lim, size=(n, channels))
                elif kind == 1:
                    t = np.arange(n)
                    base = (0.6 * lim * np.sin(
                        2 * np.pi * 440 * t / rate)).astype(np.int64)
                    x = np.stack([base + c for c in range(channels)], axis=1)
                    x += rng.integers(-max(lim // 512, 2),
                                      max(lim // 512, 2), size=(n, channels))
                elif kind == 2:
                    x = np.full((n, channels), -(lim // 3), dtype=np.int64)
                else:
                    x = rng.integers(-(lim // 16), lim // 16,
                                     size=(n, channels)) * 8
                x = np.clip(x, -lim, lim - 1).astype(np.int64)
                enc = encode_flac(
                    rate, x, bits=bits,
                    block_size=(256, 192, 4096)[i % 3],
                    partition_order=i % 3,
                )
                drate, dch, dbits, dec = decode_flac(enc)
                rows.append({
                    "aud_id": i, "rate": drate, "channels": dch,
                    "bits": dbits, "n_samples": int(dec.shape[0]),
                    "bit_ok": bool(
                        drate == rate and dch == channels and dbits == bits
                        and dec.shape == x.shape and np.array_equal(dec, x)
                    ),
                })
            yield pd.DataFrame(rows)

    return ids.mapInPandas(
        run,
        "aud_id int, rate int, channels int, bits int, n_samples int, "
        "bit_ok boolean",
    )


def q_oggflac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC-in-Ogg encapsulation cross-check (round 5,
    operators/oggflac.py — mapping v1.0 over the RFC 9639 codec):
    inside one mapInPandas stage each deterministic PCM signal is
    encoded to a real Ogg-FLAC stream (odd ids force the first audio
    frame to SPAN TWO PAGES via the continuation flag; every third id
    carries a VORBIS_COMMENT header packet) and decoded back through
    the full verification chain — Ogg page CRC-32s, mapping header,
    FLAC frame CRC-8/16, STREAMINFO MD5, EOS granule vs decoded
    length. bit_ok asserts decode(encode(pcm)) == pcm ELEMENT-EXACT;
    duration_ms comes from the independent ogg_metadata container
    walk. The oracle enumerates everything arithmetically."""
    import pandas as pd

    ids = spark.range(0, 24).select(F.col("id").cast("int").alias("aud_id"))

    def run(batches):
        import numpy as np

        from sigraph_spark.operators.mediameta import ogg_metadata
        from sigraph_spark.operators.oggflac import (decode_ogg_flac,
                                                     encode_ogg_flac)

        for pdf in batches:
            rows = []
            for i in pdf["aud_id"]:
                i = int(i)
                channels = 2 if i % 2 else 1
                bits = (8, 16, 24)[i % 3]
                rate = (8000, 44100, 48000, 32000)[i % 4]
                n = 600 + 151 * (i % 5)
                lim = 1 << (bits - 1)
                rng = np.random.default_rng(1000 + i)
                x = rng.integers(-lim, lim, size=(n, channels)).astype(
                    np.int64)
                comments = ([("TITLE", f"t{i}")] if i % 3 == 0 else None)
                enc = encode_ogg_flac(
                    rate, x, bits=bits, block_size=256,
                    split_first_frame=bool(i % 2), comments=comments)
                meta = ogg_metadata(enc)
                drate, dch, dbits, dec = decode_ogg_flac(enc)
                rows.append({
                    "aud_id": i, "rate": drate, "channels": dch,
                    "bits": dbits, "n_samples": int(dec.shape[0]),
                    "duration_ms": int(meta["duration_ms"]),
                    "n_tags": (1 if comments else 0),
                    "bit_ok": bool(
                        meta["format"] == "ogg-flac"
                        and drate == rate and dch == channels
                        and dbits == bits and dec.shape == x.shape
                        and np.array_equal(dec, x)
                    ),
                })
            yield pd.DataFrame(rows)

    return ids.mapInPandas(
        run,
        "aud_id int, rate int, channels int, bits int, n_samples int, "
        "duration_ms int, n_tags int, bit_ok boolean",
    )


def q_avi_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIFF/AVI container metadata (round 5, operators/avi.py) through
    the generic video_metadata operator — exercises the parser-chain
    fallthrough (mp4 -> mkv -> avi). Headers are BUILT deterministically
    driver-side: alternating raw BI_RGB / MJPG streams, four frame
    rates incl. an NTSC 30000/1001 leg every 5th id, frame counts and
    dimensions from id arithmetic; the oracle enumerates the expected
    rows (duration_ms = n * 1000 * scale // rate, integer division on
    both sides)."""
    from sigraph_spark.operators.avi import encode_avi_mjpeg
    from sigraph_spark.operators.multimodal import video_metadata

    rows = []
    for i in range(40):
        n = i % 7 + 1
        raw = i % 2 == 0
        if i % 5 == 4:
            fps_num, fps_den = 30000, 1001
        else:
            fps_num, fps_den = (24, 25, 30, 60)[i % 4], 1
        # metadata walk never opens frame payloads; deterministic filler
        frames = [bytes([j % 256]) * (10 + j) for j in range(n)]
        rows.append((f"avi-{i}", bytearray(encode_avi_mjpeg(
            frames, 32 + i, 24 + i % 10,
            fps_num=fps_num, fps_den=fps_den, raw=raw,
        ))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return video_metadata(df)


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-level VIDEO decode (round 5, operators/avi.py): one row
    per decoded frame with exact integer per-channel pixel sums. Even
    ids carry raw BI_RGB streams of solid-color frames — the decoded
    sums are pure id arithmetic (sum_c = w*h*color), so the oracle
    verifies the actual pixel path, bottom-up row flip and BGR swap
    included. Odd ids carry MJPG streams (each frame a real JPEG from
    the repo's T.81 encoder: noise / gradient / solid by frame index);
    their decoded sums are pinned by pix_ok — equality against a
    driver-side decode_jpeg of the very same payload, proving the
    container walk hands the codec bit-identical frame bytes. Blob
    never leaves the mapInPandas stage."""
    import numpy as np

    from sigraph_spark.operators.avi import (
        _raw_frame_bytes,
        encode_avi_mjpeg,
        video_frames,
    )
    from sigraph_spark.operators.jpeg import decode_jpeg, encode_jpeg

    def frame_rgb(i: int, j: int, w: int, h: int) -> bytes:
        kind = (i + j) % 3
        if kind == 0:
            rng = np.random.default_rng(100 * i + j)
            return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        if kind == 1:
            x = np.linspace(0, 255, w)
            g = np.stack(
                [np.tile(x, (h, 1)), np.tile(x[::-1], (h, 1)),
                 np.full((h, w), float((i * 5 + j) % 256))], axis=2)
            return g.astype(np.uint8).tobytes()
        return np.full((h, w, 3), (i * 37 + j * 11) % 256,
                       dtype=np.uint8).tobytes()

    rows, expected = [], []
    for i in range(24):
        w, h = 16 + i % 5, 12 + i % 4
        n = 1 + i % 3
        if i % 2 == 0:
            frames = []
            for j in range(n):
                r, g, b = ((i * 7 + j * 13) % 256, (i * 11 + j * 3) % 256,
                           (i * 5 + j * 17) % 256)
                rgb = bytes((r, g, b)) * (w * h)
                frames.append(_raw_frame_bytes(w, h, rgb))
                expected.append((f"vid-{i}", j, w * h * r, w * h * g, w * h * b))
            payload = encode_avi_mjpeg(frames, w, h, fps_num=30, raw=True)
        else:
            jpegs = [encode_jpeg(w, h, frame_rgb(i, j, w, h), quality=75)
                     for j in range(n)]
            for j, jp in enumerate(jpegs):
                px = np.frombuffer(decode_jpeg(jp)[2], dtype=np.uint8)
                s = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                expected.append((f"vid-{i}", j, int(s[0]), int(s[1]), int(s[2])))
            payload = encode_avi_mjpeg(jpegs, w, h, fps_num=24)
        rows.append((f"vid-{i}", bytearray(payload)))

    df = spark.createDataFrame(rows, "media_id string, payload binary")
    exp = spark.createDataFrame(
        expected, "media_id string, frame_idx int, exp_r long, exp_g long, "
        "exp_b long")
    out = video_frames(df)
    vid_num = F.element_at(F.split("media_id", "-"), 2).cast("int")
    return (
        out.join(F.broadcast(exp), ["media_id", "frame_idx"])
        .select(
            "media_id", "frame_idx", "width", "height", "codec",
            F.when(vid_num % 2 == 0, F.col("sum_r")).alias("sum_r"),
            F.when(vid_num % 2 == 0, F.col("sum_g")).alias("sum_g"),
            F.when(vid_num % 2 == 0, F.col("sum_b")).alias("sum_b"),
            ((F.col("sum_r") == F.col("exp_r"))
             & (F.col("sum_g") == F.col("exp_g"))
             & (F.col("sum_b") == F.col("exp_b"))).alias("pix_ok"),
        )
    )


def q_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-BMFF sample extraction (round 5, operators/mp4frames.py):
    the full stsd/stts/stsc/stsz/stco|co64 sample-table walk recovers
    each video sample's file extent; JPEG-coded samples decode through
    the repo's T.81 codec with pixel sums pinned by pix_ok (equality
    vs a driver-side decode_jpeg of the same bytes — the walk must
    hand the codec bit-identical extents). Mix: multi-chunk stsc runs
    (odd ids one sample per chunk), co64 every 3rd id, an avc1 file
    every 5th (loud non-goal -> codec 'unknown' NULL row), garbage
    every 7th (same). The oracle enumerates rows arithmetically."""
    import numpy as np

    from sigraph_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from sigraph_spark.operators.mp4frames import (
        encode_mp4_samples,
        mp4_video_frames,
    )

    rows, expected = [], []
    for i in range(20):
        if i % 7 == 0:
            rows.append((f"vid-{i}", bytearray(b"\x00\x01no box" * 4)))
            continue
        w, h = 16 + i % 5, 12 + i % 4
        n = 1 + i % 3
        jpegs = []
        for j in range(n):
            rng = np.random.default_rng(100 * i + j)
            rgb = rng.integers(0, 256, size=(h, w, 3),
                               dtype=np.uint8).tobytes()
            jpegs.append(encode_jpeg(w, h, rgb, quality=75))
        if i % 5 == 0:
            payload = encode_mp4_samples(jpegs, w, h, codec=b"avc1")
            rows.append((f"vid-{i}", bytearray(payload)))
            continue
        chunking = [n] if i % 2 == 0 else [1] * n
        payload = encode_mp4_samples(jpegs, w, h, chunking=chunking,
                                     co64=(i % 3 == 0))
        rows.append((f"vid-{i}", bytearray(payload)))
        for j, jp in enumerate(jpegs):
            px = np.frombuffer(decode_jpeg(jp)[2], dtype=np.uint8)
            s = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
            expected.append((f"vid-{i}", j, int(s[0]), int(s[1]),
                             int(s[2])))

    df = spark.createDataFrame(rows, "media_id string, payload binary")
    exp = spark.createDataFrame(
        expected, "media_id string, frame_idx int, exp_r long, "
        "exp_g long, exp_b long")
    out = mp4_video_frames(df)
    return (
        out.join(F.broadcast(exp), ["media_id", "frame_idx"], "left")
        .select(
            "media_id", "frame_idx", "width", "height", "codec",
            F.when(
                F.col("frame_idx").isNotNull(),
                (F.col("sum_r") == F.col("exp_r"))
                & (F.col("sum_g") == F.col("exp_g"))
                & (F.col("sum_b") == F.col("exp_b"))).alias("pix_ok"),
        )
    )


def q_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-walk image metadata (round 5, operators/mediameta.py):
    dimensions/format/depth WITHOUT pixel decode — the scale-correct
    first pass over an image corpus. Round-robin over seven payload
    kinds: JPEG (coding cycles baseline / progressive / arithmetic),
    PNG IHDR, GIF (alternating interlace flag read from the first
    image descriptor), BMP, WebP (VP8 frame tag / VP8L bit-packed
    dims / VP8X extended canvas, alternating alpha), TIFF (both
    endiannesses, BitsPerSample offset-indirection when samples > 1),
    and garbage -> 'unknown' NULL row; ids 280-339 add AVIF/HEIC/HEIF
    (ISO-BMFF meta/iprp/ipco walk: ispe extents + pixi depth/channel
    properties); ids 340-399 add SVG (width/height attrs vs viewBox
    extent, alternating) and ICO (largest-directory-entry convention,
    0-byte = 256). Payloads are BUILT deterministically driver-side;
    the oracle enumerates the expected metadata arithmetically."""
    from sigraph_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from sigraph_spark.operators.jpeg_arith import encode_jpeg_arithmetic
    from sigraph_spark.operators.mediameta import (
        encode_avif_skeleton,
        encode_tiff_skeleton,
        encode_webp_skeleton,
        image_metadata,
    )
    from sigraph_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
    )

    rows = []
    for i in range(280):
        w = 8 + (i % 24)
        h = 8 + (i % 17)
        rgb = bytes([(i * 7) % 256]) * (w * h * 3)
        kind = i % 7
        if kind == 0:
            enc = (encode_jpeg, encode_jpeg_progressive,
                   encode_jpeg_arithmetic)[i % 3]
            payload = enc(w, h, rgb)
        elif kind == 1:
            payload = encode_png(w, h, rgb)
        elif kind == 2:
            payload = encode_gif(w, h, rgb, interlace=(i % 2 == 1))
        elif kind == 3:
            payload = encode_bmp(w, h, rgb)
        elif kind == 4:
            payload = encode_webp_skeleton(
                w, h, ("vp8", "vp8l", "vp8x")[i % 3],
                alpha=(i % 2 == 1),
            )
        elif kind == 5:
            payload = encode_tiff_skeleton(
                w, h, bits=16 if i % 2 == 0 else 8,
                samples=i % 3 + 1, big_endian=(i % 2 == 1),
            )
        else:
            payload = b"\x00nonsense" * 3
        rows.append((f"img-{i}", bytearray(payload)))
    for i in range(280, 340):
        payload = encode_avif_skeleton(
            100 + i, 50 + i % 40,
            brand=("avif", "heic", "mif1")[i % 3],
            bits=8 if i % 2 == 0 else 10,
            channels=i % 3 + 1,
        )
        rows.append((f"img-{i}", bytearray(payload)))
    from sigraph_spark.operators.mediameta import encode_ico_skeleton

    for i in range(340, 400):
        if i % 2 == 0:
            w, h = 100 + i, 60 + i % 30
            if i % 6 == 0:
                payload = (
                    f'<?xml version="1.0"?>\n<svg xmlns="x" '
                    f'viewBox="0 0 {w} {h}"></svg>'
                ).encode()
            else:
                payload = (
                    f'<svg width="{w}" height="{h}"><rect/></svg>'
                ).encode()
        else:
            big = ((i % 17 + 1) * 8, (i % 11 + 1) * 16,
                   32 if i % 4 == 1 else 8)
            payload = encode_ico_skeleton([(4, 4, 8), big])
        rows.append((f"img-{i}", bytearray(payload)))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return image_metadata(df)


def q_media_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container text metadata (round 5, operators/mediatags.py): the
    tag/caption side of a multimodal corpus. Round-robin payloads:
    Exif APP1 (alternating TIFF endianness, offset-indirected ASCII +
    SHORT orientation), ID3v2.3/2.4 text frames (alternating
    latin-1 / utf-16 encodings, incl. a TXXX pair), FLAC
    VORBIS_COMMENT, and Ogg Vorbis/Opus comment headers — every 16th
    Ogg comment packet SPANS two pages (255-lacing + continuation
    flag), exercising real packet reassembly; ids 200-259 add PNG
    textual chunks (tEXt / zTXt / iTXt incl. compressed, cycling) and
    GIF comment extensions. Payloads BUILT deterministically
    driver-side; the oracle enumerates every (container, tag, value)
    row arithmetically."""
    from sigraph_spark.operators.jpeg import encode_jpeg
    from sigraph_spark.operators.mediatags import (
        encode_flac_with_comments,
        encode_gif_with_comment,
        encode_id3v2,
        encode_jpeg_with_exif,
        encode_ogg_with_comments,
        encode_png_with_text,
        media_tags,
    )
    from sigraph_spark.operators.multimodal import encode_gif, encode_png

    base_jpeg = encode_jpeg(8, 8, bytes(8 * 8 * 3))
    rows = []
    for i in range(200):
        kind = i % 4
        if kind == 0:
            payload = encode_jpeg_with_exif(
                base_jpeg,
                {"make": f"make-{i % 9}", "orientation": i % 8 + 1},
                big_endian=((i // 4) % 2 == 0),
            )
        elif kind == 1:
            payload = encode_id3v2(
                [("TIT2", f"title {i}"), ("TPE1", f"artist {i % 13}"),
                 ("TXXX:mood", f"mood-{i % 5}")],
                version=4 if i % 8 == 1 else 3,
                encoding=i % 2,
            )
        elif kind == 2:
            payload = encode_flac_with_comments(
                44100, 2, 16, 44100,
                [("TITLE", f"t{i}"), ("GENRE", f"g{i % 7}")],
            )
        elif i % 8 == 3:
            payload = encode_ogg_with_comments(
                "vorbis", 48000, 2, 96000,
                [("TITLE", f"s{i}"), ("album", f"a{i % 5}")],
                span_pages=(i % 16 == 3),
            )
        else:
            payload = encode_ogg_with_comments(
                "opus", 48000, 1, 4800, [("title", f"s{i}")],
            )
        rows.append((f"tag-{i}", bytearray(payload)))
    base_png = encode_png(6, 5, bytes(6 * 5 * 3))
    base_gif = encode_gif(6, 5, bytes(6 * 5 * 3))
    for i in range(200, 260):
        if i % 2 == 0:
            kind = ("text", "ztxt", "itxt", "itxt-z")[(i // 2) % 4]
            payload = encode_png_with_text(
                base_png,
                [("Title", f"p{i}", kind),
                 ("Software", f"sw-{i % 9}", "text")],
            )
        else:
            payload = encode_gif_with_comment(base_gif, f"c{i}")
        rows.append((f"tag-{i}", bytearray(payload)))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return media_tags(df)


def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (round 5, operators/imagehash.py): the
    image plane of training-data near-dup removal — exact-integer
    dHash through the repo's own pure-Python codecs, then the 4x16-bit
    pigeonhole band join (complete for Hamming <= 3).

    Fixture: 16 groups of 9x8 block images (each pixel IS one dHash
    block).  Per group g: pixel(r, c) = 50 + ((r*9 + c)*(17 + 2g) +
    29g) % 127, encoded LOSSLESSLY as PNG + BMP + GIF (hash-identical
    by construction -> 3 pairs at Hamming 0), plus a 'vpng' variant
    whose column-0 pixels in rows 0 and 4 are nudged to b[r,1] +/- 1.
    A column-0 pixel participates in EXACTLY ONE comparison (its row's
    col0-vs-col1 bit), and the nudge reverses that comparison, so the
    variant sits at Hamming EXACTLY 2 from its trio — provable, not
    measured.  Cross-group min Hamming is 14 for these parameters
    (verified offline), so no cross-group pair survives max_hamming=3.
    One garbage payload per group must hash NULL and emit nothing.
    The oracle enumerates the 6 pairs per group arithmetically."""
    from sigraph_spark.operators.imagehash import image_neardup

    df = spark.createDataFrame(_imagehash_fixture_rows(),
                               "media_id string, payload binary")
    return image_neardup(df, max_hamming=3)


def _imagehash_fixture_rows():
    """The deterministic 16-group image fixture shared by the
    ``image_neardup`` and ``imagehash_incremental`` gates (see
    ``q_image_neardup`` for the margin/provability argument)."""
    import numpy as np

    from sigraph_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
    )

    rows = []
    for g in range(16):
        m = 17 + 2 * g
        base = np.zeros((8, 9), dtype=np.int64)
        for r in range(8):
            for c in range(9):
                base[r, c] = 50 + ((r * 9 + c) * m + g * 29) % 127
        var = base.copy()
        for r in (0, 4):
            var[r, 0] = base[r, 1] + (1 if base[r, 0] <= base[r, 1]
                                      else -1)

        def rgb(a):
            return np.stack([a] * 3, axis=-1).astype(np.uint8).tobytes()

        gid = f"g{g:02d}"
        rows.append((f"{gid}-png", bytearray(encode_png(9, 8, rgb(base)))))
        rows.append((f"{gid}-bmp", bytearray(encode_bmp(9, 8, rgb(base)))))
        rows.append((f"{gid}-gif", bytearray(encode_gif(9, 8, rgb(base)))))
        rows.append((f"{gid}-vpng", bytearray(encode_png(9, 8, rgb(var)))))
        rows.append((f"{gid}-bad", bytearray(b"\x00junk" * 4 + bytes([g]))))
    return rows


def q_imagehash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image near-dup (round 5, operators/imagehash.py
    incremental_image_candidates — the image twin of the
    minhash/simhash incremental gates): the stored corpus index is
    built from each group's png + bmp; the crawl delta brings gif,
    vpng and the garbage payload. Correct output is exactly the full
    ``image_neardup`` pair set restricted to pairs with >= 1 new
    endpoint — per group that drops only (bmp, png, 0), leaving
    (bmp, gif, 0), (gif, png, 0) from new-vs-old-and-new plus the
    three Hamming-2 variant pairs. The oracle enumerates those 5 pairs
    per group arithmetically; corpus pixels are never re-decoded."""
    from sigraph_spark.operators.imagehash import (
        image_index,
        incremental_image_candidates,
    )

    rows = _imagehash_fixture_rows()
    schema = "media_id string, payload binary"
    old_df = spark.createDataFrame(
        [r for r in rows if r[0].endswith(("-png", "-bmp"))
         and not r[0].endswith("-vpng")], schema)
    new_df = spark.createDataFrame(
        [r for r in rows if r[0].endswith(("-gif", "-vpng", "-bad"))],
        schema)
    pairs, _delta = incremental_image_candidates(new_df,
                                                 image_index(old_df))
    return pairs


def q_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic near-dup (round 5, operators/audiofp.py): the audio
    plane of training-data dedup — exact-integer Haar sub-band
    fingerprint (Haitsma-Kalker family, integer filter bank) through
    the repo's own WAV / FLAC / Ogg-FLAC codecs, then the shared
    4x16-bit pigeonhole band join.

    Fixture: 16 groups of 4608-sample signals — PCG64 noise
    (default_rng(1000+g), stable algorithm) shaped by a per-slice
    amplitude profile ((slice*k_g + g) % 9) + 1 with k_g coprime to 9
    so adjacent slices never tie.  Each group is encoded as WAV-PCM16,
    FLAC and Ogg-FLAC — identical PCM by losslessness, so the trio
    fingerprints are EQUAL (3 pairs at Hamming 0 per group; provable,
    not measured).  Min cross-group Hamming for these parameters is 11
    (verified offline), so no cross-group pair survives max_hamming=3.
    One garbage payload per group must hash NULL and emit nothing.
    The oracle enumerates the 3 pairs per group arithmetically."""
    from sigraph_spark.operators.audiofp import audio_neardup

    df = spark.createDataFrame(_audiofp_fixture_rows(),
                               "media_id string, payload binary")
    return audio_neardup(df, max_hamming=3)


def _audiofp_fixture_rows():
    """The deterministic 16-group audio fixture shared by the
    ``audio_neardup`` and ``audiofp_incremental`` gates (see
    ``q_audio_neardup`` for the margin argument)."""
    import numpy as np

    from sigraph_spark.operators.audiofp import encode_wav16
    from sigraph_spark.operators.flac import encode_flac
    from sigraph_spark.operators.oggflac import encode_ogg_flac

    ks = [1, 2, 4, 5, 7, 8]
    rows = []
    for g in range(16):
        n = 9 * 512
        rng = np.random.default_rng(1000 + g)
        noise = rng.integers(-1000, 1000, size=n,
                             endpoint=True).astype(np.int64)
        i = np.arange(n, dtype=np.int64)
        sl = i * 9 // n
        amp = ((sl * ks[g % 6] + g) % 9) + 1
        x = noise * amp
        gid = f"g{g:02d}"
        rows.append((f"{gid}-wav", bytearray(encode_wav16(8000, x))))
        rows.append((f"{gid}-flac", bytearray(encode_flac(8000, x))))
        rows.append((f"{gid}-ogg", bytearray(encode_ogg_flac(8000, x))))
        rows.append((f"{gid}-bad", bytearray(b"\x00hiss" * 4 + bytes([g]))))
    return rows


def q_audiofp_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental audio near-dup (round 5,
    operators/audiofp.py incremental_audio_candidates — closing the
    stored-index symmetry across all three dedup modalities): the
    corpus index is built from each group's wav + flac; the crawl
    delta brings the Ogg-FLAC re-encapsulation and the garbage
    payload. Correct output = the full pair set restricted to pairs
    with >= 1 new endpoint — per group that drops (flac, wav, 0),
    leaving (flac, ogg, 0) and (ogg, wav, 0). Corpus samples are
    never re-decoded; the oracle enumerates 2 pairs per group."""
    from sigraph_spark.operators.audiofp import (
        audio_index,
        incremental_audio_candidates,
    )

    rows = _audiofp_fixture_rows()
    schema = "media_id string, payload binary"
    old_df = spark.createDataFrame(
        [r for r in rows if r[0].endswith(("-wav", "-flac"))], schema)
    new_df = spark.createDataFrame(
        [r for r in rows if r[0].endswith(("-ogg", "-bad"))], schema)
    pairs, _delta = incremental_audio_candidates(new_df,
                                                 audio_index(old_df))
    return pairs


def q_spoof_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homoglyph spoof detection (round 5, operators/confusables.py):
    UTS #39 confusable skeletons — punycode decode, NFKD + combining
    strip, curated cross-script prototype map, case fold — block
    spoofed identifiers onto their targets by skeleton equi-join.
    Fixture: 200 brand domains; every 2nd gains a Cyrillic-а spoof,
    every 3rd a fullwidth-ｂ spoof (NFKD folds it), every 5th an
    unrelated decoy that must pair with nothing. The oracle
    enumerates the collision pairs (codepoint ordering is binary in
    both engines, so a/b assignment is deterministic)."""
    from sigraph_spark.operators.confusables import spoof_pairs

    rows = []
    for i in range(200):
        rows.append((f"brand{i}.com",))
        if i % 2 == 0:
            rows.append((f"brаnd{i}.com",))   # Cyrillic а
        if i % 3 == 0:
            rows.append((f"ｂrand{i}.com",))   # fullwidth ｂ
        if i % 5 == 0:
            rows.append((f"unrelated{i}.org",))
    df = spark.createDataFrame(rows, "name string")
    return spoof_pairs(df)


def q_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typosquat detection (round 5, operators/typosquat.py): SymSpell
    deletion-key blocking — every edit-distance-1 pair shares a
    1-deletion key, so candidates come from an equi-join (O(len) keys
    per name), verified by the JVM levenshtein built-in; zero Python.
    Fixture: 150 base domains with planted deletion / insertion /
    substitution variants. The oracle is the INDEPENDENT quadratic
    formulation (all-pairs levenshtein in SQL), so a blocking gap —
    a pair the key join misses — fails the gate, not just a wrong
    distance."""
    from sigraph_spark.operators.typosquat import typo_pairs

    rows = []
    for i in range(150):
        rows.append((f"site{i}.com",))
        if i % 2 == 0:
            rows.append((f"sit{i}.com",))     # deletion
        if i % 3 == 0:
            rows.append((f"sitee{i}.com",))   # insertion
        if i % 5 == 0:
            rows.append((f"sute{i}.com",))    # substitution
    df = spark.createDataFrame(rows, "name string")
    return typo_pairs(df)


def q_combosquat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combosquat detection (round 5, operators/typosquat.py
    combosquat_pairs): brand tokens embedded in larger registrable
    labels via a broadcast contains-join — the third member of the
    domain-abuse triad. Fixture: every 3rd of 200 domains embeds
    brand{i%20}; prefix-overlaps (brand1 inside brand12-...) are
    correct contains-semantics and the oracle's LIKE reproduces them
    identically."""
    from sigraph_spark.operators.typosquat import combosquat_pairs

    i = F.col("id")
    dom = F.when(
        i % 3 == 0,
        F.concat(F.lit("brand"), (i % 20).cast("string"),
                 F.lit("-portal"), i.cast("string"), F.lit(".com")),
    ).otherwise(F.concat(F.lit("shop"), i.cast("string"), F.lit(".com")))
    domains = spark.range(0, 200).select(dom.alias("domain"))
    brands = spark.range(0, 20).select(
        F.concat(F.lit("brand"), F.col("id").cast("string")).alias("brand"))
    return combosquat_pairs(domains, brands)


def q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup by frame-hash overlap (round 5,
    operators/videodup.py): decoded frames dHash exactly like stills,
    so re-containered copies share frame-hash sets — the join is a
    frame-hash equi-join, never pairwise video comparison. Fixture:
    12 sliding-window videos over a 14-frame pool (video i = frames
    [i, i+2]), ALTERNATING containers (even = AVI MJPG, odd = mp4
    'jpeg' samples — identical JPEG bytes, so the cross-container
    pixel paths must agree bit-for-bit for any pair to surface), plus
    a garbage payload. Consecutive videos share exactly 2 frames
    (pool min pairwise Hamming 23, verified offline — no accidental
    matches); i/i+2 share 1, below min_shared. The oracle enumerates
    the 11 consecutive pairs arithmetically."""
    import numpy as np

    from sigraph_spark.operators.avi import encode_avi_mjpeg
    from sigraph_spark.operators.jpeg import encode_jpeg
    from sigraph_spark.operators.mp4frames import encode_mp4_samples
    from sigraph_spark.operators.videodup import video_neardup

    w, h = 16, 12

    def frame(k):
        rng = np.random.default_rng(7000 + k)
        rgb = rng.integers(0, 256, size=(h, w, 3),
                           dtype=np.uint8).tobytes()
        return encode_jpeg(w, h, rgb, quality=75)

    rows = []
    for i in range(12):
        jpegs = [frame(i), frame(i + 1), frame(i + 2)]
        payload = (encode_avi_mjpeg(jpegs, w, h, fps_num=24)
                   if i % 2 == 0 else encode_mp4_samples(jpegs, w, h))
        rows.append((f"vid-{i:02d}", bytearray(payload)))
    rows.append(("vid-xx", bytearray(b"\x00no video" * 3)))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return video_neardup(df, min_shared=2)


def q_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation (round 5, operators/audioseg.py):
    integer frame energies through the WAV decode path, then
    gaps-and-islands maximal runs. Fixture: 40 clips, each
    silence(1+i%3 frames) / voiced(2+i%4) / silence(1+i%2)
    [/ voiced(1+i%5) on odd i] at constant amplitude 3000 (full-frame
    energy 256*3000^2 >> threshold; silence is exact zeros), so every
    segment row is run-length arithmetic — which is exactly what the
    oracle enumerates."""
    import numpy as np

    from sigraph_spark.operators.audiofp import encode_wav16
    from sigraph_spark.operators.audioseg import (
        audio_segments,
        frame_energies,
    )

    fl = 256
    rows = []
    for i in range(40):
        a, b, c = 1 + i % 3, 2 + i % 4, 1 + i % 2
        spans = [(a, 0), (b, 3000), (c, 0)]
        if i % 2 == 1:
            spans.append((1 + i % 5, 3000))
        xs = []
        for nf, amp in spans:
            if amp == 0:
                xs.append(np.zeros(nf * fl, dtype=np.int64))
            else:
                x = np.full(nf * fl, amp, dtype=np.int64)
                x[1::2] *= -1  # zero-mean square wave, energy amp^2/sample
                xs.append(x)
        rows.append((f"clip-{i:02d}",
                     bytearray(encode_wav16(8000, np.concatenate(xs)))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return audio_segments(frame_energies(df, frame_len=fl),
                          threshold=10_000)


def q_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision patch extraction (round 5, operators/imagetiles.py):
    per-tile exact integer channel sums through the real decoders.
    Fixture: 60 8x8 quadrant images (quadrant (qx, qy) of image i is
    solid (i*7+qx*3+qy*5)%256 / +40 / +80 mod 256), alternating
    PNG/BMP so both pixel paths feed the same arithmetic; every 7th
    payload is garbage -> one NULL row. grid=2 -> every tile is a
    flat 4x4 block whose sums are pure id arithmetic."""
    import numpy as np

    from sigraph_spark.operators.imagetiles import image_tiles
    from sigraph_spark.operators.multimodal import encode_bmp, encode_png

    rows = []
    for i in range(60):
        if i % 7 == 0:
            rows.append((f"img-{i:02d}", bytearray(b"\x00tile" * 4)))
            continue
        px = np.zeros((8, 8, 3), dtype=np.uint8)
        for qy in range(2):
            for qx in range(2):
                r = (i * 7 + qx * 3 + qy * 5) % 256
                px[qy * 4:(qy + 1) * 4, qx * 4:(qx + 1) * 4] = (
                    r, (r + 40) % 256, (r + 80) % 256)
        enc = encode_png if i % 2 == 0 else encode_bmp
        rows.append((f"img-{i:02d}", bytearray(enc(8, 8, px.tobytes()))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return image_tiles(df, grid=2)


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer box resize (round 5, operators/imagetiles.py
    image_resize): the same 60-quadrant-image fixture as
    ``image_tiles``, downsampled 8x8 -> 4x4 — each output pixel is
    the floor mean of a 2x2 box inside one solid quadrant, so the
    resized-channel sums are pure id arithmetic (4 pixels per
    quadrant x quadrant color). The binary resized PNG is exercised
    by tests (lossless round trip); the gate pins the sums."""
    import numpy as np

    from sigraph_spark.operators.imagetiles import image_resize
    from sigraph_spark.operators.multimodal import encode_bmp, encode_png

    rows = []
    for i in range(60):
        if i % 7 == 0:
            rows.append((f"img-{i:02d}", bytearray(b"\x00tile" * 4)))
            continue
        px = np.zeros((8, 8, 3), dtype=np.uint8)
        for qy in range(2):
            for qx in range(2):
                r = (i * 7 + qx * 3 + qy * 5) % 256
                px[qy * 4:(qy + 1) * 4, qx * 4:(qx + 1) * 4] = (
                    r, (r + 40) % 256, (r + 80) % 256)
        enc = encode_png if i % 2 == 0 else encode_bmp
        rows.append((f"img-{i:02d}", bytearray(enc(8, 8, px.tobytes()))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return image_resize(df, 4, 4).select(
        "id", "width", "height", "sum_r", "sum_g", "sum_b")


def q_image_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-caption pair mining (round 5, operators/captions.py —
    the LAION/alt-text multimodal channel): alt pairs + figcaption
    pairs with page-global image indexes, pure-codegen extraction.
    Fixture: 10,000 pages — a captioned lead image always, an
    empty-alt spacer every 3rd (dropped but SHIFTING the figure's
    index — the oracle reproduces the shift), a figure+figcaption
    every 2nd, an uncaptioned trailing img every 5th (emits
    nothing). All rows are id arithmetic."""
    from sigraph_spark.operators.captions import image_captions

    i = F.col("i")
    html = F.concat(
        F.lit('<html><body><img src="/img'), (i % 50).cast("string"),
        F.lit('.jpg" alt="Photo '), (i % 17).cast("string"),
        F.lit(' of item">'),
        F.when(i % 3 == 0,
               F.lit('<img src="/spacer.gif" alt="">')).otherwise(F.lit("")),
        F.when(i % 2 == 0, F.concat(
            F.lit('<figure><img src="/fig'), (i % 23).cast("string"),
            F.lit('.png"><figcaption>Figure '), (i % 13).cast("string"),
            F.lit(" shows the rack</figcaption></figure>"))
        ).otherwise(F.lit("")),
        F.when(i % 5 == 0,
               F.lit('<img src="/nocap.png">')).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = spark.range(0, 10_000).withColumnRenamed("id", "i").select(
        F.concat(F.lit("https://example.org/report/"),
                 F.col("i").cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return image_captions(pages)


def q_absolutized_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL absolutization (round 5, links.absolutize_url): raw hrefs
    resolved against their page url in one JVM expression chain —
    root-relative, directory-relative, parent-relative (dot-segment
    stack fold) and absolute refs, one of each kind per page (the
    absolute one on even ids). Every resolved target is id
    arithmetic."""
    from sigraph_spark.operators.links import absolutize_url, extract_links

    i = F.col("i")
    html = F.concat(
        F.lit('<a href="/p'), (i % 7).cast("string"),
        F.lit('.html">x</a><a href="img'), (i % 5).cast("string"),
        F.lit('.png">y</a><a href="../up'), (i % 3).cast("string"),
        F.lit('.html">z</a>'),
        F.when(i % 2 == 0, F.concat(
            F.lit('<a href="https://ext'), (i % 11).cast("string"),
            F.lit('.org/x">w</a>'))).otherwise(F.lit("")),
    )
    pages = spark.range(0, 10_000).withColumnRenamed("id", "i").select(
        F.concat(F.lit("https://example.org/report/"),
                 F.col("i").cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    links = extract_links(pages)
    return links.select(
        "url",
        absolutize_url(F.col("url"), F.col("target")).alias("target"))


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM quality scoring (round 5, operators/ngram_lm.py —
    the CCNet filter): train order-1..3 counts on the documents table,
    score the same table with stupid backoff. The backoff SELECTION
    per token is integer-pinned (n_tri/n_bi/n_uni/n_oov columns);
    logprob sums natural logs rounded at a coarse 4dp boundary. The
    oracle restates tokenization, context lags, all five joins, the
    rational alpha arithmetic, and the ln-sum in SQL."""
    from sigraph_spark.operators.ngram_lm import score_docs, train_ngram_lm

    docs = _docs(spark, sf_dir)
    model = train_ngram_lm(docs)
    return score_docs(docs, model)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (round 5, operators/layout.py
    plan_compaction — the OPTIMIZE half of table maintenance beside
    the Z-order/Hilbert layout keys): a synthetic 410-file manifest
    (400 undersized + 10 large) is binned by the windowed prefix-sum
    into < 2x-target rewrite groups with near-optimal group count;
    large files and single-file groups keep. The oracle restates the
    identical window arithmetic (compaction_oracle_sql)."""
    from sigraph_spark.operators.layout import plan_compaction

    manifest = spark.range(0, 410).select(
        F.concat(F.lit("f-"), F.col("id")).alias("path"),
        F.when(F.col("id") < 400, 1000 + (F.col("id") * 137) % 9000)
        .otherwise(40000 + F.col("id"))
        .cast("long")
        .alias("bytes"),
    )
    return plan_compaction(manifest, 16000)


def q_warc10_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC/1.0 ingest round trip (round 5, sources/warc.py
    encode_warc10/read_warc10_segments — closes the WARC-lite seam):
    documents -> full ISO 28500 response records with HTTP blocks
    (warcinfo prologue skipped on read; every 11th≡3 page a 404;
    bodies cycle through the real HTTP codings — plain / gzip /
    chunked / chunked+gzip / deflate, removed on read) -> EVEN
    segments framed as per-record GZIP MEMBERS (the Common Crawl
    layout, mtime pinned) -> parse -> status + per-page byte length +
    portable fingerprint of the decoded payload. The oracle computes
    the same values straight from the documents table, so any byte
    lost in framing, gzip member walking, HTTP splitting, dechunking,
    or content decoding fails the hash."""
    import pandas as pd

    from sigraph_spark.operators.textstats import fingerprint64
    from sigraph_spark.sources.warc import encode_warc10, read_warc10_segments

    pages = _docs(spark, sf_dir).select(
        F.col("doc_id"),
        F.concat(F.lit("https://corpus.example/"), F.col("doc_id")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(secs=F.col("doc_id").cast("double"))
        ).alias("ts"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        (F.col("doc_id") % 16).alias("seg"),
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        codings = ("", "gzip", "chunked", "chunked+gzip", "deflate")
        recs = [
            (u, t.to_pydatetime(), bytes(p), "text/html",
             404 if int(d) % 11 == 3 else 200,
             codings[int(d) % 5])
            for d, u, t, p in zip(pdf["doc_id"], pdf["url"], pdf["ts"],
                                  pdf["payload"])
        ]
        return pd.DataFrame(
            {"segment": [f"seg-{seg:02d}"],
             "content": [encode_warc10(recs, gzip_members=(seg % 2 == 0))]}
        )

    segs = pages.groupBy("seg").applyInPandas(
        enc, "segment string, content binary"
    )
    rec = read_warc10_segments(segs)
    return rec.select(
        "url",
        F.col("warc_ts"),
        F.col("http_status"),
        F.length("payload").cast("long").alias("n_bytes"),
        fingerprint64(F.decode(F.col("payload"), "UTF-8")).alias("fingerprint"),
    )


def q_sparql_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 named graphs (GRAPH keyword, operators/bgp.py) over a
    QUAD view of the all-channels fused claims — the claims table's
    ``source`` column is the natural fourth element (jsonld claims form
    the default graph, every other channel a named graph). The query
    exercises default-graph scoping (os triples in the 'table' graph
    must stay invisible outside GRAPH), GRAPH ?g same-graph join
    scoping (rdf:type + rack co-occur only in 'microdata'), and a
    constant GRAPH <rdfa> group; hash-checked against a DuckDB oracle
    restating the graph-filtered joins over the same quad enumeration."""
    from sigraph_spark.operators.bgp import select_sparql
    from sigraph_spark.operators.fusedscan import fused_struct_claims

    quads = fused_struct_claims(_fused_scan_pages(spark)).select(
        F.col("subject").alias("src"),
        "predicate",
        F.col("object").alias("dst"),
        F.when(F.col("source") == "jsonld", F.lit(None).cast("string"))
        .otherwise(F.col("source")).alias("g"),
    )
    q = (
        "SELECT DISTINCT ?g ?s ?r ?ow WHERE { ?s os ?o . "
        "GRAPH ?g { ?s rdf:type Server . ?s rack ?r } . "
        "GRAPH <rdfa> { ?s owner ?ow } }"
    )
    return select_sparql(quads, q)


def _kg_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KG edge table split into three named graphs by a
    deterministic src-derived key — the quad fixture for the GRAPH
    composition gates (restated verbatim in the oracles)."""
    return _edges_ckpt(spark, sf_dir).select(
        "src", "predicate", "dst",
        F.concat(
            F.lit("g"),
            (F.ascii(F.substring("src", -1, 1)) % 3).cast("string"),
        ).alias("g"),
    )


def q_sparql_graph_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property paths INSIDE ``GRAPH ?var`` (round 5 —
    operators/bgp.py ``eval_path(graph_scoped=True)``): the
    LAUNCH/CONNECT+ reachability pattern must close WITHIN each named
    graph — cross-graph hops that the unscoped closure would take are
    invisible, and all graphs evaluate in ONE plan (closure joins carry
    the graph key; no per-graph driver loop). Oracle: recursive CTE
    keyed by (g, node)."""
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?g ?a ?c WHERE { GRAPH ?g { "
         "?a LAUNCH ?b . ?b CONNECT+ ?c } }")
    return select_sparql(_kg_quads(spark, sf_dir), q)


def q_sparql_graph_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery INSIDE ``GRAPH ?var`` (round 5): the inner SELECT
    evaluates per named graph with the graph binding carried through
    its projection, then joins the outer CONNECT pattern on (g, s) —
    SPARQL's evaluate-the-subquery-within-each-active-graph rule.
    Oracle: the same-graph join in plain SQL."""
    from sigraph_spark.operators.bgp import select_sparql

    q = ("SELECT DISTINCT ?g ?s ?o WHERE { GRAPH ?g { ?s CONNECT ?o . "
         "{ SELECT ?s WHERE { ?x LAUNCH ?s } } } }")
    return select_sparql(_kg_quads(spark, sf_dir), q)


def q_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 Update (round 5, operators/sparql_update.py): a
    three-operation ``;``-chain over the event-graph triple store —
    (1) DELETE/INSERT WHERE inverts every CONNECT edge into
    CONNECTED_BY (both legs instantiated from the same pre-op
    bindings), (2) INSERT DATA adds ground seed triples (one already
    produced by op 1's template class — set semantics dedups), (3)
    DELETE WHERE removes all REG_SET triples. Ops apply left to
    right; the result is the final store. Oracle: the same three set
    operations as chained CTEs (UNION is set-distinct in SQL)."""
    from sigraph_spark.operators.sparql_update import update_sparql

    req = (
        "DELETE { ?s CONNECT ?o } INSERT { ?o CONNECTED_BY ?s } "
        "WHERE { ?s CONNECT ?o } ; "
        "INSERT DATA { seed-a LAUNCH seed-b . seed-a LAUNCH seed-c . "
        "seed-b CONNECTED_BY seed-a } ; "
        "DELETE WHERE { ?s REG_SET ?o }"
    )
    store = _edges_ckpt(spark, sf_dir).select("src", "predicate", "dst")
    return update_sparql(store, req)


def q_rdfs_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ρDF entailment (round 5, operators/rdfs.py): schema closures
    broadcast, instance triples touched in single passes — the WebPIE
    stratification. Fixture: parity-chain class hierarchy (c_i
    subClassOf c_{i-2}, i=2..19), mod-3-chain property hierarchy (p_i
    subPropertyOf p_{i-3}, i=3..8), domain(p_j)=c_{2j},
    range(p_j)=c_{2j+1}, and 600 instance triples (x_k, p_{k%9},
    y_k). Every derived triple is then pure arithmetic: superproperty
    fan-out j-3d, domain/range typing 2j', superclass fan-out m-2e —
    which is exactly what the oracle enumerates."""
    from sigraph_spark.operators.rdfs import rdfs_closure

    rows = []
    for i in range(2, 20):
        rows.append((f"c{i}", "rdfs:subClassOf", f"c{i - 2}"))
    for i in range(3, 9):
        rows.append((f"p{i}", "rdfs:subPropertyOf", f"p{i - 3}"))
    for j in range(9):
        rows.append((f"p{j}", "rdfs:domain", f"c{2 * j}"))
        rows.append((f"p{j}", "rdfs:range", f"c{2 * j + 1}"))
    for k in range(600):
        rows.append((f"x{k}", f"p{k % 9}", f"y{k}"))
    t = spark.createDataFrame(rows,
                              "src string, predicate string, dst string")
    return rdfs_closure(t)


def q_breadcrumb_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadcrumb taxonomy mining (round 5,
    operators/breadcrumbs.py): site-hierarchy edges from navigation
    markup — trail extraction is a pure-codegen regexp map, adjacent
    pairing a per-url lead() window, corroboration one count shuffle.
    Fixture: 10,000 pages; page i carries an ``<ol
    class=\"breadcrumb\">`` trail Root > Cat{i%5} [> Sub{i%7} when
    i%3>=1] [> Leaf{i%11} as a bare unlinked <li> when i%3=2], plus
    separator items and decoy anchors outside the container. Every
    (narrower, broader, n_pages) row is residue arithmetic — the
    oracle groups the same trails enumerated in SQL."""
    from sigraph_spark.operators.breadcrumbs import (
        breadcrumb_edges,
        breadcrumb_trails,
    )

    i = F.col("i")
    crumb = F.concat(
        F.lit('<ol class="breadcrumb"><li><a href="/">Root</a></li>'
              "<li>&gt;</li><li><a>Cat"),
        (i % 5).cast("string"),
        F.lit("</a></li>"),
        F.when(i % 3 >= 1, F.concat(
            F.lit("<li>›</li><li><a>Sub"), (i % 7).cast("string"),
            F.lit("</a></li>"))).otherwise(F.lit("")),
        F.when(i % 3 == 2, F.concat(
            F.lit("<li>Leaf"), (i % 11).cast("string"),
            F.lit("</li>"))).otherwise(F.lit("")),
        F.lit("</ol>"),
    )
    html = F.concat(
        F.lit("<html><body><nav><a href='/x'>Decoy</a></nav>"),
        crumb,
        F.lit("<p>body text</p><a href='/y'>Other</a></body></html>"),
    )
    pages = spark.range(0, 10_000).withColumnRenamed("id", "i").select(
        F.concat(F.lit("https://example.org/report/"),
                 F.col("i").cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return breadcrumb_edges(breadcrumb_trails(pages))


def _webtext_quote_docs(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic attributed-quote corpus over the standard urls:
    every page leads with a DECOY quoted span ("shows" is not an
    attribution verb — no match, no index shift), then a PRE-shape
    quote; every 2nd page adds a POST-shape quote with the comma inside
    the closing quote (stripped), every 3rd an according-to shape, and
    every 7th a colon+exclamation PRE variant with a single-token
    speaker. quote_idx is match order across shapes. The oracle
    enumerates the planted rows arithmetically."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    post = F.when(
        F.col("i") % 2 == 0,
        F.concat(
            F.lit('"We moved rack r-'), (F.col("i") % 23).cast("string"),
            F.lit('," said Bob Stone. '),
        ),
    ).otherwise(F.lit(""))
    acc = F.when(
        F.col("i") % 3 == 0,
        F.concat(
            F.lit('According to Eve Long, "the quota is '),
            (F.col("i") % 5).cast("string"), F.lit('." '),
        ),
    ).otherwise(F.lit(""))
    dana = F.when(
        F.col("i") % 7 == 0,
        F.concat(
            F.lit('Dana warned: "check unit '),
            (F.col("i") % 9).cast("string"), F.lit('!" '),
        ),
    ).otherwise(F.lit(""))
    text = F.concat(
        F.lit('The log shows "error '), (F.col("i") % 7).cast("string"),
        F.lit('" today. Alice Carter said "segment '),
        (F.col("i") % 17).cast("string"),
        F.lit(' is stable." '), post, acc, dana,
    )
    return pages.select("url", text.alias("text"))


def q_quotes_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotation/attribution extraction over the planted corpus; hash
    pins the three shapes, the verb gate (decoy never matches), the
    in-quote punctuation strip and the cross-shape quote_idx order."""
    from sigraph_spark.operators.quotes import extract_quotes

    return extract_quotes(_webtext_quote_docs(spark))


def _webtext_abbrev_docs(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic abbreviation corpus over the standard urls: even
    pages lead with a MISMATCH decoy (consumes pair_idx, drops), 3-pages
    add a TOO-SHORT candidate (two words cannot spell three letters —
    drops), every page carries the APT trim case (leading "The" trims
    away) and the DOD connector case, 5-pages a second trim case, and a
    letter-VARYING verified pair Team <C>unit Response (T<C>R). The
    oracle enumerates rows arithmetically."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    c = F.expr("char(65 + i % 26)")
    decoy = F.when(
        F.col("i") % 2 == 0, F.lit("Wrong Name (XYZ) appeared. ")
    ).otherwise(F.lit(""))
    shortfall = F.when(
        F.col("i") % 3 == 0, F.lit("Big Data (BDX) grows. ")
    ).otherwise(F.lit(""))
    nyt = F.when(
        F.col("i") % 5 == 0, F.lit("The New York Times (NYT) wrote. ")
    ).otherwise(F.lit(""))
    text = F.concat(
        decoy, shortfall,
        F.lit("The Advanced Persistent Threat (APT) hit the "
              "Department of Defense (DOD) segment "),
        F.col("i").cast("string"), F.lit(". "), nyt,
        F.lit("Team "), c, F.lit("unit Response (T"), c, F.lit("R) closed."),
    )
    return pages.select("url", text.alias("text"))


def q_abbrev_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abbreviation alias mining over the planted corpus; hash pins the
    candidate indexing (decoys consume pair_idx), connector initials,
    left-trim semantics and the initials verification."""
    from sigraph_spark.operators.abbrev import abbrev_pairs

    return abbrev_pairs(_webtext_abbrev_docs(spark))


def _webtext_template_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic template corpus over the standard urls: one base
    skeleton with per-page TEXT variation (structure-invariant), an
    extra aside/ul/li block on 3-pages and a bare <img> on 5-pages —
    four structure classes total. The oracle recomputes the md5
    fingerprint from the arithmetically-constructed tag string, pinning
    the tag extraction and the hash end-to-end."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    istr = F.col("i").cast("string")
    aside = F.when(
        F.col("i") % 3 == 0,
        F.concat(F.lit("<aside><ul><li>seg "), istr,
                 F.lit("</li></ul></aside>")),
    ).otherwise(F.lit(""))
    img = F.when(F.col("i") % 5 == 0, F.lit("<img>")).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Report "), istr,
        F.lit("</title></head><body><nav><a>Home</a></nav><div><h1>t"),
        istr, F.lit("</h1><p>text "), istr, F.lit("</p></div>"),
        aside, img, F.lit("<footer></footer></body></html>"),
    )
    return pages.select("url", html.alias("html"))


def q_template_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structure fingerprints over the planted corpus; hash pins the
    opening-tag skeleton extraction and the portable md5."""
    from sigraph_spark.operators.template import page_structure

    return page_structure(_webtext_template_pages(spark))


def q_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template clusters: the four planted structure classes with
    member counts and lexicographic exemplars."""
    from sigraph_spark.operators.template import (
        page_structure, template_clusters,
    )

    return template_clusters(page_structure(_webtext_template_pages(spark)))


def _webtext_quantity_docs(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic quantity corpus over the standard urls: 3-pages
    lead with a NON-DIVISIBLE decoy (0.5 B — consumes q_idx, drops),
    then a varying GiB size, a fractional GHz clock (frac from the
    divisible set .0/.25/.50/.75), a varying ms timeout, on 5-pages a
    1.5 h duration, and an out-of-contract 7-digit number that never
    matches. The oracle emits the planted base values arithmetically."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    decoy = F.when(
        F.col("i") % 3 == 0, F.lit("raw 0.5 B flag. ")
    ).otherwise(F.lit(""))
    hrs = F.when(
        F.col("i") % 5 == 0, F.lit("keep 1.5 h. ")
    ).otherwise(F.lit(""))
    text = F.concat(
        decoy,
        F.lit("disk "), (F.col("i") % 512).cast("string"),
        F.lit(" GiB, clock 3."), ((F.col("i") % 4) * 25).cast("string"),
        F.lit(" GHz, timeout "), (F.col("i") % 1000).cast("string"),
        F.lit(" ms. "), hrs,
        F.lit("big 1536000 KB ignored."),
    )
    return pages.select("url", text.alias("text"))


def q_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity normalization over the planted corpus; hash pins the
    unit inventory, exact DECIMAL(38,0) arithmetic, the non-divisible
    and out-of-contract drop rules and q_idx accounting."""
    from sigraph_spark.operators.quantities import extract_quantities

    return extract_quantities(_webtext_quantity_docs(spark))


def q_object_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity normalization APPLIED TO KG object literals: the dl
    corpus's RAM infobox values ("N GiB") gain a cross-unit comparison
    key; CPU values ("N-core") and others stay NULL — integration of
    quantities into the literal-typing family."""
    from sigraph_spark.operators.dlfacts import dl_facts
    from sigraph_spark.operators.quantities import quantity_columns

    facts = dl_facts(_webtext_dl_pages(spark))
    return quantity_columns(facts, "value")


def _webtext_chain_pages(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Deterministic pagination corpus over the standard urls: pages
    group in fours (g = id div 4); group g forms a rel=next chain of
    length g%4+1 (page 4g+p links to 4g+p+1 while p+1 < len), so the
    corpus holds standalone pages (len 1 — absent from chains) and
    2/3/4-part chains in equal measure. Text is 'part <id> body.'"""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    ln = (F.col("i") / 4).cast("long") % 4 + 1
    p = F.col("i") % 4
    nxt = F.when(
        p + 1 < ln,
        F.concat(
            F.lit('<link rel="next" href="https://example.org/report/'),
            (F.col("i") + 1).cast("string"), F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), nxt,
        F.lit("</head><body><p>part "), F.col("i").cast("string"),
        F.lit(" body.</p></body></html>"),
    )
    text = F.concat(
        F.lit("part "), F.col("i").cast("string"), F.lit(" body.")
    )
    return pages.select("url", html.alias("html"), text.alias("text"))


def q_page_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination chain labeling over the planted corpus; hash pins the
    extraction, head identification and 0-based positions."""
    from sigraph_spark.operators.pagination import (
        extract_next_links, page_chains,
    )

    pages = _webtext_chain_pages(spark)
    return page_chains(extract_next_links(pages))


def q_stitched_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-ordered multi-page reassembly: chain texts joined on
    the newline separator, keyed by head."""
    from sigraph_spark.operators.pagination import (
        extract_next_links, page_chains, stitch_chains,
    )

    pages = _webtext_chain_pages(spark)
    return stitch_chains(
        pages.select("url", "text"),
        page_chains(extract_next_links(pages)),
    )


def q_alias_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-voted abbreviation alias map over the planted corpus;
    hash pins the distinct-page voting, min_pages cut and the
    deterministic winner per short form."""
    from sigraph_spark.operators.abbrev import abbrev_pairs, alias_map

    return alias_map(abbrev_pairs(_webtext_abbrev_docs(spark)))


def q_sparql_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL OFFSET/LIMIT slice over a totally-ordered projection —
    OFFSET applies before LIMIT per SPARQL 1.1 regardless of textual
    order (the query writes LIMIT first)."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT ?a ?b WHERE { ?a LAUNCH ?b } "
        "ORDER BY ?a ?b LIMIT 10 OFFSET 20"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_template_novel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental template detection: the known index holds the
    structures of i%5!=0 pages, the delta is the full corpus — exactly
    the two <img>-bearing classes surface as novel (the anti-join probe
    never re-fingerprints the known corpus)."""
    from sigraph_spark.operators.template import novel_templates, page_structure

    pages = _webtext_template_pages(spark)
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    known = page_structure(pages.filter(i % 5 != 0))
    return novel_templates(page_structure(pages), known)


def _hearst_corpus(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Planted Hearst-pattern corpus over the standard urls: every page
    carries a such_as sentence with a 3-item coordinated list; 3/4/5/7
    multiples add or_other / including / such_np_as / 2-word-NP variants;
    9- and 11-multiples plant OPPOSITE-direction kind->kind claims (the
    taxonomy direction vote); page 4242 plants a singleton pair (the
    min_support drop). Lists are bounded by closed-class words exactly as
    real prose is — the regexes parse, the oracle emits arithmetic."""
    from sigraph_spark.corpus import gen_pages

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    I = F.col("i")

    def l(n: Column) -> Column:
        return F.char(F.lit(97) + (n % 26))

    s1 = F.concat(
        F.lit("kind"), l(I), F.lit(" such as item"), l(2 * I),
        F.lit(", item"), l(2 * I + 1), F.lit(" and item"), l(2 * I + 2),
        F.lit(" are seen."),
    )
    s2 = F.when(I % 3 == 0, F.concat(
        F.lit(" big kind"), l(I + 1), F.lit(" such as item"), l(5 * I),
        F.lit(" are near."),
    )).otherwise(F.lit(""))
    s3 = F.when(I % 4 == 0, F.concat(
        F.lit(" item"), l(7 * I), F.lit(", item"), l(7 * I + 3),
        F.lit(" or other kind"), l(I + 2), F.lit(" exist here."),
    )).otherwise(F.lit(""))
    s4 = F.when(I % 5 == 0, F.concat(
        F.lit(" kind"), l(I + 3), F.lit(", including item"), l(11 * I),
        F.lit(" and item"), l(11 * I + 5), F.lit(" are known."),
    )).otherwise(F.lit(""))
    s5 = F.when(I % 7 == 0, F.concat(
        F.lit(" such kind"), l(I + 5), F.lit(" as item"), l(13 * I),
        F.lit(" are rare."),
    )).otherwise(F.lit(""))
    s6 = F.when(I % 9 == 0, F.concat(
        F.lit(" kind"), l(I), F.lit(" such as kind"), l(I + 4),
        F.lit(" are common."),
    )).otherwise(F.lit(""))
    s7 = F.when(I % 11 == 0, F.concat(
        F.lit(" kind"), l(I + 4), F.lit(" such as kind"), l(I),
        F.lit(" are common."),
    )).otherwise(F.lit(""))
    s8 = F.when(
        I == 4242, F.lit(" gemsy such as itemzz are odd.")
    ).otherwise(F.lit(""))
    return pages.select(
        "url", F.concat(s1, s2, s3, s4, s5, s6, s7, s8).alias("text")
    )


def q_hearst_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hearst IS-A extraction (COLING'92 patterns) over the planted
    corpus — the regex/list-split/explode chain vs the oracle's direct
    arithmetic enumeration of what was planted."""
    from sigraph_spark.operators.hearst import hearst_pairs

    return hearst_pairs(_hearst_corpus(spark))


def q_taxonomy_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level taxonomy induction: aggregate pair evidence,
    min_support gate (drops the planted singleton), reciprocal direction
    vote (the 9-multiples beat the 11-multiples on every kind->kind
    letter pair)."""
    from sigraph_spark.operators.hearst import hearst_pairs, taxonomy_edges

    return taxonomy_edges(hearst_pairs(_hearst_corpus(spark)), min_support=2)


def q_text_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passim-style aligned-span text reuse over a planted corpus: page m
    shares run R_m (5 + 2 + m%4 tokens; 13-multiples plant a 5-token run
    that falls below min_run) with page m+1, wrapped in per-page-unique
    filler at arithmetic offsets. The oracle enumerates the expected
    (pair, offsets, run length) spans directly — k-gram indexing, df-cut,
    diagonal grouping and islands-splitting are all pinned."""
    from sigraph_spark.operators.textreuse import reuse_spans

    return reuse_spans(
        _webtext_reuse_docs(spark), k=5, min_run=3, max_gram_df=8
    )


def _webtext_reuse_docs(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Planted text-reuse corpus (shared runs between neighbor pages
    inside page-unique filler). Gate pins sf=0.01; bench scales it."""
    from sigraph_spark.corpus import gen_pages, pages_count

    n = pages_count(sf)
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=sf).select("url", i.alias("i"))
    I = F.col("i")
    empty = F.expr("CAST(array() AS array<string>)")

    def run_len(m: Column) -> Column:
        return F.lit(5) + F.when(m % 13 == 0, F.lit(0)).otherwise(
            (F.lit(2) + m % 4).cast("int")
        )

    def filler(seg: str, count: Column) -> Column:
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count.cast("int")),
                lambda j: F.concat(
                    F.lit("f"), I.cast("string"), F.lit(seg), j.cast("string")
                ),
            ),
        ).otherwise(empty)

    def run(m: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), (run_len(m) - 1).cast("int")),
            lambda t: F.concat(
                F.lit("s"), m.cast("string"), F.lit("x"), t.cast("string")
            ),
        )

    tokens = F.concat(
        filler("a", (I % 7).cast("int")),
        F.when(I >= 1, run(I - 1)).otherwise(empty),
        filler("b", (F.lit(2) + I % 3).cast("int")),
        F.when(I <= n - 2, run(I)).otherwise(empty),
        filler("c", F.lit(3)),
    )
    return pages.select("url", F.array_join(tokens, " ").alias("text"))


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (Kleinberg JACM'99) over the event KG in
    exact L1-normalized BIGINT fixed-point — bit-identical to the
    unrolled-CTE oracle, including the integer floor divisions of every
    normalization."""
    from sigraph_spark.operators.graphalgo import hits

    return hits(_edges_ckpt(spark, sf_dir), rounds=4)


def _multi_extractor_claims(spark: SparkSession, sf: float = 0.01) -> DataFrame:
    """Claims from FOUR extractor views, extractor-tagged: sentence
    triples, web-table facts, a degraded 'ocr' copy of the table view
    (uppercases os objects on 9-multiples — the planted cross-source
    conflict), and Hearst is_a pairs."""
    from sigraph_spark.operators.hearst import hearst_pairs
    from sigraph_spark.operators.htmltables import table_triples

    sent = _webtext_triples(spark).select(
        F.col("actor").alias("subject"),
        F.col("verb").alias("predicate"),
        "object",
        F.lit("sentence").alias("source"),
    )
    tab = table_triples(_webtext_table_pages(spark, sf=sf))
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    tabc = tab.select(
        F.col("subj").alias("subject"), "predicate",
        F.col("obj").alias("object"), F.lit("table").alias("source"),
    )
    ocr = tab.select(
        F.col("subj").alias("subject"), "predicate",
        F.when(
            (i % 9 == 0) & (F.col("predicate") == "os"), F.upper("obj")
        ).otherwise(F.col("obj")).alias("object"),
        F.lit("ocr").alias("source"),
    )
    hear = hearst_pairs(_hearst_corpus(spark, sf=sf)).select(
        F.col("hypo").alias("subject"),
        F.lit("is_a").alias("predicate"),
        F.col("hyper").alias("object"),
        F.lit("hearst").alias("source"),
    ).distinct()
    return sent.unionByName(tabc).unionByName(ocr).unionByName(hear)


def q_multi_extractor_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multi-extractor KG assembly: four extractor views
    (sentence / table / degraded-ocr / hearst) unioned as source-tagged
    claims and resolved by two-round source-weighted fusion — the
    composition the webtext plan (plans/webtext.py) materializes with
    manifests; the oracle re-derives every view arithmetically and
    restates the fusion algebra."""
    from sigraph_spark.operators.fusion import fuse_triples

    return fuse_triples(
        _multi_extractor_claims(spark), "subject", "predicate", "object", "source"
    )


def q_sparql_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual SPARQL SELECT end-to-end: parse -> BGP join ordering ->
    property-path closure -> FILTER -> DISTINCT projection, against a
    recursive-CTE oracle (the query-language surface over the same KG
    the hand-built bgp/path gates cover)."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?a ?c WHERE { ?a LAUNCH ?b . ?b CONNECT+ ?c . "
        "FILTER(?a != ?c) }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL aggregate projection: per-launcher fan-out over the 2-hop
    LAUNCH->CONNECT join — COUNT(*), COUNT(DISTINCT) and MIN computed by
    the engine's groupBy against the same aggregation in plain SQL."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT ?a (COUNT(*) AS ?n_paths) (COUNT(DISTINCT ?c) AS ?n_targets) "
        "(MIN(?c) AS ?first_target) "
        "WHERE { ?a LAUNCH ?b . ?b CONNECT ?c } GROUP BY ?a"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT (KG-to-KG rewrite): materialize reachability
    facts from the LAUNCH ∘ CONNECT+ pattern as new triples, both
    directions, DISTINCT across the two template instantiations."""
    from sigraph_spark.operators.bgp import construct_sparql

    q = (
        "CONSTRUCT { ?a reaches ?c . ?c reached_by ?a } "
        "WHERE { ?a LAUNCH ?b . ?b CONNECT+ ?c . FILTER(?a != ?c) }"
    )
    return construct_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UNION: a group chain joined with an outer triple — each
    branch evaluates independently (one may carry its own FILTER), the
    union NULL-fills branch-local variables, and the shared variable
    joins back into the required pattern."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?a ?x WHERE { ?a LAUNCH ?b . "
        "{ ?b CONNECT ?x } UNION { ?b ACCESS ?x . FILTER(?b != ?x) } }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL VALUES with UNDEF: the inline table binds the PREDICATE
    variable (data-independent literals), one row per kept predicate,
    UNDEF in the src slot admitting every subject — the compatibility
    join (UNDEF matches anything) is what the hash pins."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?p ?s ?o WHERE { ?s ?p ?o . "
        "VALUES (?p ?s) { ('LAUNCH' UNDEF) ('CONNECT' UNDEF) } }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_ask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ASK: boolean existence of the LAUNCH-into-LAUNCH join —
    one row, column ``matched`` (true at every sf: process chains
    exist by construction)."""
    from sigraph_spark.operators.bgp import ask_sparql

    return ask_sparql(
        _edges_ckpt(spark, sf_dir), "ASK { ?a LAUNCH ?b . ?b LAUNCH ?c }"
    )


def q_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE ?v WHERE: incident-edge description of every
    node that LAUNCHes a launcher — the resource set comes from a
    binding pattern, the description is the one-hop incident edge set
    (both directions, distinct) via two broadcast semi-joins."""
    from sigraph_spark.operators.bgp import describe_sparql

    return describe_sparql(
        _edges_ckpt(spark, sf_dir),
        "DESCRIBE ?m WHERE { ?m LAUNCH ?x . ?x LAUNCH ?y }",
    )


def q_sparql_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL FILTER NOT EXISTS: LAUNCH edges whose target never
    CONNECTs — hash anti-join on the shared variable (non-empty at
    every sf: most launched processes do not open sockets)."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?a ?b WHERE { ?a LAUNCH ?b . "
        "FILTER NOT EXISTS { ?b CONNECT ?c } }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL MINUS on a shared variable: LAUNCH edges whose source
    never CONNECTs — anti-join on the shared ?s."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?s ?o WHERE { ?s LAUNCH ?o . "
        "MINUS { ?s CONNECT ?z } }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_bind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL BIND: computed projection column (CONCAT over two bound
    vars) filtered downstream — the bind column participates in the
    plan like any other."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?edge WHERE { ?a LAUNCH ?b . "
        "BIND(CONCAT(?a, '->', ?b) AS ?edge) }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_nps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL negated property set: one hop over any predicate EXCEPT
    LAUNCH/CONNECT, joined into a LAUNCH hop — the !(..) atom composes
    with the path machinery like any predicate scan."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?a ?c WHERE { ?a LAUNCH ?b . "
        "?b !(LAUNCH|CONNECT) ?c }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_groupconcat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL GROUP_CONCAT / SAMPLE / HAVING: per-launcher distinct
    target roster (sorted, pinned separator), deterministic SAMPLE
    (=MIN) and a HAVING cut on the projected count."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT ?a (GROUP_CONCAT(DISTINCT ?b; SEPARATOR=',') AS ?targets) "
        "(SAMPLE(?b) AS ?first) (COUNT(*) AS ?n) "
        "WHERE { ?a LAUNCH ?b } GROUP BY ?a HAVING(?n >= 2)"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def q_sparql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL subquery: per-source CONNECT fan-out computed in an inner
    SELECT, joined into the outer LAUNCH pattern on the projected
    variable — launchers that also connect, with their counts."""
    from sigraph_spark.operators.bgp import select_sparql

    q = (
        "SELECT DISTINCT ?a ?b ?n WHERE { ?a LAUNCH ?b . "
        "{ SELECT ?a (COUNT(*) AS ?n) WHERE { ?a CONNECT ?c } GROUP BY ?a } }"
    )
    return select_sparql(_edges_ckpt(spark, sf_dir), q)


def _robots_corpus(spark: SparkSession) -> DataFrame:
    """200 planted robots.txt bodies: every host has a '*' group
    (disallow + longer allow carve-out), 4-multiples add a wildcard rule
    (the unsupported channel), 5-multiples an empty Disallow (emits
    nothing), 3-multiples a consecutive two-agent group."""
    j = F.col("id")
    a = (j % 7).cast("string")
    b = (j % 9).cast("string")
    body = F.concat(
        F.lit("# generated\nUser-agent: *\nDisallow: /p"), a,
        F.lit("/\nAllow: /p"), a, F.lit("/ok/"),
        F.when(j % 4 == 0, F.lit("\nDisallow: /*.gif$")).otherwise(F.lit("")),
        F.when(j % 5 == 0, F.lit("\nDisallow:")).otherwise(F.lit("")),
        F.when(
            j % 3 == 0,
            F.concat(
                F.lit("\n\nUser-agent: fastbot\nUser-agent: slowbot\nDisallow: /x"),
                b,
            ),
        ).otherwise(F.lit("")),
    )
    return spark.range(0, 200).select(
        F.concat(F.lit("h"), j.cast("string"), F.lit(".com")).alias("host"),
        body.alias("body"),
    )


def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parse (RFC 9309 grouping) as ONE pure-Column fold per
    file: consecutive user-agent lines share a group, empty Disallow
    emits nothing, wildcard rules surface on the 'unsupported' channel.
    The oracle enumerates the planted rules arithmetically."""
    from sigraph_spark.operators.robots import parse_robots

    return parse_robots(_robots_corpus(spark))


def q_robots_allowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-permission evaluation: longest-prefix match with the
    allow-wins tie rule and default-allow fallback, urls fanned across
    the planted hosts (disallowed / carved-out / unmatched / bare-host
    variants)."""
    from sigraph_spark.operators.robots import parse_robots, robots_allowed

    i = F.col("id")
    a = ((i % 200) % 7).cast("string")
    path = (
        F.when(i % 4 == 0, F.concat(F.lit("/p"), a, F.lit("/f"), i.cast("string")))
        .when(i % 4 == 1, F.concat(F.lit("/p"), a, F.lit("/ok/f")))
        .when(i % 4 == 2, F.lit("/other/f"))
        .otherwise(F.lit(""))
    )
    urls = spark.range(0, 10000).select(
        F.concat(
            F.lit("https://h"), (i % 200).cast("string"), F.lit(".com"), path
        ).alias("url")
    )
    return robots_allowed(urls, parse_robots(_robots_corpus(spark)))


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML parse (urlset + index entries, optional lastmod,
    whitespace-trimmed locs) over planted documents; the oracle
    enumerates the planted entries arithmetically."""
    from sigraph_spark.operators.crawl import parse_sitemaps

    j = F.col("id")
    entry = lambda k: F.concat(  # noqa: E731
        F.lit("<url><loc> https://s"), j.cast("string"), F.lit(".com/p"),
        k.cast("string"), F.lit(" </loc>"),
        F.when(
            (j + k) % 2 == 0,
            F.concat(
                F.lit("<lastmod>2024-01-0"),
                (1 + (j + k) % 9).cast("string"), F.lit("</lastmod>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    urls = F.concat_ws(
        "", F.transform(F.sequence(F.lit(0), (j % 3).cast("int")), entry)
    )
    idx = F.when(
        j % 5 == 0,
        F.concat(
            F.lit("<sitemap><loc>https://s"), j.cast("string"),
            F.lit(".com/sub.xml</loc></sitemap>"),
        ),
    ).otherwise(F.lit(""))
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'), urls, idx, F.lit("</urlset>")
    )
    sitemaps = spark.range(0, 500).select(
        F.concat(
            F.lit("https://s"), j.cast("string"), F.lit(".com/sitemap.xml")
        ).alias("sitemap_url"),
        xml.alias("xml"),
    )
    return parse_sitemaps(sitemaps)


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling: per-host batches of <=3, priority-then-url
    deterministic order — restated as one SQL window."""
    from sigraph_spark.operators.crawl import schedule_frontier

    i = F.col("id")
    frontier = spark.range(0, 10000).select(
        F.concat(
            F.lit("https://h"), (i % 97).cast("string"), F.lit(".com/p"),
            i.cast("string"),
        ).alias("url"),
        (i % 13).cast("int").alias("prio"),
    )
    return schedule_frontier(frontier, per_host_per_batch=3, priority_col="prio")


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded at the process nodes: relevance-to-
    the-pivot-set ranking (the analyst's 'expand from these processes'
    primitive), exact fixed-point BIGINT vs the unrolled-CTE oracle —
    bit-identical, including the exact 0 rows for nodes unreachable from
    the seeds."""
    from sigraph_spark.operators.pagerank import personalized_pagerank

    edges = _edges_ckpt(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node").startswith("proc_"))
    return personalized_pagerank(edges, seeds)


def q_graph_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two versions of the edge table (built from
    two overlapping event subsets, so added/removed/changed all occur):
    one null-safe full-outer join on the merge key — with the bucketed/
    Iceberg layout that join is storage-partitioned and shuffle-free."""
    from sigraph_spark.operators.diff import diff_tables
    from sigraph_spark.operators.graph import build_edges

    good, _ = _parsed(spark, sf_dir)
    eid = F.substring_index(F.col("span_id"), "-", -1).cast("long")
    cols = ["src", "predicate", "dst", "start_time", "weight"]
    old = build_edges(good.filter(eid % 11 != 0)).select(*cols)
    new = build_edges(good.filter(eid % 13 != 0)).select(*cols)
    return diff_tables(old, new, ["src", "predicate", "dst"])


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label spread: the 7 process nodes seed their own
    names as labels; 3 fixed rounds of deterministic majority vote
    classify every artifact by its dominant process. The oracle unrolls
    the identical rounds."""
    from sigraph_spark.operators.graphalgo import label_propagation

    e = _edges_ckpt(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionAll(e.select(F.col("dst").alias("n")))
        .distinct()
    )
    seeds = nodes.filter(F.col("n").like("proc\\_%")).select(
        F.col("n").alias("node"), F.col("n").alias("label")
    )
    return label_propagation(e, seeds, rounds=3)


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA community partition — exact BIGINT
    numerator q_num = 4m^2*Q (one float division at the very end), so
    the quality score itself is engine-exact and replay-stable."""
    from sigraph_spark.operators.graphalgo import (
        communities_lpa, modularity,
    )

    e = _edges_ckpt(spark, sf_dir)
    return modularity(e, communities_lpa(e, rounds=4))


def q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (Boldi-Vigna): per-node neighborhood-function
    estimates at radii 1..3 via mergeable per-node HLL registers —
    r edge-joins for ALL sources at once instead of per-source BFS.
    The oracle unrolls the identical max-merge rounds and estimator."""
    from sigraph_spark.operators.graphalgo import hyperball

    return hyperball(_edges_ckpt(spark, sf_dir), p=6, radii=3)


def q_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseeded community detection: 4 rounds of deterministic
    synchronous LPA (self-vote damped, lexicographic ties) over the
    event graph. The oracle unrolls the identical rounds."""
    from sigraph_spark.operators.graphalgo import communities_lpa

    return communities_lpa(_edges_ckpt(spark, sf_dir), rounds=4)


def q_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph health summary: node/edge counts, density,
    reciprocity (fraction of directed pairs with a reverse edge), and
    self-loop count — the sanity panel printed after every build."""
    e = _edges_ckpt(spark, sf_dir).select("src", "dst").distinct().localCheckpoint(
        eager=False
    )
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionAll(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"]).count()
    total = e.count()
    loops = e.filter(F.col("src") == F.col("dst")).count()
    raw = _events(spark, sf_dir).sparkSession.createDataFrame(
        [(nodes, total, loops, recip)],
        "n_nodes long, n_edges long, self_loops long, _recip long",
    )
    # ratios rounded Spark-side: F.round is HALF_UP like the SQL engines
    # (python round() is banker's and can differ on exact .5 boundaries)
    return raw.select(
        "n_nodes", "n_edges", "self_loops",
        F.round(F.col("_recip") / F.col("n_edges"), 6).alias("reciprocity"),
        F.round(
            F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)), 6
        ).alias("density"),
    )


def q_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component size profile — the cluster audit run after
    every near-dup/entity pass (a giant component usually means the
    blocking threshold collapsed). One count per canonical id over the
    already-oracled components output."""
    from sigraph_spark.operators.linking import connected_components

    e = _edges_ckpt(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    cc = connected_components(e)
    return (
        cc.groupBy(F.col("canonical_id").alias("component"))
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
    )


def q_node_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node feature table (degree, triangles, pagerank, component) —
    the composition a GNN/anomaly trainer consumes; each constituent
    keeps its own scale-safe algorithm and each was already individually
    oracled, so this pins the JOIN composition too."""
    from sigraph_spark.operators.graphalgo import node_features

    return node_features(_edges_ckpt(spark, sf_dir))


def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS distances from a seed process over the directed
    provenance edges (the 'blast radius in N hops' query). Spark runs the
    iterative-frontier expansion; the oracle is a bounded recursive CTE
    taking min(d) per node — exact equality because the fixture's
    eccentricity (3) is far below the bound."""
    from sigraph_spark.operators.graphalgo import shortest_paths

    seeds = spark.createDataFrame(
        [("proc_0.exe@PROCESS",)], "node_id string"
    )
    return shortest_paths(_edges_ckpt(spark, sf_dir), seeds)


def q_weighted_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded weighted shortest paths (Bellman-Ford) from the seed
    process over the directed provenance edges, costs = exact BIGINT
    weight sums. Both engines compute the SAME bounded semantics (min
    cost over <= 6-edge paths), so equality needs no convergence
    argument — the bound is part of the contract on both sides."""
    from sigraph_spark.operators.graphalgo import weighted_shortest_paths

    seeds = spark.createDataFrame(
        [("proc_0.exe@PROCESS",)], "node_id string"
    )
    return weighted_shortest_paths(
        _edges_ckpt(spark, sf_dir), seeds, max_hops=6
    )


def q_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting earliest-arrival reachability from the seed
    process: each hop's start_time must be >= the arrival time of the
    previous hop ("what could this event have caused", without the
    before-the-flow edges plain reachability overcounts). Hop-6 bounded
    semantics on both engines; times are floor-epoch BIGINTs."""
    from sigraph_spark.operators.graphalgo import temporal_reachability

    seeds = spark.createDataFrame(
        [("proc_0.exe@PROCESS",)], "node_id string"
    )
    e = _edges_ckpt(spark, sf_dir).select(
        "src", "dst", F.unix_timestamp("start_time").alias("t")
    )
    return temporal_reachability(e, seeds, max_hops=6)


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the undirected provenance graph: iterative peel on Spark
    vs the same peel unrolled to 8 CTE rounds in DuckDB (the PageRank
    unrolling device) — exact, with the fixture converging in 2 rounds
    (pinned by the metrics dict in tests)."""
    from sigraph_spark.operators.graphalgo import kcore

    return kcore(_edges_ckpt(spark, sf_dir), k=4)


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss of the trace co-occurrence graph (the triangle-dense
    companion graph from q_triangles — the raw provenance graph is
    near-bipartite, so its truss is empty): every surviving edge must
    close >=2 triangles inside the surviving subgraph, the cohesion
    audit that kills boilerplate hub stars the k-core keeps. Spark runs
    the iterative peel (degree-oriented wedge join); the oracle unrolls
    the identical peel to 4 SQL rounds (fixture convergence pinned by
    the metrics dict in tests)."""
    from sigraph_spark.operators.graph import build_trace_contains
    from sigraph_spark.operators.graphalgo import ktruss

    good, _ = _parsed(spark, sf_dir)
    tc = build_trace_contains(good)
    a = tc.select("unit_id", "trace_id", F.col("node_id").alias("src"))
    b = tc.select("unit_id", "trace_id", F.col("node_id").alias("dst"))
    co = (
        a.join(b, ["unit_id", "trace_id"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    return ktruss(co, k=4)


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-choice random walks over the provenance edges
    (the KG -> skip-gram embedding corpus path). Reproducible on any
    partitioning, so the oracle unrolls the same 4 rounds in SQL with the
    portable md5 hash family — exact match, not statistical."""
    from sigraph_spark.operators.walks import random_walks

    return random_walks(_edges_ckpt(spark, sf_dir), walks_per_node=2, length=4)


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pairs within a +-2 step window over the
    deterministic walks — the actual embedding-training table."""
    from sigraph_spark.operators.walks import random_walks, skipgram_pairs

    w = random_walks(_edges_ckpt(spark, sf_dir), walks_per_node=2, length=4)
    return skipgram_pairs(w, window=2)


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word2vec-style negative sampling over the skip-gram
    pairs: banded dense-rank vocab + portable md5 draw — same draws in
    SQL, so the training triples (center, context, negative) are
    hash-oracled end to end from the raw event log."""
    from sigraph_spark.operators.walks import (
        negative_samples, random_walks, skipgram_pairs,
    )

    w = random_walks(_edges_ckpt(spark, sf_dir), walks_per_node=2, length=4)
    pairs = skipgram_pairs(w, window=2).select("center", "context")
    return negative_samples(pairs, k=2)


def q_iocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import (
        build_nodes, build_trace_contains, iocs,
    )

    good, _ = _parsed(spark, sf_dir)
    out = iocs(build_nodes(good), build_trace_contains(good), "u-1")
    return out.select(
        F.coalesce("image", F.lit("")).alias("image"),
        "artifact",
        "artifact_type",
        F.array_join("related_trace_ids", ",").alias("related_trace_ids"),
    )


def q_traces_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_traces
    from sigraph_spark.operators.queries import traces_listing

    good, _ = _parsed(spark, sf_dir)
    return traces_listing(build_traces(good), "u-1").select(
        "unit_id", "trace_id", "start_time",
        "representative_process_name",
        F.col("span_count").cast("long").alias("span_count"),
    )


def q_traces_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination (reference F2, search_after): page 2 of the
    trace listing — cursor = page 1's max (start_time, trace_id), pushed
    as a struct > predicate. Oracle uses the same row-comparison with a
    scalar subquery cursor."""
    from sigraph_spark.operators.graph import build_traces
    from sigraph_spark.operators.queries import (
        page_cursor, paginate_keyset, traces_listing,
    )

    good, _ = _parsed(spark, sf_dir)
    listing = traces_listing(build_traces(good), "u-1").select(
        "unit_id", "trace_id", "start_time",
        "representative_process_name",
        F.col("span_count").cast("long").alias("span_count"),
    )
    keys = ["start_time", "trace_id"]
    page1 = paginate_keyset(listing, keys, page_size=2)
    return paginate_keyset(listing, keys, page_size=2, after=page_cursor(page1, keys))


def q_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.queries import neighborhood

    return neighborhood(_edges_ckpt(spark, sf_dir), "a@1")


def q_related_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import build_trace_contains, build_traces
    from sigraph_spark.operators.queries import related_traces

    good, _ = _parsed(spark, sf_dir)
    out = related_traces(
        build_traces(good),
        build_trace_contains(good).localCheckpoint(eager=False),
        _edges_ckpt(spark, sf_dir),
        "u-2", max_hop=3,
    )
    return out.select("t1", "t2", F.col("hops").cast("long").alias("hops"))


def q_debris(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.graph import (
        build_trace_contains, build_traces, debris_candidates,
    )

    good, _ = _parsed(spark, sf_dir)
    return debris_candidates(
        build_traces(good),
        build_trace_contains(good).localCheckpoint(eager=False),
        _edges_ckpt(spark, sf_dir),
    )


def _merged_tables(spark: SparkSession, sf_dir: str):
    """Incremental write path (reference §1.3 re-upsert): build the graph
    from HALF the events, merge the other half in as a delta — TWICE (the
    combiners are idempotent semilattice joins, so re-applying a delta is a
    no-op). The oracle for each graph_merge_* query is the FULL-recompute
    SQL: merge-twice == merge-once == recompute-from-union."""
    from sigraph_spark.operators.graph import build_graph, merge_graph_tables

    ev = sigraph_events(_events(spark, sf_dir))
    parity = F.pmod(F.xxhash64("span_id"), F.lit(2))
    half1 = ev.filter(parity == 0)
    half2 = ev.filter(parity == 1)
    once = merge_graph_tables(build_graph(half1), half2)
    return merge_graph_tables(once, half2)


def q_graph_merge_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _merged_tables(spark, sf_dir)
    return m.nodes.select(
        "node_id",
        "label",
        F.coalesce("image", F.lit("")).alias("image"),
        F.array_join("related_span_ids", ",").alias("span_ids"),
        F.array_join("related_trace_ids", ",").alias("trace_ids"),
    )


def q_graph_merge_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _merged_tables(spark, sf_dir)
    return m.edges.select("src", "predicate", "dst", "start_time", "weight")


def q_graph_merge_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _merged_tables(spark, sf_dir)
    return m.traces.select(
        "unit_id", "trace_id", "start_time",
        "representative_process_name",
        F.col("span_count").cast("long").alias("span_count"),
    )


def q_sigma_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.sigma import compile_rule

    rule = {
        "id": "r1",
        "detection": {
            "sel_err": {"event_type": "error", "props|contains": "9"},
            "sel_sign": {"event_type|startswith": "sign"},
            "sel_click": {"event_type": "cl*"},
            "condition": "sel_err or (sel_sign and not sel_click)",
        },
    }
    ev = _events(spark, sf_dir)
    return ev.filter(compile_rule(rule)).select("event_id", "event_type")


def q_sigma_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sigma v2 correlation meta-rule (round 5,
    sigma.apply_correlation): event_count per user over tumbling 7-day
    buckets of sign* events, alert at >= 2 — the bruteforce-window
    shape. Bucketing is epoch DIV span (floor), restated in SQL with
    floor(epoch(ts)); the base predicate compiles through the same
    rule compiler every sigma gate uses."""
    from sigraph_spark.operators.sigma import apply_correlation

    base = {"id": "signs", "detection": {
        "sel": {"event_type|startswith": "sign"}, "condition": "sel"}}
    corr = {"id": "corr-signs", "type": "event_count",
            "rules": ["signs"], "group-by": ["user_id"],
            "timespan": "168h", "condition": {"gte": 2}}
    return apply_correlation(_events(spark, sf_dir), corr,
                             {"signs": base})


def q_sigma_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sigma pattern path end-to-end (reference §3.3: rules -> predicate ->
    ordered matching sequences): compile the rule to a Column, filter, then
    assemble each user's ordered event sequence — the clause-split and
    pagination machinery of the reference collapses into one job."""
    from sigraph_spark.operators.sigma import compile_rule

    rule = {
        "id": "r-seq",
        "detection": {
            "sel": {"event_type|startswith": "sign"},
            "condition": "sel",
        },
    }
    ev = _events(spark, sf_dir).filter(compile_rule(rule))
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id"))),
                lambda s: s["event_id"].cast("string"),
            ),
            ",",
        ).alias("sequence"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def q_sigma_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four value-transform/CIDR Sigma modifiers end-to-end
    (operators/sigma.py): windash flag-variant expansion, plain base64
    value matching, base64offset alignment-shifted substring matching
    (the Spark side REALLY base64-encodes per-row payloads via
    F.base64/F.encode; the oracle only restates WHICH event_ids must
    match, arithmetically), and IPv4 CIDR mask-compare incl. the
    non-IP-string guard; round 5 adds numeric gt/lte on a string column
    with a poison row, utf16le/be re-encodings (REALLY encoded JVM-side),
    field presence (|exists over REAL planted NULLs, both branches) and
    field-to-field comparison (|fieldref equality + |fieldref|contains).
    One (event_id, rule) row per rule match."""
    import base64 as _b64

    from sigraph_spark.operators.sigma import compile_rule

    e = F.col("event_id")
    dash = F.element_at(
        F.array(*[F.lit(c) for c in "-/–—―"]),
        (e % 5 + 1).cast("int"),
    )
    b64 = lambda s: _b64.b64encode(s.encode()).decode()  # noqa: E731
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.when(
            e % 2 == 0, F.concat(F.lit("tool "), dash, F.lit("f quiet"))
        ).otherwise(F.lit("tool -x loud")).alias("cmd"),
        F.when(e % 7 == 0, F.lit(b64("whoami")))
        .otherwise(F.lit(b64("dir"))).alias("b64cmd"),
        F.when(
            e % 5 != 0,
            F.base64(F.encode(
                F.concat(
                    F.repeat(F.lit("x"), (e % 3).cast("int")),
                    F.lit("secret42tail"),
                ), "UTF-8",
            )),
        ).otherwise(
            F.base64(F.encode(F.lit("nothing here"), "UTF-8"))
        ).alias("payload"),
        F.when(e % 11 == 0, F.lit("not-an-ip"))
        .when(
            e % 2 == 0,
            F.concat(F.lit("10."), (e % 256).cast("string"), F.lit(".0.5")),
        )
        .otherwise(
            F.concat(F.lit("172.16."), (e % 256).cast("string"), F.lit(".9"))
        ).alias("ip"),
        # round 5: numeric comparison + utf16 encoding modifiers. The
        # port is a STRING column (Sigma fields usually are) with a
        # planted non-numeric poison row; wcmd/becmd are REALLY
        # utf-16le/utf-16be encoded then base64'd JVM-side per row.
        F.when(e % 13 == 0, F.lit("n/a"))
        .otherwise((e % 9973).cast("string")).alias("port"),
        F.base64(F.encode(
            F.when(e % 3 == 0, F.lit("powershell evil"))
            .otherwise(F.lit("calc benign")), "UTF-16LE",
        )).alias("wcmd"),
        F.base64(F.encode(
            F.when(e % 3 == 0, F.lit("powershell evil"))
            .otherwise(F.lit("calc benign")), "UTF-16BE",
        )).alias("becmd"),
        # round 5: exists (REAL NULLs planted) + fieldref (field-to-field
        # compare: img/pimg agree exactly when e%6 and e%3 coincide, and
        # cmdline embeds img only on even events)
        F.when(e % 4 == 0, F.lit("present"))
        .otherwise(F.lit(None).cast("string")).alias("opt"),
        F.concat(F.lit("proc_"), (e % 6).cast("string")).alias("img"),
        F.concat(F.lit("proc_"), (e % 3).cast("string")).alias("pimg"),
        F.when(
            e % 2 == 0,
            F.concat(F.lit("run proc_"), (e % 6).cast("string")),
        ).otherwise(F.lit("run other")).alias("cmdline"),
    )
    rules = {
        "windash": {"id": "m1", "detection": {
            "sel": {"cmd|windash|contains": "-f quiet"}, "condition": "sel"}},
        "b64": {"id": "m2", "detection": {
            "sel": {"b64cmd|base64": "whoami"}, "condition": "sel"}},
        "b64off": {"id": "m3", "detection": {
            "sel": {"payload|base64offset|contains": "secret42"},
            "condition": "sel"}},
        "cidr": {"id": "m4", "detection": {
            "sel": {"ip|cidr": "10.0.0.0/8"}, "condition": "sel"}},
        "gt": {"id": "m5", "detection": {
            "sel": {"port|gt": 5000}, "condition": "sel"}},
        "lte": {"id": "m6", "detection": {
            "sel": {"port|lte": 1024}, "condition": "sel"}},
        "wide": {"id": "m7", "detection": {
            "sel": {"wcmd|wide|base64": "powershell evil"},
            "condition": "sel"}},
        "utf16be": {"id": "m8", "detection": {
            "sel": {"becmd|utf16be|base64": "powershell evil"},
            "condition": "sel"}},
        "exists": {"id": "m9", "detection": {
            "sel": {"opt|exists": True}, "condition": "sel"}},
        "absent": {"id": "m10", "detection": {
            "sel": {"opt|exists": False}, "condition": "sel"}},
        "fieldref": {"id": "m11", "detection": {
            "sel": {"img|fieldref": "pimg"}, "condition": "sel"}},
        "fieldref_contains": {"id": "m12", "detection": {
            "sel": {"cmdline|fieldref|contains": "img"},
            "condition": "sel"}},
    }
    out = None
    for name, rule in rules.items():
        part = ev.filter(compile_rule(rule)).select(
            "event_id", F.lit(name).alias("rule")
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_sigma_sysmon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sysmon logsource pipeline end-to-end (reference compiles every rule
    through sigma.pipelines.sysmon before the backend, rule/session.py:
    9,27-28): a process_creation rule gains EventID=1 and a
    network_connection rule written in Sigma's GENERIC taxonomy
    (dst_port) is renamed onto Sysmon's DestinationPort — both evaluated
    in ONE scan via apply_sysmon_rules."""
    from sigraph_spark.operators.sigma import apply_sysmon_rules

    ev = _events(spark, sf_dir).select(
        "event_id",
        (F.col("event_id") % 30).cast("int").alias("EventID"),
        F.concat(
            F.lit("C:\\tools\\proc_"),
            (F.col("user_id") % 7).cast("string"),
            F.when(F.col("event_type") == "error", F.lit(".tmp")).otherwise(
                F.lit(".exe")
            ),
        ).alias("Image"),
        F.concat(F.lit("run --"), F.col("event_type")).alias("CommandLine"),
        ((F.col("user_id") * 13) % 1024).cast("int").alias("DestinationPort"),
    )
    rules = [
        {"id": "proc-click",
         "logsource": {"product": "windows", "category": "process_creation"},
         "detection": {"sel": {"Image|endswith": ".exe",
                               "CommandLine|contains": "click"},
                       "condition": "sel"}},
        {"id": "net-c2",
         "logsource": {"category": "network_connection"},
         "detection": {"sel": {"dst_port": [443, 445]}, "condition": "sel"}},
    ]
    return apply_sysmon_rules(ev, rules, id_col="event_id")


# --- text analysis ----------------------------------------------------------

def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.textstats import (
        bpe_token_count, whitespace_token_count, word_count,
    )

    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_token_count(t).alias("bpe_tokens"),
        word_count(t).alias("n_words"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.textstats import quality_features, quality_score

    d = _docs(spark, sf_dir)
    feat = d.select("doc_id", *quality_features(F.col("text")))
    feat = feat.select("*", quality_score())
    return feat.select(
        "doc_id",
        F.col("n_chars_text").cast("long").alias("n_chars_text"),
        F.col("n_words").cast("long").alias("n_words"),
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("punct_ratio", 4).alias("punct_ratio"),
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
        F.round("upper_ratio", 4).alias("upper_ratio"),
        F.round("quality_score", 4).alias("quality_score"),
    )


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.textstats import lang_id

    return _docs(spark, sf_dir).select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred")
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.textstats import fingerprint64

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint64(F.col("text")).alias("fingerprint")
    )


# --- dedup ------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.dedup import exact_dedup

    d = _docs(spark, sf_dir).select(
        "doc_id", F.substring("text", 1, 20).alias("text20")
    )
    return exact_dedup(d, id_col="doc_id", text_col="text20")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-word-shingle Jaccard over all pairs of a doc subset;
    integer numerator/denominator so no float drift vs the oracle."""
    from sigraph_spark.operators.dedup import _word_shingles

    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    sh = d.select(
        "doc_id",
        F.array_sort(F.array_distinct(_word_shingles(F.col("text"), 3))).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias("jaccard_num"),
            F.size(F.array_union("sha", "shb")).cast("long").alias("jaccard_den"),
        )
        .filter(F.col("jaccard_num") > 0)
    )


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment C(A→B)=|A∩B|/|A| over a doc
    subset — the partial-overlap near-dup case (page quoted inside a
    longer page) that symmetric Jaccard misses. Shingle-key self-join
    (never all-pairs), per-pair count, both directed scores at 6dp;
    pairs kept where either direction ≥ 0.5 (full corpus — the dup
    clusters the %10 subset misses are exactly the containment cases)."""
    from sigraph_spark.operators.dedup import containment_pairs

    return containment_pairs(_docs(spark, sf_dir), min_containment=0.5)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: train docs flagged when they share any
    3-gram with the (deterministic doc_id % 37 == 0) eval slice. The eval
    n-gram set is broadcast — the corpus side never shuffles."""
    from sigraph_spark.operators.contamination import decontaminate

    d = _docs(spark, sf_dir)
    evalset = d.filter(F.col("doc_id") % 37 == 0)
    train = d.filter(F.col("doc_id") % 37 != 0)
    out = decontaminate(train, evalset)
    # int flag rather than boolean: keeps the driver's value stringification
    # engine-neutral (no bool-vs-BOOLEAN canon divergence)
    return out.withColumn("contaminated", F.col("contaminated").cast("int"))


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span profile: per doc, the fraction of
    its distinct 3-grams occurring in at least one other document (the
    span-level dedup signal; one uniform-key shuffle on shingles)."""
    from sigraph_spark.operators.contamination import dup_spans

    return dup_spans(_docs(spark, sf_dir))


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-removal rewrite: 10-word windows, globally-first occurrence
    survives, docs reassembled in order — one window shuffle on span."""
    from sigraph_spark.operators.contamination import remove_dup_spans

    return remove_dup_spans(_docs(spark, sf_dir))


def q_dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the near-dup pipeline: Jaccard-verified pairs (>= 0.5 on the
    doc_id % 10 slice) -> large-star/small-star components -> keep the
    min-id representative per cluster; singletons keep themselves. Oracle
    = the same pair SQL + recursive reachability closure."""
    from sigraph_spark.operators.dedup import _word_shingles, dedup_keeplist

    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    sh = d.select(
        "doc_id",
        F.array_sort(F.array_distinct(_word_shingles(F.col("text"), 3))).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.size(F.array_intersect("sha", "shb")).alias("ni"),
            F.size(F.array_union("sha", "shb")).alias("nu"),
        )
        .filter(F.col("ni") * 2 >= F.col("nu"))  # jaccard >= 0.5, integer form
        .select("a", "b")
    )
    out = dedup_keeplist(d, pairs)
    return out.withColumn("keep", F.col("keep").cast("int"))


def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph from html: pages synthesized from documents
    with deterministic cross-host links (mixed quote styles + a relative
    href that must be dropped); extraction is JVM regexp_extract_all, the
    oracle rebuilds the identical html string and runs the same regex."""
    from sigraph_spark.operators.links import extract_links, host_link_graph

    d = _docs(spark, sf_dir)

    def url_of(t):
        return F.concat(
            F.lit("https://h"), t % 7, F.lit(".example.com/d/"), t
        )

    t1 = (F.col("doc_id") * 7 + 1) % 1000
    t2 = (F.col("doc_id") * 13 + 5) % 1000
    html = F.concat(
        F.lit("<html><body><p>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit('</p><a href="'), url_of(t1), F.lit('">x</a> <a href=\''),
        url_of(t2), F.lit("'>y</a><a href='/rel'>r</a></body></html>"),
    )
    pages = d.select(url_of(F.col("doc_id")).alias("url"), html.alias("html"))
    return host_link_graph(extract_links(pages))


def _anchor_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages with deterministic anchor elements for the anchor-prior gates:
    per doc, an ambiguous 'Entity K' anchor (every 4th doc points the same
    surface form at a different target — the P(entity|mention) mass split)
    plus an unambiguous 'topic K' anchor in single quotes."""
    d = _docs(spark, sf_dir)
    ent = F.col("doc_id") % 37
    amb = F.when(F.col("doc_id") % 4 == 0, ent + 100).otherwise(ent)
    href1 = F.concat(F.lit("https://e"), ent % 5, F.lit(".wiki.org/page/"), amb)
    href2 = F.concat(F.lit("https://t.wiki.org/t/"), F.col("doc_id") % 11)
    html = F.concat(
        F.lit('<html><p><a href="'), href1, F.lit('">Entity '), ent,
        F.lit("</a> <a rel='nofollow' href='"), href2, F.lit("'>topic "),
        F.col("doc_id") % 11, F.lit("</a></p></html>"),
    )
    return d.select(
        F.concat(F.lit("https://src.org/d/"), F.col("doc_id")).alias("url"),
        html.alias("html"),
    )


def q_anchor_priors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text commonness dictionary P(target | surface form) from the
    corpus's own hyperlinks (Milne-Witten prior — the statistical
    entity-linking companion to the MinHash/TF-IDF linker). Spark runs the
    real regex extraction + normalization; the oracle restates the
    synthesized anchors arithmetically and re-derives the distribution."""
    from sigraph_spark.operators.links import anchor_priors, extract_anchors

    return anchor_priors(extract_anchors(_anchor_pages(spark, sf_dir)))


def q_anchor_link_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mention resolution through the rank-1 anchor prior: mentions drawn
    from a wider id space than the dictionary (ids >= 37 must abstain with
    NULL entity, not drop). Broadcast join — the mention table never
    shuffles."""
    from sigraph_spark.operators.links import (
        anchor_priors, extract_anchors, link_mentions,
    )

    pri = anchor_priors(extract_anchors(_anchor_pages(spark, sf_dir)))
    d = _docs(spark, sf_dir)
    mention = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("Entity ")).otherwise(F.lit("entity ")),
        F.col("doc_id") % 41,
    )
    mentions = d.select(F.col("doc_id"), mention.alias("mention"))
    return link_mentions(mentions, pri)


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over synthesized messy aliases (case, default
    ports, fragments, tracking params, trailing slash) — one JVM string
    chain, identical rules restated in the SQL oracle."""
    from sigraph_spark.operators.links import canonical_url

    sfx = F.col("doc_id").cast("string")
    host = F.concat(F.lit("Host"), (F.col("doc_id") % 7), F.lit(".Example.com"))
    url = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("HTTPS://"), host, F.lit(":443/P/"), sfx,
                        F.lit("/?utm_source=x&b=2&a=1#f")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("http://"), F.lower(host), F.lit(":80/p/"), sfx))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("https://"), F.lower(host), F.lit("/p/"), sfx,
                       F.lit("?z=9&utm_campaign=c&fbclid=y")))
        .otherwise(F.concat(F.lit("https://"), host, F.lit("/p/"), sfx, F.lit("/")))
    )
    return _docs(spark, sf_dir).select(
        "doc_id", canonical_url(url).alias("canonical")
    )


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host blocklist filtering with registrable-parent suffix matching:
    suffix chain exploded + broadcast anti-join (no LIKE nested loop).
    Half the synthesized urls live under a blocked parent domain."""
    from sigraph_spark.operators.links import blocklist_filter

    host = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("h"), (F.col("doc_id") % 5), F.lit(".blocked.net")),
    ).otherwise(
        F.concat(F.lit("h"), (F.col("doc_id") % 5), F.lit(".example.com")),
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("doc_id")).alias("url"),
    )
    blocked = spark.createDataFrame(
        [("blocked.net",), ("h2.example.com",)], "host string"
    )
    return blocklist_filter(docs, blocked)


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host authority: fixed-point PageRank over the host link graph —
    the CommonCrawl-ranking composition (extract -> host graph -> rank),
    exact BIGINT arithmetic end to end so the oracle is bit-identical."""
    from sigraph_spark.operators.links import extract_links, host_link_graph
    from sigraph_spark.operators.pagerank import pagerank

    d = _docs(spark, sf_dir)

    def url_of(t):
        return F.concat(F.lit("https://h"), t % 7, F.lit(".example.com/d/"), t)

    t1 = (F.col("doc_id") * 7 + 1) % 1000
    t2 = (F.col("doc_id") * 13 + 5) % 1000
    html = F.concat(
        F.lit("<html><body><p>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit('</p><a href="'), url_of(t1), F.lit('">x</a> <a href=\''),
        url_of(t2), F.lit("'>y</a><a href='/rel'>r</a></body></html>"),
    )
    pages = d.select(url_of(F.col("doc_id")).alias("url"), html.alias("html"))
    hosts = host_link_graph(extract_links(pages)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return pagerank(hosts)


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC-lite ingest round trip, distributed end to end: documents ->
    (url, ts, payload) pages -> multi-record segment blobs (applyInPandas
    per doc_id%16 group) -> read_warc_segments parse -> per-page byte
    length + portable fingerprint of the DECODED payload. The oracle
    computes the same values straight from the documents table, so a
    framing/parse corruption of any byte fails the hash."""
    import pandas as pd

    from sigraph_spark.operators.textstats import fingerprint64
    from sigraph_spark.sources.warc import encode_records, read_warc_segments

    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://corpus.example/"), F.col("doc_id")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(secs=F.col("doc_id").cast("double"))
        ).alias("ts"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        (F.col("doc_id") % 16).alias("seg"),
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = [
            (u, t.to_pydatetime(), bytes(p))
            for u, t, p in zip(pdf["url"], pdf["ts"], pdf["payload"])
        ]
        return pd.DataFrame(
            {"segment": [f"seg-{int(pdf['seg'].iloc[0]):02d}"],
             "content": [encode_records(recs)]}
        )

    segs = pages.groupBy("seg").applyInPandas(enc, "segment string, content binary")
    rec = read_warc_segments(segs)
    return rec.select(
        "url",
        F.col("warc_ts"),
        F.length("payload").cast("long").alias("n_bytes"),
        fingerprint64(F.decode(F.col("payload"), "UTF-8")).alias("fingerprint"),
    )


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered curation rule chain (length -> language -> quality ->
    repetition) with the first failing rule recorded per document —
    a single narrow map composing the textstats signals."""
    from sigraph_spark.operators.corpus import curation_funnel

    return curation_funnel(_docs(spark, sf_dir))


def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle: the gate runs the engine-portable md5 hash family
    (``hash32_md5_le``) so DuckDB reproduces the exact shingle hashes,
    64-permutation signatures, band keys, and pair set. The crc32 default
    family is pinned separately by tests/test_dedup.py bit-identity
    assertions (Column form == numpy kernel)."""
    from sigraph_spark.operators.dedup import minhash_candidates

    return minhash_candidates(_docs(spark, sf_dir), hash_family="md5")


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle: incremental dedup — docs with doc_id % 4 == 0 are the
    "new crawl"; the rest are the corpus whose LSH index is pre-built
    (``minhash_index``). Because band keys are per-doc independent, the
    incremental pair set must equal the full-corpus pair set filtered to
    pairs touching a new doc — which is exactly what the oracle computes
    from the full md5-family pipeline."""
    from sigraph_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_index,
    )

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    index = minhash_index(old, hash_family="md5")
    pairs, _delta = incremental_minhash_candidates(new, index, hash_family="md5")
    return pairs


def q_dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-hash incremental dedup: the delta (doc_id % 4 == 0) is
    classified against the stored content-hash index of the rest —
    corpus_dup / batch_dup / new, with deterministic canonicals."""
    from sigraph_spark.operators.dedup import (
        exact_hash_index,
        incremental_exact_dedup,
    )

    docs = _docs(spark, sf_dir)
    idx = exact_hash_index(docs.filter(F.col("doc_id") % 4 != 0))
    return incremental_exact_dedup(docs.filter(F.col("doc_id") % 4 == 0), idx)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle: md5 family — DuckDB's md5_number_upper() IS the
    little-endian uint64 of digest[0:8], so signatures, 16-bit band
    blocking, and Hamming verification all reproduce exactly in SQL."""
    from sigraph_spark.operators.dedup import simhash_candidates

    return simhash_candidates(_docs(spark, sf_dir), max_hamming=3, hash_family="md5")


def q_simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle (round 5): incremental SimHash — docs with
    doc_id % 4 == 0 are the "new crawl", the rest the corpus whose band
    index (``simhash_index``, signatures included for Hamming
    verification) is pre-built. Bands are per-doc independent, so the
    incremental pair set must equal the FULL-corpus simhash pair set
    filtered to pairs touching a new doc — exactly what the oracle
    computes from the complete md5-family pipeline."""
    from sigraph_spark.operators.dedup import (
        incremental_simhash_candidates,
        simhash_index,
    )

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    index = simhash_index(old, hash_family="md5")
    pairs, _delta = incremental_simhash_candidates(
        new, index, max_hamming=3, hash_family="md5"
    )
    return pairs


# --- similarity search ------------------------------------------------------

def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.similarity import dot, l2_norm

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select("vec_id", F.col("embedding").alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("cv"), F.col("qv"))
            / (l2_norm(F.col("cv")) * l2_norm(F.col("qv"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sigraph_spark.operators.similarity import dot, l2_norm

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (l2_norm(F.col("va")) * l2_norm(F.col("vb"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.5)
    )


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle: the 8x4-bit band hyperplanes are literal constants, so
    DuckDB reproduces bucket agreement per band and the verified pair set
    (a pair is emitted once regardless of how many bands collide — the
    oracle uses DISTINCT where Spark uses the first-matching-band filter).
    Recall vs the brute-force oracle is pinned in tests/test_similarity.py
    (>= 0.9 on planted near-dups)."""
    from sigraph_spark.operators.similarity import embedding_neardup_lsh

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    # bucket_kernel="column": exact float parity with the SQL oracle; the
    # numpy matmul scale kernel is pinned equal to this form by
    # tests/test_similarity.py on the same data
    out = embedding_neardup_lsh(
        e, dim=64, threshold=0.5, bits=4, bands=8, bucket_kernel="column"
    )
    return out.select("a", "b", F.round("cosine", 6).alias("cosine"))


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle: the hyperplanes are deterministic literal constants
    (similarity._hyperplane), so DuckDB reproduces the bucket bits exactly;
    scores are rounded to 6 decimals BEFORE ranking so the per-query
    ordering (cosine desc, vec_id) is identical across engines. Recall vs
    brute force is separately asserted in tests/test_similarity.py."""
    from sigraph_spark.operators.similarity import dot, l2_norm, l2_normalize, lsh_bucket

    e = _emb(spark, sf_dir)
    c = e.select(
        "vec_id",
        F.col("embedding").alias("cv"),
        lsh_bucket(l2_normalize(F.col("embedding")), dim=64, bits=4).alias("bucket"),
    )
    q = c.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("cv").alias("qv"), "bucket"
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("cv"), F.col("qv"))
            / (l2_norm(F.col("cv")) * l2_norm(F.col("qv"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


# --- corpus curation (training-data pipeline ops) ---------------------------

def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector via posexplode + algebraic (label, dim)
    aggregation — no UDF; 6dp rounding keeps float summation order out
    of the hash."""
    from sigraph_spark.operators.similarity import embedding_centroids

    return embedding_centroids(_emb(spark, sf_dir))


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by the portable md5 bucket —
    zero-shuffle narrow map; assignment is stable across corpus growth."""
    from sigraph_spark.operators.corpus import dataset_split

    return dataset_split(_docs(spark, sf_dir)).select("doc_id", "bucket", "split")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic hash-threshold sampling (en at 20%,
    everything else at 50%) — zero-shuffle."""
    from sigraph_spark.operators.corpus import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), {"en": 200}, 500).select(
        "doc_id", "lang", "bucket"
    )


def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture upsampling: source A repeats 2.3 epochs (2 full
    copies + hash-fraction third), B exactly 1, C drops — the per-source
    epoch recipe of an LLM data mixture, zero shuffle."""
    from sigraph_spark.operators.corpus import mixture_epochs

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        F.element_at(
            F.array(F.lit("wiki"), F.lit("cc"), F.lit("forum")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("source"),
    )
    out = mixture_epochs(
        docs, {"wiki": 2.3, "cc": 1.0, "forum": 0.0}, default_epochs=1.0
    )
    return out.select("doc_id", "source", "epoch")


def q_drop_common_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate-line removal: two seeded template lines
    (one on every doc, one on every 7th) cross the min_docs=50 document-
    frequency bar and are dropped; the per-doc unique line survives. The
    common set broadcasts — the corpus never shuffles."""
    from sigraph_spark.operators.corpus import drop_common_lines

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nAll rights reserved."),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\nSubscribe to our newsletter!"),
            ).otherwise(F.lit("")),
            F.lit("\nRef code "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return drop_common_lines(d, min_docs=50).select(
        "doc_id", "text", "n_lines_dropped"
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/IPv4/digit-run masking. The corpus has no organic PII, so the
    gate seeds deterministic synthetic PII per doc first; the oracle
    reproduces seed + redaction with the same RE2/Java-compatible
    patterns."""
    from sigraph_spark.operators.corpus import redact_pii

    seeded = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 acct 1234567"), F.col("doc_id").cast("string"),
        ),
    )
    return redact_pii(seeded).select("doc_id", "text")


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate 3-gram ratio per document (narrow map)."""
    from sigraph_spark.operators.corpus import repetition_score

    return repetition_score(_docs(spark, sf_dir))


def q_corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-100 token frequencies: partial aggregation then a
    TakeOrdered of 100 rows (never a full vocabulary sort); deterministic
    (n desc, token asc) boundary."""
    from sigraph_spark.operators.corpus import vocab_topk

    return vocab_topk(_docs(spark, sf_dir), k=100)


def q_corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact token-count quantiles (p25/p50/p75/p90), count
    and mean: Spark exact ``percentile`` == DuckDB ``quantile_cont`` rank
    arithmetic on integer inputs; both sides round to 4dp. The scale path
    is ``token_quantiles_approx`` (t-digest-style mergeable sketch),
    pinned vs this exact form by tests/test_corpus_ops.py."""
    from sigraph_spark.operators.corpus import token_quantiles

    return token_quantiles(_docs(spark, sf_dir))


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication report: how many docs each source
    contributes and what fraction are exact duplicates of an earlier doc
    (corpus-wide canonical = min doc_id) — the table that tells you WHICH
    feed to deprioritize. Prefix-20 content key for a non-trivial
    fixture, same device as dedup_prefix."""
    from sigraph_spark.operators.dedup import exact_dedup

    d = _docs(spark, sf_dir).withColumn("text", F.substring("text", 1, 20))
    dd = exact_dedup(d).select(
        "doc_id", (F.col("doc_id") != F.col("canonical_id")).cast("long").alias("is_dup")
    )
    return (
        d.select("doc_id", "source")
        .join(dd, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dups"),
            F.round(F.sum("is_dup") / F.count(F.lit(1)), 6).alias("dup_rate"),
        )
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-integrity audit: content hashes that appear in MORE THAN
    ONE train/val/test split (exact duplicates straddling the split
    boundary leak eval data into training). Composition of the split
    assignment and exact dedup — one groupBy on the content hash."""
    from sigraph_spark.operators.corpus import dataset_split
    from sigraph_spark.operators.dedup import exact_dedup

    # prefix-20 content key (the dedup_prefix device) so the fixture has
    # real cross-split collisions — a 0-row audit proves nothing
    d = dataset_split(
        _docs(spark, sf_dir).withColumn("text", F.substring("text", 1, 20))
    )
    h = exact_dedup(d).select("doc_id", "content_hash")
    return (
        d.select("doc_id", "split")
        .join(h, "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.size(F.collect_set("split")).cast("long").alias("n_splits"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
        )
        .filter(F.col("n_splits") > 1)
    )


def q_adaptive_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality gate: keep docs at or above their
    language's MEDIAN composite quality score (the threshold adapts to
    each language's score distribution instead of one global constant).
    Exact percentile == quantile_cont parity is already pinned by the
    corpus_quantiles gate; identical double comparisons on both sides."""
    from sigraph_spark.operators.textstats import quality_features, quality_score

    scored = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", *quality_features(F.col("text")))
        .select("doc_id", "lang", quality_score())
    )
    med = scored.groupBy("lang").agg(
        F.expr("percentile(quality_score, 0.5)").alias("med")
    )
    return (
        scored.join(med, "lang")
        .filter(F.col("quality_score") >= F.col("med"))
        .select("doc_id", "lang", F.round("quality_score", 6).alias("quality_score"))
    )


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier audit: confusion matrix of the stored lang column vs
    the n-gram language-ID prediction — one narrow map + one tiny
    algebraic aggregation."""
    from sigraph_spark.operators.textstats import lang_id

    return (
        _docs(spark, sf_dir)
        .select("lang", lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram in power-of-two buckets per language — the
    corpus length profile chart; bucket = floor(log2(tokens)), zero-safe."""
    from sigraph_spark.operators.textstats import whitespace_token_count

    t = whitespace_token_count(F.col("text"))
    bucket = F.when(t <= 0, F.lit(-1)).otherwise(
        F.floor(F.log2(t.cast("double"))).cast("long")
    )
    return (
        _docs(spark, sf_dir)
        .select("lang", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_doc_keyterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per doc: corpus-global df + WindowGroupLimit
    top-k; identical double arithmetic orders both engines the same."""
    from sigraph_spark.operators.corpus import doc_keyterms

    return doc_keyterms(_docs(spark, sf_dir))


def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank extractive summarization (round 5,
    operators/keyphrase.py — Mihalcea & Tarau 2004): top-3 sentences per
    document by damped power iteration over the shared-word sentence
    graph, every score in exact BIGINT micro-units so aggregation order
    can't perturb a bit. The synthetic corpus has no sentence
    punctuation, so the gate derives it deterministically: 12-word
    chunks joined with '. ' (identical expression in the oracle, which
    also unrolls all 4 iterations as chained CTEs like the PageRank
    oracle)."""
    from sigraph_spark.operators.keyphrase import textrank_sentences

    docs = _docs(spark, sf_dir)
    ws = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda x: x != "",
    )
    nch = F.ceil(F.size(ws) / F.lit(12)).cast("int")
    sent_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(nch - 1, F.lit(0))),
        lambda k: F.array_join(F.slice(ws, k * 12 + 1, 12), " "),
    )
    derived = docs.select(
        "doc_id", F.array_join(sent_arr, ". ").alias("text")
    )
    return textrank_sentences(derived, top_k=3)


def q_coref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based pronoun coreference (round 5, operators/coref.py):
    nearest-preceding-capitalized-mention resolution inside a 2-sentence
    window via a BANDED equi-join. The synthetic corpus is all
    lowercase with no punctuation, so the gate seeds it
    deterministically: token k (0-based) becomes a pronoun when
    k % 11 == 5, is capitalized when k % 7 <= 1 (two consecutive
    capitals -> multi-word mentions), and sentences are 12-token chunks
    joined with '. ' — the oracle re-derives the identical token stream
    arithmetically and replays the same window ranking."""
    from sigraph_spark.operators.coref import pronoun_coref

    docs = _docs(spark, sf_dir)
    ws = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda x: x != "",
    )
    prons = F.array(F.lit("he"), F.lit("she"), F.lit("it"), F.lit("they"))
    ws2 = F.transform(
        ws,
        lambda w, i: F.when(i % 11 == 5, F.element_at(prons, (i % 4) + 1))
        .when(i % 7 <= 1,
              F.concat(F.upper(w.substr(1, 1)),
                       w.substr(F.lit(2), F.length(w))))
        .otherwise(w),
    )
    nch = F.ceil(F.size(ws2) / F.lit(12)).cast("int")
    sent_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(nch - 1, F.lit(0))),
        lambda k: F.array_join(F.slice(ws2, k * 12 + 1, 12), " "),
    )
    derived = docs.select(
        "doc_id", F.array_join(sent_arr, ". ").alias("text")
    )
    return pronoun_coref(derived, window_sents=2)


def q_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (round 5, operators/keyphrase.py — Rose
    et al. 2010): top-5 candidate phrases per document; word
    degree/frequency ratios quantized to BIGINT micro-units with ONE
    integer division per word before the order-free integer sum (the
    repo's exactness device)."""
    from sigraph_spark.operators.keyphrase import rake_keywords

    return rake_keywords(_docs(spark, sf_dir), top_k=5)


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: PMI over adjacent word pairs (min_count 5) —
    two wordcount aggregations + scalar-total broadcasts; ln math
    reproduced exactly in the oracle at 6dp."""
    from sigraph_spark.operators.corpus import bigram_pmi

    return bigram_pmi(_docs(spark, sf_dir))


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-normalized unigram LM quality score (CCNet-perplexity proxy):
    two wordcount-shaped passes, natural-log mean per doc at 6dp."""
    from sigraph_spark.operators.corpus import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM, CCNet train/score shape
    (Wenzek et al. 2020): train the model on one corpus split
    (doc_id % 5 != 0 — the "trusted" corpus standing in for their
    Wikipedia/KenLM), score the other split; low mean log-probability
    flags out-of-distribution text. One bigram-count shuffle to train;
    scoring is three left hash joins of the exploded corpus against
    vocabulary-sized model tables (AQE-broadcastable) + one per-doc agg.
    The oracle reproduces the KN counts and smoothing arithmetic
    operation-for-operation."""
    from sigraph_spark.operators.corpus import bigram_lm_logprob

    docs = _docs(spark, sf_dir)
    return bigram_lm_logprob(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 5 != 0),
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: 12 merge rounds over the
    corpus word counts. One full-corpus shuffle, then every round runs on
    the cached distinct-word table (JVM literal-replace merges on the
    double-separator encoding — greedy-exact, zero per-row Python). The
    oracle unrolls the identical 12 rounds as materialized DuckDB CTEs,
    so training is hash-verified round for round."""
    from sigraph_spark.operators.bpe import bpe_train

    return bpe_train(_docs(spark, sf_dir), num_merges=12)


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 12 BPE merges, then encode every document with them: per-doc
    word count, BPE token count, and distinct-token count. Encoding is
    the chained-literal-replace JVM path (bpe_encode); the Arrow
    rank-priority path (bpe_encode_arrow, the 32k-merge scale variant) is
    pinned equal by tests/test_bpe.py."""
    from sigraph_spark.operators.bpe import bpe_encode, bpe_train

    docs = _docs(spark, sf_dir)
    merges = bpe_train(docs, num_merges=12).collect()
    enc = bpe_encode(docs, merges)
    words = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("tokens")).alias("n_tokens"),
    )
    dist = (
        enc.select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("doc_id")
        .agg(F.count_distinct("tok").alias("n_distinct_tokens"))
    )
    return words.join(dist, "doc_id").select(
        "doc_id", "n_words", "n_tokens", "n_distinct_tokens"
    )


def q_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (RE2-safe marker-insert + split device; no
    lookbehind): one narrow generate, no shuffle. The synthetic corpus
    has no punctuation, so (text_normalize precedent) every 7th doc is
    seeded with a multi-sentence prefix — period/bang/question enders,
    single/double-space and newline separators — so the split, the
    1-based stable ids and the trim all actually fire."""
    from sigraph_spark.operators.corpus import split_sentences

    d = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit("First one. Second!  Third?\nFourth. "),
                F.coalesce(F.col("text"), F.lit("")),
            ),
        ).otherwise(F.col("text")),
    )
    return split_sentences(d)


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/control-char/curly-quote normalization chain — one
    narrow JVM regex map; the oracle runs the identical chain."""
    from sigraph_spark.operators.corpus import normalize_text

    # seed a few rows with the characters the chain exists for
    d = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("‘q’ “w” \x07 \x1f  a\tb\n"),
                     F.col("text")),
        ).otherwise(F.col("text")),
    )
    return normalize_text(d)


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap keeping the highest-quality k: WindowGroupLimit
    pushes rank<=k below the shuffle, so a giant host ships at most k rows
    per map partition. Quality = n_chars (deterministic, already present)."""
    from sigraph_spark.operators.corpus import domain_quota

    docs = _docs(spark, sf_dir).withColumn(
        "url",
        F.concat(
            F.lit("https://host"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ),
    )
    out = domain_quota(docs, per_host=25, quality_col="n_chars")
    # domain_quota keeps its internal host column private; recompute the
    # host label for the report projection.
    host = F.substring_index(
        F.substring_index(F.col("url"), "://", -1), "/", 1
    )
    return out.withColumn("host", host).select(
        "doc_id", "host", "lang", "n_chars"
    )


def q_distant_supervision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distant supervision (Mintz-style): KG facts matched back onto
    corpus sentences that mention both endpoints as contiguous token
    runs — the KG -> relation-extractor training-set bridge. Blocked on
    the entity's first token; the oracle is the INDEPENDENT naive
    formulation (padded substring search over every sentence x fact)."""
    from sigraph_spark.operators.distant import distant_supervision

    facts = spark.createDataFrame(
        _DS_FACTS, "subj string, predicate string, obj string"
    )
    return distant_supervision(_docs(spark, sf_dir), facts)


_DS_FACTS = [
    ("hash value", "phrase_with", "table"),
    ("query", "cooccurs", "window"),
    ("spark", "cooccurs", "merge"),
    ("customer", "cooccurs", "order"),
    ("big vector", "phrase_with", "scan"),
]


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters: per-key frequency estimates from
    O(d*w) mergeable counter state (w=64 forces real collisions, so
    the min-over-rows estimator is exercised, not just the sums).
    Fully integer — the oracle matches bit-for-bit."""
    from sigraph_spark.operators.sketches import cms_estimate, cms_sketch

    docs = _docs(spark, sf_dir).withColumn(
        "hh_key",
        F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string")),
    )
    cms = cms_sketch(docs, "hh_key", w=64, d=3)
    return cms_estimate(cms, docs.select("hh_key"), "hh_key", w=64, d=3)


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable mergeable HyperLogLog distinct-count sketch: per-source
    estimated distinct doc_ids (p=8). Register arithmetic is the
    engine-exact md5 family + integer leading-zero device; the oracle
    replays registers AND the estimator branches at 6dp."""
    from sigraph_spark.operators.sketches import hll_distinct

    return hll_distinct(_docs(spark, sf_dir), ["source"], "doc_id", p=8)


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host corpus profile over synthesized multi-host URLs
    (host{doc_id % 50}.example.com — deterministic in both engines). Host
    extraction is double substring_index (not parse_url, whose semantics
    differ across engines); aggregates are algebraic so map-side partials
    absorb the power-law head key before the shuffle."""
    from sigraph_spark.operators.corpus import domain_stats

    docs = _docs(spark, sf_dir).withColumn(
        "url",
        F.concat(
            F.lit("https://HOST"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".Example.com/p/"),
            F.col("doc_id").cast("string"),
        ),
    )
    return domain_stats(docs)


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized point-in-interval join (the range-join Spark lacks a
    native optimization for): points = distinct user_id % 997, intervals
    synthesized from doc ids — the oracle is the plain BETWEEN theta
    join, which the operator must reproduce exactly while planning as an
    equi-join (no BroadcastNestedLoopJoin; plan-asserted in the audit)."""
    from sigraph_spark.operators.rangejoin import point_in_interval_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    points = ev.select((F.col("user_id") % 997).alias("p")).distinct()
    d = _docs(spark, sf_dir)
    lo = (F.col("doc_id") * 7) % 1000
    iv = d.select(
        F.col("doc_id").alias("interval_id"),
        lo.alias("lo"),
        (lo + F.col("doc_id") % 50).alias("hi"),
    )
    return point_in_interval_join(points, iv, "p", bucket_width=64.0).select(
        "p", "interval_id", "lo", "hi"
    )


def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(lang, source) in one shuffle — per-pair, per-lang, and
    grand-total counters from a single aggregation; grouping_id shares
    bit semantics with SQL GROUPING(lang, source)."""
    from sigraph_spark.operators.corpus import corpus_rollup

    return corpus_rollup(_docs(spark, sf_dir))


def q_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k=7 docs per language by portable md5-hash rank — the
    deterministic eval-set sampler (count-guaranteed, unlike rate-based
    stratified sampling)."""
    from sigraph_spark.operators.corpus import sample_k_per_group

    return sample_k_per_group(_docs(spark, sf_dir), k=7).select(
        "doc_id", "lang"
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking at 64 tokens / 16 overlap (small enough
    that the synthetic docs produce multi-chunk output). Pure integer
    window arithmetic + JVM array slice — no shuffle; the oracle
    regenerates the identical windows."""
    from sigraph_spark.operators.corpus import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=64, overlap=16)


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance over the documents table for a fixed 3-term query
    (terms chosen from the synthetic vocabulary). Lucene-form idf; 4dp
    rounding puts the sub-ulp per-doc summation differences far inside
    the grid in both engines."""
    from sigraph_spark.operators.corpus import bm25_scores

    return bm25_scores(_docs(spark, sf_dir), ["join", "hash", "vector"])


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-sharded inverted index materialization (the Lucene/ES
    layout): (term, shard) posting rows with per-shard df/cf and
    doc_id-ordered postings, shard = portable md5 hash of doc_id % 4 so
    a stopword's postings split into bounded arrays instead of one
    unbounded per-term row. min_df=2 prunes the global singleton tail.
    Postings serialize as 'doc:tf;...' for the gate hash."""
    from sigraph_spark.operators.index import build_inverted_index

    idx = build_inverted_index(_docs(spark, sf_dir), n_shards=4, min_df=2)
    return idx.select(
        "term",
        F.col("shard").cast("long").alias("shard"),
        F.col("df_shard").cast("long").alias("df_shard"),
        F.col("cf_shard").cast("long").alias("cf_shard"),
        F.array_join(
            F.transform(
                "postings",
                lambda p: F.concat_ws(":", p["doc_id"], p["tf"].cast("string")),
            ),
            ";",
        ).alias("postings_str"),
    )


def q_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed top-k retrieval: BM25 scored purely from stored
    postings + the doc-norms side table — the corpus is never re-read at
    query time. Disjunctive 3-term query, deterministic two-stage salted
    top-20 (score desc, doc_id asc). Arithmetic is identical to the
    corpus-side `bm25_scores` (pinned in tests), so the oracle computes
    the same scores directly."""
    from sigraph_spark.operators.index import (
        build_inverted_index,
        doc_norms,
        search_index,
    )

    docs = _docs(spark, sf_dir)
    return search_index(
        build_inverted_index(docs, n_shards=4),
        doc_norms(docs),
        ["join", "hash", "vector"],
        mode="or",
        k=20,
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derandomized Efraimidis-Spirakis weighted sampling without
    replacement: key = u^(1/w) with u from the portable md5 hash, top-50
    by (key desc, doc_id) — the corpus-mixture primitive where two runs
    must pick identical subsets. Weights (doc_id % 7) + 1."""
    from sigraph_spark.operators.corpus import weighted_sample

    docs = _docs(spark, sf_dir)
    out = weighted_sample(docs, (F.col("doc_id") % 7 + 1).cast("double"), 50)
    return out.select("doc_id", "sample_key")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing at ctx=512. The Spark side is a
    distributed two-stage prefix sum (banded cumsum + per-band base
    offsets, band_size=100 here so the test data actually exercises
    multiple bands); the oracle is the plain single-window cumsum the
    two-stage form must equal exactly."""
    from sigraph_spark.operators.corpus import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), ctx_len=512, band_size=100)


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the most recent error event
    at-or-before it for the same user (union-and-carry plan: one shuffle
    on user_id + one window scan — no range cross-join). Ties on the
    right side resolve to the greatest event_id, so the result is
    engine-reproducible."""
    from sigraph_spark.operators.asof import asof_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    out = asof_join(clicks, errors, on="user_id", right_tiebreak="event_id")
    return out.select(
        "event_id", "user_id", "ts", "matched_event_id", "matched_value"
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events table (5-minute
    inactivity gap per user) via Spark's native ``session_window`` —
    batch form of the streaming operator (streaming/windows.py
    sessionize; stream==batch pinned in tests/test_streaming_sessions).
    session_end = last event ts + gap; events exactly ``gap`` apart DO
    merge (overlap-or-adjacency). total_value sums DECIMAL(18,2) so
    the oracle is addition-order-exact."""
    from sigraph_spark.streaming.windows import sessionize

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return sessionize(ev, gap="5 minutes")


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over events: user_id and
    epoch-second ts each bucketed to 16 bits by exact integer
    arithmetic, bits interleaved into one BIGINT (operators/layout.py —
    the OPTIMIZE ZORDER BY technique for multi-column min/max pruning
    at lakehouse scale). The oracle rebuilds the key from the SAME
    unrolled shift/mask terms (zorder_oracle_sql), so the two
    implementations cannot drift silently."""
    from sigraph_spark.operators.layout import int_bucket, zorder_key

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    mm = ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min(F.unix_timestamp("ts")).alias("tmin"),
        F.max(F.unix_timestamp("ts")).alias("tmax"),
    ).collect()[0]
    ub = int_bucket(F.col("user_id"), mm.umin, mm.umax, 16)
    tb = int_bucket(F.unix_timestamp("ts"), mm.tmin, mm.tmax, 16)
    return ev.select(
        "event_id",
        ub.alias("user_bucket"),
        tb.alias("ts_bucket"),
        zorder_key([ub, tb], 16).alias("zkey"),
    )


def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout key over events (same exact bucket
    arithmetic as `zorder_key`, 8 bits per axis): the classic xy2d
    bit-level walk staged as one chained projection per level so the
    expression tree stays linear (operators/layout.py). Better range
    locality than Z-order — consecutive keys are Manhattan-adjacent
    cells (pinned in test_layout). Oracle: chained CTEs GENERATED from
    the same per-level formulas (hilbert_oracle_sql)."""
    from sigraph_spark.operators.layout import (
        int_bucket, with_hilbert_key,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    mm = ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min(F.unix_timestamp("ts")).alias("tmin"),
        F.max(F.unix_timestamp("ts")).alias("tmax"),
    ).collect()[0]
    b = ev.select(
        "event_id",
        int_bucket(F.col("user_id"), mm.umin, mm.umax, 8).alias("xb"),
        int_bucket(F.unix_timestamp("ts"), mm.tmin, mm.tmax, 8).alias("yb"),
    )
    return with_hilbert_key(b, "xb", "yb", bits=8).select(
        "event_id", "xb", "yb", "hkey"
    )


def q_cluster_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution clustering evaluation (operators/clustereval.py):
    B-cubed precision/recall/F1 plus pairwise pair-counting metrics,
    comparing 20-char-prefix blocking clusters (pred) against
    first-3-words blocking clusters (gold) over documents — two
    non-nested blockings, so precision AND recall are both < 1 and the
    whole metric algebra is exercised. All counts exact BIGINT algebra
    (cells / n-choose-2 identities — no pair enumeration, no per-item
    work); ratio columns rounded to 6dp in both engines (the only
    floating step is the final division)."""
    from sigraph_spark.operators.clustereval import bcubed, pairwise_metrics

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    w_pred = Window.partitionBy(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 20)
    )
    w_gold = Window.partitionBy(
        F.array_join(
            F.slice(
                F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"), 1, 3
            ),
            " ",
        )
    )
    assign = docs.select(
        F.col("doc_id").alias("item"),
        F.min("doc_id").over(w_pred).alias("pred_cluster"),
        F.min("doc_id").over(w_gold).alias("gold_cluster"),
    )
    b = bcubed(assign)
    p = pairwise_metrics(assign)
    out = b.crossJoin(p)
    rounded = [
        "bcubed_precision", "bcubed_recall", "bcubed_f1",
        "pair_precision", "pair_recall", "pair_f1",
    ]
    return out.select(
        "n_items", "tp_pairs", "pred_pairs", "gold_pairs",
        *[F.round(F.col(c), 6).alias(c) for c in rounded],
    )


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the watermarked stream-stream interval join
    (streaming/joins.py — same DataFrame expression both modes; the
    stream==batch identity is pinned by tests/test_streaming_joins.py):
    every (click, error) pair for the same user with the error within 6
    hours at-or-before the click (that width gives the sf0.01 fixture a
    few hundred pairs)."""
    from sigraph_spark.streaming.joins import interval_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    return interval_join(clicks, errors, "user_id", max_delay="6 hours").select(
        "user_id",
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("error_id"),
    )


def q_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (the batch form of the streaming
    windowed stats — F.window is a plain grouping expression, so the same
    code runs in both modes; streaming/windows.py + its stream==batch
    test cover the watermarked path). 1-hour windows align to the epoch,
    so date_trunc reproduces them in SQL."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour").alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- generic engine coverage ------------------------------------------------

def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_over = (F.col("ts") - prev) > F.expr("INTERVAL 1800 SECONDS")
    new_sess = F.when(prev.isNull() | gap_over, 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, first signup and first purchase
    strictly after it; one row of funnel counts + conversion rate.
    min-aggregations only — order-insensitive, exactly reproducible."""
    ev = _events(spark, sf_dir)
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    converted = (
        first_signup.join(purchases, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .select("user_id")
        .distinct()
    )
    base = first_signup.agg(F.count(F.lit(1)).alias("n_signup_users")).crossJoin(
        converted.agg(F.count(F.lit(1)).alias("n_converted"))
    )
    return base.select(
        F.col("n_signup_users").cast("long"),
        F.col("n_converted").cast("long"),
        F.round(F.col("n_converted") / F.col("n_signup_users"), 6).alias("rate"),
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the Monday week of their
    first event; n distinct users active at each later week offset.
    Pure UTC second arithmetic — identical in both engines."""
    ev = _events(spark, sf_dir).select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    return (
        active.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort_week")) / 604800
            ).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    dq = F.col("l_quantity").cast("decimal(18,4)")
    dp = F.col("l_extendedprice").cast("decimal(18,4)")
    dd = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dq).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dp).cast("double"), 2).alias("sum_base"),
            F.round(F.sum(dp * (F.lit(1).cast("decimal(18,4)") - dd)).cast("double"), 2).alias("sum_disc"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def q_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2).alias("total"),
    )


# --- pandas-UDF / pipeline stages (rows-only checks) -------------------------

def q_triples_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle (upgraded r2): the pages corpus selects golden-bank
    sentences via an engine-portable hash (corpus.portable_hash), so the
    exact expected (url, step, actor, verb, object, context) relation is
    reconstructable in DuckDB SQL — extraction order, per-doc IoC dedup,
    and step renumbering included. Pinned sf=0.01 (10,000 pages) so the
    oracle constant matches regardless of sf_dir."""
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.triples import triples_from_docs

    pages = gen_pages(spark, sf=0.01)
    docs = extract_pages(pages).select("url", "text")
    return triples_from_docs(docs).select(
        "url", F.col("step").cast("int").alias("step"),
        "actor", "verb", "object", "context",
    )


def q_pipeline_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle (upgraded r2): full S1-S4 pipeline (extract -> triples ->
    link -> canonical edge table). The sf0.01 vocabulary has no near-dup
    merges (verified by running link_entities over the full bank vocab), so
    canonicalization == normalization in the oracle; last-writer timestamps
    compare as integer second offsets from the corpus epoch to avoid
    cross-engine timestamp stringification drift."""
    from sigraph_spark.corpus import EPOCH, gen_pages
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        canonicalize_triples, link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    pages = gen_pages(spark, sf=0.01)
    docs = extract_pages(pages).select("url", "warc_ts", "text")
    triples = triples_from_docs(docs)
    mapping = link_entities(triples)
    epoch_s = F.unix_timestamp(F.lit(EPOCH.isoformat()).cast("timestamp"))
    canon = canonicalize_triples(triples, mapping).join(
        docs.select(
            "url", (F.unix_timestamp("warc_ts") - epoch_s).alias("start_off")
        ),
        "url",
    )
    return (
        canon.groupBy(F.col("subj"), F.col("verb").alias("predicate"), F.col("obj"))
        .agg(
            F.max(F.struct("start_off", "url")).alias("_lw"),
            F.count(F.lit(1)).cast("long").alias("weight"),
        )
        .select(
            "subj", "predicate", "obj",
            F.col("_lw.start_off").cast("long").alias("start_off"),
            F.col("_lw.url").alias("provenance_url"),
            "weight",
        )
    )


def q_link_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental entity linking over TWO crawl deltas (the 10^12-doc
    production path: a recrawl never re-links the corpus — only unseen
    entities are signed, probed against the stored band index, scored in
    the stored idf space, and appended with frozen history). On this
    corpus the vocabulary has no near-dup merges (same fact the
    pipeline_edges oracle relies on), so the total mapping equals the
    identity over the normalized vocabulary — which the oracle restates
    directly; merge behavior itself is pytest-pinned."""
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        empty_link_state, incremental_link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    pages = gen_pages(spark, sf=0.01)
    docs = extract_pages(pages).select("url", "warc_ts", "text")
    triples = triples_from_docs(docs)
    parity = F.pmod(F.xxhash64("url"), F.lit(2))
    _, state = incremental_link_entities(
        triples.filter(parity == 0), empty_link_state(spark)
    )
    mapping, _ = incremental_link_entities(triples.filter(parity == 1), state)
    return mapping


def q_predicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation-synonym clustering over the webtext triples: predicates
    whose object sets overlap (integer-exact Jaccard >= 0.2) collapse to a
    canonical relation via star-contraction CC; singletons map to
    themselves. Pinned sf=0.01 like the other triple gates so the oracle
    constant matches regardless of sf_dir."""
    from sigraph_spark.operators.linking import predicate_clusters

    return predicate_clusters(
        _webtext_triples(spark), "verb", "object", min_jaccard_pct=20
    )


def _webtext_triples(spark: SparkSession) -> DataFrame:
    """Shared triples-at-sf0.01 input for the fusion/ontology gates."""
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.triples import triples_from_docs

    pages = gen_pages(spark, sf=0.01)
    return triples_from_docs(extract_pages(pages).select("url", "text"))


def _webtext_claims(spark: SparkSession) -> DataFrame:
    """Claims table for the fusion gates: triples + deterministic
    extractor noise. Pages with i % 10 == 0 report an UPPER-cased object
    for the 'create'/'launch' verbs (a noisy segment-0 extractor), and
    source = crawl segment 'seg-{i%5}' — so every (actor, create/launch)
    fact has a genuine 2-object conflict for fusion to resolve and the
    clean object holds the source majority."""
    t = _webtext_triples(spark)
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    noisy = ((i % 10) == 0) & F.col("verb").isin("create", "launch")
    return t.select(
        "actor",
        "verb",
        F.when(noisy, F.upper("object")).otherwise(F.col("object")).alias("object"),
        F.concat(F.lit("seg-"), (i % 5).cast("string")).alias("source"),
    )


def q_predicate_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema induction: per-predicate cardinality profile + functional
    flag over the noisy claims (create/launch lose functionality, the
    other 20 verbs keep it)."""
    from sigraph_spark.operators.fusion import predicate_cardinality

    return predicate_cardinality(_webtext_claims(spark))


def q_functional_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint check: subjects with >1 distinct object for declared
    functional predicates — exactly the noise-injected create/launch
    facts, with the conflicting objects '|'-joined sorted."""
    from sigraph_spark.operators.fusion import functional_violations

    return functional_violations(
        _webtext_claims(spark), functional_preds=["create", "launch"]
    )


def q_triple_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round source-weighted truth fusion: the noisy segment's
    uppercase variants lose both the majority vote and the weighted
    re-vote; fused objects equal the clean extraction."""
    from sigraph_spark.operators.fusion import fuse_triples

    return fuse_triples(_webtext_claims(spark))


def q_triple_fusion_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental fusion: the claims fold in as two OVERLAPPING crawl
    deltas (segments 0-2 and 2-4) through the merge_claims semilattice;
    fusing the merged state must equal the from-scratch fuse — same
    oracle as `triple_fusion`."""
    from sigraph_spark.operators.fusion import fuse_triples, merge_claims

    claims = _webtext_claims(spark).select(
        F.col("actor").alias("subject"),
        F.col("verb").alias("predicate"),
        "object",
        "source",
    )
    d1 = claims.filter(F.col("source").isin("seg-0", "seg-1", "seg-2"))
    d2 = claims.filter(F.col("source").isin("seg-2", "seg-3", "seg-4"))
    merged = merge_claims(merge_claims(None, d1), d2)
    return fuse_triples(merged, "subject", "predicate", "object", "source")


def q_inverse_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse/symmetric relation induction over the webtext triples plus
    a deterministic inverse injection (even pages assert the reversed
    'exfiltrated_by' for every 'exfiltrate' fact) — the induced pair must
    surface under the integer-exact mirror-Jaccard gate."""
    from sigraph_spark.operators.fusion import inverse_predicates

    t = _webtext_triples(spark)
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    inv = t.filter(((i % 2) == 0) & (F.col("verb") == "exfiltrate")).select(
        F.col("object").alias("actor"),
        F.lit("exfiltrated_by").alias("verb"),
        F.col("actor").alias("object"),
    )
    base = t.select("actor", "verb", "object").unionByName(inv)
    return inverse_predicates(base, min_overlap_pct=30)


def q_predicate_subsumption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy induction: even pages also assert the generalized
    'network_request' for every 'http_request' fact; the containment
    gate must induce http_request ⊑ network_request."""
    from sigraph_spark.operators.fusion import predicate_subsumption

    t = _webtext_triples(spark)
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    gen = t.filter(((i % 2) == 0) & (F.col("verb") == "http_request")).select(
        "actor", F.lit("network_request").alias("verb"), "object"
    )
    base = t.select("actor", "verb", "object").unionByName(gen)
    return predicate_subsumption(base, min_containment_pct=90)


def q_edge_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge lineage panel over the webtext triples: exact mention and
    doc counts plus a rank-filtered (bounded) 3-doc sample per edge."""
    from sigraph_spark.operators.fusion import edge_provenance

    return edge_provenance(
        _webtext_triples(spark),
        subj_col="actor", pred_col="verb", obj_col="object",
        doc_col="url", max_samples=3,
    )


def q_predicate_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range induction: modal object literal type per predicate with
    exact distribution counts."""
    from sigraph_spark.operators.literals import predicate_ranges

    return predicate_ranges(_webtext_triples(spark))


def q_predicate_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-predicate schema report: cardinality profile + functional
    flag + induced range type in one table."""
    from sigraph_spark.operators.fusion import predicate_schema

    return predicate_schema(_webtext_triples(spark))


def q_range_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape validation against the induced schema: every 50th page
    injects a winpath object for 'dns_query' (naturally all-domain, so
    consensus stays 88% >= 80% and each injected object violates)."""
    from sigraph_spark.operators.literals import range_violations

    t = _webtext_triples(spark).select("verb", "object")
    inj = (
        spark.range(0, 10_000)
        .filter((F.col("id") % 50) == 0)
        .select(
            F.lit("dns_query").alias("verb"),
            F.concat(
                F.lit("c:\\noise\\dq_"), F.col("id"), F.lit(".dat")
            ).alias("object"),
        )
    )
    return range_violations(t.unionByName(inj), min_share_pct=80)


def q_fusion_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned-KG materialization: the noisy claims rewritten onto the
    fused truth — losing objects (the uppercase injected variants)
    dropped, uncontested rows untouched."""
    from sigraph_spark.operators.fusion import apply_fusion, fuse_triples

    claims = _webtext_claims(spark).select(
        F.col("actor").alias("subject"),
        F.col("verb").alias("predicate"),
        F.col("object").alias("object"),
        "source",
    ).distinct()
    fused = fuse_triples(claims, "subject", "predicate", "object", "source")
    return apply_fusion(
        claims, fused, subj_col="subject", pred_col="predicate", obj_col="object"
    )


def q_entity_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional entity typing over raw triples: modal predicate
    (corpus-frequency weighted, lexicographic ties) + exact usage
    counts per actor."""
    from sigraph_spark.operators.fusion import entity_type_signature

    return entity_type_signature(_webtext_triples(spark))


def q_transe_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed KG-embedding training (TransE, Bordes et al. 2013)
    with exact BIGINT subgradient descent: deterministic md5 init,
    lexicographic-rank negative draws, integer margin test — the oracle
    unrolls the identical 3 training rounds and matches bit-for-bit."""
    from sigraph_spark.operators.transe import transe_train

    t = _webtext_triples(spark).select(
        F.col("actor").alias("subj"),
        F.col("verb").alias("predicate"),
        F.col("object").alias("obj"),
    )
    return transe_train(t, dim=4, rounds=3)


def q_kg_completion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG-completion evaluation protocol (filtered ranking): every ~5th
    fact becomes a probe; its true tail is ranked among all trained
    entities by exact-integer TransE distance with known facts filtered
    out. The oracle composes the training CTEs with the ranking SQL."""
    from sigraph_spark.operators.dedup import hash32_md5_le
    from sigraph_spark.operators.transe import (
        transe_rank_tails, transe_train,
    )

    t = _webtext_triples(spark).select(
        F.col("actor").alias("subj"),
        F.col("verb").alias("predicate"),
        F.col("object").alias("obj"),
    )
    emb = transe_train(t, dim=4, rounds=3)
    h = hash32_md5_le(F.concat_ws("|", "subj", "predicate", "obj"))
    probes = t.distinct().filter(h % 5 == 0)
    return transe_rank_tails(emb, probes, filter_facts=t)


def q_transe_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start TransE for the continuous-crawl path: 2 cold rounds
    over 90% of the facts (stored embeddings), then 2 resumed rounds
    over the full fact set — delta entities md5-init, draw sequence
    continues at round 3. The oracle composes two prefix-namespaced
    unrolled phases; resume on unchanged facts is bit-identical to the
    longer cold run (test-pinned)."""
    from sigraph_spark.operators.dedup import hash32_md5_le
    from sigraph_spark.operators.transe import transe_train

    t = _webtext_triples(spark).select(
        F.col("actor").alias("subj"),
        F.col("verb").alias("predicate"),
        F.col("object").alias("obj"),
    )
    h = hash32_md5_le(F.concat_ws("|", "subj", "predicate", "obj"))
    base = t.filter(h % 10 != 0)
    emb1 = transe_train(base, dim=4, rounds=2)
    return transe_train(
        t, dim=4, rounds=2, init_emb=emb1, round_offset=2
    )


def q_schema_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-level schema summary: the instance KG contracted onto the
    induced entity types (modal subject predicate; object-only entities
    are LITERAL leaves) with exact edge/instance counts per
    (subj_type, predicate, obj_type)."""
    from sigraph_spark.operators.fusion import schema_graph

    return schema_graph(_webtext_triples(spark))


def q_entity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-card summarization: top-3 rarest facts per subject with
    deterministic (fact_subjects, predicate, object) ordering."""
    from sigraph_spark.operators.fusion import entity_summary

    return entity_summary(_webtext_triples(spark), top_k=3)


def q_entity_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level entity co-occurrence pairs (count >= 2) with exact
    per-side document frequencies — the relation-discovery table."""
    from sigraph_spark.operators.fusion import entity_cooccurrence

    return entity_cooccurrence(_webtext_triples(spark), min_count=2)


def q_literal_typing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-literal dictionary over the webtext triple objects: extract,
    classify (url/registry/winpath/unc/cve/sha256/ipv4/file/domain) and
    canonicalize (lower + re-fang, ip strips :port) with exact counts."""
    from sigraph_spark.operators.literals import typed_literals

    return typed_literals(_webtext_triples(spark))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle: gen_media payloads are deterministic ASCII
    ('MEDIA{id}' + 'x'*((id%7+1)*100)) and the stub decoder is a byte%16
    histogram, so DuckDB reconstructs the whole pipeline from range(128) —
    the mapInPandas plumbing (schema, batching, null handling) is what the
    comparison exercises."""
    from sigraph_spark.operators.multimodal import gen_media, image_features

    media = gen_media(spark, n=128)
    # cast the float32 feature to double BEFORE rounding so the oracle can
    # reproduce the exact value (float32 quantization then float64 round)
    return image_features(media).select(
        "media_id", "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0")
    )



def q_trace_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sequence retrieval (reference F1, db_session.py:181-214):
    per trace, span ids concatenated in (timestamp, span_id) order."""
    good, _ = _parsed(spark, sf_dir)
    return (
        good.filter(F.col("unit_id") == "u-3")
        .groupBy("trace_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("timestamp", "span_id"))),
                    lambda s: s["span_id"],
                ),
                ",",
            ).alias("sequence"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def q_unit_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit flush (reference A11, schema.py:182-193): per-unit containment
    counts after deleting unit u-0."""
    from sigraph_spark.operators.graph import build_trace_contains, unit_flush

    good, _ = _parsed(spark, sf_dir)
    kept = unit_flush(build_trace_contains(good), "u-0")
    return kept.groupBy("unit_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )


def q_provenance_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle (upgraded r2): multi-hop provenance subgraph export
    (reference D5, schema.py QUERY_ALL_PROVENANCE) for unit u-3, 2 hops —
    the oracle is the recursive-CTE restatement of the label-filtered BFS
    (edges whose src is reachable within max_hop-1 hops of the unit's
    containment anchors)."""
    from sigraph_spark.operators.graph import build_nodes, build_trace_contains
    from sigraph_spark.operators.queries import provenance_subgraph

    good, _ = _parsed(spark, sf_dir)
    _nodes, sub_edges = provenance_subgraph(
        build_trace_contains(good).localCheckpoint(eager=False),
        _edges_ckpt(spark, sf_dir),
        build_nodes(good).localCheckpoint(eager=False),
        "u-3",
        max_hop=2,
    )
    return sub_edges



def q_drift_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift sequences (reference D7, v1/api.py:177-208): ordered sequences
    of trace tr-2 plus its related traces within 3 hops (unit u-2)."""
    from sigraph_spark.operators.graph import build_trace_contains, build_traces
    from sigraph_spark.operators.queries import drift_sequences

    good, _ = _parsed(spark, sf_dir)
    good = good.localCheckpoint(eager=False)
    return drift_sequences(
        good,
        build_traces(good),
        build_trace_contains(good).localCheckpoint(eager=False),
        _edges_ckpt(spark, sf_dir),
        "u-2", "tr-2", max_hop=3,
    )



def _ivf_rounded_search(spark: SparkSession, sf_dir: str, cents) -> DataFrame:
    """Shared IVF probe-search half (SQL-reproducible): ivf_assign
    tagging, 2-probe selection (score desc, cluster desc tie-break),
    cluster-restricted exact cosine rounded to 6dp, rank <= 10."""
    from sigraph_spark.operators.similarity import (
        dot, ivf_assign, l2_norm, l2_normalize,
    )

    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    e = _emb(spark, sf_dir)
    tagged = ivf_assign(e, cents)
    q0 = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.transform(
            cent_arr, lambda c: dot(l2_normalize(F.col("embedding")), c)
        ).alias("_cs"),
    )
    probes = q0.select(
        "query_id", "qv",
        F.explode(
            F.slice(
                F.reverse(F.array_sort(
                    F.transform(
                        F.col("_cs"),
                        lambda s, i: F.struct(s.alias("score"), i.alias("cluster")),
                    )
                )),
                1, 2,
            )
        ).alias("_p"),
    ).select("query_id", "qv", F.col("_p.cluster").cast("int").alias("cluster"))
    scored = tagged.join(F.broadcast(probes), "cluster").select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("emb"), F.col("qv"))
            / (l2_norm(F.col("emb")) * l2_norm(F.col("qv"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle (round 5 — closes the last rows-only gate): the
    k-means TRAINING half is now the deterministic spherical-Lloyd
    trainer (similarity.ivf_train_lloyd — fixed-point BIGINT dimension
    sums, first-index argmax, driver-side left-assoc normalization), so
    the oracle unrolls the 2 training iterations as chained CTEs and
    the search half reuses the ivf_topk_fixed device. Spark ML's KMeans
    path (ivf_index) stays the convenience trainer, recall-pinned in
    tests."""
    from sigraph_spark.operators.similarity import ivf_train_lloyd

    cents = ivf_train_lloyd(_emb(spark, sf_dir), k=8, iters=2)
    return _ivf_rounded_search(spark, sf_dir, cents)


def q_ivf_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD oracle for the IVF SEARCH path alone: fixed literal
    centroids (the frozen-quantizer deployment — see
    similarity.ivf_assign) make the assignment, 2-probe selection
    (score desc, cluster desc), and cluster-restricted ranking fully
    SQL-reproducible without the training unroll."""
    from sigraph_spark.operators.similarity import _hyperplane

    cents = [_hyperplane(64, 100 + i) for i in range(8)]
    return _ivf_rounded_search(spark, sf_dir, cents)


def _pq_fixed_books() -> list:
    """Literal PQ codebooks from an exact-binary formula (every value
    k/16 with |k| <= 10 — short repr, no parse drift)."""
    return [[[((mi * 37 + j * 17 + t * 7) % 21 - 10) / 16.0
              for t in range(8)] for j in range(8)] for mi in range(8)]


def _pq_search(spark: SparkSession, sf_dir: str, books) -> DataFrame:
    from sigraph_spark.operators.pq import pq_encode, pq_topk

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return pq_topk(pq_encode(e, books), books, q, k=10)


def q_pq_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search with FIXED literal codebooks
    (round 5, operators/pq.py — the frozen-codebook deployment):
    encode = first-index argmin of squared L2 per sub-space, search =
    per-query M x K distance tables + left-assoc chained lookups,
    rounded 6dp at the boundary. Fully SQL-reproducible without the
    training unroll (the ivf_topk_fixed device on the PQ plane)."""
    return _pq_search(spark, sf_dir, _pq_fixed_books())


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with TRAINED codebooks, hard-oracled:
    pq_train_lloyd is deterministic by construction (seeds = the
    sub-vectors of the 8 smallest vec_ids, first-index argmin
    assignment, fixed-point BIGINT dimension sums, mean =
    s/(2^24 * n), empty clusters keep their codeword), so the oracle
    unrolls the 2 training iterations as chained CTEs — the
    ivf_topk/PageRank/BPE unrolled-oracle device — and the search half
    reuses the pq_topk_fixed SQL with the trained codebook TABLE."""
    from sigraph_spark.operators.pq import pq_train_lloyd

    books = pq_train_lloyd(_emb(spark, sf_dir), m=8, k=8, iters=2)
    return _pq_search(spark, sf_dir, books)


def q_ivfpq_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC) search with FIXED coarse centroids + FIXED PQ
    codebooks (round 5, operators/pq.py ivfpq_*): coarse assignment on
    the normalized corpus, PQ codes of the RESIDUAL normalized(v) -
    centroid[cluster], 2-probe selection per query, ADC against the
    query residual of each probed centroid, ranking restricted to
    probed clusters. Every stage restated in SQL (residuals via
    list_transform index arithmetic, the ADC sum as the left-assoc
    ds[1]+..+ds[8] chain)."""
    from sigraph_spark.operators.pq import ivfpq_encode, ivfpq_topk
    from sigraph_spark.operators.similarity import _hyperplane

    cents = [_hyperplane(64, 300 + i) for i in range(8)]
    books = _pq_fixed_books()
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    enc = ivfpq_encode(e, cents, books)
    return ivfpq_topk(enc, cents, books, q, k=10, n_probe=2)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus filter: distill a high-precision seed rule into
    a full-vocabulary linear classifier (the CCNet/FineWeb bootstrap:
    label confident docs with a cheap rule, exclude the ambiguous band,
    train a hashed-bag-of-words head that then scores everything).

    Teacher here: sign of count('join') - count('scan') where the counts
    differ by > 2 (the ambiguous band is excluded so a real margin
    exists). Training is the full-batch INTEGER perceptron (12 rounds,
    dim=256) — all-BIGINT arithmetic makes it partition-order invariant
    and bit-identical to the unrolled-CTE oracle: the fixed-point-
    PageRank device applied to distributed ML. Converges to training
    accuracy 1.0 at both sf0.01 and sf0.1, with the learned weight mass
    exactly on the join/scan buckets. Returns (doc_id, score, pred,
    label) over the training subset."""
    from sigraph_spark.operators.classifier import train_quality_classifier

    docs = _docs(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    diff = F.size(F.filter(toks, lambda t: t == F.lit("join"))) - F.size(
        F.filter(toks, lambda t: t == F.lit("scan"))
    )
    seed = docs.withColumn("_diff", diff).filter(F.abs(F.col("_diff")) > 2)
    out = train_quality_classifier(
        seed,
        F.when(F.col("_diff") > 0, F.lit(1)).otherwise(F.lit(-1)),
        dim=256,
        rounds=12,
    )
    return out.select(
        "doc_id",
        F.col("score").cast("long").alias("score"),
        F.col("pred").cast("int").alias("pred"),
        F.col("label").cast("long").alias("label"),
    ).orderBy("doc_id")


def _quality_classifier_oracle() -> str:
    """DuckDB twin of q_quality_classifier: identical seed-rule teacher
    (list_filter counts, ambiguous band excluded), identical feature
    hash (md5_number_upper little-endian-uint32 family), the 12 training
    rounds unrolled as MATERIALIZED CTEs (margin -> misclassified ->
    bucket delta -> weight fold), all-integer so it matches bit-for-bit."""
    ctes = [
        r"""seed AS MATERIALIZED (
          SELECT doc_id, text,
                 len(list_filter(w, t -> t = 'join'))
                   - len(list_filter(w, t -> t = 'scan')) AS d
          FROM (SELECT doc_id, text,
                       list_filter(string_split_regex(
                           lower(trim(coalesce(text, ''))), '\s+'),
                           t -> t <> '') AS w
                FROM documents)
          WHERE abs(len(list_filter(w, t -> t = 'join'))
                    - len(list_filter(w, t -> t = 'scan'))) > 2)""",
        """lbl AS (
          SELECT doc_id,
                 CAST(CASE WHEN d > 0 THEN 1 ELSE -1 END AS BIGINT) AS y
          FROM seed)""",
        r"""tok AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(trim(coalesce(text, ''))),
                        '\s+')) AS token
          FROM seed)""",
        """fc AS MATERIALIZED (
          SELECT doc_id,
                 CAST((md5_number_upper('feat:' || token) & 4294967295) % 256
                      AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM tok WHERE token <> '' GROUP BY 1, 2
          UNION ALL
          SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM lbl)""",
        """w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket,
                         CAST(NULL AS BIGINT) AS w WHERE FALSE)""",
    ]
    rounds = 12
    for r in range(1, rounds + 1):
        ctes.append(
            f"""m{r} AS MATERIALIZED (
          SELECT f.doc_id, sum(coalesce(w.w, 0) * f.cnt) AS margin
          FROM fc f LEFT JOIN w{r - 1} w ON f.bucket = w.bucket
          GROUP BY f.doc_id)"""
        )
        ctes.append(
            f"""u{r} AS MATERIALIZED (
          SELECT f.bucket, sum(l.y * f.cnt) AS dw
          FROM fc f
          JOIN lbl l ON l.doc_id = f.doc_id
          JOIN m{r} m ON m.doc_id = f.doc_id
          WHERE l.y * m.margin <= 0
          GROUP BY f.bucket)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
          SELECT coalesce(w.bucket, u.bucket) AS bucket,
                 coalesce(w.w, 0) + coalesce(u.dw, 0) AS w
          FROM w{r - 1} w FULL OUTER JOIN u{r} u ON w.bucket = u.bucket)"""
        )
    ctes.append(
        f"""mf AS (
          SELECT f.doc_id, sum(coalesce(w.w, 0) * f.cnt) AS score
          FROM fc f LEFT JOIN w{rounds} w ON f.bucket = w.bucket
          GROUP BY f.doc_id)"""
    )
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + """
        SELECT l.doc_id,
               CAST(mf.score AS BIGINT) AS score,
               CAST(CASE WHEN mf.score > 0 THEN 1 ELSE -1 END AS INT) AS pred,
               l.y AS label
        FROM lbl l JOIN mf ON mf.doc_id = l.doc_id
        ORDER BY l.doc_id
    """
    )


def _webtext_chain_facts(spark: SparkSession) -> DataFrame:
    """Triples + a deterministic 2-hop composition signal for the AMIE
    chain-rule gates. Per page i the crawl graph asserts
    ``(crawler-{i%50}, links_to, host-{i%97})`` and
    ``(host-{i%97}, hosted_in, cc-{(i%97)%13})``; the composed head
    ``(crawler, reaches, cc)`` is asserted only for pairs with even
    portable-hash parity — so the rule
    links_to ∧ hosted_in ⇒ reaches is mineable at ~50% confidence
    (650 distinct body pairs) and the odd half is forward-chainable.
    The extraction triples ride along as mining noise."""
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.dedup import hash32_md5_le

    t = _webtext_triples(spark).select("actor", "verb", "object")
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=0.01).select(i.alias("i"))
    src = F.concat(F.lit("crawler-"), (F.col("i") % 50).cast("string"))
    mid = F.concat(F.lit("host-"), (F.col("i") % 97).cast("string"))
    cc = F.concat(F.lit("cc-"), ((F.col("i") % 97) % 13).cast("string"))
    links = pages.select(
        src.alias("actor"), F.lit("links_to").alias("verb"), mid.alias("object")
    )
    hosted = pages.select(
        mid.alias("actor"), F.lit("hosted_in").alias("verb"), cc.alias("object")
    )
    head = pages.select(
        src.alias("actor"), F.lit("reaches").alias("verb"), cc.alias("object")
    ).filter(hash32_md5_le(F.concat_ws("|", "actor", "object")) % 2 == 0)
    return t.unionByName(links).unionByName(hosted).unionByName(head)


def q_chain_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-style length-2 Horn rule mining (support / std-confidence /
    PCA-confidence denominators, all exact BIGINT) over the webtext KG
    plus the injected composition signal — the planted rule
    network_connect ∧ resolves_to ⇒ reaches_ip must surface."""
    from sigraph_spark.operators.rulemine import mine_chain_rules

    return mine_chain_rules(
        _webtext_chain_facts(spark),
        subj_col="actor",
        pred_col="verb",
        obj_col="object",
        min_support=3,
        min_conf_pct=30,
    ).select("p1", "p2", "head", "support", "n_body", "n_pca", "n_head")


def _webtext_chase_facts(spark: SparkSession) -> DataFrame:
    """Chain facts + a third (region) level so materialization needs a
    second round: ``(cc, in_region, region-{cc%4})`` for every country
    node, and even-parity ``(crawler, reaches_region, region)`` heads —
    the mined rule reaches ∧ in_region ⇒ reaches_region then fires over
    round-1-DERIVED reaches facts in round 2."""
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.dedup import hash32_md5_le

    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    pages = gen_pages(spark, sf=0.01).select(i.alias("i"))
    src = F.concat(F.lit("crawler-"), (F.col("i") % 50).cast("string"))
    cc = F.concat(F.lit("cc-"), ((F.col("i") % 97) % 13).cast("string"))
    rg = F.concat(
        F.lit("region-"), (((F.col("i") % 97) % 13) % 4).cast("string")
    )
    in_region = pages.select(
        cc.alias("actor"), F.lit("in_region").alias("verb"), rg.alias("object")
    )
    head2 = pages.select(
        src.alias("actor"),
        F.lit("reaches_region").alias("verb"),
        rg.alias("object"),
    ).filter(hash32_md5_le(F.concat_ws("|", "actor", "object")) % 2 == 0)
    return (
        _webtext_chain_facts(spark).unionByName(in_region).unionByName(head2)
    )


def q_rule_chase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datalog-style materialization: mined rules forward-chain for
    exactly 2 rounds (semi-naive delta grounding); round-2 facts exist
    only because round 1 derived the odd-parity reaches edges — the
    oracle re-derives both rounds by naive full regrounding, pinning
    the semi-naive == naive equivalence on real data."""
    from sigraph_spark.operators.rulemine import chase, mine_chain_rules

    facts = _webtext_chase_facts(spark)
    rules = mine_chain_rules(
        facts,
        subj_col="actor",
        pred_col="verb",
        obj_col="object",
        min_support=3,
        min_conf_pct=30,
    )
    return chase(
        facts,
        rules,
        subj_col="actor",
        pred_col="verb",
        obj_col="object",
        min_pca_conf_pct=40,
        max_rounds=2,
    ).filter(F.col("round") >= 1)


def q_chain_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward chaining: mined rules at PCA-confidence ≥40% fire over
    their body groundings and emit only NOVEL head triples (the
    odd-parity reaches_ip half), each tagged with its best deriving
    rule and integer confidence percent."""
    from sigraph_spark.operators.rulemine import infer_chain, mine_chain_rules

    facts = _webtext_chain_facts(spark)
    rules = mine_chain_rules(
        facts,
        subj_col="actor",
        pred_col="verb",
        obj_col="object",
        min_support=3,
        min_conf_pct=30,
    )
    return infer_chain(
        facts,
        rules,
        subj_col="actor",
        pred_col="verb",
        obj_col="object",
        min_pca_conf_pct=40,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "provenance_parse": q_provenance_parse,
        "provenance_errors": q_provenance_errors,
        "graph_nodes": q_graph_nodes,
        "graph_edges": q_graph_edges,
        "graph_traces": q_graph_traces,
        "trace_contains": q_trace_contains,
        "trace_spans": q_trace_spans,
        "graph_merge_spans": q_graph_merge_spans,
        "rule_matches": q_rule_matches,
        "graph_merge_nodes": q_graph_merge_nodes,
        "graph_merge_edges": q_graph_merge_edges,
        "graph_merge_traces": q_graph_merge_traces,
        "adjacency": q_adjacency,
        "degree_table": q_degree_table,
        "pagerank": q_pagerank,
        "pagerank_weighted": q_pagerank_weighted,
        "pagerank_resume": q_pagerank_resume,
        "graph_diff": q_graph_diff,
        "components": q_components,
        "components_resume": q_components_resume,
        "triangles": q_triangles,
        "link_prediction": q_link_prediction,
        "scc": q_scc,
        "condensation_levels": q_condensation_levels,
        "bgp_match": q_bgp_match,
        "bgp_optional": q_bgp_optional,
        "path_query": q_path_query,
        "sparql_graph_path": q_sparql_graph_path,
        "sparql_graph_subquery": q_sparql_graph_subquery,
        "sparql_update": q_sparql_update,
        "rdfs_closure": q_rdfs_closure,
        "breadcrumb_taxonomy": q_breadcrumb_taxonomy,
        "video_metadata": q_video_metadata,
        "avi_metadata": q_avi_metadata,
        "video_frames": q_video_frames,
        "mp4_frames": q_mp4_frames,
        "jpeg_codecs": q_jpeg_codecs,
        "flac_roundtrip": q_flac_roundtrip,
        "oggflac_roundtrip": q_oggflac_roundtrip,
        "textrank": q_textrank,
        "rake_keywords": q_rake,
        "pronoun_coref": q_coref,
        "image_metadata": q_image_metadata,
        "media_tags": q_media_tags,
        "image_neardup": q_image_neardup,
        "imagehash_incremental": q_imagehash_incremental,
        "audio_neardup": q_audio_neardup,
        "audiofp_incremental": q_audiofp_incremental,
        "spoof_pairs": q_spoof_pairs,
        "typo_pairs": q_typo_pairs,
        "combosquat": q_combosquat,
        "video_neardup": q_video_neardup,
        "audio_segments": q_audio_segments,
        "image_tiles": q_image_tiles,
        "image_resize": q_image_resize,
        "image_captions": q_image_captions,
        "absolutized_links": q_absolutized_links,
        "lm_quality": q_lm_quality,
        "compaction_plan": q_compaction_plan,
        "warc10_roundtrip": q_warc10_roundtrip,
        "simhash_incremental": q_simhash_incremental,
        "ivf_topk": q_ivf_topk,
        "pq_topk": q_pq_topk,
        "pq_topk_fixed": q_pq_topk_fixed,
        "ivfpq_topk_fixed": q_ivfpq_topk_fixed,
        "sigma_modifiers": q_sigma_modifiers,
        "rdf_export": q_rdf_export,
        "rdf_roundtrip": q_rdf_roundtrip,
        "rdf_star_roundtrip": q_rdf_star_roundtrip,
        "neo4j_nodes": q_neo4j_nodes,
        "graphml_nodes": q_graphml_nodes,
        "graphml_edges": q_graphml_edges,
        "neo4j_rels": q_neo4j_rels,
        "opensearch_bulk": q_opensearch_bulk,
        "redirect_resolution": q_redirect_resolution,
        "table_triples": q_table_triples,
        "jsonld_triples": q_jsonld_triples,
        "meta_triples": q_meta_triples,
        "microdata_triples": q_microdata_triples,
        "rdfa_triples": q_rdfa_triples,
        "list_items": q_list_items,
        "list_memberships": q_list_memberships,
        "dl_facts": q_dl_facts,
        "fused_struct_claims": q_fused_struct_claims,
        "quotes_extract": q_quotes_extract,
        "abbrev_pairs": q_abbrev_pairs,
        "alias_map": q_alias_map,
        "sparql_slice": q_sparql_slice,
        "template_id": q_template_id,
        "template_clusters": q_template_clusters,
        "template_novel": q_template_novel,
        "quantities": q_quantities,
        "object_quantities": q_object_quantities,
        "page_chains": q_page_chains,
        "stitched_pages": q_stitched_pages,
        "hearst_pairs": q_hearst_pairs,
        "taxonomy_induction": q_taxonomy_induction,
        "text_reuse": q_text_reuse,
        "hits": q_hits,
        "multi_extractor_fusion": q_multi_extractor_fusion,
        "sparql_select": q_sparql_select,
        "sparql_aggregate": q_sparql_aggregate,
        "sparql_construct": q_sparql_construct,
        "sparql_union": q_sparql_union,
        "sparql_values": q_sparql_values,
        "sparql_ask": q_sparql_ask,
        "sparql_describe": q_sparql_describe,
        "sparql_not_exists": q_sparql_not_exists,
        "sparql_minus": q_sparql_minus,
        "sparql_bind": q_sparql_bind,
        "sparql_nps": q_sparql_nps,
        "sparql_groupconcat": q_sparql_groupconcat,
        "sparql_subquery": q_sparql_subquery,
        "robots_rules": q_robots_rules,
        "robots_allowed": q_robots_allowed,
        "sitemap_parse": q_sitemap_parse,
        "frontier_schedule": q_frontier_schedule,
        "edge_history": q_edge_history,
        "edge_asof": q_edge_asof,
        "anchor_priors": q_anchor_priors,
        "anchor_link_mentions": q_anchor_link_mentions,
        "ppr": q_ppr,
        "predicate_clusters": q_predicate_clusters,
        "predicate_cardinality": q_predicate_cardinality,
        "functional_violations": q_functional_violations,
        "triple_fusion": q_triple_fusion,
        "triple_fusion_merge": q_triple_fusion_merge,
        "entity_types": q_entity_types,
        "schema_graph": q_schema_graph,
        "transe_embeddings": q_transe_embeddings,
        "transe_resume": q_transe_resume,
        "kg_completion_eval": q_kg_completion_eval,
        "entity_summary": q_entity_summary,
        "entity_cooccurrence": q_entity_cooccurrence,
        "literal_typing": q_literal_typing,
        "inverse_predicates": q_inverse_predicates,
        "predicate_subsumption": q_predicate_subsumption,
        "chain_rules": q_chain_rules,
        "chain_inference": q_chain_inference,
        "rule_chase": q_rule_chase,
        "edge_provenance": q_edge_provenance,
        "predicate_ranges": q_predicate_ranges,
        "predicate_schema": q_predicate_schema,
        "range_violations": q_range_violations,
        "fusion_apply": q_fusion_apply,
        "shortest_paths": q_shortest_paths,
        "weighted_paths": q_weighted_paths,
        "temporal_reach": q_temporal_reach,
        "kcore": q_kcore,
        "ktruss": q_ktruss,
        "node_features": q_node_features,
        "component_stats": q_component_stats,
        "graph_metrics": q_graph_metrics,
        "label_propagation": q_label_propagation,
        "communities": q_communities,
        "hyperball": q_hyperball,
        "modularity": q_modularity,
        "random_walks": q_random_walks,
        "skipgram_pairs": q_skipgram_pairs,
        "negative_samples": q_negative_samples,
        "iocs": q_iocs,
        "traces_listing": q_traces_listing,
        "traces_page": q_traces_page,
        "neighborhood": q_neighborhood,
        "related_traces": q_related_traces,
        "debris": q_debris,
        "sigma_filter": q_sigma_filter,
        "sigma_sequences": q_sigma_sequences,
        "sigma_correlation": q_sigma_correlation,
        "sigma_sysmon": q_sigma_sysmon,
        "sparql_graph": q_sparql_graph,
        "audio_metadata": q_audio_metadata,
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "dedup_exact": q_dedup_exact,
        "dedup_prefix": q_dedup_prefix,
        "ngram_jaccard": q_ngram_jaccard,
        "containment_pairs": q_containment,
        "decontaminate": q_decontaminate,
        "dup_spans": q_dup_spans,
        "remove_dup_spans": q_remove_dup_spans,
        "dedup_keeplist": q_dedup_keeplist,
        "curation_funnel": q_curation_funnel,
        "warc_roundtrip": q_warc_roundtrip,
        "link_graph": q_link_graph,
        "url_canonical": q_url_canonical,
        "url_blocklist": q_url_blocklist,
        "host_pagerank": q_host_pagerank,
        "minhash_candidates": q_minhash_candidates,
        "minhash_incremental": q_minhash_incremental,
        "dedup_incremental_exact": q_dedup_incremental_exact,
        "simhash_pairs": q_simhash_pairs,
        "embedding_topk": q_embedding_topk,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "lsh_topk": q_lsh_topk,
        "embedding_centroids": q_embedding_centroids,
        "dataset_split": q_dataset_split,
        "stratified_sample": q_stratified_sample,
        "weighted_sample": q_weighted_sample,
        "mixture_epochs": q_mixture_epochs,
        "drop_common_lines": q_drop_common_lines,
        "quality_classifier": q_quality_classifier,
        "pii_redact": q_pii_redact,
        "text_repetition": q_text_repetition,
        "corpus_vocab": q_corpus_vocab,
        "corpus_quantiles": q_corpus_quantiles,
        "bm25_scores": q_bm25,
        "inverted_index": q_inverted_index,
        "index_search": q_index_search,
        "corpus_rollup": q_corpus_rollup,
        "range_join": q_range_join,
        "sample_k_per_group": q_sample_k_per_group,
        "chunk_documents": q_chunk_documents,
        "domain_stats": q_domain_stats,
        "hll_distinct": q_hll_distinct,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "distant_supervision": q_distant_supervision,
        "text_normalize": q_text_normalize,
        "unigram_logprob": q_unigram_logprob,
        "bigram_logprob": q_bigram_lm,
        "bpe_merges": q_bpe_merges,
        "bpe_tokens": q_bpe_tokens,
        "sentences": q_sentences,
        "bigram_pmi": q_bigram_pmi,
        "doc_keyterms": q_doc_keyterms,
        "lang_confusion": q_lang_confusion,
        "split_leakage": q_split_leakage,
        "dedup_rate_by_source": q_dedup_rate_by_source,
        "adaptive_quality": q_adaptive_quality,
        "length_histogram": q_length_histogram,
        "domain_quota": q_domain_quota,
        "pack_sequences": q_pack_sequences,
        "events_asof": q_events_asof,
        "sessionize": q_sessionize,
        "zorder_key": q_zorder_key,
        "cluster_eval": q_cluster_eval,
        "hilbert_key": q_hilbert_key,
        "events_interval_join": q_events_interval_join,
        "events_windows": q_events_windows,
        "events_sessions": q_events_sessions,
        "events_funnel": q_events_funnel,
        "retention_cohorts": q_retention_cohorts,
        "tpch_q1": q_tpch_q1,
        "revenue_by_nation": q_revenue_by_nation,
        "orders_priority": q_orders_priority,
        "triples_extract": q_triples_extract,
        "pipeline_edges": q_pipeline_edges,
        "link_incremental": q_link_incremental,
        "media_features": q_media_features,
        "trace_sequences": q_trace_sequences,
        "unit_flush": q_unit_flush,
        "provenance_export": q_provenance_export,
        "drift_sequences": q_drift_sequences,
        "ivf_topk_fixed": q_ivf_topk_fixed,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

def _pages_triples_cte(n_pages: int = 10_000) -> str:
    """Reconstruct the synthetic pages corpus' expected triples in DuckDB:
    portable-hash sentence selection (corpus.page_sentence_idxs_sql) joined
    against the golden bank as VALUES, per-url first-instance dedup, step
    renumbering — the relational restatement of extract_triples over
    gen_pages (page-level parity pinned in tests/test_corpus.py)."""
    from sigraph_spark.corpus import page_sentence_idxs_sql
    from sigraph_spark.operators.triples import SENTENCE_BANK

    frag = page_sentence_idxs_sql("i", "j")

    def q(x: str) -> str:
        return "'" + x.replace("'", "''") + "'"

    vals = []
    idx = 0
    for s in SENTENCE_BANK:
        if not s.page_safe:
            continue
        idx += 1
        for t_ord, (a, v, o) in enumerate(s.expected):
            ctx = "'in memory'" if v == "inject" else "CAST(NULL AS VARCHAR)"
            vals.append(f"({idx}, {t_ord}, {q(a)}, {q(v)}, {q(o)}, {ctx})")
    values = ",\n    ".join(vals)
    return f"""
pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, {n_pages})),
sel AS (
  SELECT i, CAST(j AS BIGINT) AS j, {frag['sent_idx']} AS sent_idx
  FROM pg, UNNEST(range(0, {frag['n_sent']})) AS t(j)),
golden(sent_idx, t_ord, actor, verb, object, context) AS (VALUES
    {values}),
tri AS (
  SELECT i, j, t_ord, actor, verb, object, context
  FROM sel JOIN golden USING (sent_idx)),
firsts AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY i, actor, verb, object ORDER BY j, t_ord) AS rn
    FROM tri) WHERE rn = 1),
stepped AS (
  SELECT 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
         CAST(row_number() OVER (PARTITION BY i ORDER BY j, t_ord) AS INT) AS step,
         actor, verb, object, context, i
  FROM firsts)
"""


_EDGES_CTE = SEVENTS_CTE + """,
edges0 AS (
  SELECT CASE WHEN actor_type = 'READ_RECV' THEN node_id ELSE parent_id END AS src,
         action AS predicate,
         CASE WHEN actor_type = 'READ_RECV' THEN parent_id ELSE node_id END AS dst,
         timestamp AS start_time,
         CAST(weight AS BIGINT) AS weight,
         span_id
  FROM parsed WHERE has_parent
),
edges AS (
  SELECT src, predicate, dst, start_time, weight FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src, predicate, dst
      ORDER BY start_time DESC, span_id DESC) AS rn
    FROM edges0) WHERE rn = 1
),
containment AS (
  SELECT DISTINCT unit_id, trace_id, node_id FROM (
    SELECT unit_id, trace_id, node_id FROM parsed
    UNION ALL
    SELECT unit_id, trace_id, parent_id AS node_id FROM parsed WHERE has_parent)
),
node_incidence AS (
  SELECT node_id, label, span_id, trace_id, timestamp, process_name AS image
  FROM parsed
  UNION ALL
  SELECT parent_id AS node_id, 'PROCESS' AS label, span_id, trace_id, timestamp,
         CAST(NULL AS VARCHAR) AS image
  FROM parsed WHERE has_parent
),
nodes AS (
  SELECT node_id, label,
         arg_min(image, timestamp) AS image,
         list_sort(list(DISTINCT span_id)) AS related_span_ids,
         list_sort(list(DISTINCT trace_id)) AS related_trace_ids
  FROM node_incidence GROUP BY node_id, label
)
"""


def _lsh_bucket_sql(vec_expr: str, dim: int, bits: int, offset: int) -> str:
    """DuckDB expression for similarity.lsh_bucket: bit i of the bucket id
    is the sign of <vec, hyperplane_{offset+i}>; the planes are the same
    deterministic constants Spark embeds (crc32-derived, literal-exact via
    repr round-trip)."""
    from sigraph_spark.operators.similarity import _hyperplane

    terms = []
    for i in range(bits):
        plane = "[" + ", ".join(repr(w) for w in _hyperplane(dim, offset + i)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {plane}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _bpe_oracle_ctes(num_merges: int) -> str:
    """Unrolled BPE-training CTE chain for the DuckDB oracle: w0 = word
    counts in the double-separator delimited encoding, then per round k a
    pair-count (p{k}), a deterministic argmax (b{k}: cnt DESC, lhs, rhs)
    and the literal-replace merge (w{k}). ``AS MATERIALIZED`` is
    load-bearing: DuckDB inlines plain CTEs, which re-evaluates the
    chained rounds exponentially."""
    sep, sep2, end = "\x1f", "\x1f\x1f", "\x1e"
    ctes = [
        f"""w0 AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq,
             '{sep2}' || regexp_replace(word, '(.)', '\\1{sep2}', 'g')
               || '{end}{sep2}' AS delim
      FROM (SELECT unnest(string_split_regex(lower(coalesce(text, '')),
                                             '[^a-z0-9]+')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word)"""
    ]
    for k in range(1, num_merges + 1):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
      SELECT syms[i] AS lhs, syms[i+1] AS rhs, sum(freq) AS cnt
      FROM (SELECT unnest(range(1, len(syms))) AS i, syms, freq
            FROM (SELECT list_filter(string_split(delim, '{sep2}'),
                                     s -> s <> '') AS syms, freq
                  FROM w{k-1})
            WHERE len(syms) >= 2)
      GROUP BY lhs, rhs)"""
        )
        ctes.append(
            f"b{k} AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p{k}"
            " ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"""w{k} AS MATERIALIZED (
      SELECT word,
             replace(delim, '{sep}' || lhs || '{sep2}' || rhs || '{sep}',
                     '{sep}' || lhs || rhs || '{sep}') AS delim, freq
      FROM w{k-1} CROSS JOIN b{k})"""
        )
    return ",\n".join(ctes)


def _bpe_merges_oracle(num_merges: int) -> str:
    end = "\x1e"
    finals = [
        f"SELECT CAST({k} AS INT) AS rank, replace(lhs, '{end}', '</w>') AS lhs,"
        f" replace(rhs, '{end}', '</w>') AS rhs, CAST(cnt AS BIGINT) AS freq"
        f" FROM b{k}"
        for k in range(1, num_merges + 1)
    ]
    return "WITH " + _bpe_oracle_ctes(num_merges) + "\n" + "\nUNION ALL\n".join(finals)


def _bpe_tokens_oracle(num_merges: int) -> str:
    sep2 = "\x1f\x1f"
    return (
        "WITH " + _bpe_oracle_ctes(num_merges) + f""",
    occ AS MATERIALIZED (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split_regex(lower(coalesce(text, '')),
                                                 '[^a-z0-9]+')) AS word
        FROM documents)
      WHERE word <> ''),
    tok AS MATERIALIZED (
      SELECT occ.doc_id,
             list_filter(string_split(w{num_merges}.delim, '{sep2}'),
                         s -> s <> '') AS syms
      FROM occ JOIN w{num_merges} ON w{num_merges}.word = occ.word),
    agg1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                    CAST(sum(len(syms)) AS BIGINT) AS n_tokens
             FROM tok GROUP BY doc_id),
    toks AS (SELECT doc_id, unnest(syms) AS tk FROM tok),
    agg2 AS (SELECT doc_id, CAST(count(DISTINCT tk) AS BIGINT)
                    AS n_distinct_tokens
             FROM toks GROUP BY doc_id)
    SELECT agg1.doc_id, n_words, n_tokens, n_distinct_tokens
    FROM agg1 JOIN agg2 USING (doc_id)"""
    )


def oracle_sql() -> dict[str, str]:
    sq = {}
    sq["provenance_parse"] = (
        "WITH " + SEVENTS_CTE
        + " SELECT span_id, node_id, label, action, actor_type FROM parsed"
    )
    sq["provenance_errors"] = (
        "WITH " + SEVENTS_CTE
        + " SELECT span_id, 'Value must contain ''@''' AS error"
          " FROM sevents WHERE is_invalid"
    )
    sq["graph_nodes"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT node_id, label, coalesce(image, '') AS image,
               array_to_string(related_span_ids, ',') AS span_ids,
               array_to_string(related_trace_ids, ',') AS trace_ids
        FROM nodes
        """
    )
    sq["graph_edges"] = (
        "WITH " + _EDGES_CTE
        + " SELECT src, predicate, dst, start_time, weight FROM edges"
    )
    # --- triangles: canonical x<y<z enumeration — orientation-free
    # ground truth for the degree-oriented wedge count.
    sq["triangles"] = (
        "WITH " + _EDGES_CTE
        + """,
        co AS (
          SELECT DISTINCT a.node_id AS x, b.node_id AS y
          FROM containment a JOIN containment b USING (unit_id, trace_id)
          WHERE a.node_id < b.node_id),
        tri AS (
          SELECT e1.x AS a, e1.y AS b, e2.y AS c FROM co e1
          JOIN co e2 ON e2.x = e1.x AND e2.y > e1.y
          JOIN co e3 ON e3.x = e1.y AND e3.y = e2.y)
        SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        GROUP BY node
        """
    )
    # --- link prediction: wedge join restated relationally; AA weight
    # from the center's degree; anti-join removes existing edges.
    sq["link_prediction"] = (
        "WITH " + _EDGES_CTE
        + """,
        lp_und AS (
          SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
          FROM edges WHERE src <> dst),
        lp_adj AS (
          SELECT x AS n, y AS nb FROM lp_und
          UNION ALL SELECT y, x FROM lp_und),
        lp_deg AS (SELECT n, count(*) AS d FROM lp_adj GROUP BY n),
        lp_pair AS (
          SELECT a.nb AS u, b.nb AS v,
                 count(*) AS cn,
                 sum(1.0 / ln(d.d)) AS aa
          FROM lp_adj a
          JOIN lp_adj b ON a.n = b.n AND a.nb < b.nb
          JOIN lp_deg d ON d.n = a.n
          GROUP BY a.nb, b.nb
          HAVING count(*) >= 2),
        lp_new AS (
          SELECT p.u, p.v, p.cn, p.aa FROM lp_pair p
          WHERE NOT EXISTS (
            SELECT 1 FROM lp_und e WHERE e.x = p.u AND e.y = p.v))
        SELECT n.u, n.v, CAST(n.cn AS BIGINT) AS cn,
               round(n.aa, 6) AS adamic_adar,
               round(CAST(n.cn AS DOUBLE) / (du.d + dv.d - n.cn), 6)
                 AS jaccard
        FROM lp_new n
        JOIN lp_deg du ON du.n = n.u
        JOIN lp_deg dv ON dv.n = n.v
        """
    )
    # --- BGP: the conjunction restated as SQL self-joins (each pattern
    # one filtered alias of the edge relation, joined on shared vars).
    sq["bgp_match"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT DISTINCT e1.src AS a, e1.dst AS x, e2.dst AS y, e3.src AS b
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst AND e2.predicate = 'LAUNCH'
        JOIN edges e3 ON e3.dst = e2.dst AND e3.predicate = 'LOAD'
        WHERE e1.predicate = 'LAUNCH' AND e1.src <> e3.src
        """
    )
    sq["path_query"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        pp(a, b) AS (
          SELECT DISTINCT src, dst FROM edges WHERE predicate = 'LAUNCH'
          UNION
          SELECT p.a, e.dst FROM pp p
          JOIN edges e ON e.src = p.b AND e.predicate = 'LAUNCH')
        SELECT DISTINCT p.a AS p, e.dst AS ip
        FROM pp p JOIN edges e
          ON e.src = p.b AND e.predicate = 'CONNECT'
        """
    )
    sq["bgp_optional"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT DISTINCT e1.src AS p, e1.dst AS c, e2.dst AS ip
        FROM edges e1
        LEFT JOIN edges e2 ON e2.src = e1.dst AND e2.predicate = 'CONNECT'
        WHERE e1.predicate = 'LAUNCH'
        """
    )
    # --- anchor priors: the synthesized anchors restated arithmetically
    # (Spark runs the real regex + normalization; targets here are already
    # canonical so canonical_url is the identity).
    _anchor_ctes = """
    anchor_obs AS (
      SELECT 'entity ' || CAST(doc_id % 37 AS VARCHAR) AS anchor,
             'https://e' || CAST((doc_id % 37) % 5 AS VARCHAR)
               || '.wiki.org/page/'
               || CAST(CASE WHEN doc_id % 4 = 0 THEN doc_id % 37 + 100
                            ELSE doc_id % 37 END AS VARCHAR) AS target
      FROM documents
      UNION ALL
      SELECT 'topic ' || CAST(doc_id % 11 AS VARCHAR),
             'https://t.wiki.org/t/' || CAST(doc_id % 11 AS VARCHAR)
      FROM documents),
    anchor_counted AS (
      SELECT anchor, target, CAST(count(*) AS BIGINT) AS n
      FROM anchor_obs GROUP BY anchor, target),
    anchor_pri AS (
      SELECT anchor, target, n,
             CAST(sum(n) OVER (PARTITION BY anchor) AS BIGINT) AS total,
             round(n * 1.0 / sum(n) OVER (PARTITION BY anchor), 6) AS p,
             row_number() OVER (
               PARTITION BY anchor ORDER BY n DESC, target ASC) AS rank
      FROM anchor_counted)
    """
    sq["anchor_priors"] = (
        "WITH " + _anchor_ctes
        + " SELECT anchor, target, n, total, p, rank FROM anchor_pri"
    )
    sq["anchor_link_mentions"] = (
        "WITH " + _anchor_ctes
        + """
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 3 = 0 THEN 'Entity ' ELSE 'entity ' END
                 || CAST(d.doc_id % 41 AS VARCHAR) AS mention,
               t.target AS entity, t.p AS confidence
        FROM documents d
        LEFT JOIN (SELECT * FROM anchor_pri WHERE rank = 1) t
          ON t.anchor = 'entity ' || CAST(d.doc_id % 41 AS VARCHAR)
        """
    )
    # --- SCD2 history: gaps-and-islands over edges0 (weight is never NULL
    # here, so lag-IS-DISTINCT-FROM matches Spark's struct eqNullSafe
    # change flag on first rows too).
    _hist_ctes = """,
    h_marked AS (
      SELECT src, predicate, dst, start_time, weight, span_id,
             CASE WHEN lag(weight) OVER (
                    PARTITION BY src, predicate, dst
                    ORDER BY start_time, span_id)
                  IS DISTINCT FROM weight THEN 1 ELSE 0 END AS chg
      FROM edges0),
    h_isl AS (
      SELECT *, sum(chg) OVER (
               PARTITION BY src, predicate, dst
               ORDER BY start_time, span_id
               ROWS UNBOUNDED PRECEDING) AS isl
      FROM h_marked),
    h_runs AS (
      SELECT src, predicate, dst, isl,
             min(weight) AS weight,
             min(start_time) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM h_isl GROUP BY src, predicate, dst, isl),
    h_final AS (
      SELECT src, predicate, dst, weight, valid_from,
             lead(valid_from) OVER (
               PARTITION BY src, predicate, dst ORDER BY isl) AS valid_to,
             n_obs
      FROM h_runs)
    """
    sq["edge_history"] = (
        "WITH " + _EDGES_CTE + _hist_ctes
        + " SELECT src, predicate, dst, weight, valid_from, valid_to, n_obs"
          " FROM h_final"
    )
    sq["edge_asof"] = (
        "WITH " + _EDGES_CTE + _hist_ctes
        + """
        SELECT src, predicate, dst, weight, valid_from FROM h_final
        WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
          AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        """
    )
    # --- RDF: export lines restated as concat (this corpus's ids are
    # IRI-safe, so escaping is the identity — pytest pins hostile cases);
    # round-trip oracle is the edge relation itself.
    sq["rdf_export"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT '<http://kg.local/node/' || src || '> <http://kg.local/rel/'
               || predicate || '> <http://kg.local/node/' || dst || '> .' AS line
        FROM edges
        UNION ALL
        SELECT '<http://kg.local/edge/' || src || '/' || predicate || '/' || dst
               || '> <http://kg.local/prop/weight> "' || weight
               || '"^^<http://www.w3.org/2001/XMLSchema#long> .'
        FROM edges
        UNION ALL
        SELECT '<http://kg.local/edge/' || src || '/' || predicate || '/' || dst
               || '> <http://kg.local/prop/startTime> "'
               || strftime(start_time, '%Y-%m-%dT%H:%M:%S.%f')
               || '"^^<http://www.w3.org/2001/XMLSchema#dateTime> .'
        FROM edges
        """
    )
    sq["rdf_roundtrip"] = (
        "WITH " + _EDGES_CTE
        + " SELECT src, predicate, dst, start_time, weight FROM edges"
    )
    # --- RDF-star round trip: identical identity oracle — any drift in
    # the quoted-triple rendering, regex parse or term-key join breaks
    # the hash.
    sq["rdf_star_roundtrip"] = sq["rdf_roundtrip"]
    # --- Neo4j bulk-import CSV: every quoting rule restated — RFC-4180
    # quote doubling per field, ';'-joined arrays with per-element
    # escaping, NULL -> empty field, ISO microsecond timestamps.
    # --- GraphML: XML escape chain (& FIRST) restated byte-for-byte
    _X = (
        "replace(replace(replace(replace(coalesce({c}, ''),"
        " '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '\"', '&quot;')"
    )
    sq["graphml_nodes"] = (
        "WITH " + _EDGES_CTE
        + f"""
        SELECT '    <node id="' || {_X.format(c='node_id')}
            || '"><data key="label">' || {_X.format(c='label')}
            || '</data><data key="image">' || {_X.format(c='image')}
            || '</data></node>' AS line
        FROM nodes
        """
    )
    sq["graphml_edges"] = (
        "WITH " + _EDGES_CTE
        + f"""
        SELECT '    <edge source="' || {_X.format(c='src')}
            || '" target="' || {_X.format(c='dst')}
            || '"><data key="type">' || {_X.format(c='predicate')}
            || '</data><data key="weight">' || CAST(weight AS VARCHAR)
            || '</data><data key="start_time">'
            || strftime(start_time, '%Y-%m-%dT%H:%M:%S.%f')
            || '</data></edge>' AS line
        FROM edges
        """
    )
    sq["neo4j_nodes"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT '"' || replace(node_id, '"', '""')
            || '","' || replace(label, '"', '""')
            || '","' || coalesce(replace(image, '"', '""'), '')
            || '","' || array_to_string(
                 list_transform(related_span_ids, x -> replace(x, '"', '""')), ';')
            || '","' || array_to_string(
                 list_transform(related_trace_ids, x -> replace(x, '"', '""')), ';')
            || '"' AS line
        FROM nodes
        """
    )
    sq["neo4j_rels"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT '"' || replace(src, '"', '""')
            || '","' || replace(dst, '"', '""')
            || '","' || replace(predicate, '"', '""')
            || '","' || CAST(weight AS VARCHAR)
            || '","' || strftime(start_time, '%Y-%m-%dT%H:%M:%S.%f')
            || '"' AS line
        FROM edges
        """
    )
    # --- OpenSearch _bulk NDJSON: action line + SyslogModel source line,
    # byte-for-byte (fixed field order, JSON null for absent parent
    # fields, rule_ids as a JSON array, nested raw_data object).
    sq["opensearch_bulk"] = """
        WITH be AS (
          SELECT 'span-' || CAST(event_id AS VARCHAR) AS span_id,
                 'u-' || CAST(user_id % 5 AS VARCHAR) AS unit_id,
                 'tr-' || CAST(user_id % 25 AS VARCHAR) AS trace_id,
                 strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS tss,
                 CASE WHEN event_id % 20 = 0 THEN
                   '["rule-' || CAST(event_id % 4 AS VARCHAR)
                   || '","rule-' || CAST(event_id % 6 AS VARCHAR) || '"]'
                 ELSE 'null' END AS rules_json,
                 CASE WHEN event_id % 97 = 0 THEN 'invalid'
                 ELSE 'a@' || CAST(user_id % 40 AS VARCHAR) || '@'
                   || CASE event_type WHEN 'click' THEN 'FILE'
                        WHEN 'view' THEN 'REGISTRY' WHEN 'signup' THEN 'PROCESS'
                        WHEN 'purchase' THEN 'NETWORK' ELSE 'MODULE' END
                   || '@'
                   || CASE event_type WHEN 'click' THEN 'CREATE'
                        WHEN 'view' THEN 'REG_SET' WHEN 'signup' THEN 'LAUNCH'
                        WHEN 'purchase' THEN 'CONNECT' ELSE 'LOAD' END
                   || '@'
                   || CASE event_id % 3 WHEN 0 THEN 'READ_RECV'
                        WHEN 1 THEN 'WRITE_SEND' ELSE 'NOT_ACTOR' END
                 END AS sysprov,
                 CASE WHEN event_id % 5 <> 0 THEN
                   '"proc_' || CAST(user_id % 7 AS VARCHAR) || '.exe"'
                 ELSE 'null' END AS pname_json,
                 CASE WHEN event_id % 5 <> 0 THEN
                   '"span-p-' || CAST(user_id % 7 AS VARCHAR) || '"'
                 ELSE 'null' END AS pspan_json,
                 CAST(event_id % 9 + 1 AS VARCHAR) AS w
          FROM events)
        SELECT '{"index":{"_index":"syslog","_id":"' || span_id || '"}}'
            || chr(10)
            || '{"unit_id":"' || unit_id || '","span_id":"' || span_id
            || '","trace_id":"' || trace_id || '","timestamp":"' || tss
            || '","tactics":null,"rule_ids":' || rules_json
            || ',"raw_data":{"system_provenance":"' || sysprov
            || '","process_name":' || pname_json
            || ',"parent_span_id":' || pspan_json
            || ',"weight":' || w || '}}' AS line
        FROM be
        """
    # --- redirect resolution: the oracle performs the NAIVE step-by-step
    # walk (recursive CTE, one row per step) with the same semantics the
    # doubling implementation guarantees — stop at a terminal, cap at 16
    # steps, non-terminating walks resolve to min of visited successors.
    sq["redirect_resolution"] = """
        WITH RECURSIVE al AS (
          SELECT 'https://example.org/report/' || CAST(i AS VARCHAR) AS src,
                 'https://example.org/report/' || CAST(i - 1 AS VARCHAR) AS dst
          FROM range(0, 10000) t(i) WHERE i % 13 <> 0
          UNION ALL
          SELECT 'https://example.org/report/' || CAST(i AS VARCHAR),
                 'https://example.org/report/' || CAST(i + 12 AS VARCHAR)
          FROM range(0, 10000) t(i) WHERE i % 91 = 0
          UNION ALL
          SELECT 'https://example.org/report/' || CAST(i AS VARCHAR),
                 'https://example.org/report/' || CAST(i + 1 AS VARCHAR)
          FROM range(0, 10000) t(i) WHERE i % 17 = 0 AND i % 13 <> 0),
        nxt0 AS (SELECT src AS x, min(dst) AS y FROM al GROUP BY src),
        nxt AS (
          SELECT n.x, n.y, d.x IS NULL AS term
          FROM nxt0 n LEFT JOIN nxt0 d ON n.y = d.x),
        walk(x, cur, m, step, done) AS (
          SELECT x, y, y, 1, term FROM nxt
          UNION ALL
          SELECT w.x, n.y, least(w.m, n.y), w.step + 1, n.term
          FROM walk w JOIN nxt n ON n.x = w.cur
          WHERE NOT w.done AND w.step < 16),
        fin AS (
          SELECT x, cur, m, done,
                 row_number() OVER (PARTITION BY x ORDER BY step DESC) AS rn
          FROM walk)
        SELECT x AS url, CASE WHEN done THEN cur ELSE m END AS resolved
        FROM fin WHERE rn = 1
        """
    # --- web-table extraction: the oracle NEVER parses html — it emits
    # the planted facts arithmetically (subject blanks, ragged os cells,
    # the kv table on 4-multiples), so the Spark side's regex/explode/
    # header-zip chain is verified end-to-end. Shared with the
    # multi-extractor fusion gate (both build on the caller's `pg`).
    _PG_CTE = "pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000))"
    _TT_CTES = """
        tt_rk AS (
          SELECT i, CAST(k AS BIGINT) AS k
          FROM pg, UNNEST(range(0, 3)) t(k) WHERE k <= i % 3),
        tt_base AS (
          SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                 CASE WHEN (i * 3 + k) % 31 = 0 THEN NULL
                      ELSE 'srv-' || CAST((i * 3 + k) % 97 AS VARCHAR) END AS subj,
                 CAST((i + k) % 16 AS VARCHAR) AS cpu,
                 CASE (i + k) % 3 WHEN 0 THEN 'linux' WHEN 1 THEN 'windows' END AS os,
                 ((i + k) % 5 <> 0) AS has_os
          FROM tt_rk),
        tt AS (
          SELECT i, url, CAST(0 AS INT) AS table_idx, subj,
                 'cpu' AS predicate, cpu AS obj
          FROM tt_base WHERE subj IS NOT NULL
          UNION ALL
          SELECT i, url, CAST(0 AS INT), subj, 'os', os
          FROM tt_base WHERE subj IS NOT NULL AND has_os AND os IS NOT NULL
          UNION ALL
          SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR),
                 CAST(1 AS INT), 'owner', 'value',
                 'team-' || CAST(i % 11 AS VARCHAR)
          FROM pg WHERE i % 4 = 0)"""
    sq["table_triples"] = (
        "WITH " + _PG_CTE + "," + _TT_CTES
        + " SELECT url, table_idx, subj, predicate, obj FROM tt"
    )
    # --- JSON-LD structured-data extraction: like table_triples, the
    # oracle NEVER parses JSON — it enumerates the planted entities
    # arithmetically (malformed-block index shift on 7-multiples, @type
    # array on evens, array-block noise element at elem 1, @graph City
    # with its numeric literal), pinning the whole regex + from_json
    # raw-capture chain of operators/jsonld.py.
    sq["jsonld_triples"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 7 = 0 THEN 1 ELSE 0 END AS m7
              FROM pg),
        prod AS (SELECT i, url, m7 AS b,
                        url || '#ld' || CAST(m7 AS VARCHAR) || '-0' AS subj
                 FROM u),
        arr AS (SELECT i, url, m7 + 1 AS b,
                       'person:p' || CAST(i % 41 AS VARCHAR) AS psubj,
                       url || '#ld' || CAST(m7 + 1 AS VARCHAR) || '-2' AS osubj,
                       'org:o' || CAST(i % 11 AS VARCHAR) AS org
                FROM u WHERE i % 3 = 0),
        gr AS (SELECT i, url,
                      m7 + 1 + CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS b,
                      'city:c' || CAST(i % 13 AS VARCHAR) AS csubj
               FROM u WHERE i % 5 = 0),
        t AS (
          SELECT url, b, 0 AS e, subj, 'rdf:type' AS predicate,
                 'Product' AS obj, 'type' AS kind FROM prod
          UNION ALL SELECT url, b, 0, subj, 'rdf:type', 'Thing', 'type'
          FROM prod WHERE i % 2 = 0
          UNION ALL SELECT url, b, 0, subj, 'name',
                 'widget-' || CAST(i % 53 AS VARCHAR), 'literal' FROM prod
          UNION ALL SELECT url, b, 0, subj, 'sku',
                 'SKU-' || CAST(i AS VARCHAR), 'literal' FROM prod
          UNION ALL SELECT url, b, 0, subj, 'offers',
                 'offer-' || CAST(i % 5 AS VARCHAR), 'entity' FROM prod
          UNION ALL SELECT url, b, 0, subj, 'sameAs',
                 'https://a.example/w' || CAST(i % 53 AS VARCHAR), 'literal'
          FROM prod
          UNION ALL SELECT url, b, 0, subj, 'sameAs',
                 'https://b.example/w' || CAST(i % 53 AS VARCHAR), 'literal'
          FROM prod
          UNION ALL SELECT url, b, 0, psubj, 'rdf:type', 'Person', 'type' FROM arr
          UNION ALL SELECT url, b, 0, psubj, 'name',
                 'Person ' || CAST(i % 41 AS VARCHAR), 'literal' FROM arr
          UNION ALL SELECT url, b, 0, psubj, 'worksFor', org, 'entity' FROM arr
          UNION ALL SELECT url, b, 2, osubj, 'rdf:type', 'Organization', 'type'
          FROM arr
          UNION ALL SELECT url, b, 2, osubj, 'name',
                 'Org ' || CAST(i % 11 AS VARCHAR), 'literal' FROM arr
          UNION ALL SELECT url, b, 0, csubj, 'rdf:type', 'City', 'type' FROM gr
          UNION ALL SELECT url, b, 0, csubj, 'name',
                 'City ' || CAST(i % 13 AS VARCHAR), 'literal' FROM gr
          UNION ALL SELECT url, b, 0, csubj, 'population',
                 CAST(i + 1000 AS VARCHAR), 'literal' FROM gr)
        SELECT url, CAST(b AS INT) AS block_idx, CAST(e AS INT) AS elem_idx,
               subj, predicate, obj, kind
        FROM t
        """
    # --- meta/OpenGraph tags: meta_idx counts ALL matched tags in document
    # order BEFORE the prefix filter (viewport consumes an index, the
    # even-page og:type shifts everything after it), empty content drops.
    sq["meta_triples"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e
              FROM pg),
        t AS (
          SELECT url, 0 AS meta_idx, 'og:title' AS predicate,
                 'Report ' || CAST(i AS VARCHAR) AS obj FROM u
          UNION ALL SELECT url, 1, 'og:type', 'article' FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, 1 + e, 'twitter:card', 'summary' FROM u
          UNION ALL SELECT url, 4 + e, 'description',
                 'page ' || CAST(i AS VARCHAR) || ' desc' FROM u)
        SELECT url, CAST(meta_idx AS INT) AS meta_idx, predicate, obj FROM t
        """
    # --- microdata: arithmetic enumeration of the planted tags. tag_idx
    # counts ALL itemscope/itemprop tags in document order (the orphan on
    # i%3 pages consumes 0 and then drops; the even-page seller shifts the
    # offer block); scope_idx is the running itemscope count; subjects are
    # itemid else url#md<scope_idx>; content beats href (seller row).
    sq["microdata_triples"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS o,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e,
                     'prod:P' || CAST(i % 47 AS VARCHAR) AS p,
                     CAST(i % 53 AS VARCHAR) AS w
              FROM pg),
        t AS (
          SELECT url, o + 0 AS tag_idx, 0 AS scope_idx, p AS subj,
                 'rdf:type' AS predicate, 'Product' AS obj, 'type' AS kind
          FROM u
          UNION ALL SELECT url, o + 1, 0, p, 'name', 'Widget ' || w, 'literal'
          FROM u
          UNION ALL SELECT url, o + 2, 0, p, 'sku',
                 'SKU-' || CAST(i AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 3, 0, p, 'url',
                 'https://shop.example/w' || w, 'literal' FROM u
          UNION ALL SELECT url, o + 4, 0, p, 'image',
                 'https://img.example/w' || w || '.png', 'literal' FROM u
          UNION ALL SELECT url, o + 5, 0, p, 'brand',
                 'Brand' || CAST(i % 19 AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 5, 0, p, 'alternateName',
                 'Brand' || CAST(i % 19 AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 7, 0, p, 'seller',
                 'Seller' || CAST(i % 7 AS VARCHAR), 'literal'
          FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, o + 7 + e, 1, p, 'offers',
                 url || '#md1', 'entity' FROM u
          UNION ALL SELECT url, o + 7 + e, 1, url || '#md1', 'rdf:type',
                 'Offer', 'type' FROM u
          UNION ALL SELECT url, o + 8 + e, 1, url || '#md1', 'validFrom',
                 '2026-01-0' || CAST(i % 9 + 1 AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 9 + e, 1, url || '#md1', 'price',
                 CAST(i % 997 + 1 AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 11 + e, 2, url || '#md2', 'note',
                 'note ' || CAST(i % 13 AS VARCHAR), 'literal'
          FROM u WHERE i % 5 = 0)
        SELECT url, CAST(tag_idx AS INT) AS tag_idx,
               CAST(scope_idx AS INT) AS scope_idx, subj, predicate, obj, kind
        FROM t
        """
    # --- RDFa Lite: same arithmetic-enumeration device as microdata.
    # tag_idx counts ALL typeof/property tags in document order (orphan on
    # i%3 pages consumes 0 then drops; the even-page award shifts the
    # worksFor block); subjects are resource else about else url#rd<n>;
    # the i%5 section's TWO typeof tokens each emit one rdf:type row.
    sq["rdfa_triples"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS o,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e,
                     '#p' || CAST(i % 47 AS VARCHAR) AS p,
                     CAST(i % 53 AS VARCHAR) AS w
              FROM pg),
        t AS (
          SELECT url, o + 0 AS tag_idx, 0 AS scope_idx, p AS subj,
                 'rdf:type' AS predicate, 'Person' AS obj, 'type' AS kind
          FROM u
          UNION ALL SELECT url, o + 1, 0, p, 'name', 'Alice ' || w, 'literal'
          FROM u
          UNION ALL SELECT url, o + 2, 0, p, 'jobTitle',
                 'Job-' || CAST(i AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 3, 0, p, 'url',
                 'https://people.example/w' || w, 'literal' FROM u
          UNION ALL SELECT url, o + 4, 0, p, 'image',
                 'https://img.example/p' || w || '.png', 'literal' FROM u
          UNION ALL SELECT url, o + 5, 0, p, 'givenName',
                 'Name' || CAST(i % 19 AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 5, 0, p, 'additionalName',
                 'Name' || CAST(i % 19 AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 7, 0, p, 'award',
                 'Award' || CAST(i % 7 AS VARCHAR), 'literal'
          FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, o + 7 + e, 1, p, 'worksFor',
                 url || '#rd1', 'entity' FROM u
          UNION ALL SELECT url, o + 7 + e, 1, url || '#rd1', 'rdf:type',
                 'Organization', 'type' FROM u
          UNION ALL SELECT url, o + 8 + e, 1, url || '#rd1', 'foundingDate',
                 '2026-01-0' || CAST(i % 9 + 1 AS VARCHAR), 'literal' FROM u
          UNION ALL SELECT url, o + 9 + e, 1, url || '#rd1',
                 'numberOfEmployees', CAST(i % 997 + 1 AS VARCHAR), 'literal'
          FROM u
          UNION ALL SELECT url, o + 10 + e, 2, '#ev' || CAST(i % 13 AS VARCHAR),
                 'rdf:type', 'Event', 'type' FROM u WHERE i % 5 = 0
          UNION ALL SELECT url, o + 10 + e, 2, '#ev' || CAST(i % 13 AS VARCHAR),
                 'rdf:type', 'Meetup', 'type' FROM u WHERE i % 5 = 0
          UNION ALL SELECT url, o + 11 + e, 2, '#ev' || CAST(i % 13 AS VARCHAR),
                 'note', 'note ' || CAST(i % 13 AS VARCHAR), 'literal'
          FROM u WHERE i % 5 = 0)
        SELECT url, CAST(tag_idx AS INT) AS tag_idx,
               CAST(scope_idx AS INT) AS scope_idx, subj, predicate, obj, kind
        FROM t
        """
    # --- HTML lists: arithmetic enumeration of the planted list rows.
    # list_idx counts ALL list blocks in document order (orphan on i%3
    # pages consumes 0; the even-page dc <ol> and the i%5 empty <ul>
    # shift later indices); empty items consume item_idx; solo inherits
    # the CURRENT heading; the i%7 empty <h4> resets context to ''.
    _LIST_U = """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS o,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e
              FROM pg)
    """
    sq["list_items"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + _LIST_U
        + """,
        t AS (
          SELECT url, 0 AS list_idx, 0 AS item_idx, '' AS heading,
                 'orphan-' || CAST(i % 5 AS VARCHAR) AS item
          FROM u WHERE i % 3 = 0
          UNION ALL SELECT url, 0, 1, '', 'pre' FROM u WHERE i % 3 = 0
          UNION ALL SELECT url, o, 0, 'Operating Systems',
                 'os-' || CAST(i % 13 AS VARCHAR) FROM u
          UNION ALL SELECT url, o, 2, 'Operating Systems',
                 'os-' || CAST((i + 1) % 13 AS VARCHAR) FROM u
          UNION ALL SELECT url, o + 1, 0, 'List of Data Centers',
                 'dc-' || CAST(i % 7 AS VARCHAR) FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, o + 1, 1, 'List of Data Centers',
                 'dc-' || CAST((i + 3) % 7 AS VARCHAR) FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, o + 2 + e, 0,
                 CASE WHEN e = 1 THEN 'List of Data Centers'
                      ELSE 'Operating Systems' END,
                 'solo-' || CAST(i % 3 AS VARCHAR) FROM u WHERE i % 5 = 0
          UNION ALL SELECT url,
                 o + 1 + e + CASE WHEN i % 5 = 0 THEN 2 ELSE 0 END, 0, '',
                 'lost-' || CAST(i % 4 AS VARCHAR) FROM u WHERE i % 7 = 0
          UNION ALL SELECT url,
                 o + 1 + e + CASE WHEN i % 5 = 0 THEN 2 ELSE 0 END, 1, '',
                 'lost2' FROM u WHERE i % 7 = 0)
        SELECT url, CAST(list_idx AS INT) AS list_idx,
               CAST(item_idx AS INT) AS item_idx, heading, item
        FROM t
        """
    )
    # --- list memberships: only the 2-item headed lists vote (orphan and
    # lost have heading ''; solo is a singleton); class = lowercase with
    # the "list of " prefix stripped.
    sq["list_memberships"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + _LIST_U
        + """,
        cl AS (
          SELECT 'os-' || CAST(i % 13 AS VARCHAR) AS item,
                 'operating systems' AS class FROM u
          UNION ALL SELECT 'os-' || CAST((i + 1) % 13 AS VARCHAR),
                 'operating systems' FROM u
          UNION ALL SELECT 'dc-' || CAST(i % 7 AS VARCHAR), 'data centers'
          FROM u WHERE i % 2 = 0
          UNION ALL SELECT 'dc-' || CAST((i + 3) % 7 AS VARCHAR),
                 'data centers' FROM u WHERE i % 2 = 0)
        SELECT item, class, CAST(count(*) AS BIGINT) AS n_lists
        FROM cl GROUP BY item, class
        """
    )
    # --- definition lists: arithmetic enumeration of the planted facts.
    # dl_idx counts ALL <dl> blocks in document order (the unheaded
    # orphan on i%3 pages consumes 0 then drops; the even-page rack dl
    # shifts the i%5 power dl, which inherits the CURRENT heading).
    sq["dl_facts"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS o,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e,
                     'Server S-' || CAST(i % 47 AS VARCHAR) AS srv,
                     'Rack R-' || CAST(i % 23 AS VARCHAR) AS rck
              FROM pg),
        t AS (
          SELECT url, o AS dl_idx, 0 AS pair_idx, srv AS subject,
                 'CPU' AS key, CAST(i % 64 AS VARCHAR) || '-core' AS value
          FROM u
          UNION ALL SELECT url, o, 1, srv, 'RAM',
                 CAST(i % 512 AS VARCHAR) || ' GiB' FROM u
          UNION ALL SELECT url, o + 1, 0, rck, 'zone',
                 'z-' || CAST(i % 7 AS VARCHAR) FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, o + 1 + e, 0,
                 CASE WHEN e = 1 THEN rck ELSE srv END, 'power',
                 'p-' || CAST(i % 9 AS VARCHAR) FROM u WHERE i % 5 = 0)
        SELECT url, CAST(dl_idx AS INT) AS dl_idx,
               CAST(pair_idx AS INT) AS pair_idx, subject, key, value
        FROM t
        """
    )
    # --- fused one-scan structured extraction: 11 claims per page,
    # one per planted channel fact (the table row repeats the JSON-LD
    # os fact under the 'table' source). Arithmetic enumeration — the
    # oracle never parses html, so the hash pins the whole seven-kernel
    # single-pass composition.
    sq["fused_struct_claims"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     'srv-' || CAST(i AS VARCHAR) AS srv,
                     'os-' || CAST(i % 5 AS VARCHAR) AS os,
                     'r-' || CAST(i % 23 AS VARCHAR) AS rack,
                     'r-' || CAST((i + 1) % 23 AS VARCHAR) AS rack2
              FROM pg),
        t AS (
          SELECT url, srv AS subject, 'rdf:type' AS predicate,
                 'Server' AS object, 'jsonld' AS source FROM u
          UNION ALL SELECT url, srv, 'os', os, 'jsonld' FROM u
          UNION ALL SELECT url, url, 'og:title',
                 'Host ' || CAST(i AS VARCHAR), 'meta' FROM u
          UNION ALL SELECT url, srv, 'rdf:type', 'Server', 'microdata' FROM u
          UNION ALL SELECT url, srv, 'rack', rack, 'microdata' FROM u
          UNION ALL SELECT url, srv, 'rdf:type', 'Server', 'rdfa' FROM u
          UNION ALL SELECT url, srv, 'owner',
                 'team-' || CAST(i % 11 AS VARCHAR), 'rdfa' FROM u
          UNION ALL SELECT url, rack, 'member_of', 'racks', 'list' FROM u
          UNION ALL SELECT url, rack2, 'member_of', 'racks', 'list' FROM u
          UNION ALL SELECT url, srv, 'dc',
                 'dc-' || CAST(i % 7 AS VARCHAR), 'dl' FROM u
          UNION ALL SELECT url, srv, 'os', os, 'table' FROM u)
        SELECT url, subject, predicate, object, source FROM t
        """
    )
    # --- audio container metadata: arithmetic enumeration (PCM duration
    # = n/rate; ADPCM pads to full 505-sample blocks, byte_rate
    # 8000*256//505 -> 32 kbps; mp3 frame = 26122us at 44100/Layer III).
    sq["audio_metadata"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 300)),
        pg2 AS (SELECT CAST(range AS BIGINT) AS i FROM range(300, 400)),
        t AS (
          SELECT 'au-' || CAST(i AS VARCHAR) AS media_id,
                 'pcm16' AS format, 8000 AS sample_rate, 1 AS channels,
                 128 AS bitrate_kbps, 1000 + i AS n_frames,
                 (1000 + i) * 1000 // 8000 AS duration_ms
          FROM pg WHERE i % 3 = 0
          UNION ALL
          SELECT 'au-' || CAST(i AS VARCHAR), 'ima-adpcm', 8000, 1, 32,
                 ((1000 + i + 504) // 505) * 505,
                 (((1000 + i + 504) // 505) * 505) * 1000 // 8000
          FROM pg WHERE i % 3 = 1
          UNION ALL
          SELECT 'au-' || CAST(i AS VARCHAR), 'mpeg1-layer3', 44100, 2, 128,
                 i % 20 + 1, ((i % 20 + 1) * 26122) // 1000
          FROM pg WHERE i % 3 = 2
          UNION ALL
          SELECT 'au-' || CAST(i AS VARCHAR), 'flac', 8000 * (i % 3 + 1),
                 (i % 6) // 2 + 1, NULL, NULL,
                 (1000 * (i % 50 + 1)) * 1000 // (8000 * (i % 3 + 1))
          FROM pg2 WHERE i % 2 = 0
          UNION ALL
          SELECT 'au-' || CAST(i AS VARCHAR), 'ogg-vorbis',
                 CASE WHEN i % 8 = 1 THEN 44100 ELSE 48000 END,
                 i % 3 + 1, 64 + i % 128, NULL,
                 (4800 * (i % 30 + 1)) * 1000
                   // CASE WHEN i % 8 = 1 THEN 44100 ELSE 48000 END
          FROM pg2 WHERE i % 4 = 1
          UNION ALL
          SELECT 'au-' || CAST(i AS VARCHAR), 'ogg-opus', 48000,
                 (i // 2) % 2 + 1, NULL, NULL,
                 (4800 * (i % 30 + 1)) * 1000 // 48000
          FROM pg2 WHERE i % 4 = 3)
        SELECT media_id, format, CAST(sample_rate AS INT) AS sample_rate,
               CAST(channels AS INT) AS channels,
               CAST(bitrate_kbps AS INT) AS bitrate_kbps,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(duration_ms AS BIGINT) AS duration_ms
        FROM t
    """
    # --- video container metadata: pure arithmetic enumeration of the
    # built ISO-BMFF and Matroska/EBML skeletons; the Spark side does
    # the real box / vint walk per payload. Matroska duration_ms =
    # Duration ticks x TimestampScale(ns) / 10^6, exact here because
    # the built tick counts are float32-exact integers.
    sq["video_metadata"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 240))
        SELECT 'vid-' || CAST(i AS VARCHAR) AS media_id,
          CASE WHEN i % 13 = 0 THEN 'unknown'
               WHEN i % 5 = 2 THEN
                 CASE WHEN i % 2 = 0 THEN 'matroska-webm'
                      ELSE 'matroska-matroska' END
               ELSE 'isobmff-isom' END AS format,
          CAST(CASE WHEN i % 13 = 0 THEN NULL
               WHEN i % 5 = 2 THEN 1000 * (i % 50 + 1)
                    * (CASE WHEN i % 4 = 0 THEN 2 ELSE 1 END)
               ELSE (1000 * (i % 50 + 1) * 1000)
                    // (CASE WHEN i % 2 = 0 THEN 1000 ELSE 600 END)
               END AS BIGINT) AS duration_ms,
          CAST(CASE WHEN i % 13 = 0 THEN NULL
               WHEN i % 2 = 0 THEN 2 ELSE 1 END AS INT) AS n_tracks,
          CAST(CASE WHEN i % 13 = 0 THEN NULL
               WHEN i % 5 = 2 THEN 256 + 32 * (i % 7)
               ELSE 320 + 16 * (i % 5) END AS INT) AS width,
          CAST(CASE WHEN i % 13 = 0 THEN NULL
               WHEN i % 5 = 2 THEN 144 + 16 * (i % 4)
               ELSE 240 + 16 * (i % 3) END AS INT) AS height,
          CASE WHEN i % 13 = 0 THEN NULL
               WHEN i % 5 = 2 THEN
                 CASE WHEN i % 3 = 0 THEN 'V_VP9' ELSE 'V_AV1' END
               WHEN i % 3 = 0 THEN 'hev1' ELSE 'avc1' END AS video_codec,
          CASE WHEN i % 13 = 0 OR i % 2 <> 0 THEN NULL
               WHEN i % 5 = 2 THEN 'A_OPUS'
               ELSE 'mp4a' END AS audio_codec
        FROM pg
    """
    # --- JPEG codec cross-check: dimensions + identity outcomes are
    # fully determined by the id arithmetic; the Spark side does the
    # real three-codec encode/decode per image.
    sq["jpeg_codecs"] = """
        WITH pg AS (SELECT CAST(range AS INT) AS i FROM range(0, 36))
        SELECT i AS img_id,
               CAST(8 + (i % 4) * 8 + (i % 5) AS INT) AS width,
               CAST(8 + (i % 3) * 8 + (i % 7) AS INT) AS height,
               TRUE AS prog_ok,
               TRUE AS arith_ok,
               TRUE AS parith_ok
        FROM pg
    """
    # --- FLAC lossless round-trip: rates/shapes are pure id
    # arithmetic; the Spark side does the real encode+decode with CRC
    # and MD5 self-checks armed, so bit_ok=TRUE is load-bearing.
    sq["flac_roundtrip"] = """
        WITH pg AS (SELECT CAST(range AS INT) AS i FROM range(0, 32))
        SELECT i AS aud_id,
               CAST(CASE WHEN i % 4 = 0 THEN 8000
                         WHEN i % 4 = 1 THEN 44100
                         WHEN i % 4 = 2 THEN 48000
                         ELSE 32000 END AS INT) AS rate,
               CAST(CASE WHEN i % 2 = 0 THEN 1 ELSE 2 END AS INT)
                 AS channels,
               CAST(CASE WHEN i % 3 = 0 THEN 8
                         WHEN i % 3 = 1 THEN 16
                         ELSE 24 END AS INT) AS bits,
               CAST(500 + 137 * (i % 5) AS INT) AS n_samples,
               TRUE AS bit_ok
        FROM pg
    """
    # --- Ogg-FLAC round-trip: rates/shapes/durations are pure id
    # arithmetic; the Spark side runs the real mapping-v1.0 encode +
    # decode with Ogg page CRCs, frame CRCs, MD5, and the EOS-granule
    # cross-check armed, so bit_ok=TRUE is load-bearing.
    sq["oggflac_roundtrip"] = """
        WITH pg AS (SELECT CAST(range AS INT) AS i FROM range(0, 24)),
        f AS (
          SELECT i,
                 CASE WHEN i % 4 = 0 THEN 8000
                      WHEN i % 4 = 1 THEN 44100
                      WHEN i % 4 = 2 THEN 48000
                      ELSE 32000 END AS rate,
                 600 + 151 * (i % 5) AS n
          FROM pg)
        SELECT i AS aud_id,
               CAST(rate AS INT) AS rate,
               CAST(CASE WHEN i % 2 = 0 THEN 1 ELSE 2 END AS INT)
                 AS channels,
               CAST(CASE WHEN i % 3 = 0 THEN 8
                         WHEN i % 3 = 1 THEN 16
                         ELSE 24 END AS INT) AS bits,
               CAST(n AS INT) AS n_samples,
               CAST(n * 1000 // rate AS INT) AS duration_ms,
               CAST(CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS INT)
                 AS n_tags,
               TRUE AS bit_ok
        FROM f
    """
    # --- AVI container metadata: every header field is id arithmetic;
    # the Spark side does the real RIFF walk (avih/strh/strf).
    sq["avi_metadata"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 40))
        SELECT 'avi-' || CAST(i AS VARCHAR) AS media_id,
               'avi' AS format,
               CAST((i % 7 + 1) * 1000 *
                    (CASE WHEN i % 5 = 4 THEN 1001 ELSE 1 END) //
                    (CASE WHEN i % 5 = 4 THEN 30000
                          WHEN i % 4 = 0 THEN 24
                          WHEN i % 4 = 1 THEN 25
                          WHEN i % 4 = 2 THEN 30
                          ELSE 60 END) AS BIGINT) AS duration_ms,
               CAST(1 AS INT) AS n_tracks,
               CAST(32 + i AS INT) AS width,
               CAST(24 + i % 10 AS INT) AS height,
               CASE WHEN i % 2 = 0 THEN 'rawvideo' ELSE 'mjpg' END
                 AS video_codec,
               CAST(NULL AS VARCHAR) AS audio_codec
        FROM pg
    """
    # --- video frame decode: raw-stream pixel sums are pure id
    # arithmetic (solid frames, sum_c = w*h*color — this checks the
    # actual decoded pixels, row flip + BGR swap included); MJPG rows
    # are pinned by pix_ok bit-identity and carry NULL sums.
    sq["video_frames"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 24)),
        fr AS (SELECT CAST(range AS BIGINT) AS j FROM range(0, 3)),
        xs AS (
          SELECT i, j FROM pg CROSS JOIN fr WHERE j < 1 + i % 3
        )
        SELECT 'vid-' || CAST(i AS VARCHAR) AS media_id,
               CAST(j AS INT) AS frame_idx,
               CAST(16 + i % 5 AS INT) AS width,
               CAST(12 + i % 4 AS INT) AS height,
               CASE WHEN i % 2 = 0 THEN 'rawvideo' ELSE 'mjpg' END AS codec,
               CASE WHEN i % 2 = 0 THEN
                 CAST((16 + i % 5) * (12 + i % 4) * ((i*7 + j*13) % 256)
                      AS BIGINT) END AS sum_r,
               CASE WHEN i % 2 = 0 THEN
                 CAST((16 + i % 5) * (12 + i % 4) * ((i*11 + j*3) % 256)
                      AS BIGINT) END AS sum_g,
               CASE WHEN i % 2 = 0 THEN
                 CAST((16 + i % 5) * (12 + i % 4) * ((i*5 + j*17) % 256)
                      AS BIGINT) END AS sum_b,
               TRUE AS pix_ok
        FROM xs
    """
    # --- mp4 sample extraction: decodable ids are those neither %7==0
    # (garbage) nor %5==0 (avc1 non-goal); frames/dims are id
    # arithmetic, pixel sums pinned Spark-side via pix_ok.
    sq["mp4_frames"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 20)),
        fr AS (SELECT CAST(range AS BIGINT) AS j FROM range(0, 3)),
        bad AS (
          SELECT 'vid-' || CAST(i AS VARCHAR) AS media_id,
                 CAST(NULL AS INT) AS frame_idx,
                 CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
                 'unknown' AS codec, CAST(NULL AS BOOLEAN) AS pix_ok
          FROM pg WHERE i % 7 = 0 OR i % 5 = 0),
        good AS (
          SELECT 'vid-' || CAST(i AS VARCHAR) AS media_id,
                 CAST(j AS INT) AS frame_idx,
                 CAST(16 + i % 5 AS INT) AS width,
                 CAST(12 + i % 4 AS INT) AS height,
                 'jpeg' AS codec, TRUE AS pix_ok
          FROM pg CROSS JOIN fr
          WHERE i % 7 <> 0 AND i % 5 <> 0 AND j < 1 + i % 3)
        SELECT * FROM bad UNION ALL SELECT * FROM good
    """
    # --- image header metadata: the seven payload kinds and all their
    # fields are pure id arithmetic; the Spark side does the real
    # header walks (JPEG SOF scan, PNG IHDR, GIF descriptor walk, BMP,
    # WebP variants, TIFF IFD).
    sq["image_metadata"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 280)),
        av AS (SELECT CAST(range AS BIGINT) AS i FROM range(280, 340)),
        sv AS (SELECT CAST(range AS BIGINT) AS i FROM range(340, 400)),
        avif AS (
          SELECT 'img-' || CAST(i AS VARCHAR) AS media_id,
                 CASE i % 3 WHEN 0 THEN 'avif' WHEN 1 THEN 'heic'
                            ELSE 'heif' END AS format,
                 CAST(100 + i AS INT) AS width,
                 CAST(50 + i % 40 AS INT) AS height,
                 CAST(CASE WHEN i % 2 = 0 THEN 8 ELSE 10 END AS INT)
                   AS bit_depth,
                 CAST(i % 3 + 1 AS INT) AS channels,
                 FALSE AS interlaced
          FROM av),
        svgico AS (
          SELECT 'img-' || CAST(i AS VARCHAR) AS media_id,
                 CASE WHEN i % 2 = 0 THEN 'svg' ELSE 'ico' END AS format,
                 CAST(CASE WHEN i % 2 = 0 THEN 100 + i
                      ELSE (i % 17 + 1) * 8 END AS INT) AS width,
                 CAST(CASE WHEN i % 2 = 0 THEN 60 + i % 30
                      ELSE (i % 11 + 1) * 16 END AS INT) AS height,
                 CAST(CASE WHEN i % 2 = 0 THEN NULL
                      WHEN i % 4 = 1 THEN 32 ELSE 8 END AS INT)
                   AS bit_depth,
                 CAST(CASE WHEN i % 2 = 0 THEN NULL
                      WHEN i % 4 = 1 THEN 4 ELSE 3 END AS INT)
                   AS channels,
                 FALSE AS interlaced
          FROM sv)
        SELECT * FROM avif
        UNION ALL
        SELECT * FROM svgico
        UNION ALL
        SELECT 'img-' || CAST(i AS VARCHAR) AS media_id,
          CASE i % 7
            WHEN 0 THEN CASE i % 3 WHEN 0 THEN 'jpeg'
                                   WHEN 1 THEN 'jpeg-progressive'
                                   ELSE 'jpeg-arith' END
            WHEN 1 THEN 'png'
            WHEN 2 THEN 'gif'
            WHEN 3 THEN 'bmp'
            WHEN 4 THEN CASE i % 3 WHEN 0 THEN 'webp'
                                   WHEN 1 THEN 'webp-lossless'
                                   ELSE 'webp-extended' END
            WHEN 5 THEN 'tiff'
            ELSE 'unknown' END AS format,
          CAST(CASE WHEN i % 7 = 6 THEN NULL
               ELSE 8 + (i % 24) END AS INT) AS width,
          CAST(CASE WHEN i % 7 = 6 THEN NULL
               ELSE 8 + (i % 17) END AS INT) AS height,
          CAST(CASE WHEN i % 7 = 6 THEN NULL
               WHEN i % 7 = 5 THEN
                 CASE WHEN i % 2 = 0 THEN 16 ELSE 8 END
               ELSE 8 END AS INT) AS bit_depth,
          CAST(CASE WHEN i % 7 = 6 THEN NULL
               WHEN i % 7 = 5 THEN i % 3 + 1
               WHEN i % 7 = 4 AND i % 3 <> 0 AND i % 2 = 1 THEN 4
               ELSE 3 END AS INT) AS channels,
          CASE WHEN i % 7 = 6 THEN NULL
               WHEN i % 7 = 0 AND i % 3 = 1 THEN TRUE
               WHEN i % 7 = 2 AND i % 2 = 1 THEN TRUE
               ELSE FALSE END AS interlaced
        FROM pg
    """
    # --- compaction plan: the oracle is the module's own generated
    # window restatement over the same synthetic manifest.
    from sigraph_spark.operators.layout import compaction_oracle_sql

    sq["compaction_plan"] = compaction_oracle_sql(
        """
        SELECT 'f-' || CAST(i AS VARCHAR) AS path,
               CAST(CASE WHEN i < 400 THEN 1000 + (i * 137) % 9000
                    ELSE 40000 + i END AS BIGINT) AS bytes
        FROM (SELECT CAST(range AS BIGINT) AS i FROM range(0, 410))
        """,
        16000,
    )
    # --- perceptual image near-dup: the Spark side decodes real
    # PNG/BMP/GIF payloads, dHashes, and band-joins; the oracle
    # enumerates the provable pair structure (lossless trio at
    # Hamming 0, the col-0-nudged variant at exactly 2, garbage rows
    # and cross-group pairs emit nothing — margin 14, see the gate).
    sq["image_neardup"] = """
        WITH g AS (SELECT CAST(range AS BIGINT) AS g FROM range(0, 16)),
        p(sa, sb, hm) AS (VALUES
            ('bmp', 'gif', 0), ('bmp', 'png', 0), ('gif', 'png', 0),
            ('bmp', 'vpng', 2), ('gif', 'vpng', 2), ('png', 'vpng', 2))
        SELECT 'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sa AS a,
               'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sb AS b,
               CAST(hm AS INT) AS hamming
        FROM g CROSS JOIN p
    """
    # --- incremental image near-dup: the full pair set minus the one
    # old-vs-old pair per group (bmp, png) — the decomposition the
    # stored index guarantees (see dedup.incremental_*_candidates).
    sq["imagehash_incremental"] = """
        WITH g AS (SELECT CAST(range AS BIGINT) AS g FROM range(0, 16)),
        p(sa, sb, hm) AS (VALUES
            ('bmp', 'gif', 0), ('gif', 'png', 0),
            ('bmp', 'vpng', 2), ('gif', 'vpng', 2), ('png', 'vpng', 2))
        SELECT 'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sa AS a,
               'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sb AS b,
               CAST(hm AS INT) AS hamming
        FROM g CROSS JOIN p
    """
    # --- acoustic near-dup: the Spark side decodes real WAV/FLAC/
    # Ogg-FLAC payloads and fingerprints; lossless codecs carry
    # identical PCM, so the trio pairs sit at Hamming 0 by
    # construction (cross-group margin 11, garbage hashes NULL).
    sq["audio_neardup"] = """
        WITH g AS (SELECT CAST(range AS BIGINT) AS g FROM range(0, 16)),
        p(sa, sb) AS (VALUES
            ('flac', 'ogg'), ('flac', 'wav'), ('ogg', 'wav'))
        SELECT 'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sa AS a,
               'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sb AS b,
               CAST(0 AS INT) AS hamming
        FROM g CROSS JOIN p
    """
    # --- homoglyph spoof pairs: collision structure is id arithmetic;
    # the Spark side does the real punycode/NFKD/prototype skeleton.
    sq["spoof_pairs"] = """
        WITH pg AS (
          SELECT CAST(range AS BIGINT) AS i,
                 -- the skeleton maps digit confusables too: 0->o, 1->l
                 replace(replace(CAST(range AS VARCHAR), '0', 'o'),
                         '1', 'l') AS sk_i
          FROM range(0, 200)),
        p1 AS (
          SELECT 'brand' || CAST(i AS VARCHAR) || '.com' AS a,
                 'brаnd' || CAST(i AS VARCHAR) || '.com' AS b,
                 'brand' || sk_i || '.com' AS skeleton
          FROM pg WHERE i % 2 = 0),
        p2 AS (
          SELECT 'brand' || CAST(i AS VARCHAR) || '.com',
                 'ｂrand' || CAST(i AS VARCHAR) || '.com',
                 'brand' || sk_i || '.com'
          FROM pg WHERE i % 3 = 0),
        p3 AS (
          SELECT 'brаnd' || CAST(i AS VARCHAR) || '.com',
                 'ｂrand' || CAST(i AS VARCHAR) || '.com',
                 'brand' || sk_i || '.com'
          FROM pg WHERE i % 6 = 0)
        SELECT * FROM p1
        UNION ALL SELECT * FROM p2
        UNION ALL SELECT * FROM p3
    """
    # --- typosquat pairs: the oracle is the QUADRATIC independent
    # formulation — all-pairs levenshtein — so it checks blocking
    # completeness, not just the distances.
    sq["typo_pairs"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 150)),
        names AS (
          SELECT 'site' || CAST(i AS VARCHAR) || '.com' AS name FROM pg
          UNION SELECT 'sit' || CAST(i AS VARCHAR) || '.com'
          FROM pg WHERE i % 2 = 0
          UNION SELECT 'sitee' || CAST(i AS VARCHAR) || '.com'
          FROM pg WHERE i % 3 = 0
          UNION SELECT 'sute' || CAST(i AS VARCHAR) || '.com'
          FROM pg WHERE i % 5 = 0),
        f AS (SELECT name FROM names WHERE length(name) >= 4)
        SELECT n1.name AS a, n2.name AS b, CAST(1 AS INT) AS dist
        FROM f n1 JOIN f n2 ON n1.name < n2.name
        WHERE levenshtein(n1.name, n2.name) = 1
    """
    # --- image tiles: every tile is a solid 4x4 block; sums are id
    # arithmetic, garbage ids carry one all-NULL row.
    sq["image_tiles"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 60)),
        q AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, 2)),
        bad AS (
          SELECT 'img-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id,
                 CAST(NULL AS INT) AS tx, CAST(NULL AS INT) AS ty,
                 CAST(NULL AS INT) AS tile_w, CAST(NULL AS INT) AS tile_h,
                 CAST(NULL AS BIGINT) AS n_px,
                 CAST(NULL AS BIGINT) AS sum_r,
                 CAST(NULL AS BIGINT) AS sum_g,
                 CAST(NULL AS BIGINT) AS sum_b,
                 CAST(NULL AS BOOLEAN) AS flat
          FROM pg WHERE i % 7 = 0),
        good AS (
          SELECT 'img-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id,
                 CAST(qx.t AS INT) AS tx, CAST(qy.t AS INT) AS ty,
                 CAST(4 AS INT) AS tile_w, CAST(4 AS INT) AS tile_h,
                 CAST(16 AS BIGINT) AS n_px,
                 CAST(16 * ((i * 7 + qx.t * 3 + qy.t * 5) % 256)
                      AS BIGINT) AS sum_r,
                 CAST(16 * (((i * 7 + qx.t * 3 + qy.t * 5) % 256 + 40)
                            % 256) AS BIGINT) AS sum_g,
                 CAST(16 * (((i * 7 + qx.t * 3 + qy.t * 5) % 256 + 80)
                            % 256) AS BIGINT) AS sum_b,
                 TRUE AS flat
          FROM pg CROSS JOIN q qx CROSS JOIN q qy
          WHERE i % 7 <> 0)
        SELECT * FROM bad UNION ALL SELECT * FROM good
    """
    # --- n-gram LM quality: tokenization, context lags, the five
    # joins, rational-alpha stupid backoff and the 4dp ln-sum, all
    # restated; backoff selection doubles as integer evidence.
    sq["lm_quality"] = r"""
        WITH lmd AS (
          SELECT doc_id,
                 list_filter(string_split_regex(
                   lower(trim(coalesce(text, ''))), '\s+'),
                   x -> x <> '') AS w
          FROM documents),
        tok AS (
          SELECT doc_id, CAST(t.p AS INT) AS pos,
                 w[CAST(t.p AS INT)] AS word,
                 CASE WHEN t.p >= 2 THEN w[CAST(t.p - 1 AS INT)] END AS p1,
                 CASE WHEN t.p >= 3 THEN w[CAST(t.p - 2 AS INT)] END AS p2
          FROM lmd, UNNEST(range(1, len(w) + 1)) AS t(p)),
        lm_total AS (SELECT COUNT(*) AS n FROM tok),
        uni AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
        bi AS (SELECT p1 AS c, word, COUNT(*) AS cnt FROM tok
               WHERE p1 IS NOT NULL GROUP BY p1, word),
        tri AS (SELECT p2 || ' ' || p1 AS c, word, COUNT(*) AS cnt
                FROM tok WHERE p2 IS NOT NULL GROUP BY 1, word),
        lmj AS (
          SELECT tok.doc_id, t3.cnt AS t_cnt, b.cnt AS b_cnt,
                 u.cnt AS u_cnt, d2.cnt AS d2_cnt, d1.cnt AS d1_cnt
          FROM tok
          LEFT JOIN uni u ON tok.word = u.word
          LEFT JOIN bi b ON tok.p1 = b.c AND tok.word = b.word
          LEFT JOIN tri t3
            ON tok.p2 || ' ' || tok.p1 = t3.c AND tok.word = t3.word
          LEFT JOIN uni d1 ON tok.p1 = d1.word
          LEFT JOIN bi d2 ON tok.p2 = d2.c AND tok.p1 = d2.word),
        lms AS (
          SELECT doc_id,
                 CASE WHEN t_cnt IS NOT NULL
                      THEN ln(CAST(t_cnt AS DOUBLE) / d2_cnt)
                      WHEN b_cnt IS NOT NULL
                      THEN ln((2.0 / 5.0)
                              * (CAST(b_cnt AS DOUBLE) / d1_cnt))
                      WHEN u_cnt IS NOT NULL
                      THEN ln((2.0 / 5.0) * (2.0 / 5.0)
                              * (CAST(u_cnt AS DOUBLE)
                                 / (SELECT n FROM lm_total)))
                      ELSE ln((2.0 / 5.0) * (2.0 / 5.0)
                              / (SELECT n FROM lm_total)) END AS l,
                 CASE WHEN t_cnt IS NOT NULL THEN 3
                      WHEN b_cnt IS NOT NULL THEN 2
                      WHEN u_cnt IS NOT NULL THEN 1 ELSE 0 END AS o
          FROM lmj)
        SELECT doc_id, COUNT(*) AS n_tokens,
               SUM(CASE WHEN o = 3 THEN 1 ELSE 0 END) AS n_tri,
               SUM(CASE WHEN o = 2 THEN 1 ELSE 0 END) AS n_bi,
               SUM(CASE WHEN o = 1 THEN 1 ELSE 0 END) AS n_uni,
               SUM(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS n_oov,
               round(SUM(l), 4) AS logprob
        FROM lms GROUP BY doc_id
    """
    # --- absolutized links: one resolution of each reference kind per
    # page, pure id arithmetic.
    sq["absolutized_links"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR)
                     AS url
              FROM pg)
        SELECT url, 'https://example.org/p' || CAST(i % 7 AS VARCHAR)
               || '.html' AS target FROM u
        UNION ALL
        SELECT url, 'https://example.org/report/img'
               || CAST(i % 5 AS VARCHAR) || '.png' FROM u
        UNION ALL
        SELECT url, 'https://example.org/up' || CAST(i % 3 AS VARCHAR)
               || '.html' FROM u
        UNION ALL
        SELECT url, 'https://ext' || CAST(i % 11 AS VARCHAR) || '.org/x'
        FROM u WHERE i % 2 = 0
    """
    # --- image captions: lead alt row per page; figure rows on even
    # ids with the spacer-shifted global index.
    sq["image_captions"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        lead_rows AS (
          SELECT 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                 CAST(0 AS INT) AS img_idx,
                 '/img' || CAST(i % 50 AS VARCHAR) || '.jpg' AS src,
                 'Photo ' || CAST(i % 17 AS VARCHAR) || ' of item' AS caption,
                 'alt' AS source
          FROM pg),
        fig_rows AS (
          SELECT 'https://example.org/report/' || CAST(i AS VARCHAR),
                 CAST(CASE WHEN i % 3 = 0 THEN 2 ELSE 1 END AS INT),
                 '/fig' || CAST(i % 23 AS VARCHAR) || '.png',
                 'Figure ' || CAST(i % 13 AS VARCHAR) || ' shows the rack',
                 'figcaption'
          FROM pg WHERE i % 2 = 0)
        SELECT * FROM lead_rows UNION ALL SELECT * FROM fig_rows
    """
    # --- image resize: resized-channel sums per image = 4 pixels per
    # solid quadrant x quadrant color, summed over the four quadrants.
    sq["image_resize"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 60)),
        q AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, 2)),
        quad AS (
          SELECT i, (i * 7 + qx.t * 3 + qy.t * 5) % 256 AS r
          FROM pg CROSS JOIN q qx CROSS JOIN q qy WHERE i % 7 <> 0),
        sums AS (
          SELECT i, SUM(4 * r) AS sr, SUM(4 * ((r + 40) % 256)) AS sg,
                 SUM(4 * ((r + 80) % 256)) AS sb
          FROM quad GROUP BY i)
        SELECT 'img-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id,
               CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
               CAST(NULL AS BIGINT) AS sum_r,
               CAST(NULL AS BIGINT) AS sum_g,
               CAST(NULL AS BIGINT) AS sum_b
        FROM pg WHERE i % 7 = 0
        UNION ALL
        SELECT 'img-' || lpad(CAST(i AS VARCHAR), 2, '0'),
               CAST(4 AS INT), CAST(4 AS INT),
               CAST(sr AS BIGINT), CAST(sg AS BIGINT), CAST(sb AS BIGINT)
        FROM sums
    """
    # --- audio segments: four-run (or three-run on even i) structure,
    # pure run-length arithmetic.
    sq["audio_segments"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 40)),
        d AS (SELECT i, 1 + i % 3 AS a, 2 + i % 4 AS b, 1 + i % 2 AS c,
                     1 + i % 5 AS dd
              FROM pg),
        runs AS (
          SELECT i, 0 AS seg_idx, FALSE AS voiced,
                 CAST(0 AS INT) AS start_frame,
                 CAST(a - 1 AS INT) AS end_frame, a AS n_frames FROM d
          UNION ALL
          SELECT i, 1, TRUE, CAST(a AS INT), CAST(a + b - 1 AS INT), b
          FROM d
          UNION ALL
          SELECT i, 2, FALSE, CAST(a + b AS INT),
                 CAST(a + b + c - 1 AS INT), c FROM d
          UNION ALL
          SELECT i, 3, TRUE, CAST(a + b + c AS INT),
                 CAST(a + b + c + dd - 1 AS INT), dd
          FROM d WHERE i % 2 = 1)
        SELECT 'clip-' || lpad(CAST(i AS VARCHAR), 2, '0') AS id,
               seg_idx, voiced, start_frame, end_frame,
               CAST(n_frames AS BIGINT) AS n_frames
        FROM runs
    """
    # --- video near-dup: 11 consecutive sliding-window pairs, each
    # sharing exactly 2 frames; cross-container agreement is what the
    # Spark side actually proves.
    sq["video_neardup"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 11))
        SELECT 'vid-' || lpad(CAST(i AS VARCHAR), 2, '0') AS a,
               'vid-' || lpad(CAST(i + 1 AS VARCHAR), 2, '0') AS b,
               CAST(2 AS BIGINT) AS shared
        FROM pg
    """
    # --- combosquat: the same contains-join in SQL (LIKE over the
    # extracted registrable label).
    sq["combosquat"] = r"""
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 200)),
        doms AS (
          SELECT CASE WHEN i % 3 = 0
                 THEN 'brand' || CAST(i % 20 AS VARCHAR) || '-portal'
                      || CAST(i AS VARCHAR) || '.com'
                 ELSE 'shop' || CAST(i AS VARCHAR) || '.com' END AS domain
          FROM pg),
        brands AS (
          SELECT 'brand' || CAST(range AS VARCHAR) AS brand
          FROM range(0, 20)),
        lab AS (
          SELECT domain,
                 lower(regexp_extract(domain, '^(.*)\.[^.]+$', 1)) AS l
          FROM doms)
        SELECT domain, brand FROM lab CROSS JOIN brands
        WHERE l LIKE '%' || brand || '%' AND l <> brand
    """
    # --- incremental audio near-dup: the full trio pair set minus
    # the per-group old-vs-old (flac, wav) pair.
    sq["audiofp_incremental"] = """
        WITH g AS (SELECT CAST(range AS BIGINT) AS g FROM range(0, 16)),
        p(sa, sb) AS (VALUES ('flac', 'ogg'), ('ogg', 'wav'))
        SELECT 'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sa AS a,
               'g' || lpad(CAST(g AS VARCHAR), 2, '0') || '-' || sb AS b,
               CAST(0 AS INT) AS hamming
        FROM g CROSS JOIN p
    """
    # --- container text metadata: every (container, tag, value) row
    # is id arithmetic; the Spark side does the real Exif IFD / ID3
    # frame / vorbis-comment walks incl. cross-page Ogg reassembly.
    sq["media_tags"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 200)),
        pg2 AS (SELECT CAST(range AS BIGINT) AS i FROM range(200, 260)),
        t AS (
          SELECT i, 'exif' AS container, 'make' AS tag,
                 'make-' || CAST(i % 9 AS VARCHAR) AS value
          FROM pg WHERE i % 4 = 0
          UNION ALL
          SELECT i, 'exif', 'orientation', CAST(i % 8 + 1 AS VARCHAR)
          FROM pg WHERE i % 4 = 0
          UNION ALL
          SELECT i, 'id3', 'TIT2', 'title ' || CAST(i AS VARCHAR)
          FROM pg WHERE i % 4 = 1
          UNION ALL
          SELECT i, 'id3', 'TPE1', 'artist ' || CAST(i % 13 AS VARCHAR)
          FROM pg WHERE i % 4 = 1
          UNION ALL
          SELECT i, 'id3', 'TXXX:mood', 'mood-' || CAST(i % 5 AS VARCHAR)
          FROM pg WHERE i % 4 = 1
          UNION ALL
          SELECT i, 'flac', 'TITLE', 't' || CAST(i AS VARCHAR)
          FROM pg WHERE i % 4 = 2
          UNION ALL
          SELECT i, 'flac', 'GENRE', 'g' || CAST(i % 7 AS VARCHAR)
          FROM pg WHERE i % 4 = 2
          UNION ALL
          SELECT i, 'ogg', 'TITLE', 's' || CAST(i AS VARCHAR)
          FROM pg WHERE i % 4 = 3
          UNION ALL
          SELECT i, 'ogg', 'ALBUM', 'a' || CAST(i % 5 AS VARCHAR)
          FROM pg WHERE i % 8 = 3
          UNION ALL
          SELECT i, 'png', 'Title', 'p' || CAST(i AS VARCHAR)
          FROM pg2 WHERE i % 2 = 0
          UNION ALL
          SELECT i, 'png', 'Software', 'sw-' || CAST(i % 9 AS VARCHAR)
          FROM pg2 WHERE i % 2 = 0
          UNION ALL
          SELECT i, 'gif', 'comment', 'c' || CAST(i AS VARCHAR)
          FROM pg2 WHERE i % 2 = 1)
        SELECT 'tag-' || CAST(i AS VARCHAR) AS media_id,
               container, tag, value
        FROM t
    """
    # --- named graphs: the oracle RESTATES the graph-filtered joins
    # over the same quad enumeration (default graph = jsonld claims,
    # named graphs = the other channels): a default-graph os probe, a
    # same-graph (rdf:type, rack) pair resolved per named graph, and a
    # constant-graph rdfa owner lookup.
    sq["sparql_graph"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + """
        u AS (SELECT i, 'srv-' || CAST(i AS VARCHAR) AS srv,
                     'os-' || CAST(i % 5 AS VARCHAR) AS os,
                     'r-' || CAST(i % 23 AS VARCHAR) AS rack,
                     'team-' || CAST(i % 11 AS VARCHAR) AS team
              FROM pg),
        quads AS (
          SELECT srv AS src, 'rdf:type' AS predicate, 'Server' AS dst,
                 NULL AS g FROM u
          UNION ALL SELECT srv, 'os', os, NULL FROM u
          UNION ALL SELECT srv, 'rdf:type', 'Server', 'microdata' FROM u
          UNION ALL SELECT srv, 'rack', rack, 'microdata' FROM u
          UNION ALL SELECT srv, 'rdf:type', 'Server', 'rdfa' FROM u
          UNION ALL SELECT srv, 'owner', team, 'rdfa' FROM u
          UNION ALL SELECT srv, 'dc', 'dc-' || CAST(i % 7 AS VARCHAR),
                 'dl' FROM u
          UNION ALL SELECT srv, 'os', os, 'table' FROM u),
        dflt AS (SELECT * FROM quads WHERE g IS NULL),
        named AS (SELECT * FROM quads WHERE g IS NOT NULL)
        SELECT DISTINCT nt.g, nt.src AS s, nr.dst AS r, no.dst AS ow
        FROM dflt d
        JOIN named nt ON nt.src = d.src
             AND nt.predicate = 'rdf:type' AND nt.dst = 'Server'
        JOIN named nr ON nr.src = d.src AND nr.g = nt.g
             AND nr.predicate = 'rack'
        JOIN named no ON no.src = d.src AND no.g = 'rdfa'
             AND no.predicate = 'owner'
        WHERE d.predicate = 'os'
        """
    )
    # --- GRAPH ?var composition (round 5): paths + subqueries scoped
    # per named graph. The quad split ('g' || ascii(src) % 3) is
    # restated verbatim; the closure CTE carries g in its join key so
    # reachability never crosses graphs.
    sq["sparql_graph_path"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        quads AS (SELECT src, predicate, dst,
                         'g' || CAST(ascii(substr(src, -1, 1)) % 3 AS VARCHAR) AS g
                  FROM edges),
        gc AS (SELECT g, src AS a, dst AS b FROM quads
               WHERE predicate = 'CONNECT'),
        gclo AS (
          SELECT g, a, b FROM gc
          UNION
          SELECT c.g, c.a, p.b FROM gclo c
          JOIN gc p ON p.g = c.g AND p.a = c.b),
        gl AS (SELECT g, src, dst FROM quads WHERE predicate = 'LAUNCH')
        SELECT DISTINCT l.g AS g, l.src AS a, k.b AS c
        FROM gl l JOIN gclo k ON k.g = l.g AND k.a = l.dst
        """
    )
    sq["sparql_graph_subquery"] = (
        "WITH " + _EDGES_CTE
        + """,
        quads AS (SELECT src, predicate, dst,
                         'g' || CAST(ascii(substr(src, -1, 1)) % 3 AS VARCHAR) AS g
                  FROM edges)
        SELECT DISTINCT c.g AS g, c.src AS s, c.dst AS o
        FROM quads c JOIN quads l
          ON l.g = c.g AND l.predicate = 'LAUNCH' AND l.dst = c.src
        WHERE c.predicate = 'CONNECT'
        """
    )
    # --- attributed quotes: arithmetic enumeration. The decoy span
    # never matches (verb gate), so indices start at the PRE quote; the
    # even-page POST shifts the i%3 according-to and i%7 Dana rows.
    sq["quotes_extract"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS t
              FROM pg),
        q AS (
          SELECT url, 0 AS quote_idx, 'Alice Carter' AS speaker,
                 'said' AS verb,
                 'segment ' || CAST(i % 17 AS VARCHAR) || ' is stable' AS quote
          FROM u
          UNION ALL SELECT url, 1, 'Bob Stone', 'said',
                 'We moved rack r-' || CAST(i % 23 AS VARCHAR)
          FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, 1 + e, 'Eve Long', 'according_to',
                 'the quota is ' || CAST(i % 5 AS VARCHAR)
          FROM u WHERE i % 3 = 0
          UNION ALL SELECT url, 1 + e + t, 'Dana', 'warned',
                 'check unit ' || CAST(i % 9 AS VARCHAR)
          FROM u WHERE i % 7 = 0)
        SELECT url, CAST(quote_idx AS INT) AS quote_idx, speaker, verb, quote
        FROM q
        """
    )
    # --- abbreviation pairs: arithmetic enumeration. Decoys consume
    # pair_idx then drop; the letter-varying TCR pair pins the initials
    # verification end-to-end.
    sq["abbrev_pairs"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS t3,
                     CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END AS t5,
                     chr(65 + CAST(i % 26 AS INT)) AS c
              FROM pg),
        q AS (
          SELECT url, e + t3 AS pair_idx,
                 'Advanced Persistent Threat' AS long, 'APT' AS short FROM u
          UNION ALL SELECT url, e + t3 + 1, 'Department of Defense', 'DOD'
          FROM u
          UNION ALL SELECT url, e + t3 + 2, 'New York Times', 'NYT'
          FROM u WHERE i % 5 = 0
          UNION ALL SELECT url, e + t3 + 2 + t5,
                 'Team ' || c || 'unit Response', 'T' || c || 'R' FROM u)
        SELECT url, CAST(pair_idx AS INT) AS pair_idx, long, short FROM q
        """
    )
    # --- template fingerprints: the oracle REBUILDS the tag string
    # arithmetically and applies the same md5 — extraction + hash pinned.
    _TPL_CTES = """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     'html,head,title,body,nav,a,div,h1,p'
                       || CASE WHEN i % 3 = 0 THEN ',aside,ul,li' ELSE '' END
                       || CASE WHEN i % 5 = 0 THEN ',img' ELSE '' END
                       || ',footer' AS skel,
                     10 + CASE WHEN i % 3 = 0 THEN 3 ELSE 0 END
                        + CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END AS n_tags
              FROM pg)
    """
    sq["template_id"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + _TPL_CTES
        + " SELECT url, CAST(n_tags AS INT) AS n_tags, md5(skel) AS template_id"
          " FROM u"
    )
    sq["template_clusters"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + _TPL_CTES
        + """
        SELECT md5(skel) AS template_id,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(min(n_tags) AS INT) AS n_tags,
               min(url) AS exemplar
        FROM u GROUP BY md5(skel)
        """
    )
    # --- novel templates: the known set excludes i%5==0 pages, so the
    # two <img> classes are the anti-join survivors.
    sq["template_novel"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + _TPL_CTES
        + """
        SELECT md5(skel) AS template_id,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(min(n_tags) AS INT) AS n_tags,
               min(url) AS exemplar
        FROM u WHERE i % 5 = 0 GROUP BY md5(skel)
        """
    )
    # --- quantities: planted base values emitted arithmetically (the
    # decimal-exact normalization is what the hash pins; the 0.5 B decoy
    # consumes q_idx 0 on 3-pages, the 7-digit number never matches).
    sq["quantities"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS t3
              FROM pg),
        q AS (
          SELECT url, t3 + 0 AS q_idx, CAST(i % 512 AS VARCHAR) AS value_raw,
                 'GiB' AS unit, 'bytes' AS unit_class,
                 (i % 512) * 1073741824 AS base
          FROM u
          UNION ALL SELECT url, t3 + 1,
                 '3.' || CAST((i % 4) * 25 AS VARCHAR), 'GHz', 'hertz',
                 3000000000 + (i % 4) * 250000000 FROM u
          UNION ALL SELECT url, t3 + 2, CAST(i % 1000 AS VARCHAR), 'ms',
                 'micros', (i % 1000) * 1000 FROM u
          UNION ALL SELECT url, t3 + 3, '1.5', 'h', 'micros', 5400000000
          FROM u WHERE i % 5 = 0)
        SELECT url, CAST(q_idx AS INT) AS q_idx, value_raw, unit,
               unit_class, CAST(base AS BIGINT) AS base
        FROM q
        """
    )
    # --- object quantities: the dl enumeration + the normalized RAM
    # column ((i%512) GiB is the only unit-bearing planted value).
    sq["object_quantities"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS o,
                     CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS e,
                     'Server S-' || CAST(i % 47 AS VARCHAR) AS srv,
                     'Rack R-' || CAST(i % 23 AS VARCHAR) AS rck
              FROM pg),
        t AS (
          SELECT url, o AS dl_idx, 0 AS pair_idx, srv AS subject,
                 'CPU' AS key, CAST(i % 64 AS VARCHAR) || '-core' AS value,
                 NULL AS qty_class, NULL AS qty_base
          FROM u
          UNION ALL SELECT url, o, 1, srv, 'RAM',
                 CAST(i % 512 AS VARCHAR) || ' GiB', 'bytes',
                 (i % 512) * 1073741824 FROM u
          UNION ALL SELECT url, o + 1, 0, rck, 'zone',
                 'z-' || CAST(i % 7 AS VARCHAR), NULL, NULL
          FROM u WHERE i % 2 = 0
          UNION ALL SELECT url, o + 1 + e, 0,
                 CASE WHEN e = 1 THEN rck ELSE srv END, 'power',
                 'p-' || CAST(i % 9 AS VARCHAR), NULL, NULL
          FROM u WHERE i % 5 = 0)
        SELECT url, CAST(dl_idx AS INT) AS dl_idx,
               CAST(pair_idx AS INT) AS pair_idx, subject, key, value,
               CAST(qty_class AS VARCHAR) AS qty_class,
               CAST(qty_base AS BIGINT) AS qty_base
        FROM t
        """
    )
    # --- pagination chains: arithmetic enumeration of group-of-four
    # chain membership (len = g%4+1; standalone len-1 groups absent).
    _CHAIN_U = """
        u AS (SELECT i, i // 4 AS g, CAST(i % 4 AS INT) AS p,
                     CAST((i // 4) % 4 + 1 AS INT) AS len,
                     'https://example.org/report/' || CAST(i AS VARCHAR) AS url,
                     'https://example.org/report/' || CAST((i // 4) * 4 AS VARCHAR) AS head
              FROM pg)
    """
    sq["page_chains"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + _CHAIN_U
        + """
        SELECT url, head, p AS pos FROM u WHERE len >= 2 AND p < len
        """
    )
    sq["stitched_pages"] = (
        "WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),"
        + _CHAIN_U
        + """
        SELECT head, CAST(count(*) AS BIGINT) AS n_parts,
               string_agg('part ' || CAST(i AS VARCHAR) || ' body.',
                          chr(10) ORDER BY p) AS text
        FROM u WHERE len >= 2 AND p < len
        GROUP BY head
        """
    )
    # --- alias map: winners enumerated arithmetically (10000 = 26*384
    # + 16, so letters below 16 support one extra page).
    sq["alias_map"] = """
        SELECT 'APT' AS short, 'Advanced Persistent Threat' AS long,
               CAST(10000 AS BIGINT) AS n_pages
        UNION ALL SELECT 'DOD', 'Department of Defense', 10000
        UNION ALL SELECT 'NYT', 'New York Times', 2000
        UNION ALL
        SELECT 'T' || chr(65 + CAST(k AS INT)) || 'R',
               'Team ' || chr(65 + CAST(k AS INT)) || 'unit Response',
               CAST(CASE WHEN k < 16 THEN 385 ELSE 384 END AS BIGINT)
        FROM range(0, 26) t(k)
        """
    # --- SPARQL slice: OFFSET-before-LIMIT restatement.
    sq["sparql_slice"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT src AS a, dst AS b FROM edges WHERE predicate = 'LAUNCH'
        ORDER BY src, dst LIMIT 10 OFFSET 20
        """
    )
    # --- Hearst extraction: the oracle enumerates the PLANTED pairs
    # arithmetically (it never runs a regex), so the pattern inventory,
    # the closed-class NP guard, and the list splitting are all pinned.
    _hearst_pairs_ctes = """
        u AS (SELECT i, 'https://example.org/report/' || CAST(i AS VARCHAR) AS url
              FROM pg),
        hp AS (
          SELECT url, 'item' || chr(97 + CAST((2 * i + o) % 26 AS INT)) AS hypo,
                 'kind' || chr(97 + CAST(i % 26 AS INT)) AS hyper,
                 'such_as' AS pattern
          FROM u, UNNEST([0, 1, 2]) t(o)
          UNION ALL
          SELECT url, 'item' || chr(97 + CAST((5 * i) % 26 AS INT)),
                 'big kind' || chr(97 + CAST((i + 1) % 26 AS INT)), 'such_as'
          FROM u WHERE i % 3 = 0
          UNION ALL
          SELECT url, 'item' || chr(97 + CAST((7 * i + o) % 26 AS INT)),
                 'kind' || chr(97 + CAST((i + 2) % 26 AS INT)), 'or_other'
          FROM u, UNNEST([0, 3]) t(o) WHERE i % 4 = 0
          UNION ALL
          SELECT url, 'item' || chr(97 + CAST((11 * i + o) % 26 AS INT)),
                 'kind' || chr(97 + CAST((i + 3) % 26 AS INT)), 'including'
          FROM u, UNNEST([0, 5]) t(o) WHERE i % 5 = 0
          UNION ALL
          SELECT url, 'item' || chr(97 + CAST((13 * i) % 26 AS INT)),
                 'kind' || chr(97 + CAST((i + 5) % 26 AS INT)), 'such_np_as'
          FROM u WHERE i % 7 = 0
          UNION ALL
          SELECT url, 'kind' || chr(97 + CAST((i + 4) % 26 AS INT)),
                 'kind' || chr(97 + CAST(i % 26 AS INT)), 'such_as'
          FROM u WHERE i % 9 = 0
          UNION ALL
          SELECT url, 'kind' || chr(97 + CAST(i % 26 AS INT)),
                 'kind' || chr(97 + CAST((i + 4) % 26 AS INT)), 'such_as'
          FROM u WHERE i % 11 = 0
          UNION ALL
          SELECT url, 'itemzz', 'gemsy', 'such_as' FROM u WHERE i = 4242)
        """
    sq["hearst_pairs"] = (
        "WITH " + _PG_CTE + "," + _hearst_pairs_ctes
        + " SELECT url, hypo, hyper, pattern FROM hp"
    )
    sq["taxonomy_induction"] = (
        "WITH " + _PG_CTE + "," + _hearst_pairs_ctes
        + """,
        agg AS (
          SELECT hypo, hyper, CAST(count(*) AS BIGINT) AS n_mentions,
                 CAST(count(DISTINCT pattern) AS BIGINT) AS n_patterns
          FROM hp GROUP BY hypo, hyper)
        SELECT a.hypo, a.hyper, a.n_mentions, a.n_patterns
        FROM agg a LEFT JOIN agg r ON a.hypo = r.hyper AND a.hyper = r.hypo
        WHERE a.n_mentions >= 2
          AND (r.hypo IS NULL OR a.n_mentions > r.n_mentions
               OR (a.n_mentions = r.n_mentions AND a.hypo < a.hyper))
        """
    )
    # --- text reuse: arithmetic enumeration of the planted spans. The
    # a-side offset A = leading filler + previous run + middle filler;
    # doc_a/doc_b order is LEXICOGRAPHIC on urls (report/100 < report/99),
    # mirrored by the CASE swap.
    sq["text_reuse"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS m FROM range(0, 9999)),
        q AS (
          SELECT 'https://example.org/report/' || CAST(m AS VARCHAR) AS u1,
                 'https://example.org/report/' || CAST(m + 1 AS VARCHAR) AS u2,
                 CAST(m % 7 AS INT)
                   + CASE WHEN m >= 1 THEN
                       5 + CASE WHEN (m - 1) % 13 = 0 THEN 0
                                ELSE 2 + CAST((m - 1) % 4 AS INT) END
                     ELSE 0 END
                   + 2 + CAST(m % 3 AS INT) AS a_pos,
                 CAST((m + 1) % 7 AS INT) AS b_pos,
                 3 + CAST(m % 4 AS INT) AS n_grams
          FROM pg WHERE m % 13 <> 0)
        SELECT CASE WHEN u2 < u1 THEN u2 ELSE u1 END AS doc_a,
               CASE WHEN u2 < u1 THEN u1 ELSE u2 END AS doc_b,
               CAST(CASE WHEN u2 < u1 THEN b_pos ELSE a_pos END AS INT) AS start_a,
               CAST(CASE WHEN u2 < u1 THEN a_pos ELSE b_pos END AS INT) AS start_b,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(n_grams + 4 AS BIGINT) AS len_tokens
        FROM q
        """
    # --- SCC: mutual-reachability ground truth over the sparsified
    # relation (forward-oriented + LAUNCH back-edges).
    sq["scc"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        scc_e AS (
          SELECT DISTINCT src AS u, dst AS v FROM edges
          WHERE src <> dst AND (src < dst OR predicate = 'LAUNCH')),
        scc_n AS (SELECT u AS n FROM scc_e UNION SELECT v FROM scc_e),
        scc_reach(a, b) AS (
          SELECT u, v FROM scc_e
          UNION
          SELECT r.a, e.v FROM scc_reach r JOIN scc_e e ON e.u = r.b),
        scc_mutual AS (
          SELECT r1.a AS x, r1.b AS y
          FROM scc_reach r1 JOIN scc_reach r2
            ON r1.a = r2.b AND r1.b = r2.a)
        SELECT n.n AS node_id,
               least(n.n, coalesce(min(m.x), n.n)) AS scc_id
        FROM scc_n n LEFT JOIN scc_mutual m ON m.y = n.n
        GROUP BY n.n
        """
    )
    # --- condensation + topo levels: longest path into each contracted
    # component over the ground-truth condensation DAG.
    sq["condensation_levels"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        scc_e AS (
          SELECT DISTINCT src AS u, dst AS v FROM edges
          WHERE src <> dst AND (src < dst OR predicate = 'LAUNCH')),
        scc_n AS (SELECT u AS n FROM scc_e UNION SELECT v FROM scc_e),
        scc_reach(a, b) AS (
          SELECT u, v FROM scc_e
          UNION
          SELECT r.a, e.v FROM scc_reach r JOIN scc_e e ON e.u = r.b),
        scc_mutual AS (
          SELECT r1.a AS x, r1.b AS y
          FROM scc_reach r1 JOIN scc_reach r2
            ON r1.a = r2.b AND r1.b = r2.a),
        scc_map AS (
          SELECT n.n, least(n.n, coalesce(min(m.x), n.n)) AS scc_id
          FROM scc_n n LEFT JOIN scc_mutual m ON m.y = n.n
          GROUP BY n.n),
        dag AS (
          SELECT DISTINCT ms.scc_id AS u, md.scc_id AS v
          FROM scc_e e
          JOIN scc_map ms ON ms.n = e.u
          JOIN scc_map md ON md.n = e.v
          WHERE ms.scc_id <> md.scc_id),
        dag_n AS (SELECT u AS node FROM dag UNION SELECT v FROM dag),
        paths(node, l) AS (
          SELECT node, 0 FROM dag_n
          UNION
          SELECT d.v, p.l + 1 FROM paths p JOIN dag d ON d.u = p.node)
        SELECT node AS node_id, CAST(max(l) AS BIGINT) AS level
        FROM paths GROUP BY node
        """
    )
    # --- connected components: star contraction's fixpoint must equal the
    # ground-truth reachability closure (min reachable id per node).
    sq["components"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        und AS (
          SELECT DISTINCT src AS x, dst AS y FROM edges WHERE src <> dst
          UNION
          SELECT DISTINCT dst, src FROM edges WHERE src <> dst),
        reach(x, r) AS (
          SELECT DISTINCT x, x AS r FROM und
          UNION
          SELECT u.y, r.r FROM reach r JOIN und u ON u.x = r.x)
        SELECT x AS entity, min(r) AS canonical_id FROM reach GROUP BY x
        """
    )
    # star edges preserve connectivity exactly, so the incremental path's
    # ground truth IS the full-recompute closure
    sq["components_resume"] = sq["components"]
    # --- label propagation: fixed 3 rounds of deterministic majority vote
    from sigraph_spark.operators.graphalgo import label_propagation_oracle_sql

    sq["label_propagation"] = (
        "WITH " + _EDGES_CTE
        + """,
        lp_seeds AS (
          SELECT DISTINCT n AS node, n AS label FROM (
            SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)
          WHERE n LIKE 'proc\\_%' ESCAPE '\\'),
        """
        + label_propagation_oracle_sql("edges", "lp_seeds", 3)
    )
    # --- HyperBall: 3 unrolled register max-merge rounds + estimator
    from sigraph_spark.operators.graphalgo import hyperball_oracle_sql

    sq["hyperball"] = (
        "WITH " + _EDGES_CTE + ",\n" + hyperball_oracle_sql("edges", 6, 3)
    )
    # --- unseeded community detection: 4 unrolled LPA rounds
    from sigraph_spark.operators.graphalgo import communities_oracle_sql

    sq["communities"] = (
        "WITH " + _EDGES_CTE + ",\n" + communities_oracle_sql("edges", 4)
    )
    # --- modularity of that partition: exact-integer numerator
    sq["modularity"] = (
        "WITH " + _EDGES_CTE + ",\n"
        + communities_oracle_sql("edges", 4, final_select=False)
        + """,
        md_und AS (
          SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
          FROM edges WHERE src <> dst),
        md_lab AS (
          SELECT u.x, u.y, ax.label AS cx, ay.label AS cy
          FROM md_und u
          JOIN cm_l4 ax ON ax.node = u.x
          JOIN cm_l4 ay ON ay.node = u.y),
        md_e AS (
          SELECT cx AS c, CAST(count(*) AS BIGINT) AS e_in
          FROM md_lab WHERE cx = cy GROUP BY cx),
        md_d AS (
          SELECT c, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT cx AS c FROM md_lab
            UNION ALL SELECT cy FROM md_lab)
          GROUP BY c),
        md_pc AS (
          SELECT md_d.c, coalesce(md_e.e_in, 0) AS e_in, md_d.d
          FROM md_d LEFT JOIN md_e ON md_d.c = md_e.c),
        md_m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM md_und),
        md_s AS (
          SELECT CAST(count(*) AS BIGINT) AS n_communities,
                 sum(e_in) AS se, sum(d * d) AS sd2
          FROM md_pc)
        SELECT m AS m_edges, n_communities,
               CAST(4 * m * se - sd2 AS BIGINT) AS q_num,
               round((4 * m * se - sd2) / (4.0 * m * m), 6) AS q
        FROM md_m CROSS JOIN md_s
        """
    )
    # --- one-row graph health panel
    sq["graph_metrics"] = (
        "WITH " + _EDGES_CTE
        + """,
        de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
        nn AS (SELECT count(*) AS n FROM (
          SELECT DISTINCT x FROM (
            SELECT src AS x FROM de UNION ALL SELECT dst FROM de))),
        tot AS (SELECT count(*) AS t FROM de),
        rc AS (SELECT count(*) AS r FROM de a
               JOIN de b ON b.src = a.dst AND b.dst = a.src),
        lp AS (SELECT count(*) AS l FROM de WHERE src = dst)
        SELECT CAST(nn.n AS BIGINT) AS n_nodes,
               CAST(tot.t AS BIGINT) AS n_edges,
               CAST(lp.l AS BIGINT) AS self_loops,
               round(rc.r / CAST(tot.t AS DOUBLE), 6) AS reciprocity,
               round(tot.t / CAST(nn.n * (nn.n - 1) AS DOUBLE), 6) AS density
        FROM nn, tot, rc, lp
        """
    )
    # --- component size profile over the reachability closure
    sq["component_stats"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        und AS (
          SELECT DISTINCT src AS x, dst AS y FROM edges WHERE src <> dst
          UNION
          SELECT DISTINCT dst, src FROM edges WHERE src <> dst),
        reach(x, r) AS (
          SELECT DISTINCT x, x AS r FROM und
          UNION
          SELECT u.y, r.r FROM reach r JOIN und u ON u.x = r.x),
        canon AS (SELECT x, min(r) AS component FROM reach GROUP BY x)
        SELECT component, CAST(count(*) AS BIGINT) AS size
        FROM canon GROUP BY component
        """
    )
    # --- node feature table: degree + triangles + pagerank + component,
    # every constituent reusing its individually-proven oracle form.
    from sigraph_spark.operators.pagerank import pagerank_oracle_sql as _pr_sql

    _prk = _pr_sql("edges")
    _prk_ctes, _prk_final = _prk.rsplit("\nSELECT node, rank_fp,", 1)
    sq["node_features"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        und AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
          FROM edges WHERE src <> dst),
        degt AS (
          SELECT n AS node_id, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT x AS n FROM und UNION ALL SELECT y FROM und)
          GROUP BY n),
        tri AS (
          SELECT e1.x AS a, e1.y AS b, e2.y AS c
          FROM und e1
          JOIN und e2 ON e2.x = e1.x AND e2.y > e1.y
          JOIN und e3 ON e3.x = e1.y AND e3.y = e2.y),
        tric AS (
          SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
          GROUP BY node),
        cu AS (SELECT x, y FROM und UNION SELECT y, x FROM und),
        reach(x, r) AS (
          SELECT DISTINCT x, x AS r FROM cu
          UNION
          SELECT u.y, r.r FROM reach r JOIN cu u ON u.x = r.x),
        comp AS (SELECT x AS node_id, min(r) AS component FROM reach GROUP BY x),
        """
        + _prk_ctes.lstrip()
        + ",\n        prk AS MATERIALIZED (\nSELECT node, rank_fp," + _prk_final + ")"
        + """
        SELECT degt.node_id, degt.degree,
               coalesce(tric.triangles, 0) AS triangles,
               prk.rank AS pagerank,
               coalesce(comp.component, degt.node_id) AS component
        FROM degt
        LEFT JOIN tric ON tric.node = degt.node_id
        LEFT JOIN prk ON prk.node = degt.node_id
        LEFT JOIN comp ON comp.node_id = degt.node_id
        """
    )
    # --- multi-source BFS: bounded recursive closure, min(d) per node.
    # Bound 10 >> fixture eccentricity (3), so equality is exact.
    sq["shortest_paths"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        de AS (SELECT DISTINCT src, dst FROM edges),
        reach(node, d) AS (
          SELECT 'proc_0.exe@PROCESS', 0
          UNION
          SELECT e.dst, r.d + 1 FROM reach r JOIN de e ON e.src = r.node
          WHERE r.d < 10)
        SELECT node AS node_id, CAST(min(d) AS BIGINT) AS distance
        FROM reach GROUP BY node
        """
    )
    # --- weighted shortest paths: identical hop-6 Bellman-Ford semantics
    # as a bounded recursive CTE — exact by the round invariant, no
    # convergence assumption.
    from sigraph_spark.operators.graphalgo import weighted_paths_oracle_sql

    sq["weighted_paths"] = (
        "WITH RECURSIVE " + _EDGES_CTE + ",\n"
        + weighted_paths_oracle_sql("edges", "'proc_0.exe@PROCESS'", 6)
    )
    # --- temporal reachability: hop-6 earliest-arrival as a bounded
    # recursive CTE; floor(epoch()) matches Spark's timestamp->long cast.
    from sigraph_spark.operators.graphalgo import temporal_reachability_oracle_sql

    sq["temporal_reach"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        tsrc AS (SELECT src, dst,
                        CAST(floor(epoch(start_time)) AS BIGINT) AS t
                 FROM edges),"""
        + temporal_reachability_oracle_sql("tsrc", "'proc_0.exe@PROCESS'", 6)
    )
    # --- k-core: the same peel unrolled to 8 rounds (fixture converges in 2).
    from sigraph_spark.operators.graphalgo import kcore_oracle_sql

    sq["kcore"] = (
        "WITH " + _EDGES_CTE + ",\n" + kcore_oracle_sql("edges", 4, 8)
    )
    # --- k-truss: the triangle-support peel over the trace
    # co-occurrence graph, unrolled to 4 rounds (fixture converges well
    # within; pinned by the convergence metric).
    from sigraph_spark.operators.graphalgo import ktruss_oracle_sql

    sq["ktruss"] = (
        "WITH " + _EDGES_CTE
        + """,
        truss_co AS (
          SELECT DISTINCT a.node_id AS src, b.node_id AS dst
          FROM containment a JOIN containment b USING (unit_id, trace_id)
          WHERE a.node_id < b.node_id),
"""
        + ktruss_oracle_sql("truss_co", 4, 4)
    )
    # --- random walks: hash-choice determinism means the oracle is the
    # SAME walk, not a distributional check — md5 family, 4 unrolled rounds.
    from sigraph_spark.operators.walks import random_walks_oracle_sql

    sq["random_walks"] = (
        "WITH " + _EDGES_CTE + ",\n" + random_walks_oracle_sql("edges", 2, 4)
    )
    from sigraph_spark.operators.walks import skipgram_oracle_sql

    sq["skipgram_pairs"] = (
        "WITH " + _EDGES_CTE + ",\n" + skipgram_oracle_sql("edges", 2, 4, 2)
    )
    from sigraph_spark.operators.walks import negative_samples_oracle_sql

    _sg = skipgram_oracle_sql("edges", 2, 4, 2)
    _sg_ctes, _sg_final = _sg.rsplit("\n        SELECT a.node AS center,", 1)
    sq["negative_samples"] = (
        "WITH " + _EDGES_CTE + ",\n" + _sg_ctes
        + ",\n        sgp AS MATERIALIZED (\n        SELECT a.node AS center,"
        + _sg_final.replace(
            "CAST(count(*) AS BIGINT) AS n", "1 AS one"
        )
        + "),\n"
        + negative_samples_oracle_sql("sgp", 2)
    )
    # --- snapshot diff: two filtered edge builds (event_id % 11 / % 13
    # survivors), full-outer join, IS DISTINCT FROM == Spark's <=> negation.
    sq["graph_diff"] = (
        "WITH " + SEVENTS_CTE
        + """,
        eo0 AS (
          SELECT CASE WHEN actor_type = 'READ_RECV' THEN node_id ELSE parent_id END AS src,
                 action AS predicate,
                 CASE WHEN actor_type = 'READ_RECV' THEN parent_id ELSE node_id END AS dst,
                 timestamp AS start_time, CAST(weight AS BIGINT) AS weight, span_id
          FROM parsed WHERE has_parent AND event_id % 11 <> 0),
        eo AS (
          SELECT src, predicate, dst, start_time, weight FROM (
            SELECT *, row_number() OVER (
              PARTITION BY src, predicate, dst
              ORDER BY start_time DESC, span_id DESC) AS rn
            FROM eo0) WHERE rn = 1),
        en0 AS (
          SELECT CASE WHEN actor_type = 'READ_RECV' THEN node_id ELSE parent_id END AS src,
                 action AS predicate,
                 CASE WHEN actor_type = 'READ_RECV' THEN parent_id ELSE node_id END AS dst,
                 timestamp AS start_time, CAST(weight AS BIGINT) AS weight, span_id
          FROM parsed WHERE has_parent AND event_id % 13 <> 0),
        en AS (
          SELECT src, predicate, dst, start_time, weight FROM (
            SELECT *, row_number() OVER (
              PARTITION BY src, predicate, dst
              ORDER BY start_time DESC, span_id DESC) AS rn
            FROM en0) WHERE rn = 1),
        d AS (
          SELECT coalesce(o.src, n.src) AS src,
                 coalesce(o.predicate, n.predicate) AS predicate,
                 coalesce(o.dst, n.dst) AS dst,
                 CASE WHEN o.src IS NULL THEN 'added'
                      WHEN n.src IS NULL THEN 'removed'
                      WHEN (o.start_time IS DISTINCT FROM n.start_time)
                        OR (o.weight IS DISTINCT FROM n.weight) THEN 'changed'
                 END AS change,
                 o.start_time AS old_start_time, o.weight AS old_weight,
                 n.start_time AS new_start_time, n.weight AS new_weight
          FROM eo o FULL OUTER JOIN en n
            ON o.src = n.src AND o.predicate = n.predicate AND o.dst = n.dst)
        SELECT * FROM d WHERE change IS NOT NULL
        """
    )
    # --- fixed-point PageRank: same BIGINT micro-unit arithmetic as the
    # Spark loop, unrolled to 5 CTE rounds — exact match, not approximate.
    from sigraph_spark.operators.pagerank import pagerank_oracle_sql

    sq["pagerank"] = (
        "WITH " + _EDGES_CTE + "," + pagerank_oracle_sql("edges")
    )
    # --- weighted PageRank: the same unrolled fixed-point device with
    # weight-proportional flow (rank * w // wtot).
    from sigraph_spark.operators.pagerank import pagerank_weighted_oracle_sql

    sq["pagerank_weighted"] = (
        "WITH " + _EDGES_CTE + ","
        + pagerank_weighted_oracle_sql("edges")
    )
    # --- HITS: L1-normalized exact-integer mutual reinforcement, 4
    # unrolled rounds — bit-exact including every floor division.
    from sigraph_spark.operators.graphalgo import hits_oracle_sql

    sq["hits"] = (
        "WITH " + _EDGES_CTE + "," + hits_oracle_sql("edges")
        + " SELECT node, auth_fp, hub_fp, auth, hub FROM hits_out"
    )
    # --- SPARQL SELECT: LAUNCH hop into the CONNECT+ closure with the
    # inequality filter — recursive CTE restatement.
    sq["sparql_select"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        sqp_c AS (SELECT src AS a, dst AS b FROM edges
                  WHERE predicate = 'CONNECT'),
        sqp_clo AS (
          SELECT a, b FROM sqp_c
          UNION
          SELECT c.a, p.b FROM sqp_clo c JOIN sqp_c p ON p.a = c.b),
        sqp_l AS (SELECT src, dst FROM edges WHERE predicate = 'LAUNCH')
        SELECT DISTINCT l.src AS a, k.b AS c
        FROM sqp_l l JOIN sqp_clo k ON k.a = l.dst
        WHERE l.src <> k.b
        """
    )
    # --- SPARQL aggregates: the same 2-hop join + groupBy in plain SQL.
    sq["sparql_aggregate"] = (
        "WITH " + _EDGES_CTE
        + """,
        sqa_l AS (SELECT src, dst FROM edges WHERE predicate = 'LAUNCH'),
        sqa_c AS (SELECT src, dst FROM edges WHERE predicate = 'CONNECT')
        SELECT l.src AS a,
               CAST(count(*) AS BIGINT) AS n_paths,
               CAST(count(DISTINCT c.dst) AS BIGINT) AS n_targets,
               min(c.dst) AS first_target
        FROM sqa_l l JOIN sqa_c c ON c.src = l.dst
        GROUP BY l.src
        """
    )
    # --- SPARQL CONSTRUCT: closure + two template projections, DISTINCT.
    sq["sparql_construct"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        sqc_c AS (SELECT src AS a, dst AS b FROM edges
                  WHERE predicate = 'CONNECT'),
        sqc_clo AS (
          SELECT a, b FROM sqc_c
          UNION
          SELECT c.a, p.b FROM sqc_clo c JOIN sqc_c p ON p.a = c.b),
        sqc_l AS (SELECT src, dst FROM edges WHERE predicate = 'LAUNCH'),
        sqc_pairs AS (
          SELECT DISTINCT l.src AS a, k.b AS c
          FROM sqc_l l JOIN sqc_clo k ON k.a = l.dst
          WHERE l.src <> k.b)
        SELECT DISTINCT subject, predicate, object FROM (
          SELECT a AS subject, 'reaches' AS predicate, c AS object
          FROM sqc_pairs
          UNION ALL
          SELECT c, 'reached_by', a FROM sqc_pairs)
        """
    )
    # --- SPARQL UNION: branch union (CONNECT plus self-filtered ACCESS)
    # joined back into the LAUNCH triple on the shared ?b.
    sq["sparql_union"] = (
        "WITH " + _EDGES_CTE
        + """,
        squ_l AS (SELECT src, dst FROM edges WHERE predicate = 'LAUNCH'),
        squ_u AS (
          SELECT src AS b, dst AS x FROM edges WHERE predicate = 'CONNECT'
          UNION ALL
          SELECT src, dst FROM edges
          WHERE predicate = 'ACCESS' AND src <> dst)
        SELECT DISTINCT l.src AS a, u.x
        FROM squ_l l JOIN squ_u u ON u.b = l.dst
        """
    )
    # --- SPARQL VALUES with UNDEF: the compatibility join reduces to a
    # predicate keep-list (UNDEF src admits every subject).
    sq["sparql_values"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT DISTINCT predicate AS p, src AS s, dst AS o
        FROM edges WHERE predicate IN ('LAUNCH', 'CONNECT')
        """
    )
    # --- SPARQL ASK: one boolean row.
    sq["sparql_ask"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT EXISTS(
          SELECT 1 FROM edges l JOIN edges a ON a.src = l.dst
          WHERE l.predicate = 'LAUNCH' AND a.predicate = 'LAUNCH'
        ) AS matched
        """
    )
    # --- SPARQL DESCRIBE: incident edges (either side) of every node
    # that LAUNCHes an ACCESSor.
    sq["sparql_describe"] = (
        "WITH " + _EDGES_CTE
        + """,
        sqd_res AS (
          SELECT DISTINCT l.src AS node
          FROM edges l JOIN edges a ON a.src = l.dst
          WHERE l.predicate = 'LAUNCH' AND a.predicate = 'LAUNCH')
        SELECT DISTINCT src AS subject, predicate, dst AS object
        FROM edges
        WHERE src IN (SELECT node FROM sqd_res)
           OR dst IN (SELECT node FROM sqd_res)
        """
    )
    # --- SPARQL FILTER NOT EXISTS: anti-join restatement.
    sq["sparql_not_exists"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT DISTINCT l.src AS a, l.dst AS b
        FROM edges l
        WHERE l.predicate = 'LAUNCH'
          AND NOT EXISTS (SELECT 1 FROM edges k
                          WHERE k.predicate = 'CONNECT' AND k.src = l.dst)
        """
    )
    # --- SPARQL 1.1 Update: the three-op chain restated as set CTEs
    # (UNION is set-distinct; anti-joins become predicate filters
    # because the templates cover whole predicate classes here).
    sq["sparql_update"] = (
        "WITH " + _EDGES_CTE
        + """,
        su_base AS (SELECT DISTINCT src, predicate, dst FROM edges),
        su_s1 AS (
          SELECT src, predicate, dst FROM su_base
          WHERE predicate <> 'CONNECT'
          UNION
          SELECT dst AS src, 'CONNECTED_BY' AS predicate, src AS dst
          FROM su_base WHERE predicate = 'CONNECT'
        ),
        su_s2 AS (
          SELECT src, predicate, dst FROM su_s1
          UNION
          SELECT * FROM (VALUES
            ('seed-a', 'LAUNCH', 'seed-b'),
            ('seed-a', 'LAUNCH', 'seed-c'),
            ('seed-b', 'CONNECTED_BY', 'seed-a'))
            v(src, predicate, dst)
        )
        SELECT src, predicate, dst FROM su_s2
        WHERE predicate <> 'REG_SET'
        """
    )
    # --- breadcrumb taxonomy: the same trails enumerated in SQL,
    # grouped — each page contributes each adjacent pair once.
    sq["breadcrumb_taxonomy"] = """
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        pairs AS (
          SELECT 'Cat' || CAST(i % 5 AS VARCHAR) AS narrower,
                 'Root' AS broader FROM pg
          UNION ALL
          SELECT 'Sub' || CAST(i % 7 AS VARCHAR),
                 'Cat' || CAST(i % 5 AS VARCHAR) FROM pg WHERE i % 3 >= 1
          UNION ALL
          SELECT 'Leaf' || CAST(i % 11 AS VARCHAR),
                 'Sub' || CAST(i % 7 AS VARCHAR) FROM pg WHERE i % 3 = 2)
        SELECT narrower, broader, COUNT(*) AS n_pages
        FROM pairs GROUP BY narrower, broader
    """
    # --- ρDF closure: every rule family is id arithmetic over the
    # synthetic hierarchy (superproperty j-3d, typing 2j', superclass
    # m-2e); UNION is set-distinct so overlaps collapse exactly as the
    # operator's final distinct does.
    sq["rdfs_closure"] = """
        WITH ks AS (SELECT CAST(range AS BIGINT) AS k FROM range(0, 600)),
        ds AS (SELECT CAST(range AS BIGINT) AS d FROM range(0, 3)),
        es AS (SELECT CAST(range AS BIGINT) AS e FROM range(0, 10)),
        jprime AS (
          SELECT k, (k % 9) - 3 * d AS jp
          FROM ks CROSS JOIN ds WHERE (k % 9) - 3 * d >= 0),
        inst AS (
          SELECT 'x' || CAST(k AS VARCHAR) AS src,
                 'p' || CAST(jp AS VARCHAR) AS predicate,
                 'y' || CAST(k AS VARCHAR) AS dst
          FROM jprime),
        subj_types AS (
          SELECT 'x' || CAST(k AS VARCHAR) AS src,
                 'rdf:type' AS predicate,
                 'c' || CAST(2 * jp - 2 * e AS VARCHAR) AS dst
          FROM jprime CROSS JOIN es WHERE 2 * jp - 2 * e >= 0),
        obj_types AS (
          SELECT 'y' || CAST(k AS VARCHAR) AS src,
                 'rdf:type' AS predicate,
                 'c' || CAST(2 * jp + 1 - 2 * e AS VARCHAR) AS dst
          FROM jprime CROSS JOIN es WHERE 2 * jp + 1 - 2 * e >= 1),
        sc AS (
          SELECT 'c' || CAST(i AS VARCHAR) AS src,
                 'rdfs:subClassOf' AS predicate,
                 'c' || CAST(i - 2 * e AS VARCHAR) AS dst
          FROM (SELECT CAST(range AS BIGINT) AS i FROM range(2, 20))
          CROSS JOIN es WHERE e >= 1 AND i - 2 * e >= 0),
        sp AS (
          SELECT 'p' || CAST(i AS VARCHAR) AS src,
                 'rdfs:subPropertyOf' AS predicate,
                 'p' || CAST(i - 3 * e AS VARCHAR) AS dst
          FROM (SELECT CAST(range AS BIGINT) AS i FROM range(3, 9))
          CROSS JOIN es WHERE e >= 1 AND i - 3 * e >= 0),
        domrng AS (
          SELECT 'p' || CAST(j AS VARCHAR) AS src, 'rdfs:domain' AS predicate,
                 'c' || CAST(2 * j AS VARCHAR) AS dst
          FROM (SELECT CAST(range AS BIGINT) AS j FROM range(0, 9))
          UNION
          SELECT 'p' || CAST(j AS VARCHAR), 'rdfs:range',
                 'c' || CAST(2 * j + 1 AS VARCHAR)
          FROM (SELECT CAST(range AS BIGINT) AS j FROM range(0, 9)))
        SELECT src, predicate, dst FROM inst
        UNION SELECT * FROM subj_types
        UNION SELECT * FROM obj_types
        UNION SELECT * FROM sc
        UNION SELECT * FROM sp
        UNION SELECT * FROM domrng
    """
    # --- SPARQL MINUS on the shared ?s: source keep-out list.
    sq["sparql_minus"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT DISTINCT src AS s, dst AS o FROM edges
        WHERE predicate = 'LAUNCH'
          AND src NOT IN (SELECT src FROM edges WHERE predicate = 'CONNECT')
        """
    )
    # --- SPARQL BIND: computed concat column.
    sq["sparql_bind"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT DISTINCT src || '->' || dst AS edge FROM edges
        WHERE predicate = 'LAUNCH'
        """
    )
    # --- SPARQL negated property set: NOT-IN hop restatement.
    sq["sparql_nps"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT DISTINCT l.src AS a, n.dst AS c
        FROM edges l JOIN edges n ON n.src = l.dst
        WHERE l.predicate = 'LAUNCH'
          AND n.predicate NOT IN ('LAUNCH', 'CONNECT')
        """
    )
    # --- SPARQL GROUP_CONCAT/SAMPLE/HAVING: sorted-roster restatement.
    sq["sparql_groupconcat"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT src AS a,
               string_agg(DISTINCT dst, ',' ORDER BY dst) AS targets,
               min(dst) AS first,
               CAST(count(*) AS BIGINT) AS n
        FROM edges WHERE predicate = 'LAUNCH'
        GROUP BY src HAVING count(*) >= 2
        """
    )
    # --- SPARQL subquery: inner aggregate joined on its projection.
    sq["sparql_subquery"] = (
        "WITH " + _EDGES_CTE
        + """,
        sqq_n AS (
          SELECT src AS a, CAST(count(*) AS BIGINT) AS n
          FROM edges WHERE predicate = 'CONNECT' GROUP BY src)
        SELECT DISTINCT l.src AS a, l.dst AS b, q.n
        FROM edges l JOIN sqq_n q ON q.a = l.src
        WHERE l.predicate = 'LAUNCH'
        """
    )
    # --- robots.txt: the oracle enumerates the planted rule table and
    # the per-url longest-match outcomes arithmetically — the Column
    # fold, grouping and match ranking are what the hashes pin.
    sq["robots_rules"] = """
        WITH rj AS (SELECT CAST(range AS BIGINT) AS j FROM range(0, 200)),
        rb AS (SELECT j, 'h' || CAST(j AS VARCHAR) || '.com' AS host,
                      CAST(j % 7 AS VARCHAR) AS a,
                      CAST(j % 9 AS VARCHAR) AS b
               FROM rj)
        SELECT host, '*' AS agent, 'disallow' AS rule,
               '/p' || a || '/' AS prefix FROM rb
        UNION ALL SELECT host, '*', 'allow', '/p' || a || '/ok/' FROM rb
        UNION ALL SELECT host, '*', 'unsupported', '/*.gif$' FROM rb
        WHERE j % 4 = 0
        UNION ALL SELECT host, 'fastbot', 'disallow', '/x' || b FROM rb
        WHERE j % 3 = 0
        UNION ALL SELECT host, 'slowbot', 'disallow', '/x' || b FROM rb
        WHERE j % 3 = 0
        """
    # variants 1-3 build host-level urls (no per-i component), so the
    # 10000 inputs collapse to one row per DISTINCT url — hosts h where
    # h % 4 == v (200 | 10000 and 4 | 200, so i % 4 == (i % 200) % 4).
    sq["robots_allowed"] = """
        WITH ri AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        rb AS (SELECT i, CAST((i % 200) % 7 AS VARCHAR) AS a,
                      'https://h' || CAST(i % 200 AS VARCHAR) || '.com' AS base
               FROM ri),
        rh AS (SELECT CAST(range AS BIGINT) AS j FROM range(0, 200)),
        hb AS (SELECT j, CAST(j % 7 AS VARCHAR) AS a,
                      'https://h' || CAST(j AS VARCHAR) || '.com' AS base
               FROM rh)
        SELECT base || '/p' || a || '/f' || CAST(i AS VARCHAR) AS url,
               FALSE AS allowed, 'disallow' AS matched_rule,
               '/p' || a || '/' AS matched_prefix
        FROM rb WHERE i % 4 = 0
        UNION ALL
        SELECT base || '/p' || a || '/ok/f', TRUE, 'allow',
               '/p' || a || '/ok/'
        FROM hb WHERE j % 4 = 1
        UNION ALL
        SELECT base || '/other/f', TRUE, NULL, NULL FROM hb WHERE j % 4 = 2
        UNION ALL
        SELECT base, TRUE, NULL, NULL FROM hb WHERE j % 4 = 3
        """
    # --- crawl feed: planted sitemap entries + window restatement of the
    # politeness batches.
    sq["sitemap_parse"] = """
        WITH sj AS (SELECT CAST(range AS BIGINT) AS j FROM range(0, 500)),
        sk AS (SELECT j, CAST(k AS BIGINT) AS k
               FROM sj, UNNEST(range(0, 3)) t(k) WHERE k <= j % 3)
        SELECT 'https://s' || CAST(j AS VARCHAR) || '.com/sitemap.xml'
                 AS sitemap_url,
               'url' AS kind,
               'https://s' || CAST(j AS VARCHAR) || '.com/p'
                 || CAST(k AS VARCHAR) AS loc,
               CASE WHEN (j + k) % 2 = 0
                    THEN '2024-01-0' || CAST(1 + (j + k) % 9 AS VARCHAR)
               END AS lastmod
        FROM sk
        UNION ALL
        SELECT 'https://s' || CAST(j AS VARCHAR) || '.com/sitemap.xml',
               'index',
               'https://s' || CAST(j AS VARCHAR) || '.com/sub.xml', NULL
        FROM sj WHERE j % 5 = 0
        """
    sq["frontier_schedule"] = """
        WITH fi AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 10000)),
        fu AS (SELECT 'https://h' || CAST(i % 97 AS VARCHAR) || '.com/p'
                 || CAST(i AS VARCHAR) AS url,
               'h' || CAST(i % 97 AS VARCHAR) || '.com' AS host,
               CAST(i % 13 AS INT) AS prio
               FROM fi)
        SELECT url, host,
               CAST((row_number() OVER (
                 PARTITION BY host ORDER BY prio DESC, url) - 1) // 3
                 AS BIGINT) AS batch
        FROM fu
        """
    # warm-start: phase 1 (cold, 5 rounds) over the base subgraph, phase 2
    # (3 rounds) over the FULL graph initialized from phase 1's ranks —
    # both phases the same exact integer recurrence, composed via CTE
    # prefixes (pb_ cold, pw_ warm).
    sq["pagerank_resume"] = (
        "WITH " + _EDGES_CTE + ","
        + "base_e AS (SELECT src, dst FROM edges WHERE predicate <> 'write'),"
        + pagerank_oracle_sql(
            "base_e", prefix="pb_", iterations=5, final_select=False
        )
        + ","
        + pagerank_oracle_sql(
            "edges", prefix="pw_", iterations=3, init_rel="pb_r5"
        )
    )
    from sigraph_spark.operators.pagerank import ppr_oracle_sql

    sq["ppr"] = (
        "WITH " + _EDGES_CTE + ","
        + ppr_oracle_sql("edges", "starts_with(node, 'proc_')")
    )
    sq["graph_traces"] = (
        "WITH " + SEVENTS_CTE
        + """,
        ranked AS (
          SELECT unit_id, trace_id, process_name,
                 row_number() OVER (PARTITION BY unit_id, trace_id
                                    ORDER BY timestamp, span_id) AS rn
          FROM parsed),
        agg AS (
          SELECT unit_id, trace_id, min(timestamp) AS start_time,
                 CAST(count(*) AS BIGINT) AS span_count
          FROM parsed GROUP BY unit_id, trace_id)
        SELECT agg.unit_id, agg.trace_id, agg.start_time,
               ranked.process_name AS representative_process_name,
               agg.span_count
        FROM agg JOIN ranked
          ON agg.unit_id = ranked.unit_id AND agg.trace_id = ranked.trace_id
        WHERE ranked.rn = 1
        """
    )
    sq["trace_contains"] = (
        "WITH " + _EDGES_CTE
        + " SELECT unit_id, trace_id, node_id FROM containment"
    )
    sq["trace_spans"] = (
        "WITH " + SEVENTS_CTE
        + " SELECT DISTINCT unit_id, trace_id, span_id FROM parsed"
    )
    # merge-twice == recompute-from-union for the span side table
    sq["graph_merge_spans"] = sq["trace_spans"]
    sq["rule_matches"] = (
        "WITH " + SEVENTS_CTE
        + """
        SELECT DISTINCT unnest(related_rule_ids) AS rule_id, node_id
        FROM parsed WHERE related_rule_ids IS NOT NULL
        """
    )
    sq["adjacency"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT src,
               array_to_string(list_sort(list(predicate || '->' || dst)), ';') AS out_edges,
               CAST(count(*) AS BIGINT) AS out_degree
        FROM edges GROUP BY src
        """
    )
    sq["degree_table"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT node_id, CAST(count(*) AS BIGINT) AS degree FROM (
          SELECT src AS node_id FROM edges
          UNION ALL SELECT dst FROM edges
          UNION ALL SELECT node_id FROM containment)
        GROUP BY node_id
        """
    )
    sq["iocs"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT coalesce(n.image, '') AS image,
               n.node_id AS artifact,
               n.label AS artifact_type,
               array_to_string(list_sort(list(DISTINCT c.trace_id)), ',') AS related_trace_ids
        FROM nodes n
        JOIN containment c ON c.node_id = n.node_id AND c.unit_id = 'u-1'
        WHERE n.label <> 'PROCESS'
        GROUP BY n.node_id, n.label, n.image
        """
    )
    sq["traces_listing"] = (
        "WITH " + SEVENTS_CTE
        + """,
        ranked AS (
          SELECT unit_id, trace_id, process_name,
                 row_number() OVER (PARTITION BY unit_id, trace_id
                                    ORDER BY timestamp, span_id) AS rn
          FROM parsed),
        agg AS (
          SELECT unit_id, trace_id, min(timestamp) AS start_time,
                 CAST(count(*) AS BIGINT) AS span_count
          FROM parsed GROUP BY unit_id, trace_id)
        SELECT agg.unit_id, agg.trace_id, agg.start_time,
               ranked.process_name AS representative_process_name, agg.span_count
        FROM agg JOIN ranked
          ON agg.unit_id = ranked.unit_id AND agg.trace_id = ranked.trace_id
        WHERE ranked.rn = 1 AND agg.unit_id = 'u-1' AND agg.span_count >= 2
        """
    )
    # --- keyset pagination: page 2 via ROW(key) > (scalar-subquery cursor)
    sq["traces_page"] = (
        "WITH " + SEVENTS_CTE
        + """,
        ranked AS (
          SELECT unit_id, trace_id, process_name,
                 row_number() OVER (PARTITION BY unit_id, trace_id
                                    ORDER BY timestamp, span_id) AS rn
          FROM parsed),
        agg AS (
          SELECT unit_id, trace_id, min(timestamp) AS start_time,
                 CAST(count(*) AS BIGINT) AS span_count
          FROM parsed GROUP BY unit_id, trace_id),
        listing AS (
          SELECT agg.unit_id, agg.trace_id, agg.start_time,
                 ranked.process_name AS representative_process_name, agg.span_count
          FROM agg JOIN ranked
            ON agg.unit_id = ranked.unit_id AND agg.trace_id = ranked.trace_id
          WHERE ranked.rn = 1 AND agg.unit_id = 'u-1' AND agg.span_count >= 2),
        page1 AS (
          SELECT * FROM listing ORDER BY start_time, trace_id LIMIT 2),
        cursor AS (
          SELECT max(ROW(start_time, trace_id)) AS c FROM page1)
        SELECT * FROM listing
        WHERE ROW(start_time, trace_id) > (SELECT c FROM cursor)
        ORDER BY start_time, trace_id LIMIT 2
        """
    )
    sq["neighborhood"] = (
        "WITH " + _EDGES_CTE
        + """,
        targets AS (
          SELECT node_id FROM (
            SELECT DISTINCT node_id FROM (
              SELECT src AS node_id FROM edges UNION SELECT dst FROM edges))
          WHERE node_id LIKE 'a@1%' ORDER BY node_id LIMIT 2)
        SELECT rendering FROM (
          SELECT DISTINCT src || ' - ' || predicate || ' -> ' || dst AS rendering
          FROM edges WHERE src IN (SELECT node_id FROM targets)
                        OR dst IN (SELECT node_id FROM targets))
        ORDER BY rendering LIMIT 50
        """
    )
    sq["related_traces"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        und AS (
          SELECT DISTINCT src AS x, dst AS y FROM edges
          UNION SELECT dst AS x, src AS y FROM edges),
        seed AS (
          SELECT DISTINCT trace_id, node_id AS x FROM containment
          WHERE unit_id = 'u-2'),
        reach(trace_id, x, hops) AS (
          SELECT trace_id, x, 0 FROM seed
          UNION
          SELECT r.trace_id, e.y, r.hops + 1
          FROM reach r JOIN und e ON r.x = e.x WHERE r.hops < 3),
        minreach AS (
          SELECT trace_id, x, min(hops) AS hops FROM reach GROUP BY 1, 2)
        SELECT t1, t2, CAST(min(plen) AS BIGINT) AS hops FROM (
          SELECT a.trace_id AS t1, b.trace_id AS t2, a.hops + b.hops AS plen
          FROM minreach a JOIN minreach b ON a.x = b.x AND a.trace_id < b.trace_id)
        WHERE plen <= 3 GROUP BY t1, t2
        """
    )
    sq["debris"] = (
        "WITH " + _EDGES_CTE
        + """,
        single AS (
          SELECT unit_id, trace_id FROM containment
          GROUP BY 1, 2 HAVING count(*) = 1),
        deg AS (
          SELECT node_id, count(*) AS degree FROM (
            SELECT src AS node_id FROM edges
            UNION ALL SELECT dst FROM edges
            UNION ALL SELECT node_id FROM containment)
          GROUP BY node_id)
        SELECT c.unit_id, c.trace_id, c.node_id
        FROM containment c
        JOIN single s ON c.unit_id = s.unit_id AND c.trace_id = s.trace_id
        JOIN deg d ON d.node_id = c.node_id AND d.degree = 1
        """
    )
    sq["sigma_filter"] = """
        SELECT event_id, event_type FROM events
        WHERE (event_type = 'error' AND props LIKE '%9%')
           OR (event_type LIKE 'sign%' AND NOT (event_type LIKE 'cl%'))
    """
    # --- sigma correlation: tumbling epoch-DIV-span buckets + count.
    sq["sigma_correlation"] = """
        WITH m AS (
          SELECT user_id, ts FROM events WHERE event_type LIKE 'sign%'),
        b AS (
          SELECT user_id,
                 make_timestamp(
                   (CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(floor(epoch(ts)) AS BIGINT) % 604800)
                   * 1000000) AS window_start
          FROM m),
        a AS (SELECT user_id, window_start, COUNT(*) AS agg_value
              FROM b GROUP BY user_id, window_start)
        SELECT 'corr-signs' AS rule_id, user_id, window_start, agg_value
        FROM a WHERE agg_value >= 2
    """
    sq["sigma_sequences"] = """
        SELECT user_id,
               string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id) AS sequence,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        WHERE event_type LIKE 'sign%'
        GROUP BY user_id
    """
    # sysmon pipeline: category -> EventID gate + generic-field rename,
    # restated as plain predicates over the same synthesized columns
    sq["sigma_sysmon"] = r"""
        WITH s AS (
          SELECT event_id,
                 CAST(event_id % 30 AS INT) AS EventID,
                 'C:\tools\proc_' || CAST(user_id % 7 AS VARCHAR) ||
                   CASE WHEN event_type = 'error' THEN '.tmp' ELSE '.exe' END
                   AS Image,
                 'run --' || event_type AS CommandLine,
                 CAST((user_id * 13) % 1024 AS INT) AS DestinationPort
          FROM events)
        SELECT event_id, 'proc-click' AS rule_id FROM s
        WHERE EventID = 1 AND Image LIKE '%.exe'
          AND contains(CommandLine, 'click')
        UNION ALL
        SELECT event_id, 'net-c2' AS rule_id FROM s
        WHERE EventID = 3 AND DestinationPort IN (443, 445)
    """
    # --- sigma value modifiers: the oracle restates WHICH event_ids
    # each rule must match, arithmetically — the Spark side does the
    # real windash expansion / base64 encodes / CIDR mask math, so the
    # hash pins those transforms end-to-end.
    sq["sigma_modifiers"] = """
        SELECT event_id, 'windash' AS rule FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_id, 'b64' FROM events WHERE event_id % 7 = 0
        UNION ALL
        SELECT event_id, 'b64off' FROM events WHERE event_id % 5 <> 0
        UNION ALL
        SELECT event_id, 'cidr' FROM events
        WHERE event_id % 2 = 0 AND event_id % 11 <> 0
        UNION ALL
        SELECT event_id, 'gt' FROM events
        WHERE event_id % 13 <> 0 AND event_id % 9973 > 5000
        UNION ALL
        SELECT event_id, 'lte' FROM events
        WHERE event_id % 13 <> 0 AND event_id % 9973 <= 1024
        UNION ALL
        SELECT event_id, 'wide' FROM events WHERE event_id % 3 = 0
        UNION ALL
        SELECT event_id, 'utf16be' FROM events WHERE event_id % 3 = 0
        UNION ALL
        SELECT event_id, 'exists' FROM events WHERE event_id % 4 = 0
        UNION ALL
        SELECT event_id, 'absent' FROM events WHERE event_id % 4 <> 0
        UNION ALL
        SELECT event_id, 'fieldref' FROM events
        WHERE event_id % 6 = event_id % 3
        UNION ALL
        SELECT event_id, 'fieldref_contains' FROM events
        WHERE event_id % 2 = 0
    """
    sq["text_tokens"] = r"""
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE length(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS ws_tokens,
               CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
               CAST(length(regexp_extract_all(text, '[A-Za-z0-9_'']+')) AS BIGINT) AS n_words
        FROM documents
    """
    sq["text_quality"] = r"""
        WITH feat AS (
          SELECT doc_id,
                 CAST(length(text) AS DOUBLE) AS n_chars_text,
                 CAST(length(regexp_extract_all(text, '[A-Za-z0-9_'']+')) AS DOUBLE) AS n_words,
                 CAST(length(regexp_replace(text, '[^A-Za-z0-9_'']', '', 'g')) AS DOUBLE) AS word_chars,
                 CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
                 CAST(length(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS n_upper,
                 CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it|was|for)\b')) AS DOUBLE) AS n_stop
          FROM documents),
        ratio AS (
          SELECT doc_id, n_chars_text, n_words,
                 word_chars / greatest(n_words, 1.0) AS mean_word_len,
                 n_punct / greatest(n_chars_text, 1.0) AS punct_ratio,
                 n_stop / greatest(n_words, 1.0) AS stopword_ratio,
                 n_upper / greatest(n_chars_text, 1.0) AS upper_ratio
          FROM feat)
        SELECT doc_id,
               CAST(n_chars_text AS BIGINT) AS n_chars_text,
               CAST(n_words AS BIGINT) AS n_words,
               round(mean_word_len, 4) AS mean_word_len,
               round(punct_ratio, 4) AS punct_ratio,
               round(stopword_ratio, 4) AS stopword_ratio,
               round(upper_ratio, 4) AS upper_ratio,
               round(
                 (CASE WHEN n_words >= 5 AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
                       THEN 1.0 ELSE 0.0 END)
                 * (0.4 * least(stopword_ratio * 5.0, 1.0)
                    + 0.3 * greatest(0.0, 1.0 - punct_ratio * 4.0)
                    + 0.3 * greatest(0.0, 1.0 - upper_ratio * 2.0)), 4) AS quality_score
        FROM ratio
    """
    sq["text_langid"] = r"""
        WITH s AS (
          SELECT doc_id,
            length(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it|was|for)\b')) AS s_en,
            length(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|mit|auf|zu)\b')) AS s_de,
            length(regexp_extract_all(lower(text), '\b(le|la|et|les|des|est|un|une|dans|que)\b')) AS s_fr,
            length(regexp_extract_all(lower(text), '\b(el|la|de|que|los|una|por|con|para|las)\b')) AS s_es
          FROM documents)
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM s
    """
    sq["text_fingerprint"] = """
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(7 AS BIGINT),
                   list_transform(regexp_extract_all(substr(coalesce(text, ''), 1, 4096), '(?s).'),
                                  c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 72057594037927931) AS fingerprint
        FROM documents
    """
    sq["dedup_exact"] = """
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY sha256(coalesce(text, ''))) AS canonical_id,
               sha256(coalesce(text, '')) AS content_hash
        FROM documents
    """
    sq["dedup_prefix"] = """
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY sha256(coalesce(substr(text, 1, 20), ''))) AS canonical_id,
               sha256(coalesce(substr(text, 1, 20), '')) AS content_hash
        FROM documents
    """
    sq["ngram_jaccard"] = r"""
        WITH d AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents WHERE doc_id % 10 = 0),
        sh AS (
          -- docs with <3 words use the whole text as the single shingle,
          -- matching Spark's _word_shingles short-input fallback (a 2-word
          -- doc must not produce a NULL out-of-range shingle)
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                        ELSE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                             || ' ' || w[CAST(i AS INT) + 2] END AS s
            FROM d, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
          WHERE s IS NOT NULL),
        cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT inter.a, inter.b,
               CAST(inter.i AS BIGINT) AS jaccard_num,
               CAST(ca.c + cb.c - inter.i AS BIGINT) AS jaccard_den
        FROM inter
        JOIN cnt ca ON ca.doc_id = inter.a
        JOIN cnt cb ON cb.doc_id = inter.b
    """
    sq["containment_pairs"] = r"""
        WITH d AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                        ELSE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                             || ' ' || w[CAST(i AS INT) + 2] END AS s
            FROM d, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
          WHERE s IS NOT NULL),
        cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT inter.a, inter.b,
               CAST(inter.i AS BIGINT) AS n_common,
               round(CAST(inter.i AS DOUBLE) / ca.c, 6) AS containment_ab,
               round(CAST(inter.i AS DOUBLE) / cb.c, 6) AS containment_ba
        FROM inter
        JOIN cnt ca ON ca.doc_id = inter.a
        JOIN cnt cb ON cb.doc_id = inter.b
        WHERE greatest(round(CAST(inter.i AS DOUBLE) / ca.c, 6),
                       round(CAST(inter.i AS DOUBLE) / cb.c, 6)) >= 0.5
    """
    # --- shared distinct-3-gram CTE for the contamination family (same
    # short-doc fallback as the Spark _word_shingles construction)
    _DSH = r"""
        d AS (SELECT doc_id,
                     string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS w
              FROM documents),
        dsh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                        ELSE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                             || ' ' || w[CAST(i AS INT) + 2] END AS s
            FROM d, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
          WHERE s IS NOT NULL)
    """
    sq["decontaminate"] = (
        "WITH " + _DSH
        + """,
        ev AS (SELECT DISTINCT s FROM dsh WHERE doc_id % 37 = 0),
        tr AS (SELECT doc_id, s FROM dsh WHERE doc_id % 37 <> 0)
        SELECT tr.doc_id,
               CAST(count(*) AS BIGINT) AS total_ngrams,
               CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS overlap_ngrams,
               CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) >= 1
                    AS INT) AS contaminated
        FROM tr LEFT JOIN ev ON tr.s = ev.s
        GROUP BY tr.doc_id
        """
    )
    sq["dup_spans"] = (
        "WITH " + _DSH
        + """,
        c AS (SELECT s, count(*) AS doc_count FROM dsh GROUP BY s)
        SELECT dsh.doc_id,
               CAST(count(*) AS BIGINT) AS total_ngrams,
               CAST(sum(CASE WHEN c.doc_count > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS shared_ngrams,
               round(sum(CASE WHEN c.doc_count > 1 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS dup_span_ratio
        FROM dsh JOIN c ON dsh.s = c.s
        GROUP BY dsh.doc_id
        """
    )
    # --- span-removal rewrite: DuckDB 1-based inclusive slices clamp at
    # the array end exactly like Spark's slice(arr, start, length).
    sq["remove_dup_spans"] = r"""
        WITH d AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS w
          FROM documents),
        ch AS (
          SELECT doc_id, CAST(i AS INT) AS pos,
                 array_to_string(w[CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' ') AS span
          FROM d, UNNEST(range(0, greatest(CAST(ceil(len(w) / 10.0) AS BIGINT), 1))) AS t(i)),
        k AS (
          SELECT doc_id, pos, span,
                 row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
          FROM ch),
        reb AS (
          SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS kept
          FROM k WHERE rn = 1 GROUP BY doc_id),
        per AS (SELECT doc_id, count(*) AS n_spans FROM ch GROUP BY doc_id)
        SELECT per.doc_id,
               coalesce(reb.clean_text, '') AS clean_text,
               CAST(per.n_spans AS BIGINT) AS n_spans,
               CAST(coalesce(reb.kept, 0) AS BIGINT) AS kept_spans
        FROM per LEFT JOIN reb ON reb.doc_id = per.doc_id
    """
    # --- keep-list: Jaccard>=0.5 pairs on the %10 slice -> reachability
    # closure -> min-id representative; singletons keep themselves.
    sq["dedup_keeplist"] = (
        "WITH RECURSIVE " + _DSH
        + """,
        sub AS (SELECT doc_id, s FROM dsh WHERE doc_id % 10 = 0),
        cnt AS (SELECT doc_id, count(*) AS c FROM sub GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          FROM sub x JOIN sub y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT a, b FROM inter
          JOIN cnt ca ON ca.doc_id = inter.a
          JOIN cnt cb ON cb.doc_id = inter.b
          WHERE inter.i * 2 >= ca.c + cb.c - inter.i),
        und AS (SELECT a AS x, b AS y FROM pairs
                UNION SELECT b, a FROM pairs),
        reach(x, r) AS (
          SELECT DISTINCT x, x AS r FROM und
          UNION
          SELECT u.y, r.r FROM reach r JOIN und u ON u.x = r.x),
        canon AS (SELECT x AS doc_id, min(r) AS cluster_id FROM reach GROUP BY x)
        SELECT dd.doc_id,
               coalesce(canon.cluster_id, dd.doc_id) AS cluster_id,
               CAST(dd.doc_id = coalesce(canon.cluster_id, dd.doc_id) AS INT) AS keep
        FROM (SELECT DISTINCT doc_id FROM sub) dd
        LEFT JOIN canon ON canon.doc_id = dd.doc_id
        """
    )
    # --- link graph: identical html reconstruction + same href regex in
    # both engines; relative hrefs dropped by the ://-containment filter.
    sq["link_graph"] = r"""
        WITH p AS (
          SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
                 '<html><body><p>' || coalesce(text, '')
                 || '</p><a href="'
                 || 'https://h' || CAST(((doc_id * 7 + 1) % 1000) % 7 AS VARCHAR)
                 || '.example.com/d/' || CAST((doc_id * 7 + 1) % 1000 AS VARCHAR)
                 || '">x</a> <a href='''
                 || 'https://h' || CAST(((doc_id * 13 + 5) % 1000) % 7 AS VARCHAR)
                 || '.example.com/d/' || CAST((doc_id * 13 + 5) % 1000 AS VARCHAR)
                 || '''>y</a><a href=''/rel''>r</a></body></html>' AS html
          FROM documents),
        l AS (
          SELECT url,
                 unnest(regexp_extract_all(html, 'href=["'']([^"'']+)["'']', 1))
                   AS target
          FROM p)
        SELECT split_part(split_part(url, '://', 2), '/', 1) AS src_host,
               split_part(split_part(target, '://', 2), '/', 1) AS dst_host,
               CAST(count(*) AS BIGINT) AS n_links
        FROM l WHERE contains(target, '://')
        GROUP BY 1, 2
    """
    # --- URL canonicalization: identical rule chain in SQL (list_filter/
    # list_sort == Spark filter/array_sort under binary collation).
    _TRK = "', '".join(
        p for p in (
            "utm_source", "utm_medium", "utm_campaign", "utm_term",
            "utm_content", "gclid", "fbclid", "ref", "mc_cid", "mc_eid",
        )
    )
    sq["url_canonical"] = f"""
        WITH d AS (
          SELECT doc_id,
                 CASE doc_id % 4
                   WHEN 0 THEN 'HTTPS://Host' || CAST(doc_id % 7 AS VARCHAR)
                        || '.Example.com:443/P/' || CAST(doc_id AS VARCHAR)
                        || '/?utm_source=x&b=2&a=1#f'
                   WHEN 1 THEN 'http://host' || CAST(doc_id % 7 AS VARCHAR)
                        || '.example.com:80/p/' || CAST(doc_id AS VARCHAR)
                   WHEN 2 THEN 'https://host' || CAST(doc_id % 7 AS VARCHAR)
                        || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                        || '?z=9&utm_campaign=c&fbclid=y'
                   ELSE 'https://Host' || CAST(doc_id % 7 AS VARCHAR)
                        || '.Example.com/p/' || CAST(doc_id AS VARCHAR) || '/'
                 END AS url
          FROM documents),
        s1 AS (
          SELECT doc_id, split_part(trim(url), '#', 1) AS u FROM d),
        s2 AS (
          SELECT doc_id, u,
                 split_part(u, '?', 1) AS base,
                 CASE WHEN contains(u, '?')
                      THEN substr(u, length(split_part(u, '?', 1)) + 2)
                 END AS query
          FROM s1),
        s3 AS (
          SELECT doc_id, query,
                 lower(split_part(base, '://', 1)) AS scheme,
                 split_part(base, '://', 2) AS rest,
                 lower(split_part(split_part(base, '://', 2), '/', 1)) AS hostport
          FROM s2),
        s4 AS (
          SELECT doc_id, query, scheme,
                 regexp_replace(hostport, ':(80|443)$', '') AS host,
                 CASE WHEN contains(rest, '/')
                      THEN substr(rest, length(hostport) + 1) ELSE '' END AS path0
          FROM s3),
        s5 AS (
          SELECT doc_id, scheme, host,
                 CASE WHEN length(path0) > 1
                      THEN regexp_replace(path0, '/$', '') ELSE path0 END AS path,
                 list_sort(list_filter(
                   string_split(coalesce(query, ''), '&'),
                   x -> x <> '' AND NOT list_contains(
                     ['{_TRK}'], lower(split_part(x, '=', 1)))))
                   AS keep
          FROM s4)
        SELECT doc_id,
               scheme || '://' || host || path ||
               CASE WHEN len(keep) > 0
                    THEN '?' || array_to_string(keep, '&') ELSE '' END
                 AS canonical
        FROM s5
    """
    # --- blocklist: suffix-chain membership via NOT EXISTS over the same
    # exploded chain (label-boundary matching, not LIKE infix).
    sq["url_blocklist"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'https://' ||
                 CASE WHEN doc_id % 3 = 0
                      THEN 'h' || CAST(doc_id % 5 AS VARCHAR) || '.blocked.net'
                      ELSE 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
                 END || '/p/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents),
        blocked(host) AS (VALUES ('blocked.net'), ('h2.example.com')),
        hosts AS (
          SELECT doc_id, url,
                 string_split(
                   regexp_replace(
                     split_part(split_part(lower(url), '://', 2), '/', 1),
                     ':\d+$', ''),
                   '.') AS labels
          FROM d)
        SELECT doc_id, url FROM hosts
        WHERE NOT EXISTS (
          SELECT 1 FROM UNNEST(range(0, greatest(len(labels) - 1, 1))) AS t(i)
          JOIN blocked
            ON blocked.host = array_to_string(
                 labels[CAST(i + 1 AS INT):CAST(len(labels) AS INT)], '.'))
    """
    # --- host pagerank: link-graph CTEs composed with the unrolled
    # fixed-point pagerank block (bit-identical BIGINT arithmetic).
    from sigraph_spark.operators.pagerank import pagerank_oracle_sql as _pr2

    sq["host_pagerank"] = r"""
        WITH p AS (
          SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
                 '<html><body><p>' || coalesce(text, '')
                 || '</p><a href="'
                 || 'https://h' || CAST(((doc_id * 7 + 1) % 1000) % 7 AS VARCHAR)
                 || '.example.com/d/' || CAST((doc_id * 7 + 1) % 1000 AS VARCHAR)
                 || '">x</a> <a href='''
                 || 'https://h' || CAST(((doc_id * 13 + 5) % 1000) % 7 AS VARCHAR)
                 || '.example.com/d/' || CAST((doc_id * 13 + 5) % 1000 AS VARCHAR)
                 || '''>y</a><a href=''/rel''>r</a></body></html>' AS html
          FROM documents),
        l AS (
          SELECT url,
                 unnest(regexp_extract_all(html, 'href=["'']([^"'']+)["'']', 1))
                   AS target
          FROM p),
        lg AS (
          SELECT split_part(split_part(url, '://', 2), '/', 1) AS src,
                 split_part(split_part(target, '://', 2), '/', 1) AS dst
          FROM l WHERE contains(target, '://')),
    """ + _pr2("lg").lstrip()
    # --- WARC round trip: the oracle recomputes url/ts/bytes/fingerprint
    # straight from documents — equality proves the framing+parse path
    # preserved every payload byte. encode() is DuckDB's VARCHAR->BLOB
    # (UTF-8), octet_length counts its bytes like Spark length(binary).
    sq["warc_roundtrip"] = """
        SELECT 'https://corpus.example/' || CAST(doc_id AS VARCHAR) AS url,
               TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id) AS warc_ts,
               CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
               list_reduce(
                 list_prepend(CAST(7 AS BIGINT),
                   list_transform(regexp_extract_all(substr(coalesce(text, ''), 1, 4096), '(?s).'),
                                  c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 72057594037927931) AS fingerprint
        FROM documents
    """
    # --- WARC/1.0 round trip: same oracle device as warc_roundtrip,
    # plus the planted per-doc HTTP status.
    sq["warc10_roundtrip"] = """
        SELECT 'https://corpus.example/' || CAST(doc_id AS VARCHAR) AS url,
               TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id) AS warc_ts,
               CAST(CASE WHEN doc_id % 11 = 3 THEN 404 ELSE 200 END
                    AS BIGINT) AS http_status,
               CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
               list_reduce(
                 list_prepend(CAST(7 AS BIGINT),
                   list_transform(regexp_extract_all(substr(coalesce(text, ''), 1, 4096), '(?s).'),
                                  c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 72057594037927931) AS fingerprint
        FROM documents
    """
    # --- curation funnel: the textstats signals composed, first failing
    # rule wins (same CASE precedence as the Column chain).
    sq["curation_funnel"] = r"""
        WITH feat AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS w,
                 CAST(length(text) AS DOUBLE) AS n_chars_text,
                 CAST(length(regexp_extract_all(text, '[A-Za-z0-9_'']+')) AS DOUBLE) AS n_words,
                 CAST(length(regexp_replace(text, '[^A-Za-z0-9_'']', '', 'g')) AS DOUBLE) AS word_chars,
                 CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
                 CAST(length(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS n_upper,
                 CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it|was|for)\b')) AS DOUBLE) AS n_stop,
                 length(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it|was|for)\b')) AS s_en,
                 length(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|mit|auf|zu)\b')) AS s_de,
                 length(regexp_extract_all(lower(text), '\b(le|la|et|les|des|est|un|une|dans|que)\b')) AS s_fr,
                 length(regexp_extract_all(lower(text), '\b(el|la|de|que|los|una|por|con|para|las)\b')) AS s_es
          FROM documents),
        grams AS (
          SELECT doc_id, count(*) AS total, count(DISTINCT s) AS dis FROM (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                        ELSE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                             || ' ' || w[CAST(i AS INT) + 2] END AS s
            FROM feat, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
          GROUP BY doc_id),
        sig AS (
          SELECT feat.doc_id, n_words,
                 CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                      WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                      WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                      WHEN s_fr >= s_es THEN 'fr'
                      ELSE 'es' END AS lang_pred,
                 round((total - dis) / CAST(total AS DOUBLE), 6) AS dup_ngram_ratio,
                 (CASE WHEN n_words >= 5
                            AND word_chars / greatest(n_words, 1.0) >= 2.0
                            AND word_chars / greatest(n_words, 1.0) <= 12.0
                       THEN 1.0 ELSE 0.0 END)
                 * (0.4 * least(n_stop / greatest(n_words, 1.0) * 5.0, 1.0)
                    + 0.3 * greatest(0.0, 1.0 - n_punct / greatest(n_chars_text, 1.0) * 4.0)
                    + 0.3 * greatest(0.0, 1.0 - n_upper / greatest(n_chars_text, 1.0) * 2.0))
                   AS q
          FROM feat JOIN grams ON grams.doc_id = feat.doc_id)
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               lang_pred,
               round(q, 4) AS quality_score,
               dup_ngram_ratio,
               CASE WHEN n_words < 10 THEN 'too_short'
                    WHEN n_words > 1000000 THEN 'too_long'
                    WHEN lang_pred <> 'en' THEN 'wrong_lang'
                    WHEN q < 0.15 THEN 'low_quality'
                    WHEN dup_ngram_ratio > 0.35 THEN 'repetitive'
                    ELSE 'pass' END AS verdict
        FROM sig
    """
    # embeddings are FLOAT[] — cast to DOUBLE[] so DuckDB accumulates the
    # dot product in float64 like Spark's zip_with/aggregate path does
    sq["embedding_topk"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, c.vec_id,
                 round(list_dot_product(c.v, q.qv)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
          FROM e c CROSS JOIN q)
        SELECT query_id, vec_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored)
        WHERE rank <= 10
    """
    sq["embedding_centroids"] = """
        WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        x AS (
          SELECT label, CAST(i - 1 AS INT) AS dim, v[CAST(i AS INT)] AS val
          FROM e, UNNEST(range(1, len(v) + 1)) AS t(i)),
        pd AS (
          SELECT label, dim, round(avg(val), 6) AS m, count(*) AS c
          FROM x GROUP BY 1, 2)
        SELECT label, CAST(max(c) AS BIGINT) AS n_vectors,
               list(m ORDER BY dim) AS centroid
        FROM pd GROUP BY label
    """
    sq["embedding_neardup"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        scored AS (
          SELECT a.vec_id AS a, b.vec_id AS b,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT a, b, cosine FROM scored WHERE cosine >= 0.5
    """
    # --- LSH similarity: the hyperplanes are deterministic constants
    # (similarity._hyperplane), embedded below as double literals (repr()
    # round-trips IEEE754 exactly), so bucket bits reproduce in any engine.
    _NORM_CTE = """
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        u AS (SELECT vec_id, v, nrm,
                     CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
                          ELSE v END AS uv
              FROM n)
    """
    sq["lsh_topk"] = (
        "WITH " + _NORM_CTE + f""",
        b AS (SELECT vec_id, v, nrm, {_lsh_bucket_sql('uv', 64, 4, 0)} AS bucket FROM u),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket
              FROM b WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, c.vec_id,
                 round(list_dot_product(c.v, q.qv) / (c.nrm * q.qn), 6) AS cosine
          FROM b c JOIN q USING (bucket))
        SELECT query_id, vec_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored)
        WHERE rank <= 10
        """
    )
    _ndl_buckets = ", ".join(
        _lsh_bucket_sql("uv", 64, 4, band * 4) + f" AS bk{band}" for band in range(8)
    )
    _ndl_bucket_list = "[" + ", ".join(f"bk{band}" for band in range(8)) + "]"
    sq["embedding_neardup_lsh"] = (
        "WITH " + _NORM_CTE + f""",
        b AS (SELECT vec_id, uv, {_ndl_buckets} FROM u),
        banded AS (
          SELECT vec_id, uv, CAST(i AS INT) AS band,
                 {_ndl_bucket_list}[CAST(i + 1 AS INT)] AS bucket
          FROM b, UNNEST(range(0, 8)) AS t(i))
        SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
               round(list_dot_product(x.uv, y.uv), 6) AS cosine
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE list_dot_product(x.uv, y.uv) >= 0.5
        """
    )
    from sigraph_spark.operators.similarity import _hyperplane as _hp

    _cents = [
        "[" + ", ".join(repr(w) for w in _hp(64, 100 + i)) + "]" for i in range(8)
    ]
    _cs_expr = "[" + ", ".join(f"list_dot_product(uv, {c})" for c in _cents) + "]"
    sq["ivf_topk_fixed"] = (
        "WITH " + _NORM_CTE + f""",
        a AS (SELECT vec_id, v, nrm, {_cs_expr} AS cs FROM u),
        assign AS (
          SELECT vec_id, v, nrm,
                 CAST(list_position(cs, list_aggregate(cs, 'max')) - 1 AS INT) AS cluster
          FROM a),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cs
              FROM a WHERE vec_id < 5),
        qs AS (
          SELECT query_id, qv, qn, CAST(i AS INT) AS cid,
                 cs[CAST(i + 1 AS INT)] AS s
          FROM q, UNNEST(range(0, 8)) AS t(i)),
        probes AS (
          SELECT query_id, qv, qn, cid FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY s DESC, cid DESC) AS rn
            FROM qs)
          WHERE rn <= 2),
        scored AS (
          SELECT p.query_id, c.vec_id,
                 round(list_dot_product(c.v, p.qv) / (c.nrm * p.qn), 6) AS cosine
          FROM assign c JOIN probes p ON c.cluster = p.cid)
        SELECT query_id, vec_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored)
        WHERE rank <= 10
        """
    )
    # --- ivf_topk: TRAINED quantizer, hard-oracled (round 5; closes the
    # last rows-only gate). similarity.ivf_train_lloyd is deterministic by
    # construction — seeds = normalized vectors of the 8 smallest vec_ids;
    # assign = first-index argmax of <uv, c>; update = per-dimension
    # fixed-point BIGINT sums (floor(uv_j * 2^24), order-independent),
    # mean = s / (2^24 * n), then left-assoc norm — so each Lloyd
    # iteration unrolls to the chained CTEs below (the PageRank/BPE
    # unrolled-oracle device) and every double matches bit-for-bit.
    # Empty / zero-norm clusters keep the previous centroid (LEFT JOIN +
    # CASE). Search half = the ivf_topk_fixed device with the trained
    # centroid TABLE instead of literals.
    def _lloyd_iter(i: int) -> str:
        prev = f"cents{i - 1}"
        return f"""
        cs{i} AS (
          SELECT t.vec_id, t.uv,
                 list(list_dot_product(t.uv, c.c) ORDER BY c.cid) AS cs
          FROM u t CROSS JOIN {prev} c GROUP BY t.vec_id, t.uv),
        a{i} AS (
          SELECT vec_id, uv,
                 CAST(list_position(cs, list_aggregate(cs, 'max')) - 1 AS INT)
                   AS cluster
          FROM cs{i}),
        s{i} AS (
          SELECT cluster, CAST(j AS INT) AS j, count(*) AS n,
                 sum(CAST(floor(uv[CAST(j + 1 AS INT)] * 16777216.0) AS BIGINT))
                   AS s
          FROM a{i}, UNNEST(range(0, 64)) AS t(j)
          GROUP BY cluster, j),
        m{i} AS (
          SELECT cluster, list(s / (16777216.0 * n) ORDER BY j) AS m
          FROM s{i} GROUP BY cluster),
        nrm{i} AS (
          SELECT cluster, m,
                 list_reduce(list_transform(m, x -> x * x),
                             (acc, x) -> acc + x) AS norm2
          FROM m{i}),
        cents{i} AS (
          SELECT c0.cid,
                 CASE WHEN nn.norm2 > 0
                      THEN list_transform(nn.m, x -> x / sqrt(nn.norm2))
                      ELSE c0.c END AS c
          FROM {prev} c0 LEFT JOIN nrm{i} nn ON c0.cid = nn.cluster)"""

    sq["ivf_topk"] = (
        "WITH " + _NORM_CTE + """,
        cents0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                 uv AS c
          FROM (SELECT vec_id, uv FROM u ORDER BY vec_id LIMIT 8)),"""
        + ",".join(_lloyd_iter(i) for i in (1, 2))
        + """,
        csf AS (
          SELECT t.vec_id, t.v, t.nrm,
                 list(list_dot_product(t.uv, c.c) ORDER BY c.cid) AS cs
          FROM u t CROSS JOIN cents2 c GROUP BY t.vec_id, t.v, t.nrm),
        assignf AS (
          SELECT vec_id, v, nrm,
                 CAST(list_position(cs, list_aggregate(cs, 'max')) - 1 AS INT)
                   AS cluster
          FROM csf),
        qf AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cs
               FROM csf WHERE vec_id < 5),
        qsf AS (
          SELECT query_id, qv, qn, CAST(i AS INT) AS cid,
                 cs[CAST(i + 1 AS INT)] AS s
          FROM qf, UNNEST(range(0, 8)) AS t(i)),
        probesf AS (
          SELECT query_id, qv, qn, cid FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY s DESC, cid DESC) AS rn
            FROM qsf)
          WHERE rn <= 2),
        scoredf AS (
          SELECT p.query_id, c.vec_id,
                 round(list_dot_product(c.v, p.qv) / (c.nrm * p.qn), 6) AS cosine
          FROM assignf c JOIN probesf p ON c.cluster = p.cid)
        SELECT query_id, vec_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scoredf)
        WHERE rank <= 10
        """
    )
    # --- product quantization: encode = per-sub-space first-index
    # argmin (row_number dist ASC, j ASC == array_position of min);
    # ADC = left-assoc chain over the 8 table lookups, round 6dp at
    # the boundary only. The trained variant unrolls the 2 Lloyd
    # iterations exactly like ivf_topk (fixed-point BIGINT sums,
    # COALESCE keeps empty clusters' codewords).
    _PQ_DIST = (
        "list_dot_product(s.sub, s.sub) - 2 * list_dot_product(s.sub, b.c)"
        " + list_dot_product(b.c, b.c)"
    )
    _PQ_BASE = """
        e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
        ms AS (SELECT CAST(range AS BIGINT) AS m FROM range(0, 8)),
        subs AS (
          SELECT vec_id, m,
                 v[CAST(m * 8 + 1 AS INT):CAST(m * 8 + 8 AS INT)] AS sub
          FROM e2 CROSS JOIN ms)"""

    def _pq_search_sql(books: str) -> str:
        return f"""
        pdists AS (
          SELECT s.vec_id, s.m, b.j, {_PQ_DIST} AS dist
          FROM subs s JOIN {books} b ON s.m = b.m),
        pcodes AS (
          SELECT vec_id, m, j AS code FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
            FROM pdists) WHERE rn = 1),
        pqd AS (SELECT vec_id AS query_id, m, j, dist
                FROM pdists WHERE vec_id < 5),
        pcontrib AS (
          SELECT q.query_id, c.vec_id, c.m, q.dist
          FROM pcodes c JOIN pqd q ON q.m = c.m AND q.j = c.code),
        pper AS (
          SELECT query_id, vec_id, list(dist ORDER BY m) AS ds
          FROM pcontrib GROUP BY query_id, vec_id),
        pscored AS (
          SELECT query_id, vec_id,
                 round(ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6]
                       + ds[7] + ds[8], 6) AS adist
          FROM pper)
        SELECT query_id, vec_id, adist, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) AS rank
          FROM pscored)
        WHERE rank <= 10
        """

    sq["pq_topk_fixed"] = (
        "WITH " + _PQ_BASE + """,
        js AS (SELECT CAST(range AS BIGINT) AS j FROM range(0, 8)),
        ts AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, 8)),
        bookf AS (
          SELECT m, j,
                 list(((m * 37 + j * 17 + t * 7) % 21 - 10) / 16.0
                      ORDER BY t) AS c
          FROM ms CROSS JOIN js CROSS JOIN ts GROUP BY m, j),"""
        + _pq_search_sql("bookf")
    )

    # --- IVF-PQ fixed index: coarse assignment + residual codes +
    # 2-probe ADC, all restated (residuals via index arithmetic; the
    # same bookf formula codebooks; contrib join restricted to probed
    # clusters).
    from sigraph_spark.operators.similarity import _hyperplane as _hp2

    _ivfpq_cents = [
        "[" + ", ".join(repr(w) for w in _hp2(64, 300 + i)) + "]"
        for i in range(8)
    ]
    _ivfpq_cs = "[" + ", ".join(
        f"list_dot_product(uv, {c})" for c in _ivfpq_cents) + "]"
    _ivfpq_cent_rows = ", ".join(
        f"({i}, {c})" for i, c in enumerate(_ivfpq_cents))
    _PQ_DIST_Q = _PQ_DIST  # same shape, s/b aliases shared
    sq["ivfpq_topk_fixed"] = (
        "WITH " + _NORM_CTE + f""",
        js AS (SELECT CAST(range AS BIGINT) AS j FROM range(0, 8)),
        ts AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, 8)),
        ms AS (SELECT CAST(range AS BIGINT) AS m FROM range(0, 8)),
        bookf AS (
          SELECT m, j,
                 list(((m * 37 + j * 17 + t * 7) % 21 - 10) / 16.0
                      ORDER BY t) AS c
          FROM ms CROSS JOIN js CROSS JOIN ts GROUP BY m, j),
        iva AS (SELECT vec_id, uv, {_ivfpq_cs} AS cs FROM u),
        ivassign AS (
          SELECT vec_id, uv,
                 CAST(list_position(cs, list_aggregate(cs, 'max')) - 1
                      AS INT) AS cluster
          FROM iva),
        centt AS (SELECT * FROM (VALUES {_ivfpq_cent_rows})
                  c(cid, cvec)),
        rsd AS (
          SELECT a.vec_id, a.cluster,
                 list_transform(range(64),
                   i -> a.uv[CAST(i + 1 AS INT)]
                        - ct.cvec[CAST(i + 1 AS INT)]) AS r
          FROM ivassign a JOIN centt ct ON a.cluster = ct.cid),
        rsubs AS (
          SELECT vec_id, cluster, m,
                 r[CAST(m * 8 + 1 AS INT):CAST(m * 8 + 8 AS INT)] AS sub
          FROM rsd CROSS JOIN ms),
        rdists AS (
          SELECT s.vec_id, s.cluster, s.m, b.j, {_PQ_DIST} AS dist
          FROM rsubs s JOIN bookf b ON s.m = b.m),
        rcodes AS (
          SELECT vec_id, cluster, m, j AS code FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
            FROM rdists) WHERE rn = 1),
        ivq AS (SELECT vec_id AS query_id, uv AS quv, cs
                FROM iva WHERE vec_id < 5),
        ivqs AS (
          SELECT query_id, quv, CAST(i AS INT) AS cid,
                 cs[CAST(i + 1 AS INT)] AS s
          FROM ivq, UNNEST(range(0, 8)) AS t(i)),
        ivprobes AS (
          SELECT query_id, quv, cid FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY s DESC, cid DESC) AS rn
            FROM ivqs)
          WHERE rn <= 2),
        qrsd AS (
          SELECT p.query_id, p.cid,
                 list_transform(range(64),
                   i -> p.quv[CAST(i + 1 AS INT)]
                        - ct.cvec[CAST(i + 1 AS INT)]) AS qr
          FROM ivprobes p JOIN centt ct ON p.cid = ct.cid),
        qsubs AS (
          SELECT query_id, cid, m,
                 qr[CAST(m * 8 + 1 AS INT):CAST(m * 8 + 8 AS INT)] AS sub
          FROM qrsd CROSS JOIN ms),
        qdists AS (
          SELECT s.query_id, s.cid, s.m, b.j, {_PQ_DIST_Q} AS dist
          FROM qsubs s JOIN bookf b ON s.m = b.m),
        vcontrib AS (
          SELECT q.query_id, c.vec_id, q.m, q.dist
          FROM rcodes c JOIN qdists q
            ON c.cluster = q.cid AND c.m = q.m AND c.code = q.j),
        vper AS (
          SELECT query_id, vec_id, list(dist ORDER BY m) AS ds
          FROM vcontrib GROUP BY query_id, vec_id),
        vscored AS (
          SELECT query_id, vec_id,
                 round(ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6]
                       + ds[7] + ds[8], 6) AS adist
          FROM vper)
        SELECT query_id, vec_id, adist, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) AS rank
          FROM vscored)
        WHERE rank <= 10
        """
    )

    def _pq_lloyd_iter(i: int) -> str:
        prev = f"books{i - 1}"
        return f"""
        pd{i} AS (
          SELECT s.vec_id, s.m, s.sub, b.j, {_PQ_DIST} AS dist
          FROM subs s JOIN {prev} b ON s.m = b.m),
        pa{i} AS (
          SELECT vec_id, m, sub, j AS cluster FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
            FROM pd{i}) WHERE rn = 1),
        ps{i} AS (
          SELECT m, cluster, CAST(t.t AS INT) AS jd, count(*) AS n,
                 sum(CAST(floor(sub[CAST(t.t + 1 AS INT)] * 16777216.0)
                          AS BIGINT)) AS s
          FROM pa{i}, UNNEST(range(0, 8)) AS t(t)
          GROUP BY m, cluster, jd),
        pm{i} AS (
          SELECT m, cluster, list(s / (16777216.0 * n) ORDER BY jd) AS c
          FROM ps{i} GROUP BY m, cluster),
        books{i} AS (
          SELECT b0.m, b0.j, COALESCE(p.c, b0.c) AS c
          FROM {prev} b0 LEFT JOIN pm{i} p
            ON b0.m = p.m AND b0.j = p.cluster)"""

    sq["pq_topk"] = (
        "WITH " + _PQ_BASE + """,
        books0 AS (
          SELECT m, CAST(row_number() OVER (
                   PARTITION BY m ORDER BY vec_id) - 1 AS BIGINT) AS j,
                 sub AS c
          FROM subs WHERE vec_id IN
            (SELECT vec_id FROM e2 ORDER BY vec_id LIMIT 8)),"""
        + ",".join(_pq_lloyd_iter(i) for i in (1, 2))
        + ","
        + _pq_search_sql("books2")
    )
    # --- MinHash-LSH pairs, md5 hash family (gate query passes
    # hash_family="md5"): shingle hash = little-endian uint32 of
    # md5-digest[0:4] == md5_number_upper(s) & 0xFFFFFFFF; signature slot i
    # = min((2i+1)*h + i*i+1) mod 2^31-1; 16 bands x 4 rows.
    sq["minhash_candidates"] = r"""
        WITH d AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                        ELSE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                             || ' ' || w[CAST(i AS INT) + 2] END AS s
            FROM d, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
          WHERE s IS NOT NULL),
        h AS (
          SELECT DISTINCT doc_id,
                 CAST(md5_number_upper(s) & 4294967295 AS BIGINT) AS h
          FROM sh),
        sig AS (
          SELECT doc_id, i,
                 min(((2 * i + 1) * h + (i * i + 1)) % 2147483647) AS m
          FROM h, UNNEST(range(0, 64)) AS t(i)
          GROUP BY doc_id, i),
        sigarr AS (
          SELECT doc_id, list(m ORDER BY i) AS sig FROM sig GROUP BY doc_id),
        banded AS (
          SELECT doc_id,
                 CAST(b AS VARCHAR) || ':' ||
                 CAST(sig[CAST(b * 4 + 1 AS INT)] AS VARCHAR) || '_' ||
                 CAST(sig[CAST(b * 4 + 2 AS INT)] AS VARCHAR) || '_' ||
                 CAST(sig[CAST(b * 4 + 3 AS INT)] AS VARCHAR) || '_' ||
                 CAST(sig[CAST(b * 4 + 4 AS INT)] AS VARCHAR) AS bk
          FROM sigarr, UNNEST(range(0, 16)) AS t(b))
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM banded x JOIN banded y ON x.bk = y.bk AND x.doc_id < y.doc_id
    """
    # --- incremental exact dedup: same sha256 + deterministic canonicals.
    sq["dedup_incremental_exact"] = """
        WITH corpus AS (
          SELECT sha256(coalesce(text, '')) AS content_hash,
                 min(doc_id) AS cid
          FROM documents WHERE doc_id % 4 <> 0
          GROUP BY 1),
        delta AS (
          SELECT doc_id, sha256(coalesce(text, '')) AS content_hash,
                 min(doc_id) OVER (
                   PARTITION BY sha256(coalesce(text, ''))) AS bmin
          FROM documents WHERE doc_id % 4 = 0)
        SELECT d.doc_id, d.content_hash,
               coalesce(c.cid,
                        CASE WHEN d.doc_id > d.bmin THEN d.bmin END,
                        d.doc_id) AS canonical_id,
               CASE WHEN c.cid IS NOT NULL THEN 'corpus_dup'
                    WHEN d.doc_id > d.bmin THEN 'batch_dup'
                    ELSE 'new' END AS status
        FROM delta d LEFT JOIN corpus c USING (content_hash)
    """
    # --- incremental MinHash: band keys are per-doc independent, so
    # incremental(new, index(old)) == full-pipeline pairs touching a new
    # doc (doc_id % 4 == 0). Same md5-family pipeline, filtered.
    sq["minhash_incremental"] = (
        sq["minhash_candidates"]
        + " WHERE x.doc_id % 4 = 0 OR y.doc_id % 4 = 0"
    )
    # --- SimHash pairs, md5 family: signature bit j = sign of the +1/-1
    # vote sum of bit j over shingle hashes h = md5_number_upper(s); docs
    # with no words have signature 0 (LEFT JOIN back to documents); 4
    # 16-bit bands block, bit_count(xor) verifies Hamming <= 3. Spark's
    # first-matching-band filter == DISTINCT here (hamming is band-free).
    sq["simhash_pairs"] = r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(
                   string_split_regex(lower(trim(coalesce(text, ''))), '\s+'),
                   x -> x <> '') AS w
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                        ELSE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                             || ' ' || w[CAST(i AS INT) + 2] END AS s
            FROM d, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
          WHERE s IS NOT NULL AND s <> ''),
        hs AS (SELECT doc_id, md5_number_upper(s) AS h FROM sh),
        votes AS (
          SELECT doc_id, j,
                 sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM hs, UNNEST(range(0, 64)) AS t(j)
          GROUP BY doc_id, j),
        sig0 AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << CAST(j AS INT)
                               ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sig
          FROM votes GROUP BY doc_id),
        sig AS (
          SELECT dd.doc_id AS id, coalesce(s.sig, CAST(0 AS UBIGINT)) AS sig
          FROM documents dd LEFT JOIN sig0 s ON dd.doc_id = s.doc_id),
        banded AS (
          SELECT id, sig, CAST(i AS INT) AS bi,
                 (sig >> CAST(16 * i AS INT)) & 65535 AS bv
          FROM sig, UNNEST(range(0, 4)) AS t(i))
        SELECT DISTINCT x.id AS a, y.id AS b,
               CAST(bit_count(xor(x.sig, y.sig)) AS INT) AS hamming
        FROM banded x JOIN banded y
          ON x.bi = y.bi AND x.bv = y.bv AND x.id < y.id
        WHERE bit_count(xor(x.sig, y.sig)) <= 3
    """
    # --- incremental SimHash: band independence means the delta pair
    # set IS the full pair set restricted to new-doc endpoints.
    sq["simhash_incremental"] = (
        sq["simhash_pairs"] + " AND (x.id % 4 = 0 OR y.id % 4 = 0)"
    )
    # --- media features: gen_media payloads are deterministic ASCII and
    # the stub decoder is a byte%16 histogram — reconstruct both from
    # range(128). The inner CAST AS FLOAT replicates the float32
    # quantization of the declared array<float> schema before rounding.
    sq["media_features"] = """
        WITH m AS (
          SELECT CAST(i AS BIGINT) AS id,
                 'MEDIA' || CAST(i AS VARCHAR)
                   || repeat('x', CAST(((i % 7) + 1) * 100 AS INT)) AS s
          FROM UNNEST(range(0, 128)) AS t(i))
        SELECT 'm-' || CAST(id AS VARCHAR) AS media_id,
               CAST(length(s) AS BIGINT) AS n_bytes,
               round(CAST(CAST(
                 CAST(len(list_filter(range(1, length(s) + 1),
                                      i -> ascii(s[CAST(i AS INT)]) % 16 = 0))
                      AS DOUBLE) / length(s)
                 AS FLOAT) AS DOUBLE), 6) AS f0
        FROM m
    """
    # --- corpus curation ops: the split/sample hash is the portable md5
    # family (hash32_md5_le == md5_number_upper & 0xFFFFFFFF).
    sq["dataset_split"] = """
        WITH b AS (
          SELECT doc_id,
                 CAST((md5_number_upper('split:' || CAST(doc_id AS VARCHAR))
                       & 4294967295) % 100 AS BIGINT) AS bucket
          FROM documents)
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """
    sq["stratified_sample"] = """
        WITH b AS (
          SELECT doc_id, lang,
                 CAST((md5_number_upper('sample:' || CAST(doc_id AS VARCHAR))
                       & 4294967295) % 1000 AS BIGINT) AS bucket
          FROM documents)
        SELECT doc_id, lang, bucket FROM b
        WHERE bucket < CASE WHEN lang = 'en' THEN 200 ELSE 500 END
    """
    # boilerplate-line removal: per-line doc frequencies via aligned
    # unnest/generate_subscripts; rebuild = ordered string_agg with a
    # common-set filter (coalesce covers the all-dropped doc)
    sq["drop_common_lines"] = """
        WITH d AS (
          SELECT doc_id,
                 text || chr(10) || 'All rights reserved.'
                      || CASE WHEN doc_id % 7 = 0
                              THEN chr(10) || 'Subscribe to our newsletter!'
                              ELSE '' END
                      || chr(10) || 'Ref code ' || CAST(doc_id AS VARCHAR)
                   AS text
          FROM documents),
        x AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 generate_subscripts(string_split(text, chr(10)), 1) AS pos
          FROM d),
        common AS (
          SELECT line FROM (
            SELECT DISTINCT doc_id, line FROM x WHERE trim(line) <> '')
          GROUP BY line HAVING count(*) >= 50)
        SELECT doc_id,
               coalesce(
                 string_agg(line, chr(10) ORDER BY pos)
                   FILTER (WHERE line NOT IN (SELECT line FROM common)),
                 '') AS text,
               CAST(count(*) FILTER (WHERE line IN (SELECT line FROM common))
                    AS BIGINT) AS n_lines_dropped
        FROM x GROUP BY doc_id
    """
    # mixture upsampling: n_copies = floor(e) + (md5 bucket < frac permille);
    # unnest(range(n)) expands the per-copy epoch index
    sq["mixture_epochs"] = """
        WITH d AS (
          SELECT doc_id,
                 ['wiki', 'cc', 'forum'][(doc_id % 3 + 1)] AS source
          FROM documents),
        w AS (
          SELECT doc_id, source,
                 CASE source WHEN 'wiki' THEN 2300 WHEN 'cc' THEN 1000
                      WHEN 'forum' THEN 0 ELSE 1000 END AS e,
                 CAST((md5_number_upper('mix:' || CAST(doc_id AS VARCHAR))
                       & 4294967295) % 1000 AS BIGINT) AS bucket
          FROM d),
        n AS (
          SELECT doc_id, source,
                 (e // 1000) + CASE WHEN bucket < e % 1000 THEN 1 ELSE 0 END
                   AS n_copies
          FROM w)
        SELECT doc_id, source, unnest(range(n_copies)) AS epoch
        FROM n WHERE n_copies > 0
    """
    sq["pii_redact"] = r"""
        WITH seeded AS (
          SELECT doc_id,
                 text || ' contact u' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.com from 10.0.'
                      || CAST(doc_id % 256 AS VARCHAR)
                      || '.7 acct 1234567' || CAST(doc_id AS VARCHAR) AS text
          FROM documents)
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\b\d{7,}\b', '<NUM>', 'g') AS text
        FROM seeded
    """
    sq["text_repetition"] = r"""
        WITH d AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
                      ELSE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                           || ' ' || w[CAST(i AS INT) + 2] END AS s
          FROM d, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i)),
        cnt AS (
          SELECT doc_id, count(*) AS total, count(DISTINCT s) AS dis
          FROM sh GROUP BY doc_id)
        SELECT doc_id,
               round((total - dis) / CAST(total AS DOUBLE), 6) AS dup_ngram_ratio
        FROM cnt
    """
    sq["corpus_vocab"] = r"""
        WITH w AS (
          SELECT unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')) AS token
          FROM documents)
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM w WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 100
    """
    # --- per-language exact quantiles: quantile_cont uses the same
    # (n-1)*p linear-interpolation rank arithmetic as Spark's exact
    # percentile; integer inputs + round(4) keep float parity.
    sq["corpus_quantiles"] = r"""
        WITH t AS (
          SELECT lang,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                 END AS n_tok
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(n_tok), 4) AS mean_tokens,
               round(quantile_cont(n_tok, 0.25), 4) AS p25,
               round(quantile_cont(n_tok, 0.5), 4) AS p50,
               round(quantile_cont(n_tok, 0.75), 4) AS p75,
               round(quantile_cont(n_tok, 0.9), 4) AS p90
        FROM t GROUP BY lang
    """
    # --- range join: the oracle is the naive BETWEEN theta join the
    # bucketized equi-join must equal exactly.
    sq["range_join"] = """
        WITH p AS (SELECT DISTINCT user_id % 997 AS p FROM events),
        iv AS (
          SELECT doc_id AS interval_id,
                 (doc_id * 7) % 1000 AS lo,
                 (doc_id * 7) % 1000 + doc_id % 50 AS hi
          FROM documents)
        SELECT p.p, iv.interval_id, iv.lo, iv.hi
        FROM p JOIN iv ON p.p BETWEEN iv.lo AND iv.hi
    """
    # --- rollup: GROUPING() bit semantics match Spark's grouping_id.
    sq["corpus_rollup"] = r"""
        WITH t AS (
          SELECT lang, source,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                 END AS n_tok
          FROM documents)
        SELECT lang, source,
               CAST(GROUPING(lang, source) AS INT) AS gid,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens
        FROM t GROUP BY ROLLUP (lang, source)
    """
    # --- k-per-group sample: same portable md5 rank order.
    sq["sample_k_per_group"] = """
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang, row_number() OVER (
            PARTITION BY lang
            ORDER BY CAST((md5_number_upper('sample:' || CAST(doc_id AS VARCHAR))
                           & 4294967295) AS BIGINT) ASC, doc_id ASC) AS rk
          FROM documents)
        WHERE rk <= 7
    """
    # --- chunking: integer window arithmetic, 1-based inclusive list
    # slice == Spark's F.slice(start, length).
    sq["chunk_documents"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(coalesce(text, '')) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+')
                 END AS w
          FROM documents),
        c AS (
          SELECT doc_id, w, len(w) AS n,
                 CAST((greatest(len(w) - 16, 1) + 47) // 48 AS INT) AS nc
          FROM t)
        SELECT doc_id,
               CAST(i AS INT) AS chunk_id,
               CAST(i * 48 AS BIGINT) AS start_tok,
               CAST(least(64, n - i * 48) AS BIGINT) AS chunk_len,
               array_to_string(
                 w[CAST(i * 48 + 1 AS INT):CAST(i * 48 + 64 AS INT)], ' '
               ) AS chunk_text
        FROM c, UNNEST(range(0, nc)) AS u(i)
    """
    # --- BM25: identical float formulation (ln == F.log natural log;
    # integer tf/df/dl; avgdl = exact int-sum / count in both engines).
    sq["bm25_scores"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS w
          FROM documents),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(len(w)) AS avgdl FROM toks),
        dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
        hits AS (
          SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM (
            SELECT doc_id, unnest(w) AS t FROM toks)
          WHERE t IN ('join', 'hash', 'vector')
          GROUP BY doc_id, t),
        dfr AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY t)
        SELECT doc_id,
               round(sum(
                 ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 4) AS bm25
        FROM hits JOIN dfr USING (t) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY doc_id
    """
    sq["inverted_index"] = r"""
        WITH tok AS (
          SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                 unnest(list_filter(string_split_regex(
                     lower(trim(coalesce(text, ''))), '\s+'),
                     t -> t <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        idx AS (
          SELECT term,
                 CAST((md5_number_upper('shard:' || doc_id) & 4294967295) % 4
                      AS BIGINT) AS shard,
                 doc_id, tf
          FROM tf),
        rows_ AS (
          SELECT term, shard,
                 CAST(count(*) AS BIGINT) AS df_shard,
                 CAST(sum(tf) AS BIGINT) AS cf_shard,
                 string_agg(doc_id || ':' || tf, ';' ORDER BY doc_id)
                   AS postings_str
          FROM idx GROUP BY term, shard),
        keep AS (SELECT term FROM rows_ GROUP BY term
                 HAVING sum(df_shard) >= 2)
        SELECT r.term, r.shard, r.df_shard, r.cf_shard, r.postings_str
        FROM rows_ r JOIN keep k ON k.term = r.term
    """
    sq["index_search"] = r"""
        WITH toks AS (
          SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                 string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS w
          FROM documents),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(len(w)) AS avgdl FROM toks),
        dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
        hits AS (
          SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM (
            SELECT doc_id, unnest(w) AS t FROM toks)
          WHERE t IN ('join', 'hash', 'vector')
          GROUP BY doc_id, t),
        dfr AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY t),
        scored AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_terms,
                 round(sum(
                   ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                 ), 4) AS bm25
          FROM hits JOIN dfr USING (t) JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY doc_id)
        SELECT doc_id, n_terms, bm25,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                    AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= 20
    """
    # --- domain stats over synthesized multi-host urls: lowercased host
    # by double substring_index, algebraic aggregates.
    sq["dedup_rate_by_source"] = """
        WITH d AS (
          SELECT doc_id, source,
                 sha256(coalesce(substr(text, 1, 20), '')) AS h
          FROM documents),
        c AS (SELECT doc_id, source,
                     min(doc_id) OVER (PARTITION BY h) AS canon FROM d)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN doc_id <> canon THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dups,
               round(sum(CASE WHEN doc_id <> canon THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS dup_rate
        FROM c GROUP BY source
    """
    sq["split_leakage"] = """
        WITH b AS (
          SELECT doc_id,
                 CASE WHEN CAST((md5_number_upper('split:' || CAST(doc_id AS VARCHAR))
                                 & 4294967295) % 100 AS BIGINT) < 80 THEN 'train'
                      WHEN CAST((md5_number_upper('split:' || CAST(doc_id AS VARCHAR))
                                 & 4294967295) % 100 AS BIGINT) < 90 THEN 'val'
                      ELSE 'test' END AS split,
                 sha256(coalesce(substr(text, 1, 20), '')) AS content_hash
          FROM documents)
        SELECT content_hash,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
               array_to_string(list_sort(list(DISTINCT split)), ',') AS splits
        FROM b GROUP BY content_hash
        HAVING count(DISTINCT split) > 1
    """
    sq["adaptive_quality"] = r"""
        WITH feat AS (
          SELECT doc_id, lang,
                 CAST(length(text) AS DOUBLE) AS n_chars_text,
                 CAST(length(regexp_extract_all(text, '[A-Za-z0-9_'']+')) AS DOUBLE) AS n_words,
                 CAST(length(regexp_replace(text, '[^A-Za-z0-9_'']', '', 'g')) AS DOUBLE) AS word_chars,
                 CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
                 CAST(length(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS n_upper,
                 CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it|was|for)\b')) AS DOUBLE) AS n_stop
          FROM documents),
        q AS (
          SELECT doc_id, lang,
                 (CASE WHEN n_words >= 5
                            AND word_chars / greatest(n_words, 1.0) >= 2.0
                            AND word_chars / greatest(n_words, 1.0) <= 12.0
                       THEN 1.0 ELSE 0.0 END)
                 * (0.4 * least(n_stop / greatest(n_words, 1.0) * 5.0, 1.0)
                    + 0.3 * greatest(0.0, 1.0 - n_punct / greatest(n_chars_text, 1.0) * 4.0)
                    + 0.3 * greatest(0.0, 1.0 - n_upper / greatest(n_chars_text, 1.0) * 2.0))
                   AS quality_score
          FROM feat),
        m AS (SELECT lang, quantile_cont(quality_score, 0.5) AS med FROM q GROUP BY lang)
        SELECT q.doc_id, q.lang, round(q.quality_score, 6) AS quality_score
        FROM q JOIN m ON m.lang = q.lang
        WHERE q.quality_score >= m.med
    """
    sq["lang_confusion"] = r"""
        WITH s AS (
          SELECT lang,
            length(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it|was|for)\b')) AS s_en,
            length(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|mit|auf|zu)\b')) AS s_de,
            length(regexp_extract_all(lower(text), '\b(le|la|et|les|des|est|un|une|dans|que)\b')) AS s_fr,
            length(regexp_extract_all(lower(text), '\b(el|la|de|que|los|una|por|con|para|las)\b')) AS s_es
          FROM documents)
        SELECT lang,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS lang_pred,
               CAST(count(*) AS BIGINT) AS n
        FROM s GROUP BY 1, 2
    """
    sq["length_histogram"] = r"""
        WITH t AS (
          SELECT lang,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                      ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tok
          FROM documents)
        SELECT lang,
               CASE WHEN n_tok <= 0 THEN -1
                    ELSE CAST(floor(log2(n_tok)) AS BIGINT) END AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY 1, 2
    """
    # --- TextRank / RAKE (round 5): the keyphrase module generates its
    # own oracles — identical BIGINT micro-unit arithmetic, the TextRank
    # power iteration unrolled into chained CTEs like the PageRank one.
    from sigraph_spark.operators.keyphrase import (rake_oracle_sql,
                                                   textrank_oracle_sql)

    sq["textrank"] = textrank_oracle_sql("documents")
    sq["rake_keywords"] = rake_oracle_sql("documents")
    from sigraph_spark.operators.coref import coref_oracle_sql

    sq["pronoun_coref"] = coref_oracle_sql("documents")
    sq["doc_keyterms"] = r"""
        WITH tt AS (
          SELECT doc_id, u AS term FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+'))
                     AS u
            FROM documents)
          WHERE u <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 tf.tf * (ln(n.n) - ln(df.df)) AS s
          FROM tf JOIN df ON df.term = tf.term CROSS JOIN n)
        SELECT doc_id, term, CAST(rank AS BIGINT) AS rank,
               round(s, 6) AS score
        FROM (
          SELECT doc_id, term, s,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY s DESC, term ASC) AS rank
          FROM scored)
        WHERE rank <= 3
    """
    sq["bigram_pmi"] = r"""
        WITH d AS (
          SELECT string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS ws
          FROM documents),
        uni AS (
          SELECT u AS w, count(*) AS c FROM (SELECT unnest(ws) AS u FROM d)
          WHERE u <> '' GROUP BY u),
        nu AS (SELECT sum(c) AS nu FROM uni),
        bi AS (
          SELECT b, count(*) AS c_ab FROM (
            SELECT ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] AS b
            FROM d, UNNEST(range(1, len(ws))) AS t(i)
            WHERE len(ws) >= 2)
          GROUP BY b HAVING count(*) >= 5),
        nb AS (SELECT sum(c_ab) AS nb FROM bi)
        SELECT split_part(b, ' ', 1) AS w1,
               split_part(b, ' ', 2) AS w2,
               CAST(c_ab AS BIGINT) AS c_ab,
               round(ln(c_ab) - ln(nb.nb) - ln(ua.c) - ln(ub.c)
                     + 2 * ln(nu.nu), 6) AS pmi
        FROM bi
        JOIN uni ua ON ua.w = split_part(b, ' ', 1)
        JOIN uni ub ON ub.w = split_part(b, ' ', 2)
        CROSS JOIN nb CROSS JOIN nu
    """
    sq["unigram_logprob"] = r"""
        WITH t AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+'))
                   AS token
          FROM documents),
        tt AS (SELECT doc_id, token FROM t WHERE token <> ''),
        f AS (SELECT token, count(*) AS tf FROM tt GROUP BY token),
        n AS (SELECT sum(tf) AS n FROM f)
        SELECT tt.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(ln(f.tf) - ln(n.n)), 6) AS mean_logprob
        FROM tt JOIN f ON f.token = tt.token CROSS JOIN n
        GROUP BY tt.doc_id
    """
    sq["bigram_logprob"] = r"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(
                     lower(trim(coalesce(text, ''))), '\s+'),
                     t -> t <> '') AS ws
          FROM documents),
        bg AS (
          SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
          FROM w CROSS JOIN UNNEST(range(1, len(ws))) AS t(i)),
        c12 AS (
          SELECT w1, w2, count(*) AS c12
          FROM bg WHERE doc_id % 5 <> 0 GROUP BY w1, w2),
        hist AS (
          SELECT w1, sum(c12) AS c1, count(*) AS n_follow
          FROM c12 GROUP BY w1),
        cont AS (SELECT w2, count(*) AS n_prec FROM c12 GROUP BY w2),
        sc AS (SELECT (SELECT count(*) FROM c12) AS t_types,
                      (SELECT count(*) FROM cont) AS v_cont),
        s AS (
          SELECT b.doc_id,
                 ln(CASE WHEN h.c1 IS NOT NULL THEN
                      greatest(CAST(coalesce(c.c12, 0) AS DOUBLE) - 0.75, 0.0)
                        / CAST(h.c1 AS DOUBLE)
                      + 0.75 * CAST(h.n_follow AS DOUBLE)
                        / CAST(h.c1 AS DOUBLE)
                        * ((CAST(coalesce(p.n_prec, 0) AS DOUBLE) + 1.0)
                           / (CAST(sc.t_types AS DOUBLE)
                              + CAST(sc.v_cont AS DOUBLE) + 1.0))
                    ELSE (CAST(coalesce(p.n_prec, 0) AS DOUBLE) + 1.0)
                         / (CAST(sc.t_types AS DOUBLE)
                            + CAST(sc.v_cont AS DOUBLE) + 1.0)
                    END) AS lp
          FROM bg b
          LEFT JOIN c12 c ON c.w1 = b.w1 AND c.w2 = b.w2
          LEFT JOIN hist h ON h.w1 = b.w1
          LEFT JOIN cont p ON p.w2 = b.w2
          CROSS JOIN sc
          WHERE b.doc_id % 5 = 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(lp), 6) AS mean_logprob
        FROM s GROUP BY doc_id
    """
    sq["weighted_sample"] = r"""
        WITH keyed AS (
          SELECT doc_id,
                 round(pow(
                   (CAST((md5_number_upper('ws:' || CAST(doc_id AS VARCHAR))
                          & 4294967295) AS DOUBLE) + 1.0) / 4294967296.0,
                   1.0 / CAST(doc_id % 7 + 1 AS DOUBLE)), 6) AS sample_key
          FROM documents)
        SELECT doc_id, sample_key
        FROM keyed
        QUALIFY row_number() OVER (ORDER BY sample_key DESC, doc_id ASC) <= 50
    """
    sq["text_normalize"] = r"""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0
                      THEN '‘q’ “w” ' || chr(7) || ' ' || chr(31) || '  a'
                           || chr(9) || 'b' || chr(10) || coalesce(text, '')
                      ELSE coalesce(text, '') END AS t
          FROM documents),
        n AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   translate(
                     regexp_replace(t, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
                     '‘’“”', '''''""'),
                   '\s+', ' ', 'g')) AS norm_text
          FROM d)
        SELECT doc_id, norm_text,
               CAST(length(norm_text) AS BIGINT) AS n_chars_norm
        FROM n
    """
    sq["domain_quota"] = r"""
        WITH d AS (
          SELECT doc_id, lang, n_chars,
                 'https://host' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents),
        r AS (
          SELECT doc_id, lang, n_chars,
                 split_part(split_part(url, '://', 2), '/', 1) AS host,
                 row_number() OVER (
                   PARTITION BY split_part(split_part(url, '://', 2), '/', 1)
                   ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM d)
        SELECT doc_id, host, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM r WHERE rn <= 25
    """
    from sigraph_spark.operators.sketches import cms_oracle_sql, hll_oracle_sql
    sq["hll_distinct"] = "WITH " + hll_oracle_sql(
        "documents", ["source AS source"], "doc_id", p=8
    )
    _hh_rel = (
        "(SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) AS hh_key FROM documents)"
    )
    sq["cms_heavy_hitters"] = "WITH " + cms_oracle_sql(
        _hh_rel, "hh_key", _hh_rel, "hh_key", w=64, d=3
    )
    # distant supervision: the ORACLE is the independent naive
    # formulation — every sentence x fact probed by padded substring
    # search (no anchor blocking), so it checks the blocking path's
    # completeness, not just its arithmetic
    _ds_vals = ", ".join(
        "('{}', '{}', '{}')".format(*f) for f in _DS_FACTS
    )
    sq["distant_supervision"] = f"""
        WITH f(subj, predicate, obj) AS (VALUES {_ds_vals}),
        ds_d AS (
          SELECT doc_id,
                 string_split(regexp_replace(coalesce(text, ''),
                                             '([.!?])\\s+',
                                             '\\1' || chr(29), 'g'),
                              chr(29)) AS parts
          FROM documents),
        ds_i AS (SELECT doc_id, unnest(range(1, len(parts) + 1)) AS sid,
                        parts
                 FROM ds_d),
        ds_s AS (
          SELECT doc_id, CAST(sid AS INTEGER) AS sentence_id,
                 trim(parts[sid]) AS sentence
          FROM ds_i WHERE trim(parts[sid]) <> ''),
        ds_h AS (
          SELECT *, ' ' || array_to_string(
                   list_filter(string_split_regex(trim(sentence), '\\s+'),
                               x -> x <> ''), ' ') || ' ' AS hay
          FROM ds_s)
        SELECT DISTINCT doc_id, sentence_id, sentence, subj, predicate, obj
        FROM ds_h JOIN f
          ON strpos(hay, ' ' || subj || ' ') > 0
         AND strpos(hay, ' ' || obj || ' ') > 0
    """
    sq["domain_stats"] = r"""
        WITH d AS (
          SELECT 'https://HOST' || CAST(doc_id % 50 AS VARCHAR)
                   || '.Example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                 END AS n_tok
          FROM documents),
        h AS (
          SELECT lower(string_split(string_split(url, '://')[2], '/')[1]) AS host,
                 n_tok
          FROM d)
        SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               round(avg(n_tok), 4) AS mean_tokens
        FROM h GROUP BY host
    """
    sq["pack_sequences"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                      ELSE len(string_split_regex(lower(trim(text)), '\s+'))
                 END AS n_tokens
          FROM documents),
        o AS (
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start_offset
          FROM t)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // 512 AS chunk_id,
               (start_offset + greatest(n_tokens, 1) - 1) // 512 AS end_chunk_id,
               (start_offset + greatest(n_tokens, 1) - 1) // 512
                 <> start_offset // 512 AS spans_chunks
        FROM o
    """
    sq["events_interval_join"] = """
        SELECT c.user_id,
               c.event_id AS click_id,
               e.event_id AS error_id
        FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') e
          ON c.user_id = e.user_id
         AND e.ts <= c.ts
         AND e.ts >= c.ts - INTERVAL 6 HOUR
    """
    sq["events_asof"] = """
        WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
             e AS (SELECT * FROM events WHERE event_type = 'error')
        SELECT event_id, user_id, ts, matched_event_id, matched_value FROM (
          SELECT c.event_id, c.user_id, c.ts,
                 e.event_id AS matched_event_id, e.value AS matched_value,
                 row_number() OVER (
                   PARTITION BY c.event_id
                   ORDER BY e.ts DESC NULLS LAST, e.event_id DESC NULLS LAST
                 ) AS rn
          FROM c LEFT JOIN e ON c.user_id = e.user_id AND e.ts <= c.ts)
        WHERE rn = 1
    """
    sq["sessionize"] = """
        -- lag/cumulative-sum session assignment: a new session starts
        -- when the inactivity gap EXCEEDS 5 minutes (Spark session
        -- windows merge on overlap OR adjacency: events exactly the
        -- gap apart DO merge). session_end = last ts + gap.
        WITH b AS (
          SELECT user_id, ts, value, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, ts, value,
                 SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM b
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 5 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
                 AS total_value
        FROM s GROUP BY user_id, sid
    """
    sq["cluster_eval"] = """
        -- same cell-count algebra as operators/clustereval.py: B-cubed
        -- via sum(cell^2/cluster_size), pairwise via n-choose-2 on the
        -- cell/cluster sizes; integer counts exact, ratios rounded 6dp
        WITH a AS (
          SELECT doc_id,
                 min(doc_id) OVER (
                   PARTITION BY substr(coalesce(text, ''), 1, 20)
                 ) AS pred,
                 min(doc_id) OVER (
                   PARTITION BY array_to_string(list_slice(
                     string_split_regex(coalesce(text, ''), '\\s+'), 1, 3
                   ), ' ')
                 ) AS gold
          FROM documents),
        cells AS (SELECT pred, gold, count(*) AS cell FROM a GROUP BY 1, 2),
        ps AS (SELECT pred, sum(cell) AS psz FROM cells GROUP BY 1),
        gs AS (SELECT gold, sum(cell) AS gsz FROM cells GROUP BY 1),
        j AS (SELECT cell, psz, gsz FROM cells
              JOIN ps USING (pred) JOIN gs USING (gold)),
        m AS (SELECT CAST(sum(cell) AS BIGINT) AS n_items,
                     sum(cell * cell / psz) / sum(cell) AS bp,
                     sum(cell * cell / gsz) / sum(cell) AS br
              FROM j),
        tp AS (SELECT CAST(sum(cell * (cell - 1) / 2) AS BIGINT) AS tp_pairs
               FROM cells),
        pp AS (SELECT CAST(sum(sz * (sz - 1) / 2) AS BIGINT) AS pred_pairs
               FROM (SELECT sum(cell) AS sz FROM cells GROUP BY pred)),
        gg AS (SELECT CAST(sum(sz * (sz - 1) / 2) AS BIGINT) AS gold_pairs
               FROM (SELECT sum(cell) AS sz FROM cells GROUP BY gold))
        SELECT n_items, tp_pairs, pred_pairs, gold_pairs,
               round(bp, 6) AS bcubed_precision,
               round(br, 6) AS bcubed_recall,
               round(2 * bp * br / (bp + br), 6) AS bcubed_f1,
               round(tp_pairs * 1.0 / pred_pairs, 6) AS pair_precision,
               round(tp_pairs * 1.0 / gold_pairs, 6) AS pair_recall,
               round(2.0 * tp_pairs / (pred_pairs + gold_pairs), 6)
                 AS pair_f1
        FROM m, tp, pp, gg
    """
    from sigraph_spark.operators.layout import hilbert_oracle_sql as _hsql
    _HBASE = """h0src AS (
      SELECT event_id,
             CAST(FLOOR((user_id - (SELECT MIN(user_id) FROM events))
                  * 256 / ((SELECT MAX(user_id) FROM events)
                           - (SELECT MIN(user_id) FROM events) + 1))
                  AS BIGINT) AS xb,
             CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT)
                  - (SELECT MIN(CAST(FLOOR(epoch(ts)) AS BIGINT))
                     FROM events))
                  * 256 / ((SELECT MAX(CAST(FLOOR(epoch(ts)) AS BIGINT))
                            FROM events)
                           - (SELECT MIN(CAST(FLOOR(epoch(ts)) AS BIGINT))
                              FROM events) + 1))
                  AS BIGINT) AS yb
      FROM events)"""
    sq["hilbert_key"] = _hsql(_HBASE, "xb", "yb", 8, "event_id, xb, yb")
    from sigraph_spark.operators.layout import zorder_oracle_sql as _zsql
    sq["zorder_key"] = f"""
        -- same exact integer bucket arithmetic + the SAME unrolled
        -- shift/mask interleave terms as operators/layout.py (the
        -- expression string is GENERATED by zorder_oracle_sql, so the
        -- implementations cannot drift). floor(epoch()) matches
        -- Spark's unix_timestamp second truncation.
        WITH mm AS (
          SELECT MIN(user_id) AS umin, MAX(user_id) AS umax,
                 MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS tmin,
                 MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS tmax
          FROM events),
        b AS (
          SELECT event_id,
                 CAST(FLOOR((user_id - umin) * 65536 / (umax - umin + 1))
                      AS BIGINT) AS user_bucket,
                 CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - tmin)
                            * 65536 / (tmax - tmin + 1))
                      AS BIGINT) AS ts_bucket
          FROM events, mm)
        SELECT event_id, user_bucket, ts_bucket,
               {_zsql(['user_bucket', 'ts_bucket'], 16)} AS zkey
        FROM b
    """
    sq["events_windows"] = """
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """
    sq["events_funnel"] = """
        WITH fs AS (
          SELECT user_id, min(ts) AS signup_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id),
        conv AS (
          SELECT DISTINCT fs.user_id FROM fs
          JOIN events p ON p.user_id = fs.user_id
           AND p.event_type = 'purchase' AND p.ts > fs.signup_ts),
        a AS (SELECT count(*) AS n_signup_users FROM fs),
        b AS (SELECT count(*) AS n_converted FROM conv)
        SELECT CAST(a.n_signup_users AS BIGINT) AS n_signup_users,
               CAST(b.n_converted AS BIGINT) AS n_converted,
               round(b.n_converted / CAST(a.n_signup_users AS DOUBLE), 6) AS rate
        FROM a, b
    """
    sq["retention_cohorts"] = """
        WITH c AS (
          SELECT user_id,
                 CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
          FROM events GROUP BY user_id),
        act AS (
          SELECT DISTINCT e.user_id, c.cohort_week,
                 CAST((epoch(date_trunc('week', e.ts))
                       - epoch(c.cohort_week)) / 604800 AS BIGINT) AS week_offset
          FROM events e JOIN c ON c.user_id = e.user_id)
        SELECT cohort_week, week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM act GROUP BY 1, 2
    """
    sq["events_sessions"] = """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '1800 seconds'
                      THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts,
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM g)
        SELECT user_id, session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS start_ts, max(ts) AS end_ts
        FROM s GROUP BY user_id, session_id
    """
    sq["tpch_q1"] = """
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """
    sq["revenue_by_nation"] = """
        SELECT n_name,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """
    sq["trace_sequences"] = (
        "WITH " + SEVENTS_CTE
        + """
        SELECT trace_id,
               string_agg(span_id, ',' ORDER BY timestamp, span_id) AS sequence,
               CAST(count(*) AS BIGINT) AS n_events
        FROM parsed WHERE unit_id = 'u-3' GROUP BY trace_id
        """
    )
    sq["unit_flush"] = (
        "WITH " + _EDGES_CTE
        + """
        SELECT unit_id, CAST(count(*) AS BIGINT) AS n_rows
        FROM containment WHERE unit_id <> 'u-0' GROUP BY unit_id
        """
    )
    sq["drift_sequences"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        und AS (
          SELECT DISTINCT src AS x, dst AS y FROM edges
          UNION SELECT dst AS x, src AS y FROM edges),
        seed AS (
          SELECT DISTINCT trace_id, node_id AS x FROM containment
          WHERE unit_id = 'u-2'),
        reach(trace_id, x, hops) AS (
          SELECT trace_id, x, 0 FROM seed
          UNION
          SELECT r.trace_id, e.y, r.hops + 1
          FROM reach r JOIN und e ON r.x = e.x WHERE r.hops < 3),
        minreach AS (
          SELECT trace_id, x, min(hops) AS hops FROM reach GROUP BY 1, 2),
        rel AS (
          SELECT t1, t2 FROM (
            SELECT a.trace_id AS t1, b.trace_id AS t2, a.hops + b.hops AS plen
            FROM minreach a JOIN minreach b ON a.x = b.x AND a.trace_id < b.trace_id)
          WHERE plen <= 3 GROUP BY t1, t2),
        wanted AS (
          SELECT t2 AS trace_id FROM rel WHERE t1 = 'tr-2'
          UNION SELECT t1 FROM rel WHERE t2 = 'tr-2'
          UNION SELECT 'tr-2')
        SELECT trace_id,
               string_agg(span_id, ',' ORDER BY timestamp, span_id) AS sequence,
               CAST(count(*) AS BIGINT) AS n_events
        FROM parsed
        WHERE unit_id = 'u-2' AND trace_id IN (SELECT trace_id FROM wanted)
        GROUP BY trace_id
        """
    )
    sq["triples_extract"] = (
        "WITH " + _pages_triples_cte()
        + " SELECT url, step, actor, verb, object, context FROM stepped"
    )
    # --- predicate clustering: integer-exact Jaccard gate + recursive
    # transitive closure to the component minimum (ground truth for the
    # star-contraction CC), singletons preserved by the left join.
    sq["predicate_clusters"] = (
        "WITH RECURSIVE " + _pages_triples_cte()
        + """,
        pc_sig AS (SELECT DISTINCT verb AS p, object AS o FROM stepped),
        pc_sz AS (
          SELECT p, CAST(count(*) AS BIGINT) AS n_objects
          FROM pc_sig GROUP BY p),
        pc_inter AS (
          SELECT a.p AS p1, b.p AS p2, count(*) AS i
          FROM pc_sig a JOIN pc_sig b ON a.o = b.o AND a.p < b.p
          GROUP BY a.p, b.p),
        pc_sim AS (
          SELECT p1, p2 FROM pc_inter
          JOIN pc_sz s1 ON s1.p = p1
          JOIN pc_sz s2 ON s2.p = p2
          WHERE 100 * i >= 20 * (s1.n_objects + s2.n_objects - i)),
        pc_und AS (
          SELECT p1 AS x, p2 AS y FROM pc_sim
          UNION SELECT p2, p1 FROM pc_sim),
        pc_reach AS (
          SELECT x, x AS r FROM (SELECT DISTINCT x FROM pc_und)
          UNION
          SELECT u.y, r.r FROM pc_reach r JOIN pc_und u ON u.x = r.x),
        pc_canon AS (SELECT x AS p, min(r) AS canonical FROM pc_reach GROUP BY x)
        SELECT s.p AS predicate, coalesce(c.canonical, s.p) AS canonical,
               s.n_objects
        FROM pc_sz s LEFT JOIN pc_canon c ON c.p = s.p
        """
    )
    # --- fusion / ontology gates: shared noisy-claims CTE (must mirror
    # _webtext_claims exactly — i%10==0 pages upper-case the object for
    # create/launch; source = crawl segment i%5).
    _CLAIMS_CTE = """,
    claims AS (
      SELECT actor, verb,
             CASE WHEN i % 10 = 0 AND verb IN ('create', 'launch')
                  THEN upper(object) ELSE object END AS object,
             'seg-' || CAST(i % 5 AS VARCHAR) AS source
      FROM stepped)
    """
    sq["predicate_cardinality"] = (
        "WITH " + _pages_triples_cte() + _CLAIMS_CTE
        + """,
        pc_so AS (SELECT DISTINCT verb AS predicate, actor AS s, object AS o
                  FROM claims)
        SELECT predicate,
               CAST(count(DISTINCT s) AS BIGINT) AS n_subjects,
               CAST(count(*) AS BIGINT) AS n_so_pairs,
               CAST(count(DISTINCT o) AS BIGINT) AS n_objects,
               count(*) = count(DISTINCT s) AS is_functional
        FROM pc_so GROUP BY predicate
        """
    )
    sq["functional_violations"] = (
        "WITH " + _pages_triples_cte() + _CLAIMS_CTE
        + """,
        fv_so AS (SELECT DISTINCT actor AS subject, verb AS predicate,
                         object AS o
                  FROM claims WHERE verb IN ('create', 'launch')),
        fv_counts AS (
          SELECT subject, predicate, CAST(count(*) AS BIGINT) AS n_objects
          FROM fv_so GROUP BY subject, predicate HAVING count(*) > 1),
        fv_sample AS (
          SELECT subject, predicate,
                 string_agg(o, '|' ORDER BY o) AS objects
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY subject, predicate ORDER BY o) AS rn
                FROM fv_so) WHERE rn <= 20
          GROUP BY subject, predicate)
        SELECT c.subject, c.predicate, c.n_objects, s.objects
        FROM fv_counts c JOIN fv_sample s
          ON c.subject = s.subject AND c.predicate = s.predicate
        """
    )
    # two-round source-weighted fusion restated once, over any claims
    # relation with (subject, predicate, object, source) columns — shared
    # by the segment-fusion gates and the multi-extractor gate
    def _fusion_body_sql(claims_rel: str) -> str:
        return f""",
        tf_c AS (SELECT DISTINCT subject, predicate, object, source
                 FROM {claims_rel}),
        tf_votes AS (
          SELECT subject, predicate, object,
                 CAST(count(*) AS BIGINT) AS votes
          FROM tf_c GROUP BY subject, predicate, object),
        tf_w0 AS (
          SELECT subject, predicate, object AS win0 FROM (
            SELECT *, row_number() OVER (
              PARTITION BY subject, predicate
              ORDER BY votes DESC, object) AS rn
            FROM tf_votes) WHERE rn = 1),
        tf_scores AS (
          SELECT source, CAST(count(*) AS BIGINT) AS score
          FROM tf_c c JOIN tf_w0 w
            ON c.subject = w.subject AND c.predicate = w.predicate
           AND c.object = w.win0
          GROUP BY source),
        tf_weighted AS (
          SELECT subject, predicate, object,
                 CAST(sum(coalesce(score, 0)) AS BIGINT) AS weight
          FROM tf_c LEFT JOIN tf_scores USING (source)
          GROUP BY subject, predicate, object)
        SELECT subject, predicate, object AS fused_object, votes, weight,
               n_objects
        FROM (
          SELECT w.subject, w.predicate, w.object, v.votes, w.weight,
                 row_number() OVER (
                   PARTITION BY w.subject, w.predicate
                   ORDER BY w.weight DESC, w.object) AS rn,
                 CAST(count(*) OVER (
                   PARTITION BY w.subject, w.predicate) AS BIGINT)
                   AS n_objects
          FROM tf_weighted w
          JOIN tf_votes v USING (subject, predicate, object))
        WHERE rn = 1
        """

    sq["triple_fusion"] = (
        "WITH " + _pages_triples_cte() + _CLAIMS_CTE
        + """,
        seg_claims AS (SELECT actor AS subject, verb AS predicate,
                              object, source FROM claims)"""
        + _fusion_body_sql("seg_claims")
    )
    # incremental fusion must reproduce the from-scratch fuse exactly
    sq["triple_fusion_merge"] = sq["triple_fusion"]
    # --- multi-extractor fusion: sentence + table + noisy-ocr + hearst
    # claims unioned with extractor-tagged sources, fused by the same
    # two-round algebra — the planted ocr uppercase variants lose to the
    # table source's reliability.
    sq["multi_extractor_fusion"] = (
        "WITH " + _pages_triples_cte() + "," + _TT_CTES + ","
        + _hearst_pairs_ctes
        + """,
        mx_claims AS (
          SELECT actor AS subject, verb AS predicate, object,
                 'sentence' AS source
          FROM stepped
          UNION ALL
          SELECT subj, predicate, obj, 'table' FROM tt
          UNION ALL
          SELECT subj, predicate,
                 CASE WHEN i % 9 = 0 AND predicate = 'os'
                      THEN upper(obj) ELSE obj END,
                 'ocr'
          FROM tt
          UNION ALL
          SELECT DISTINCT hypo, 'is_a', hyper, 'hearst' FROM hp)"""
        + _fusion_body_sql("mx_claims")
    )
    sq["inverse_predicates"] = (
        "WITH " + _pages_triples_cte()
        + """,
        ip_base AS (
          SELECT actor, verb, object FROM stepped
          UNION ALL
          SELECT object, 'exfiltrated_by', actor FROM stepped
          WHERE i % 2 = 0 AND verb = 'exfiltrate'),
        ip_sig AS (SELECT DISTINCT actor AS s, verb AS p, object AS o
                   FROM ip_base),
        ip_sz AS (SELECT p, CAST(count(*) AS BIGINT) AS n_pairs
                  FROM ip_sig GROUP BY p),
        ip_i AS (
          SELECT a.p AS p1, b.p AS p2,
                 CAST(count(*) AS BIGINT) AS n_mirrored
          FROM ip_sig a JOIN ip_sig b
            ON a.s = b.o AND a.o = b.s AND a.p <= b.p
          GROUP BY a.p, b.p)
        SELECT p1, p2, n_mirrored,
               s1.n_pairs AS n_p1, s2.n_pairs AS n_p2
        FROM ip_i
        JOIN ip_sz s1 ON s1.p = p1
        JOIN ip_sz s2 ON s2.p = p2
        WHERE 100 * n_mirrored >= 30 * (s1.n_pairs + s2.n_pairs - n_mirrored)
        """
    )
    sq["predicate_subsumption"] = (
        "WITH " + _pages_triples_cte()
        + """,
        ps_base AS (
          SELECT actor, verb, object FROM stepped
          UNION ALL
          SELECT actor, 'network_request', object FROM stepped
          WHERE i % 2 = 0 AND verb = 'http_request'),
        ps_sig AS (SELECT DISTINCT actor AS s, verb AS p, object AS o
                   FROM ps_base),
        ps_sz AS (SELECT p, CAST(count(*) AS BIGINT) AS n_pairs
                  FROM ps_sig GROUP BY p),
        ps_i AS (
          SELECT a.p AS narrow, b.p AS broad,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM ps_sig a JOIN ps_sig b
            ON a.s = b.s AND a.o = b.o AND a.p <> b.p
          GROUP BY a.p, b.p)
        SELECT narrow, broad, n_shared,
               sn.n_pairs AS n_narrow, sb.n_pairs AS n_broad
        FROM ps_i
        JOIN ps_sz sn ON sn.p = narrow
        JOIN ps_sz sb ON sb.p = broad
        WHERE sn.n_pairs < sb.n_pairs
          AND 100 * n_shared >= 90 * sn.n_pairs
        """
    )
    # Shared CTE chain for the AMIE rule-mining gates: webtext triples +
    # the injected 2-hop composition signal (parity via the portable
    # md5_number_upper & 0xffffffff == hash32_md5_le family), then the
    # full mining algorithm — hot-mid guard, distinct chain groundings,
    # support / body / PCA / head denominators as exact BIGINTs.
    # `extra` lets the chase gate extend the asserted base with the
    # region level while the mining algebra stays shared.
    def _chain_mining_ctes(extra: str = "") -> str:
        return """,
        cr_pg AS (
          SELECT 'crawler-' || CAST(i % 50 AS VARCHAR) AS src,
                 'host-' || CAST(i % 97 AS VARCHAR) AS mid,
                 'cc-' || CAST((i % 97) % 13 AS VARCHAR) AS cc,
                 'region-' || CAST(((i % 97) % 13) % 4 AS VARCHAR) AS rg
          FROM pg),
        cr_base AS (
          SELECT actor, verb, object FROM stepped
          UNION ALL SELECT src, 'links_to', mid FROM cr_pg
          UNION ALL SELECT mid, 'hosted_in', cc FROM cr_pg
          UNION ALL SELECT src, 'reaches', cc FROM cr_pg
          WHERE (md5_number_upper(src || '|' || cc)
                 & 4294967295) % 2 = 0""" + extra + """),
        cr_sig AS (SELECT DISTINCT actor AS s, verb AS p, object AS o
                   FROM cr_base),
        cr_out AS (SELECT s AS z, CAST(count(*) AS BIGINT) AS n_out
                   FROM cr_sig GROUP BY s),
        cr_in AS (SELECT o AS z, CAST(count(*) AS BIGINT) AS n_in
                  FROM cr_sig GROUP BY o),
        cr_hot AS (SELECT z FROM cr_in JOIN cr_out USING (z)
                   WHERE n_in > 10000 OR n_out > 10000),
        cr_bodies AS (
          SELECT DISTINCT a.p AS p1, b.p AS p2, a.s AS x, b.o AS y
          FROM cr_sig a JOIN cr_sig b ON a.o = b.s
          WHERE a.o NOT IN (SELECT z FROM cr_hot)),
        cr_nb AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_body
                  FROM cr_bodies GROUP BY p1, p2),
        cr_sup AS (
          SELECT b.p1, b.p2, h.p AS head,
                 CAST(count(*) AS BIGINT) AS support
          FROM cr_bodies b JOIN cr_sig h ON h.s = b.x AND h.o = b.y
          GROUP BY b.p1, b.p2, h.p),
        cr_cand AS (
          SELECT * FROM cr_sup JOIN cr_nb USING (p1, p2)
          WHERE support >= 3 AND 100 * support >= 30 * n_body),
        cr_hs AS (SELECT DISTINCT p AS head, s AS x FROM cr_sig),
        cr_pca AS (
          SELECT b.p1, b.p2, c.head, CAST(count(*) AS BIGINT) AS n_pca
          FROM cr_bodies b
          JOIN (SELECT DISTINCT p1, p2, head FROM cr_cand) c
            USING (p1, p2)
          JOIN cr_hs hs ON hs.head = c.head AND hs.x = b.x
          GROUP BY b.p1, b.p2, c.head),
        cr_nh AS (SELECT p AS head, CAST(count(*) AS BIGINT) AS n_head
                  FROM cr_sig GROUP BY p)"""

    sq["chain_rules"] = (
        "WITH " + _pages_triples_cte()
        + _chain_mining_ctes()
        + """
        SELECT p1, p2, head, support, n_body, n_pca, n_head
        FROM cr_cand
        JOIN cr_pca USING (p1, p2, head)
        JOIN cr_nh USING (head)
        """
    )
    sq["chain_inference"] = (
        "WITH " + _pages_triples_cte()
        + _chain_mining_ctes()
        + """,
        cr_keep AS (
          SELECT c.p1, c.p2, c.head,
                 (100 * c.support) // p.n_pca AS conf_pct
          FROM cr_cand c JOIN cr_pca p USING (p1, p2, head)
          WHERE 100 * c.support >= 40 * p.n_pca),
        cr_der AS (
          SELECT b.x, k.head, b.y, k.p1, k.p2, k.conf_pct
          FROM cr_bodies b JOIN cr_keep k USING (p1, p2)),
        cr_best AS (
          SELECT *,
                 row_number() OVER (PARTITION BY x, head, y
                   ORDER BY conf_pct DESC, p1, p2) AS rn,
                 CAST(count(*) OVER (PARTITION BY x, head, y)
                      AS BIGINT) AS n_rules
          FROM cr_der)
        SELECT x AS actor, head AS verb, y AS object, n_rules,
               p1 AS rule_p1, p2 AS rule_p2, conf_pct
        FROM cr_best
        WHERE rn = 1 AND NOT EXISTS (
          SELECT 1 FROM cr_sig s
          WHERE s.s = x AND s.p = head AND s.o = y)
        """
    )
    sq["rule_chase"] = (
        "WITH " + _pages_triples_cte()
        + _chain_mining_ctes(
            """
          UNION ALL SELECT cc, 'in_region', rg FROM cr_pg
          UNION ALL SELECT src, 'reaches_region', rg FROM cr_pg
          WHERE (md5_number_upper(src || '|' || rg)
                 & 4294967295) % 2 = 0"""
        )
        + """,
        ch_keep AS (
          SELECT DISTINCT p1, p2, head
          FROM cr_cand JOIN cr_pca USING (p1, p2, head)
          WHERE 100 * support >= 40 * n_pca),
        ch_d1 AS (
          SELECT DISTINCT b.x AS s, k.head AS p, b.y AS o
          FROM cr_bodies b JOIN ch_keep k USING (p1, p2)
          WHERE NOT EXISTS (
            SELECT 1 FROM cr_sig t
            WHERE t.s = b.x AND t.p = k.head AND t.o = b.y)),
        ch_sig1 AS (
          SELECT s, p, o FROM cr_sig
          UNION SELECT s, p, o FROM ch_d1),
        ch_out1 AS (SELECT s AS z, CAST(count(*) AS BIGINT) AS n_out
                    FROM ch_sig1 GROUP BY s),
        ch_in1 AS (SELECT o AS z, CAST(count(*) AS BIGINT) AS n_in
                   FROM ch_sig1 GROUP BY o),
        ch_hot1 AS (SELECT z FROM ch_in1 JOIN ch_out1 USING (z)
                    WHERE n_in > 10000 OR n_out > 10000),
        ch_b2 AS (
          SELECT DISTINCT a.p AS p1, b.p AS p2, a.s AS x, b.o AS y
          FROM ch_sig1 a JOIN ch_sig1 b ON a.o = b.s
          WHERE a.o NOT IN (SELECT z FROM ch_hot1)),
        ch_d2 AS (
          SELECT DISTINCT b.x AS s, k.head AS p, b.y AS o
          FROM ch_b2 b JOIN ch_keep k USING (p1, p2)
          WHERE NOT EXISTS (
            SELECT 1 FROM ch_sig1 t
            WHERE t.s = b.x AND t.p = k.head AND t.o = b.y))
        SELECT s AS actor, p AS verb, o AS object, CAST(1 AS INT) AS round
        FROM ch_d1
        UNION ALL
        SELECT s AS actor, p AS verb, o AS object, CAST(2 AS INT) AS round
        FROM ch_d2
        """
    )
    sq["edge_provenance"] = (
        "WITH " + _pages_triples_cte()
        + """,
        ep_counts AS (
          SELECT actor AS subject, verb AS predicate, object,
                 CAST(count(*) AS BIGINT) AS n_mentions,
                 CAST(count(DISTINCT url) AS BIGINT) AS n_docs
          FROM stepped GROUP BY actor, verb, object),
        ep_d AS (SELECT DISTINCT actor AS subject, verb AS predicate,
                        object, url FROM stepped),
        ep_s AS (
          SELECT subject, predicate, object,
                 string_agg(url, '|' ORDER BY url) AS sample_docs
          FROM (
            SELECT *, row_number() OVER (
              PARTITION BY subject, predicate, object ORDER BY url) AS rn
            FROM ep_d) WHERE rn <= 3
          GROUP BY subject, predicate, object)
        SELECT c.subject, c.predicate, c.object, c.n_mentions, c.n_docs,
               s.sample_docs
        FROM ep_counts c JOIN ep_s s
          ON c.subject = s.subject AND c.predicate = s.predicate
         AND c.object = s.object
        """
    )
    sq["entity_summary"] = (
        "WITH " + _pages_triples_cte()
        + """,
        es_f AS (SELECT DISTINCT actor AS subject, verb AS predicate,
                        object FROM stepped),
        es_fr AS (SELECT predicate, object,
                         CAST(count(*) AS BIGINT) AS fact_subjects
                  FROM es_f GROUP BY predicate, object)
        SELECT subject, rank, predicate, object, fact_subjects FROM (
          SELECT f.subject, f.predicate, f.object, fr.fact_subjects,
                 CAST(row_number() OVER (
                   PARTITION BY f.subject
                   ORDER BY fr.fact_subjects, f.predicate, f.object)
                   AS INT) AS rank
          FROM es_f f JOIN es_fr fr USING (predicate, object))
        WHERE rank <= 3
        """
    )
    sq["entity_cooccurrence"] = (
        "WITH " + _pages_triples_cte()
        + """,
        co_m AS (SELECT DISTINCT url AS doc, actor AS e FROM stepped
                 UNION SELECT DISTINCT url, object FROM stepped),
        co_df AS (SELECT e, CAST(count(*) AS BIGINT) AS df
                  FROM co_m GROUP BY e),
        co_p AS (SELECT m1.e AS a, m2.e AS b,
                        CAST(count(*) AS BIGINT) AS co_count
                 FROM co_m m1 JOIN co_m m2
                   ON m1.doc = m2.doc AND m1.e < m2.e
                 GROUP BY m1.e, m2.e HAVING count(*) >= 2)
        SELECT a, b, co_count, da.df AS df_a, db.df AS df_b
        FROM co_p
        JOIN co_df da ON da.e = a
        JOIN co_df db ON db.e = b
        """
    )
    # --- typed-literal dictionary: the CASE chain is GENERATED from the
    # same LITERAL_PATTERNS constant the Spark operator uses (single
    # source of truth; patterns restricted to the Java/RE2-identical
    # regex subset).
    from sigraph_spark.operators.literals import LITERAL_PATTERNS
    def _lt_case_for(expr: str) -> str:
        return "CASE " + " ".join(
            f"WHEN regexp_matches({expr}, '{pat}') THEN '{lt}'"
            for lt, pat in LITERAL_PATTERNS
        ) + " ELSE NULL END"

    _lt_case = _lt_case_for("_c")
    sq["literal_typing"] = (
        "WITH " + _pages_triples_cte()
        + f""",
        lt_tok AS (
          SELECT url AS _doc, t AS _t
          FROM stepped, UNNEST(regexp_split_to_array(object, '[\\s,]+')) AS u(t)
          WHERE t <> ''),
        lt_c AS (SELECT _doc, replace(lower(_t), '[.]', '.') AS _c
                 FROM lt_tok),
        lt_ty AS (SELECT _doc, _c, {_lt_case} AS littype FROM lt_c)
        SELECT littype,
               CASE WHEN littype = 'ipv4' AND contains(_c, ':')
                    THEN split_part(_c, ':', 1) ELSE _c END AS canonical,
               CAST(count(*) AS BIGINT) AS n_mentions,
               CAST(count(DISTINCT _doc) AS BIGINT) AS n_docs
        FROM lt_ty WHERE littype IS NOT NULL
        GROUP BY littype, canonical
        """
    )
    _pr_case = _lt_case_for("replace(lower(t), '[.]', '.')")
    sq["predicate_ranges"] = (
        "WITH " + _pages_triples_cte()
        + f""",
        pr_t AS (
          SELECT verb AS predicate,
                 coalesce(
                   (list_filter(
                      list_transform(
                        regexp_split_to_array(object, '[\\s,]+'),
                        t -> {_pr_case}),
                      x -> x IS NOT NULL))[1],
                   'untyped') AS littype
          FROM stepped),
        pr_c AS (SELECT predicate, littype,
                        CAST(count(*) AS BIGINT) AS n
                 FROM pr_t GROUP BY predicate, littype)
        SELECT predicate,
               max(CASE WHEN rn = 1 THEN littype END) AS range_type,
               CAST(sum(n) AS BIGINT) AS n_objects,
               CAST(count(*) AS BIGINT) AS n_types
        FROM (SELECT *, row_number() OVER (
                PARTITION BY predicate ORDER BY n DESC, littype) AS rn
              FROM pr_c)
        GROUP BY predicate
        """
    )
    sq["predicate_schema"] = (
        "WITH " + _pages_triples_cte()
        + f""",
        psch_so AS (SELECT DISTINCT verb AS predicate, actor AS s,
                           object AS o FROM stepped),
        psch_card AS (
          SELECT predicate,
                 CAST(count(DISTINCT s) AS BIGINT) AS n_subjects,
                 CAST(count(*) AS BIGINT) AS n_so_pairs,
                 CAST(count(DISTINCT o) AS BIGINT) AS n_objects,
                 count(*) = count(DISTINCT s) AS is_functional
          FROM psch_so GROUP BY predicate),
        psch_t AS (
          SELECT verb AS predicate,
                 coalesce(
                   (list_filter(
                      list_transform(
                        regexp_split_to_array(object, '[\\s,]+'),
                        t -> {_pr_case}),
                      x -> x IS NOT NULL))[1],
                   'untyped') AS littype
          FROM stepped),
        psch_c AS (SELECT predicate, littype,
                          CAST(count(*) AS BIGINT) AS n
                   FROM psch_t GROUP BY predicate, littype),
        psch_r AS (
          SELECT predicate,
                 max(CASE WHEN rn = 1 THEN littype END) AS range_type
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY predicate ORDER BY n DESC, littype) AS rn
                FROM psch_c)
          GROUP BY predicate)
        SELECT c.predicate, c.n_subjects, c.n_so_pairs, c.n_objects,
               c.is_functional, r.range_type
        FROM psch_card c JOIN psch_r r ON c.predicate = r.predicate
        """
    )
    sq["range_violations"] = (
        "WITH " + _pages_triples_cte()
        + f""",
        rv_base AS (
          SELECT verb, object FROM stepped
          UNION ALL
          SELECT 'dns_query',
                 'c:\\noise\\dq_' || CAST(i AS VARCHAR) || '.dat'
          FROM pg WHERE i % 50 = 0),
        rv_t AS (
          SELECT verb AS predicate, object,
                 coalesce(
                   (list_filter(
                      list_transform(
                        regexp_split_to_array(object, '[\\s,]+'),
                        t -> {_pr_case}),
                      x -> x IS NOT NULL))[1],
                   'untyped') AS littype
          FROM rv_base),
        rv_c AS (SELECT predicate, littype,
                        CAST(count(*) AS BIGINT) AS n
                 FROM rv_t GROUP BY predicate, littype),
        rv_k AS (
          SELECT predicate, littype AS expected_type FROM (
            SELECT *, row_number() OVER (
                     PARTITION BY predicate ORDER BY n DESC, littype) AS rn,
                   sum(n) OVER (PARTITION BY predicate) AS tot
            FROM rv_c)
          WHERE rn = 1 AND littype <> 'untyped' AND 100 * n >= 80 * tot)
        SELECT t.predicate, k.expected_type, t.littype AS actual_type,
               t.object, CAST(count(*) AS BIGINT) AS n_mentions
        FROM rv_t t JOIN rv_k k ON t.predicate = k.predicate
        WHERE t.littype <> k.expected_type
        GROUP BY t.predicate, k.expected_type, t.littype, t.object
        """
    )
    sq["fusion_apply"] = (
        "WITH " + _pages_triples_cte() + _CLAIMS_CTE
        + """,
        fa_c AS (SELECT DISTINCT actor AS subject, verb AS predicate,
                        object, source FROM claims),
        fa_votes AS (
          SELECT subject, predicate, object,
                 CAST(count(*) AS BIGINT) AS votes
          FROM fa_c GROUP BY subject, predicate, object),
        fa_w0 AS (
          SELECT subject, predicate, object AS win0 FROM (
            SELECT *, row_number() OVER (
              PARTITION BY subject, predicate
              ORDER BY votes DESC, object) AS rn
            FROM fa_votes) WHERE rn = 1),
        fa_scores AS (
          SELECT source, CAST(count(*) AS BIGINT) AS score
          FROM fa_c c JOIN fa_w0 w
            ON c.subject = w.subject AND c.predicate = w.predicate
           AND c.object = w.win0
          GROUP BY source),
        fa_weighted AS (
          SELECT subject, predicate, object,
                 CAST(sum(coalesce(score, 0)) AS BIGINT) AS weight
          FROM fa_c LEFT JOIN fa_scores USING (source)
          GROUP BY subject, predicate, object),
        fa_win AS (
          SELECT subject, predicate, object AS fused_object FROM (
            SELECT *, row_number() OVER (
              PARTITION BY subject, predicate
              ORDER BY weight DESC, object) AS rn
            FROM fa_weighted) WHERE rn = 1)
        SELECT c.subject, c.predicate, c.object, c.source
        FROM fa_c c LEFT JOIN fa_win w
          ON c.subject = w.subject AND c.predicate = w.predicate
        WHERE w.fused_object IS NULL OR c.object = w.fused_object
        """
    )
    sq["entity_types"] = (
        "WITH " + _pages_triples_cte()
        + """,
        et_c AS (
          SELECT actor AS entity, verb AS p,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT object) AS BIGINT) AS nobj
          FROM stepped GROUP BY actor, verb)
        SELECT entity,
               max(CASE WHEN rn = 1 THEN p END) AS type_pred,
               CAST(sum(n) AS BIGINT) AS n_claims,
               CAST(count(*) AS BIGINT) AS n_predicates,
               CAST(sum(nobj) AS BIGINT) AS n_objects
        FROM (SELECT *, row_number() OVER (
                PARTITION BY entity ORDER BY n DESC, p) AS rn
              FROM et_c)
        GROUP BY entity
        """
    )
    from sigraph_spark.operators.transe import transe_oracle_sql
    sq["transe_embeddings"] = (
        "WITH " + _pages_triples_cte()
        + """,
        te_in AS (SELECT actor AS s, verb AS p, object AS o FROM stepped),
        """
        + transe_oracle_sql("te_in", dim=4, rounds=3)
    )
    sq["kg_completion_eval"] = (
        "WITH " + _pages_triples_cte()
        + """,
        te_in AS (SELECT actor AS s, verb AS p, object AS o FROM stepped),
        """
        + transe_oracle_sql("te_in", dim=4, rounds=3, final_select=False)
        + """,
        ev_q AS (
          SELECT DISTINCT s, p, o FROM te_in
          WHERE CAST(md5_number_upper(s || '|' || p || '|' || o)
                     & 4294967295 AS BIGINT) % 5 = 0),
        ev_c AS (
          SELECT q.s, q.p, q.o, e.id AS cand
          FROM ev_q q CROSS JOIN (SELECT DISTINCT id FROM te_e3) e),
        ev_f AS (
          SELECT c.* FROM ev_c c
          WHERE c.cand = c.o OR NOT EXISTS (
            SELECT 1 FROM te_f f
            WHERE f.s = c.s AND f.p = c.p AND f.o = c.cand)),
        ev_d AS (
          SELECT c.s, c.p, c.o, c.cand,
                 sum(abs(es.v + rp.v - et.v)) AS d
          FROM ev_f c
          JOIN te_e3 es ON es.id = c.s
          JOIN te_r3 rp ON rp.id = c.p AND rp.k = es.k
          JOIN te_e3 et ON et.id = c.cand AND et.k = es.k
          GROUP BY c.s, c.p, c.o, c.cand),
        ev_t AS (SELECT s, p, o, d AS d_true FROM ev_d WHERE cand = o)
        SELECT d.s AS subj, d.p AS predicate, d.o AS obj,
               CAST(1 + sum(CASE WHEN d.d < t.d_true
                                 OR (d.d = t.d_true AND d.cand < d.o)
                            THEN 1 ELSE 0 END) AS BIGINT) AS rank
        FROM ev_d d
        JOIN ev_t t ON d.s = t.s AND d.p = t.p AND d.o = t.o
        GROUP BY d.s, d.p, d.o
        """
    )
    sq["transe_resume"] = (
        "WITH " + _pages_triples_cte()
        + """,
        tr_all AS (SELECT actor AS s, verb AS p, object AS o FROM stepped),
        tr_base AS (
          SELECT s, p, o FROM tr_all
          WHERE CAST(md5_number_upper(s || '|' || p || '|' || o)
                     & 4294967295 AS BIGINT) % 10 <> 0),
        """
        + transe_oracle_sql(
            "tr_base", dim=4, rounds=2, prefix="tc_", final_select=False
        )
        + """,
        tr_prior AS (
          SELECT 'e' AS kind, id, k, v FROM tc_e2
          UNION ALL SELECT 'r', id, k, v FROM tc_r2),
        """
        + transe_oracle_sql(
            "tr_all", dim=4, rounds=2, prefix="tw_",
            init_rel="tr_prior", round_offset=2, final_select=False,
        )
        + """
        SELECT 'e' AS kind, id, k, v FROM tw_e2
        UNION ALL SELECT 'r', id, k, v FROM tw_r2
        """
    )
    sq["schema_graph"] = (
        "WITH " + _pages_triples_cte()
        + """,
        sg_c AS (
          SELECT actor AS entity, verb AS p, count(*) AS n
          FROM stepped GROUP BY actor, verb),
        sg_types AS (
          SELECT entity, max(CASE WHEN rn = 1 THEN p END) AS type_pred
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY entity ORDER BY n DESC, p) AS rn
                FROM sg_c)
          GROUP BY entity)
        SELECT st.type_pred AS subj_type,
               t.verb AS predicate,
               coalesce(ot.type_pred, 'LITERAL') AS obj_type,
               CAST(count(*) AS BIGINT) AS n_edges,
               CAST(count(DISTINCT t.actor) AS BIGINT) AS n_subjects,
               CAST(count(DISTINCT t.object) AS BIGINT) AS n_objects
        FROM stepped t
        JOIN sg_types st ON t.actor = st.entity
        LEFT JOIN sg_types ot ON t.object = ot.entity
        GROUP BY 1, 2, 3
        """
    )
    from sigraph_spark.corpus import portable_hash_sql
    sq["pipeline_edges"] = (
        "WITH " + _pages_triples_cte()
        + f""",
        norm AS (
          SELECT i, url,
                 replace(lower(trim(actor)), '[.]', '.') AS subj,
                 verb AS predicate,
                 replace(lower(trim(object)), '[.]', '.') AS obj,
                 {portable_hash_sql('i', 14)} % 31536000 AS start_off
          FROM stepped),
        ranked AS (
          SELECT subj, predicate, obj, start_off, url,
                 row_number() OVER (PARTITION BY subj, predicate, obj
                                    ORDER BY start_off DESC, url DESC) AS rn,
                 count(*) OVER (PARTITION BY subj, predicate, obj) AS weight
          FROM norm)
        SELECT subj, predicate, obj, CAST(start_off AS BIGINT) AS start_off,
               url AS provenance_url, CAST(weight AS BIGINT) AS weight
        FROM ranked WHERE rn = 1
        """
    )
    # incremental linking total mapping == identity over the normalized
    # vocabulary on this corpus (no near-dup merges fire — the same
    # verified fact the pipeline_edges oracle rests on)
    sq["link_incremental"] = (
        "WITH " + _pages_triples_cte()
        + """,
        vocab AS (
          SELECT replace(lower(trim(actor)), '[.]', '.') AS entity
          FROM stepped
          UNION
          SELECT replace(lower(trim(object)), '[.]', '.') FROM stepped)
        SELECT entity, entity AS canonical_id FROM vocab WHERE entity <> ''
        """
    )
    sq["provenance_export"] = (
        "WITH RECURSIVE " + _EDGES_CTE
        + """,
        fe AS (
          SELECT e.src, e.predicate, e.dst, e.start_time, e.weight
          FROM edges e
          JOIN nodes ns ON ns.node_id = e.src
          JOIN nodes nd ON nd.node_id = e.dst
          WHERE ns.label <> 'MODULE'
            AND NOT (ns.label = 'PROCESS' AND nd.label = 'PROCESS')),
        anchor AS (
          SELECT DISTINCT node_id AS x FROM containment WHERE unit_id = 'u-3'),
        reach(x, hops) AS (
          SELECT x, 0 FROM anchor
          UNION
          SELECT fe.dst, r.hops + 1 FROM reach r JOIN fe ON fe.src = r.x
          WHERE r.hops < 1),
        minreach AS (SELECT x, min(hops) AS h FROM reach GROUP BY x)
        SELECT fe.src, fe.predicate, fe.dst, fe.start_time, fe.weight
        FROM fe JOIN minreach m ON fe.src = m.x
        """
    )
    sq["orders_priority"] = """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
        FROM orders GROUP BY o_orderpriority
    """
    # the incremental merge path must reproduce the full recompute exactly
    # (merge-twice == merge-once == recompute-from-union, §1.3 semilattice)
    sq["graph_merge_nodes"] = sq["graph_nodes"]
    sq["graph_merge_edges"] = sq["graph_edges"]
    sq["graph_merge_traces"] = sq["graph_traces"]
    sq["bpe_merges"] = _bpe_merges_oracle(12)
    sq["bpe_tokens"] = _bpe_tokens_oracle(12)
    sq["sentences"] = r"""
        WITH s AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN 'First one. Second!  Third?' || chr(10)
                           || 'Fourth. ' || coalesce(text, '')
                      ELSE coalesce(text, '') END AS t
          FROM documents),
        d AS (
          SELECT doc_id,
                 string_split(regexp_replace(t, '([.!?])\s+',
                                             '\1' || chr(29),
                                             'g'), chr(29)) AS parts
          FROM s),
        i AS (SELECT doc_id, unnest(range(1, len(parts) + 1)) AS sid, parts
              FROM d)
        SELECT doc_id, CAST(sid AS INTEGER) AS sentence_id,
               trim(parts[sid]) AS sentence
        FROM i WHERE trim(parts[sid]) <> ''
    """
    sq["quality_classifier"] = _quality_classifier_oracle()
    return sq
