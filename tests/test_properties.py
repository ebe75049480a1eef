"""Property-based checks (hypothesis) for operators with exact python
references: fixed-point PageRank, triangle counting, and chunk coverage.
Few examples, small inputs — each example is a real Spark job."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_nodes = st.integers(min_value=0, max_value=9)
_edges = st.lists(
    st.tuples(_nodes, _nodes), min_size=1, max_size=25, unique=True
)


@given(edges=_edges)
@settings(**_SETTINGS)
def test_pagerank_always_matches_python_reference(spark, edges):
    from sigraph_spark.operators.pagerank import SCALE, pagerank

    e = [(f"n{a}", f"n{b}") for a, b in edges]
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(
            spark.createDataFrame(e, "src string, dst string")
        ).collect()
    }
    # python reference of the identical fixed-point recurrence
    es = sorted(set(e))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    n = len(nodes)
    deg: dict[str, int] = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: SCALE // n for v in nodes}
    for _ in range(5):
        acc = {v: 0 for v in nodes}
        for u, v in es:
            acc[v] += rank[u] // deg[u]
        rank = {
            v: (15 * SCALE) // (100 * n) + (85 * acc[v]) // 100 for v in nodes
        }
    assert got == rank


@given(edges=_edges)
@settings(**_SETTINGS)
def test_triangles_always_match_brute_force(spark, edges):
    from sigraph_spark.operators.graphalgo import triangle_total

    e = [(f"n{a}", f"n{b}") for a, b in edges]
    adj: dict[str, set] = {}
    for a, b in e:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for x, y, z in combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    df = spark.createDataFrame(e, "src string, dst string")
    assert triangle_total(df) == want


@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=8),
    chunk=st.integers(min_value=2, max_value=16),
    overlap=st.integers(min_value=0, max_value=8),
)
@settings(**_SETTINGS)
def test_chunking_covers_every_token_exactly(spark, lengths, chunk, overlap):
    from sigraph_spark.operators.corpus import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(n))) for i, n in enumerate(lengths)
    ]
    out = chunk_documents(
        spark.createDataFrame(rows, "doc_id long, text string"),
        chunk_tokens=chunk,
        overlap=overlap,
    ).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(lengths):
        chunks = sorted(per_doc[i], key=lambda r: r["chunk_id"])
        covered = set()
        for r in chunks:
            assert r["start_tok"] == r["chunk_id"] * (chunk - overlap)
            toks = r["chunk_text"].split() if r["chunk_text"] else []
            assert len(toks) == r["chunk_len"]
            assert toks == [f"d{i}w{j}" for j in range(r["start_tok"], r["start_tok"] + r["chunk_len"])]
            covered.update(range(r["start_tok"], r["start_tok"] + r["chunk_len"]))
        assert covered == set(range(n))  # every token exactly covered
        if n == 0:
            assert len(chunks) == 1 and chunks[0]["chunk_len"] == 0
