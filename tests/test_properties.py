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


@given(edges=_edges, seed=_nodes)
@settings(**_SETTINGS)
def test_shortest_paths_always_matches_python_bfs(spark, edges, seed):
    from collections import deque

    from sigraph_spark.operators.graphalgo import shortest_paths

    e = [(f"n{a}", f"n{b}") for a, b in edges]
    s = f"n{seed}"
    got = {
        r["node_id"]: r["distance"]
        for r in shortest_paths(
            spark.createDataFrame(e, "src string, dst string"),
            spark.createDataFrame([(s,)], "node_id string"),
        ).collect()
    }
    adj: dict[str, set[str]] = {}
    for a, b in set(e):
        adj.setdefault(a, set()).add(b)
    ref = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)
    assert got == ref


_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_remove_dup_spans_invariants(spark, texts):
    from sigraph_spark.operators.contamination import remove_dup_spans

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = remove_dup_spans(docs, span_words=2).collect()
    # invariant 1: every doc appears exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(len(texts)))
    # invariant 2: kept <= total per doc; total kept across the corpus ==
    # number of DISTINCT spans in the corpus (each survives exactly once)
    spans = []
    for t in texts:
        w = (t or "").lower().strip().split()
        n = max((len(w) + 1) // 2, 1)
        spans.extend(" ".join(w[i * 2 : i * 2 + 2]) for i in range(n))
    assert sum(r["kept_spans"] for r in rows) == len(set(spans))
    for r in rows:
        assert 0 <= r["kept_spans"] <= r["n_spans"]
        # invariant 3: the rewrite's words are a subsequence of the original
        orig = (texts[r["doc_id"]] or "").lower().strip().split()
        kept = r["clean_text"].split()
        it = iter(orig)
        assert all(any(k == o for o in it) for k in kept)


@given(edges=_edges)
@settings(**_SETTINGS)
def test_negative_samples_count_bounds(spark, edges):
    from sigraph_spark.operators.walks import negative_samples

    pairs = sorted({(f"n{a}", f"n{b}") for a, b in edges if a != b})
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "center string, context string")
    got = sorted(
        (r["center"], r["context"], r["slot"], r["negative"])
        for r in negative_samples(df, k=3).collect()
    )
    import hashlib

    def h32(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little")

    vocab = sorted({n for p in pairs for n in p})
    ref = sorted(
        (c, ctx, s, vocab[h32(f"{c}|{ctx}|{s}") % len(vocab)])
        for c, ctx in pairs
        for s in range(1, 4)
        if vocab[h32(f"{c}|{ctx}|{s}") % len(vocab)] != ctx
    )
    assert got == ref


# ---------------------------------------------------------------------------
# Trace-span merge semilattice: random-split merge == full rebuild
# ---------------------------------------------------------------------------

_span_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # unit
        st.integers(min_value=0, max_value=3),    # trace
        st.integers(min_value=0, max_value=15),   # span
        st.integers(min_value=0, max_value=50),   # ts offset
    ),
    min_size=1,
    max_size=30,
)


@given(events=_span_events, split_bits=st.integers(min_value=0, max_value=2**30))
@settings(**_SETTINGS)
def test_trace_merge_any_split_equals_rebuild(spark, events, split_bits):
    """For ANY event multiset and ANY 2-way split (including re-delivered
    overlap via duplicated rows), merging the halves' trace tables through
    the span side table equals the full rebuild — the semilattice contract
    the production MERGE relies on."""
    import datetime as dt

    from sigraph_spark.operators.graph import (
        build_trace_spans, build_traces, merge_trace_spans, merge_traces,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (f"u{u}", f"t{t}", f"s{s}", base + dt.timedelta(seconds=ts), f"p{s % 3}.exe")
        for (u, t, s, ts) in events
    ]
    schema = ("unit_id string, trace_id string, span_id string, "
              "timestamp timestamp, process_name string")
    full = spark.createDataFrame(rows, schema)
    mask = [bool((split_bits >> (i % 30)) & 1) for i in range(len(rows))]
    left = [r for r, m in zip(rows, mask) if m]
    right = [r for r, m in zip(rows, mask) if not m]
    # overlap: re-deliver the first row on both sides when both non-empty
    if left and right:
        right = right + [left[0]]
    if not left or not right:
        left, right = rows, rows  # degenerate split -> full re-delivery
    l_df = spark.createDataFrame(left, schema)
    r_df = spark.createDataFrame(right, schema)

    spans = merge_trace_spans(build_trace_spans(l_df), build_trace_spans(r_df))
    merged = merge_traces(build_traces(l_df), build_traces(r_df), spans)
    rebuild = build_traces(full)
    diff = merged.exceptAll(rebuild).count() + rebuild.exceptAll(merged).count()
    assert diff == 0


@given(
    ids=st.lists(st.integers(min_value=0, max_value=500), min_size=1,
                 max_size=40, unique=True),
    permille=st.integers(min_value=0, max_value=3000),
)
@settings(**_SETTINGS)
def test_mixture_epochs_copy_count_formula(spark, ids, permille):
    """Every doc's copy count equals floor(e) + (md5 bucket < frac) exactly
    — recomputed off-engine with hashlib."""
    import hashlib

    from pyspark.sql import functions as F

    from sigraph_spark.operators.corpus import mixture_epochs

    docs = spark.createDataFrame(
        [(i, "s") for i in ids], "doc_id long, source string"
    )
    out = mixture_epochs(docs, {"s": permille / 1000}).groupBy("doc_id").count()
    got = {r["doc_id"]: r["count"] for r in out.collect()}
    for i in ids:
        b = int.from_bytes(
            hashlib.md5(f"mix:{i}".encode()).digest()[:4], "little"
        ) % 1000
        want = permille // 1000 + (1 if b < permille % 1000 else 0)
        assert got.get(i, 0) == want


# --- fusion invariants ------------------------------------------------------

_claims = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.sampled_from(["p1", "p2"]),
        st.sampled_from(["oa", "ob", "oc"]),
        st.sampled_from(["A", "B", "C", "D"]),
    ),
    min_size=1,
    max_size=20,
)


def _fuse_py(claims):
    """Python reference of the exact two-round integer vote."""
    cs = sorted(set(claims))
    votes: dict = {}
    for s, p, o, src in cs:
        votes[(s, p, o)] = votes.get((s, p, o), 0) + 1
    win0 = {}
    for (s, p, o), v in votes.items():
        k = (s, p)
        if k not in win0 or (-v, o) < (-votes[(s, p, win0[k])], win0[k]):
            win0[k] = o
    score: dict = {}
    for s, p, o, src in cs:
        if win0[(s, p)] == o:
            score[src] = score.get(src, 0) + 1
    weight: dict = {}
    for s, p, o, src in cs:
        weight[(s, p, o)] = weight.get((s, p, o), 0) + score.get(src, 0)
    out = {}
    for (s, p, o), w in weight.items():
        k = (s, p)
        if k not in out or (-w, o) < (-weight[(s, p, out[k])], out[k]):
            out[k] = o
    return {(s, p): (o, votes[(s, p, o)], weight[(s, p, o)])
            for (s, p), o in out.items()}


@given(claims=_claims, cut=st.integers(min_value=0, max_value=20))
@settings(**_SETTINGS)
def test_fusion_matches_reference_and_merge_is_split_invariant(
    spark, claims, cut
):
    from sigraph_spark.operators.fusion import fuse_triples, merge_claims

    schema = "subject string, predicate string, object string, source string"
    cut = min(cut, len(claims))
    full = spark.createDataFrame(claims, schema)
    # arbitrary overlapping split folded through the semilattice
    d1 = spark.createDataFrame(claims[:cut] or claims[:1], schema)
    d2 = spark.createDataFrame(claims[cut:] or claims[-1:], schema)
    merged = merge_claims(merge_claims(None, d1), d2)
    got = {
        (r["subject"], r["predicate"]): (
            r["fused_object"], r["votes"], r["weight"])
        for r in fuse_triples(
            merged, "subject", "predicate", "object", "source"
        ).collect()
    }
    assert got == _fuse_py(claims)
