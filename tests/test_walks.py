"""Deterministic random walks: python-reference parity, partition
invariance, sink handling, skip-gram pair construction."""

from __future__ import annotations

import hashlib

from sigraph_spark.operators.walks import random_walks, skipgram_pairs


def _h32(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little")


def _ref_walks(edges, walks_per_node, length):
    adj = {}
    for a, b in set(edges):
        adj.setdefault(a, set()).add(b)
    rows = []
    for start in sorted({a for a, _ in edges}):
        for w in range(walks_per_node):
            node = start
            rows.append((start, w, 0, node))
            for t in range(1, length + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                node = min(nbrs, key=lambda v: (_h32(f"{start}|{w}|{t}|{v}"), v))
                rows.append((start, w, t, node))
    return sorted(rows)


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("d", "e"),  # e is a sink: walks through d stop at e
    ("b", "a"),
]


def test_random_walks_match_python_reference(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = sorted(
        (r["start"], r["walk"], r["step"], r["node"])
        for r in random_walks(e, walks_per_node=3, length=5).collect()
    )
    assert got == _ref_walks(EDGES, 3, 5)


def test_random_walks_partition_invariant(spark):
    e1 = spark.createDataFrame(EDGES, "src string, dst string").repartition(1)
    e7 = spark.createDataFrame(EDGES, "src string, dst string").repartition(7)
    k = lambda df: sorted(map(tuple, df.collect()))
    assert k(random_walks(e1, 2, 4)) == k(random_walks(e7, 2, 4))


def test_random_walks_diverge_per_walker(spark):
    """Different walk indices from the same start must not all collapse
    onto one path (the hash includes the walker id)."""
    e = spark.createDataFrame(EDGES, "src string, dst string")
    rows = random_walks(e, walks_per_node=4, length=5).collect()
    paths = {}
    for r in rows:
        paths.setdefault((r["start"], r["walk"]), []).append((r["step"], r["node"]))
    seqs = {tuple(n for _, n in sorted(v)) for k_, v in paths.items() if k_[0] == "a"}
    assert len(seqs) > 1


def test_skipgram_pairs_window(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    walks = random_walks(e, walks_per_node=2, length=4)
    pairs = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(walks, 2).collect()}

    ref = {}
    rows = _ref_walks(EDGES, 2, 4)
    byw = {}
    for start, w, step, node in rows:
        byw.setdefault((start, w), []).append((step, node))
    for seq in byw.values():
        seq.sort()
        for i, (si, ci) in enumerate(seq):
            for j, (sj, cj) in enumerate(seq):
                if i != j and abs(si - sj) <= 2:
                    ref[(ci, cj)] = ref.get((ci, cj), 0) + 1
    assert pairs == ref


def test_negative_samples_deterministic_draws(spark):
    from sigraph_spark.operators.walks import negative_samples

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "b")]
    df = spark.createDataFrame(pairs, "center string, context string")
    got = sorted(
        (r["center"], r["context"], r["slot"], r["negative"])
        for r in negative_samples(df, k=3).collect()
    )
    vocab = sorted({n for p in pairs for n in p})
    ref = []
    for c, ctx in pairs:
        for s in range(1, 4):
            neg = vocab[_h32(f"{c}|{ctx}|{s}") % len(vocab)]
            if neg != ctx:
                ref.append((c, ctx, s, neg))
    assert got == sorted(ref)
    # draws are pseudorandom: not every negative is the same node
    assert len({n for _, _, _, n in got}) > 1


def test_negative_samples_partition_invariant(spark):
    from sigraph_spark.operators.walks import negative_samples

    pairs = [(f"n{i}", f"n{(i * 3 + 1) % 20}") for i in range(20)]
    d1 = spark.createDataFrame(pairs, "center string, context string").repartition(1)
    d5 = spark.createDataFrame(pairs, "center string, context string").repartition(5)
    k = lambda df: sorted(map(tuple, negative_samples(df, k=2).collect()))
    assert k(d1) == k(d5)
