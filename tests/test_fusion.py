"""KG fusion & ontology induction (operators/fusion.py)."""

from conftest import spark  # noqa: F401

from sigraph_spark.operators.fusion import (
    entity_type_signature,
    functional_violations,
    fuse_triples,
    predicate_cardinality,
)

TRIPLES = "actor string, verb string, object string"


def test_predicate_cardinality_flags_functional(spark):
    rows = [
        # 'born_in' is functional here: every subject one object
        ("a", "born_in", "x"), ("b", "born_in", "y"), ("a", "born_in", "x"),
        # 'visited' is not: subject a has two objects
        ("a", "visited", "x"), ("a", "visited", "y"), ("b", "visited", "z"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = {r["predicate"]: r for r in predicate_cardinality(t).collect()}
    assert out["born_in"]["is_functional"] is True
    assert out["born_in"]["n_subjects"] == 2
    assert out["born_in"]["n_so_pairs"] == 2
    assert out["visited"]["is_functional"] is False
    assert out["visited"]["n_so_pairs"] == 3
    assert out["visited"]["n_objects"] == 3


def test_functional_violations_declared(spark):
    rows = [
        ("a", "born_in", "x"), ("a", "born_in", "y"), ("b", "born_in", "z"),
        ("a", "visited", "x"), ("a", "visited", "y"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = functional_violations(t, functional_preds=["born_in"]).collect()
    assert len(out) == 1
    assert out[0]["subject"] == "a"
    assert out[0]["n_objects"] == 2
    assert out[0]["objects"] == "x|y"


def test_functional_violations_induced_90pct(spark):
    # 10 subjects use 'id_of'; exactly one breaks it -> 9/10 >= 90% induced
    rows = [(f"s{i}", "id_of", f"v{i}") for i in range(10)]
    rows.append(("s0", "id_of", "other"))
    # 'tags' is 50% multi-valued -> NOT induced as functional
    rows += [("s0", "tags", "t1"), ("s0", "tags", "t2"), ("s1", "tags", "t3")]
    t = spark.createDataFrame(rows, TRIPLES)
    out = functional_violations(t).collect()
    assert {(r["subject"], r["predicate"]) for r in out} == {("s0", "id_of")}


def test_functional_violations_caps_object_sample(spark):
    rows = [("s", "p", f"o{i:03d}") for i in range(30)]
    t = spark.createDataFrame(rows, TRIPLES)
    out = functional_violations(t, functional_preds=["p"], max_objects=5).collect()
    assert out[0]["n_objects"] == 30
    assert out[0]["objects"] == "o000|o001|o002|o003|o004"


def test_entity_type_signature_modal_tiebreak(spark):
    rows = [
        ("e", "alpha", "o1"), ("e", "alpha", "o2"),
        ("e", "beta", "o3"), ("e", "beta", "o4"),  # tie 2-2 -> 'alpha'
        ("f", "gamma", "o5"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = {r["entity"]: r for r in entity_type_signature(t).collect()}
    assert out["e"]["type_pred"] == "alpha"
    assert out["e"]["n_claims"] == 4
    assert out["e"]["n_predicates"] == 2
    assert out["f"]["type_pred"] == "gamma"


def test_entity_summary_rarity_rank_and_ties(spark):
    from sigraph_spark.operators.fusion import entity_summary

    rows = [
        # (p,common) shared by 3 subjects; (p,rare) by 1; (q,mid) by 2
        ("a", "p", "common"), ("b", "p", "common"), ("c", "p", "common"),
        ("a", "p", "rare"),
        ("a", "q", "mid"), ("b", "q", "mid"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = {(r["subject"], r["rank"]): (r["predicate"], r["object"], r["fact_subjects"])
           for r in entity_summary(t, top_k=2).collect()}
    assert out[("a", 1)] == ("p", "rare", 1)
    assert out[("a", 2)] == ("q", "mid", 2)
    assert out[("b", 1)] == ("q", "mid", 2)
    assert out[("b", 2)] == ("p", "common", 3)
    assert out[("c", 1)] == ("p", "common", 3)
    assert ("c", 2) not in out


def test_entity_cooccurrence_counts_and_threshold(spark):
    from sigraph_spark.operators.fusion import entity_cooccurrence

    rows = [
        ("d1", "x", "y"), ("d2", "x", "y"),          # x,y co-occur twice
        ("d3", "x", "z"),                              # x,z once -> filtered
        ("d1", "y", "x"),                              # same doc, no double count
    ]
    t = spark.createDataFrame(rows, "url string, actor string, object string")
    out = entity_cooccurrence(t, min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["co_count"]) == ("x", "y", 2)
    assert r["df_a"] == 3 and r["df_b"] == 2


def test_predicate_schema_joins_cardinality_and_range(spark):
    from sigraph_spark.operators.fusion import predicate_schema

    rows = [
        ("a", "fetch", "http://x.example/1"),
        ("a", "fetch", "http://x.example/2"),  # a has 2 objects -> non-functional
        ("b", "fetch", "http://y.example/1"),
        ("a", "born_in", "paris france"),
        ("b", "born_in", "lyon france"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = {r["predicate"]: r for r in predicate_schema(t).collect()}
    f = out["fetch"]
    assert (f["n_subjects"], f["n_so_pairs"], f["is_functional"]) == (2, 3, False)
    assert f["range_type"] == "url"
    b = out["born_in"]
    assert (b["is_functional"], b["range_type"]) == (True, "untyped")


def test_fuse_triples_weighted_revote_overrides_majority(spark):
    # (s,p): objects x (sources A,B) vs y (sources C,D) tie 2-2 ->
    # round-0 winner x (lexicographic). A and B also agree with winners
    # elsewhere, so round 1 keeps x with a strictly larger weight.
    rows = [
        ("s", "p", "x", "A"), ("s", "p", "x", "B"),
        ("s", "p", "y", "C"), ("s", "p", "y", "D"),
        ("t", "q", "z", "A"), ("t", "q", "z", "B"),
    ]
    c = spark.createDataFrame(rows, TRIPLES + ", source string")
    out = {(r["subject"], r["predicate"]): r for r in fuse_triples(c).collect()}
    fused = out[("s", "p")]
    assert fused["fused_object"] == "x"
    assert fused["votes"] == 2
    assert fused["n_objects"] == 2
    # A,B each score 2 (agree on both winners); C,D score 0 -> weight 4
    assert fused["weight"] == 4
    assert out[("t", "q")]["fused_object"] == "z"
    assert out[("t", "q")]["n_objects"] == 1


def test_fuse_triples_reliable_minority_wins_round_two(spark):
    # Majority of one-off sources say 'bad'; two sources consistent with
    # winners elsewhere say 'good'. Round 0 picks 'bad' (3 votes vs 2)
    # but round 1 weights flip it: good = score(A)+score(B), where A,B
    # earn credit from 4 uncontested facts each.
    rows = [("s", "p", "good", "A"), ("s", "p", "good", "B")]
    rows += [("s", "p", "bad", src) for src in ("C", "D", "E")]
    for i in range(4):
        rows += [(f"u{i}", "q", f"v{i}", "A"), (f"u{i}", "q", f"v{i}", "B")]
    c = spark.createDataFrame(rows, TRIPLES + ", source string")
    out = {(r["subject"], r["predicate"]): r for r in fuse_triples(c).collect()}
    fused = out[("s", "p")]
    # A,B score 4 each (uncontested facts; their 'good' lost round 0);
    # C,D,E score 1 each -> good weight 8 > bad weight 3.
    assert fused["fused_object"] == "good"
    assert fused["weight"] == 8
    assert fused["votes"] == 2


def test_fuse_triples_passthrough_keeps_multivalued_and_scores(spark):
    from pyspark.sql import functions as F

    # Multi-valued 'said' claims (source Q) must ALL survive, and their
    # fake "conflicts" must not depress source scores: A's score comes
    # only from the arbitrated facts.
    rows = [
        ("alice", "said", "quote one", "Q"),
        ("alice", "said", "quote two", "Q"),
        ("alice", "said", "quote two", "R"),   # second source, same quote
        ("srv", "os", "linux", "A"), ("srv", "os", "linux", "Q"),
    ]
    c = spark.createDataFrame(rows, TRIPLES + ", source string")
    out = fuse_triples(
        c, "actor", "verb", "object",
        passthrough=F.col("predicate") == "said",
    ).collect()
    by_key = {(r["subject"], r["predicate"], r["fused_object"]): r for r in out}
    # both quotes present — no arbitration dropped the second
    assert ("alice", "said", "quote one") in by_key
    assert ("alice", "said", "quote two") in by_key
    q2 = by_key[("alice", "said", "quote two")]
    assert q2["votes"] == 2 and q2["n_objects"] == 2
    # weight = summed source scores from the ARBITRATED branch only:
    # Q and R each score 1 iff they agree with an arbitrated winner
    # (Q agrees on srv/os; R has no arbitrated claims -> 0)
    assert q2["weight"] == 1
    assert by_key[("alice", "said", "quote one")]["weight"] == 1
    # arbitrated branch unchanged
    assert by_key[("srv", "os", "linux")]["votes"] == 2
    # without passthrough the old (lossy) behavior persists: one winner
    lossy = fuse_triples(c, "actor", "verb", "object").collect()
    said = [r for r in lossy if r["predicate"] == "said"]
    assert len(said) == 1 and said[0]["fused_object"] == "quote two"


def test_inverse_predicates_detects_inverse_and_symmetric(spark):
    from sigraph_spark.operators.fusion import inverse_predicates

    rows = [
        # parent_of / child_of are exact inverses (2 mirrored pairs)
        ("a", "parent_of", "b"), ("b", "child_of", "a"),
        ("c", "parent_of", "d"), ("d", "child_of", "c"),
        # peer_with is symmetric
        ("x", "peer_with", "y"), ("y", "peer_with", "x"),
        # unrelated has no mirror
        ("a", "owns", "z"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = {(r["p1"], r["p2"]): (r["n_mirrored"], r["n_p1"], r["n_p2"])
           for r in inverse_predicates(t, min_overlap_pct=50).collect()}
    assert out[("child_of", "parent_of")] == (2, 2, 2)
    assert out[("peer_with", "peer_with")] == (2, 2, 2)
    assert not any("owns" in k for k in out)


def test_inverse_predicates_threshold_boundary(spark):
    from sigraph_spark.operators.fusion import inverse_predicates

    # 1 mirrored of p:2, q:2 -> jaccard 1/3; pct 33 passes (100 >= 99),
    # pct 34 fails
    rows = [
        ("a", "p", "b"), ("b", "q", "a"),
        ("c", "p", "d"), ("e", "q", "f"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    got33 = inverse_predicates(t, min_overlap_pct=33).count()
    got34 = inverse_predicates(t, min_overlap_pct=34).count()
    assert (got33, got34) == (1, 0)


def test_predicate_subsumption_direction_and_exclusions(spark):
    from sigraph_spark.operators.fusion import predicate_subsumption

    rows = [
        # http_get's 2 pairs are both also network_request facts (which
        # has a third) -> http_get ⊑ network_request
        ("a", "http_get", "u1"), ("a", "network_request", "u1"),
        ("b", "http_get", "u2"), ("b", "network_request", "u2"),
        ("c", "network_request", "u3"),
        # equal-size mutual containment (synonyms) excluded
        ("d", "syn1", "v"), ("d", "syn2", "v"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = {(r["narrow"], r["broad"]): (r["n_shared"], r["n_narrow"], r["n_broad"])
           for r in predicate_subsumption(t).collect()}
    assert out == {("http_get", "network_request"): (2, 2, 3)}


def test_predicate_subsumption_threshold(spark):
    from sigraph_spark.operators.fusion import predicate_subsumption

    # 9 of narrow's 10 pairs shared -> 90% passes at pct=90, not at 91
    rows = []
    for i in range(10):
        rows.append((f"s{i}", "narrow", f"o{i}"))
        if i < 9:
            rows.append((f"s{i}", "broad", f"o{i}"))
    rows += [(f"x{i}", "broad", f"y{i}") for i in range(5)]
    t = spark.createDataFrame(rows, TRIPLES)
    assert predicate_subsumption(t, min_containment_pct=90).count() == 1
    assert predicate_subsumption(t, min_containment_pct=91).count() == 0


def test_merge_claims_semilattice_and_fuse_parity(spark):
    from sigraph_spark.operators.fusion import fuse_triples, merge_claims

    schema = "subject string, predicate string, object string, source string"
    full_rows = [
        ("s", "p", "x", "A"), ("s", "p", "x", "B"), ("s", "p", "y", "C"),
        ("t", "q", "z", "A"),
    ]
    full = spark.createDataFrame(full_rows, schema)
    # overlapping deltas: the shared row must not double-vote
    d1 = spark.createDataFrame(full_rows[:3], schema)
    d2 = spark.createDataFrame(full_rows[2:], schema)
    merged = merge_claims(merge_claims(None, d1), d2)
    assert merged.count() == 4
    # replay is a no-op
    assert merge_claims(merged, d2).count() == 4
    # commutes
    other = merge_claims(merge_claims(None, d2), d1)
    assert merged.exceptAll(other).count() == 0
    # fuse over merged state == fuse from scratch
    a = fuse_triples(merged, "subject", "predicate", "object", "source")
    b = fuse_triples(full, "subject", "predicate", "object", "source")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_edge_provenance_counts_sample_and_timestamps(spark):
    import datetime

    from sigraph_spark.operators.fusion import edge_provenance

    ts = lambda d: datetime.datetime(2026, 1, d)  # noqa: E731
    rows = [
        ("s", "p", "o", "d2", ts(2)),
        ("s", "p", "o", "d1", ts(1)),
        ("s", "p", "o", "d1", ts(3)),  # same doc mentioned twice
        ("s", "p", "o", "d4", ts(4)),
        ("s", "p", "o", "d3", ts(5)),
        ("t", "q", "u", "d9", ts(9)),
    ]
    t = spark.createDataFrame(
        rows, "subj string, verb string, obj string, url string, warc_ts timestamp"
    )
    out = {(r["subject"], r["predicate"], r["object"]): r
           for r in edge_provenance(t, ts_col="warc_ts", max_samples=3).collect()}
    e = out[("s", "p", "o")]
    assert e["n_mentions"] == 5 and e["n_docs"] == 4
    # first 3 distinct docs in doc order, never more than max_samples
    assert e["sample_docs"] == "d1|d2|d3"
    assert (e["first_seen"], e["last_seen"]) == (ts(1), ts(5))
    assert out[("t", "q", "u")]["sample_docs"] == "d9"


def test_edge_provenance_plan_has_window_group_limit(spark):
    from sigraph_spark.operators.fusion import edge_provenance

    t = spark.createDataFrame(
        [("s", "p", "o", "d1")], "subj string, verb string, obj string, url string"
    )
    plan = edge_provenance(t)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_apply_fusion_drops_losing_objects_only(spark):
    from sigraph_spark.operators.fusion import apply_fusion

    edges = spark.createDataFrame(
        [
            ("s", "p", "good", 3), ("s", "p", "bad", 1),  # contested
            ("t", "q", "z", 2),                             # uncontested, fused
            ("u", "r", "w", 5),                             # not in fused at all
        ],
        "subj string, predicate string, obj string, weight int",
    )
    fused = spark.createDataFrame(
        [("s", "p", "good"), ("t", "q", "z")],
        "subject string, predicate string, fused_object string",
    )
    out = apply_fusion(edges, fused, broadcast_winners=True)
    got = {(r["subj"], r["predicate"], r["obj"], r["weight"])
           for r in out.collect()}
    assert got == {("s", "p", "good", 3), ("t", "q", "z", 2), ("u", "r", "w", 5)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # default: no forced hint — winners scale with the KG, AQE decides
    noforce = apply_fusion(edges, fused)
    assert {(r["subj"], r["obj"]) for r in noforce.collect()} == {
        ("s", "good"), ("t", "z"), ("u", "w")}


def test_range_violations_consensus_gate(spark):
    from sigraph_spark.operators.literals import range_violations

    rows = (
        # 'fetch': 4 of 5 objects are urls (80% -> constrained); the odd
        # winpath one violates
        [("d", "a", "fetch", f"http://x.example/{i}") for i in range(4)]
        + [("d", "a", "fetch", "C:\\tmp\\odd.dat")]
        # 'say': 50/50 split -> no constraint, no violations
        + [("d", "a", "say", "http://y.example/1"), ("d", "a", "say", "hello there")]
    )
    t = spark.createDataFrame(rows, "url string, actor string, verb string, object string")
    out = range_violations(t, min_share_pct=80).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["predicate"], r["expected_type"], r["actual_type"]) == (
        "fetch", "url", "winpath")
    assert r["n_mentions"] == 1
    # raising the consensus bar above 80% drops the constraint
    assert range_violations(t, min_share_pct=81).count() == 0


def test_fuse_triples_broadcasts_source_scores(spark):
    rows = [("s", "p", "x", "A"), ("s", "p", "y", "B")]
    c = spark.createDataFrame(rows, TRIPLES + ", source string")
    plan = fuse_triples(c)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_schema_graph_types_and_literal_leaves(spark):
    from sigraph_spark.operators.fusion import schema_graph

    rows = [
        # proc.exe's modal predicate: 'spawn' (2 vs 1) -> type 'spawn'
        ("proc.exe", "spawn", "child.exe"),
        ("proc.exe", "spawn", "other.exe"),
        ("proc.exe", "write", "c:\\f.txt"),
        # child.exe appears as subject once -> type 'connect'
        ("child.exe", "connect", "1.2.3.4"),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = {
        (r["subj_type"], r["predicate"], r["obj_type"]): (
            r["n_edges"], r["n_subjects"], r["n_objects"]
        )
        for r in schema_graph(t).collect()
    }
    # typed object: child.exe is itself typed 'connect'
    assert out[("spawn", "spawn", "connect")] == (1, 1, 1)
    # untyped objects fall to LITERAL leaves
    assert out[("spawn", "spawn", "LITERAL")] == (1, 1, 1)
    assert out[("spawn", "write", "LITERAL")] == (1, 1, 1)
    assert out[("connect", "connect", "LITERAL")] == (1, 1, 1)
    assert sum(v[0] for v in out.values()) == len(rows)


def test_fuse_triples_passthrough_routes_whole_group(spark):
    # ADVICE r4: a (subject, predicate) whose claims span both branches
    # (quote source flagged, sentence source not) must NOT emit both an
    # arbitrated winner row and passthrough rows — any marked claim
    # routes the whole group to passthrough
    from pyspark.sql import functions as F

    rows = [
        ("alice", "said", "quote one", "Q"),     # flagged (source Q)
        ("alice", "said", "hello", "S"),         # same (s,p), not flagged
        ("alice", "said", "hello", "T"),
        ("srv", "os", "linux", "S"), ("srv", "os", "bsd", "T"),
        ("srv", "os", "linux", "U"),
    ]
    c = spark.createDataFrame(rows, TRIPLES + ", source string")
    out = fuse_triples(
        c, "actor", "verb", "object",
        passthrough=F.col("source") == "Q",
    ).collect()
    said = [r for r in out if r["predicate"] == "said"]
    # whole group passed through: every distinct object survives, no
    # arbitrated duplicate of the group
    assert sorted(r["fused_object"] for r in said) == ["hello", "quote one"]
    # n_objects is computed over the WHOLE group in one branch
    assert all(r["n_objects"] == 2 for r in said)
    # arbitrated branch untouched; S and T score only from 'os'
    os_rows = [r for r in out if r["predicate"] == "os"]
    assert len(os_rows) == 1 and os_rows[0]["fused_object"] == "linux"
