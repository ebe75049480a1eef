"""Decontamination, cross-doc span duplication, keep-list selection, and
the curation funnel — python-reference parity on hand-built fixtures."""

from __future__ import annotations

from sigraph_spark.operators.contamination import decontaminate, dup_spans


def _shingles(text: str, k: int = 3) -> set[str]:
    words = text.lower().strip().split()
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "completely novel words nowhere else repeated ever again"),
    (3, "quick brown fox is a benchmark phrase fragment"),
    (4, "tiny"),
]
EVAL = [
    (100, "the quick brown fox jumps high"),
    (101, "benchmark phrase fragment appears here"),
]


def test_decontaminate_flags_overlapping_docs(spark):
    t = spark.createDataFrame(TRAIN, "doc_id long, text string")
    e = spark.createDataFrame(EVAL, "doc_id long, text string")
    got = {r["doc_id"]: r for r in decontaminate(t, e).collect()}

    egrams = set().union(*(_shingles(x) for _, x in EVAL))
    for doc_id, text in TRAIN:
        grams = _shingles(text)
        r = got[doc_id]
        assert r["total_ngrams"] == len(grams)
        assert r["overlap_ngrams"] == len(grams & egrams)
        assert r["contaminated"] == (len(grams & egrams) >= 1)
    assert got[1]["contaminated"] and got[3]["contaminated"]
    assert not got[2]["contaminated"] and not got[4]["contaminated"]


def test_decontaminate_min_overlap_threshold(spark):
    t = spark.createDataFrame(TRAIN, "doc_id long, text string")
    e = spark.createDataFrame(EVAL, "doc_id long, text string")
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(t, e, min_overlap=3).collect()
    }
    # doc 1 shares 3 shingles with eval 100; doc 3 shares only 2 with eval 101
    assert got[1] is True
    assert got[3] is False


def test_dup_spans_cross_doc_only(spark):
    docs = [
        (1, "alpha beta gamma delta"),          # shares 'alpha beta gamma' w/ 2
        (2, "alpha beta gamma epsilon"),
        (3, "zeta eta theta iota kappa"),       # fully unique
        (4, "alpha beta gamma delta"),          # exact dup of 1
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_spans(d).collect()}

    all_grams: dict[str, int] = {}
    for _, text in docs:
        for g in _shingles(text):
            all_grams[g] = all_grams.get(g, 0) + 1
    for doc_id, text in docs:
        grams = _shingles(text)
        shared = {g for g in grams if all_grams[g] > 1}
        r = got[doc_id]
        assert r["total_ngrams"] == len(grams)
        assert r["shared_ngrams"] == len(shared)
        assert abs(r["dup_span_ratio"] - len(shared) / len(grams)) < 1e-6
    assert got[3]["shared_ngrams"] == 0
    assert got[4]["dup_span_ratio"] == 1.0


def test_dedup_keeplist_clusters_and_singletons(spark):
    from sigraph_spark.operators.dedup import dedup_keeplist

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 9)], "doc_id long"
    )
    # chain 1-2-3 (transitive cluster), pair 4-5, singleton 9
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4)], "a long, b long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_keeplist(docs, pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (4, False),
        9: (9, True),
    }


def test_curation_funnel_rule_precedence(spark):
    from sigraph_spark.operators.corpus import curation_funnel

    docs = spark.createDataFrame(
        [
            (1, "too short"),  # n_words < 10 -> too_short
            # German markers, >= 10 words -> wrong_lang
            (2, "der hund und die katze ist nicht ein freund mit dem vogel auf dem baum"),
            # English with 'the ... of ... is' markers and clean prose -> pass
            (3, "the cat sat on the mat and the dog sat on the rug for a while it was calm"),
            # repeated trigram loop, has 'the' so lang=en, quality fine -> repetitive
            (4, "the fox ran the fox ran the fox ran the fox ran the fox ran"),
            # >= 10 words but zero stopwords anywhere -> und -> wrong_lang
            (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["verdict"] for r in curation_funnel(docs).collect()}
    assert got == {
        1: "too_short",
        2: "wrong_lang",
        3: "pass",
        4: "repetitive",
        5: "wrong_lang",
    }


def test_curation_funnel_signal_columns(spark):
    from sigraph_spark.operators.corpus import curation_funnel

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog sat on the rug")],
        "doc_id long, text string",
    )
    r = curation_funnel(docs).collect()[0]
    assert r["n_words"] == 13
    assert r["lang_pred"] == "en"
    assert 0.0 <= r["quality_score"] <= 1.0
    assert r["dup_ngram_ratio"] >= 0.0


def test_remove_dup_spans_keeps_first_occurrence(spark):
    from sigraph_spark.operators.contamination import remove_dup_spans

    # spans of 3 words for a readable fixture
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # spans: "a b c", "d e f"
            (2, "a b c x y z"),        # "a b c" duplicated from doc 1
            (3, "a b c d e f"),        # fully duplicated -> empty rewrite
            (4, "p q"),                # short doc: single partial span
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["kept_spans"])
        for r in remove_dup_spans(docs, span_words=3).collect()
    }
    assert got[1] == ("a b c d e f", 2, 2)
    assert got[2] == ("x y z", 2, 1)      # duplicated leading span removed
    assert got[3] == ("", 2, 0)           # everything seen before
    assert got[4] == ("p q", 1, 1)


def test_remove_dup_spans_order_preserved(spark):
    from sigraph_spark.operators.contamination import remove_dup_spans

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(25)))], "doc_id long, text string"
    )
    r = remove_dup_spans(docs, span_words=10).collect()[0]
    # 25 words -> 3 spans (10 + 10 + 5), reassembled == original
    assert r["n_spans"] == 3 and r["kept_spans"] == 3
    assert r["clean_text"] == " ".join(f"w{i}" for i in range(25))
