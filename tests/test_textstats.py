"""Text analysis: token counts, quality, language ID, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.operators.textstats import (
    FINGERPRINT_P,
    bpe_token_count,
    fingerprint64,
    lang_id,
    quality_features,
    quality_score,
    text_profile,
    whitespace_token_count,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_token_counts(spark):
    d = _df(spark, ["hello world", "  a  b   c ", "", "one-two, three!"])
    out = d.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    by_id = {r["doc_id"]: (r["ws"], r["bpe"]) for r in out}
    assert by_id[0] == (2, 2)
    assert by_id[1][0] == 3
    assert by_id[2] == (0, 0)
    # "one-two, three!" -> one,-,two,",",three,! = 6 BPE-ish tokens
    assert by_id[3][1] == 6


def test_lang_id(spark):
    d = _df(spark, [
        "the cat and the dog sat in that house, it was for sale",
        "der hund und die katze, das ist nicht ein problem mit zu",
        "le chat et la maison dans les champs, c'est un une que des",
        "el perro de la casa, que los gatos por con para las cosas",
        "xyzzy qwerty plugh",
    ])
    out = {r["doc_id"]: r["lang"] for r in d.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_fingerprint_matches_python(spark):
    texts = ["hello world", "", "a", "the quick brown fox"]
    d = _df(spark, texts)
    out = {r["doc_id"]: r["fp"] for r in d.select("doc_id", fingerprint64(F.col("text")).alias("fp")).collect()}

    def py_fp(s: str) -> int:
        acc = 7
        for ch in s[:4096]:
            acc = (acc * 31 + ord(ch)) % FINGERPRINT_P
        return acc

    for i, t in enumerate(texts):
        assert out[i] == py_fp(t), t


def test_quality_score_ranges(spark):
    d = _df(spark, [
        "The quick brown fox jumps over the lazy dog and it was for sale in that town.",
        "!!! ??? ... ,,, ;;;",
        "x",
    ])
    out = d.select("doc_id", *quality_features(F.col("text"))).select(
        "doc_id", quality_score()
    ).collect()
    scores = {r["doc_id"]: r["quality_score"] for r in out}
    assert 0.0 <= scores[0] <= 1.0 and scores[0] > 0.5
    assert scores[1] == 0.0  # no words in range
    assert scores[2] == 0.0  # too short


def test_text_profile_shape(spark):
    d = _df(spark, ["the cat sat on the mat"])
    row = text_profile(d).collect()[0]
    assert row["ws_tokens"] == 6
    assert row["lang_pred"] == "en"
    assert row["fingerprint"] > 0
