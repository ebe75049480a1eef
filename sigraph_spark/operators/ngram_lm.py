"""N-gram language-model quality scoring (round 5) — the CCNet device.

The canonical learned quality filter for web corpora (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets", LREC 2020)
scores documents with an n-gram LM trained on a reference corpus and
drops the worst tail. This module is that filter as DataFrames:

* :func:`train_ngram_lm` — order-1..3 counts over a reference corpus:
  ``(order, context, word, cnt)`` (context = space-joined preceding
  words, '' for unigrams) plus the total token count. Pure
  groupBy-count with map-side combine; the tables are the stored
  model.
* :func:`score_docs` — per document, STUPID BACKOFF scoring (Brants
  et al., EMNLP 2007 — the web-scale smoothing that needs no
  normalization): per token, use the trigram ratio if the trigram was
  seen, else ``alpha x`` the bigram ratio, else ``alpha^2 x`` the
  unigram ratio, else an ``alpha^2 / total`` OOV floor. Emits the sum
  of natural-log scores rounded at a coarse 4dp boundary (so
  cross-engine float-sum association cannot straddle it) PLUS exact
  integer evidence —
  how many tokens resolved at each order — so the backoff SELECTION
  logic is integer-pinned even where ln is float.

Scale shape: training is two shuffles (one per context length) with
map-side partial counts; scoring explodes tokens once, derives both
contexts with lag windows over (doc_id, position) and joins the count
tables on their n-gram keys. The unigram table is vocabulary-sized
and BROADCAST; bigram/trigram joins shuffle on keys whose Zipf head
is the stop-word mass — exactly the hot-key profile
``skew.choose_salting`` soaks elsewhere, noted in the plan docstring
rather than silently absorbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_ngram_lm", "score_docs"]


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+"),
        lambda t: t != "",
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "word"),
    )


def train_ngram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """-> ``{"counts": DataFrame(order, context, word, cnt),
    "total": int}``. Contexts do not cross document boundaries."""
    t = _tokens(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    # ctx feeds the three n-gram order branches; without a boundary
    # each branch re-tokenizes the corpus and re-runs the lag window.
    # localCheckpoint storage is disk-backed, so the token-level
    # materialization spills rather than pinning memory.
    ctx = t.select(
        "word",
        F.lag("word", 1).over(w).alias("_p1"),
        F.lag("word", 2).over(w).alias("_p2"),
    ).localCheckpoint(eager=False)
    uni = ctx.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit(1).alias("order"), F.lit("").alias("context"), "word", "cnt")
    bi = (
        ctx.filter(F.col("_p1").isNotNull())
        .groupBy(F.col("_p1").alias("context"), "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(2).alias("order"), "context", "word", "cnt")
    )
    tri = (
        ctx.filter(F.col("_p2").isNotNull())
        .groupBy(
            F.concat_ws(" ", "_p2", "_p1").alias("context"), "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(3).alias("order"), "context", "word", "cnt")
    )
    # the model's counts table feeds FIVE filtered views at scoring
    # time (uni/bi/tri plus the two renamed denominator tables); the
    # vocabulary-sized materialization runs the count branches once —
    # the in-session analog of persisting the trained model, which is
    # how a deployment would ship it anyway
    counts = uni.unionByName(bi).unionByName(tri).localCheckpoint(
        eager=False
    )
    total = t.count()
    return {"counts": counts, "total": total}


def score_docs(
    docs: DataFrame,
    model: dict,
    alpha_num: int = 2,
    alpha_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> ``(doc_id, n_tokens, n_tri, n_bi, n_uni, n_oov,
    logprob)`` with ``logprob`` = sum of ln(token score) rounded 4dp
    (coarse enough that cross-engine float-sum association can never
    straddle a rounding boundary)
    and the n_* columns exact integer backoff evidence. ``alpha`` is
    the rational ``alpha_num/alpha_den`` (default 0.4 per Brants et
    al.) so the score expression is restatable digit-for-digit."""
    counts = model["counts"]
    total = int(model["total"])
    alpha = f"({alpha_num}.0 / {alpha_den}.0)"

    t = _tokens(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    ctx = t.select(
        "doc_id", "pos", "word",
        F.lag("word", 1).over(w).alias("_p1"),
        F.lag("word", 2).over(w).alias("_p2"),
    )

    uni = counts.filter(F.col("order") == 1).select(
        F.col("word").alias("u_w"), F.col("cnt").alias("u_cnt"))
    bi = counts.filter(F.col("order") == 2).select(
        F.col("context").alias("b_ctx"), F.col("word").alias("b_w"),
        F.col("cnt").alias("b_cnt"))
    tri = counts.filter(F.col("order") == 3).select(
        F.col("context").alias("t_ctx"), F.col("word").alias("t_w"),
        F.col("cnt").alias("t_cnt"))
    # denominators: bigram-context totals ARE unigram counts of the
    # context word; trigram-context totals are bigram counts — join the
    # same tables renamed
    uni_d = uni.select(F.col("u_w").alias("d1_w"),
                       F.col("u_cnt").alias("d1_cnt"))
    bi_d = bi.select(F.concat_ws(" ", "b_ctx", "b_w").alias("d2_key"),
                     F.col("b_cnt").alias("d2_cnt"))

    j = (
        ctx
        .join(F.broadcast(uni), ctx.word == F.col("u_w"), "left")
        .join(bi, (F.col("_p1") == F.col("b_ctx"))
              & (ctx.word == F.col("b_w")), "left")
        .join(tri, (F.concat_ws(" ", "_p2", "_p1") == F.col("t_ctx"))
              & (ctx.word == F.col("t_w")), "left")
        .join(F.broadcast(uni_d), F.col("_p1") == F.col("d1_w"), "left")
        .join(bi_d, F.concat_ws(" ", "_p2", "_p1") == F.col("d2_key"),
              "left")
    )
    score = (
        F.when(F.col("t_cnt").isNotNull(),
               F.expr("CAST(t_cnt AS DOUBLE) / d2_cnt"))
        .when(F.col("b_cnt").isNotNull(),
              F.expr(f"{alpha} * (CAST(b_cnt AS DOUBLE) / d1_cnt)"))
        .when(F.col("u_cnt").isNotNull(),
              F.expr(f"{alpha} * {alpha} "
                     f"* (CAST(u_cnt AS DOUBLE) / {total}.0)"))
        .otherwise(F.expr(f"{alpha} * {alpha} / {total}.0"))
    )
    order_used = (
        F.when(F.col("t_cnt").isNotNull(), 3)
        .when(F.col("b_cnt").isNotNull(), 2)
        .when(F.col("u_cnt").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        j.select("doc_id", F.log(score).alias("_ln"),
                 order_used.alias("_o"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum((F.col("_o") == 3).cast("long")).alias("n_tri"),
            F.sum((F.col("_o") == 2).cast("long")).alias("n_bi"),
            F.sum((F.col("_o") == 1).cast("long")).alias("n_uni"),
            F.sum((F.col("_o") == 0).cast("long")).alias("n_oov"),
            F.round(F.sum("_ln"), 4).alias("logprob"),
        )
    )
