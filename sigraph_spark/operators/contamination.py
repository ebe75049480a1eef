"""Train/eval decontamination and cross-document span duplication.

Two standard training-data-curation operators the reference's corpus does
not cover but any 100 TB pretraining pipeline needs:

* **decontaminate** — GPT-3/PaLM-style eval-set contamination check: a
  training document is contaminated when it shares any word n-gram with a
  benchmark/eval document. The eval side is tiny relative to the corpus,
  so its distinct n-gram set is broadcast; the corpus side is a narrow
  map (shingle explode) + broadcast semi-join — NO corpus shuffle at all.
  At 100 TB the only data movement is the scan itself.

* **dup_spans** — cross-document duplicated-span profile (Lee et al.,
  "Deduplicating Training Data Makes Language Models Better", re-expressed
  set-wise): for each doc, the fraction of its k-gram shingles that occur
  in at least one *other* document. Unlike ``repetition_score`` (within-doc
  duplication, zero shuffle) this is corpus-global: one hash-partitioned
  groupBy over shingles — a single uniform-key shuffle whose keys are
  32-bit shingle hashes, so it scales like exact dedup (no skew beyond
  natural boilerplate, which AQE skew-split handles).

Both use the same ``_word_shingles`` construction as the MinHash/Jaccard
family (``operators/dedup.py``), so "n-gram" means the same thing across
the whole dedup/contamination surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _word_shingles


def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag training docs sharing >= ``min_overlap`` distinct word
    ``k``-grams with any eval doc.

    Plan shape (the one that survives 100x): the eval n-gram set is
    deduplicated then **broadcast**; the train side explodes its distinct
    shingles (narrow) and INNER-joins the broadcast set, so only MATCHING
    grams — the rare case, by construction — ever reach the per-doc
    re-aggregation shuffle. ``total_ngrams`` comes from a narrow
    ``size()`` projection before the explode; the corpus text itself is
    never shuffled. (A left join + regroup would shuffle the full
    exploded corpus, ~30x the text volume, just to count mostly-misses.)

    Returns one row per train doc:
    ``(doc_id, total_ngrams, overlap_ngrams, contaminated)``.
    """
    eval_grams = evalset.select(
        F.explode(_word_shingles(F.col(text_col), k)).alias("gram")
    ).distinct()
    base = train.select(
        F.col(id_col),
        F.size(_word_shingles(F.col(text_col), k)).cast("long").alias("total_ngrams"),
    )
    matches = (
        train.select(
            F.col(id_col),
            F.explode(_word_shingles(F.col(text_col), k)).alias("gram"),
        )
        .join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("overlap_ngrams"))
    )
    return (
        base.join(matches, id_col, "left")
        .select(
            id_col,
            "total_ngrams",
            F.coalesce(F.col("overlap_ngrams"), F.lit(0)).cast("long").alias(
                "overlap_ngrams"
            ),
        )
        .withColumn("contaminated", F.col("overlap_ngrams") >= min_overlap)
    )


def remove_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
) -> DataFrame:
    """Span-level dedup REWRITE (the act-on-it companion to
    :func:`dup_spans`): cut each document into fixed ``span_words``-word
    windows, keep only the globally FIRST occurrence of each distinct
    span (ordered by ``(doc_id, position)``), and reassemble the
    surviving spans in order. The C4/Lee-et-al-style "remove duplicated
    text, keep one copy" operation, set-oriented:

      1. explode spans with their position (narrow);
      2. one window ``row_number`` partitioned BY SPAN TEXT ordered by
         (doc_id, pos) — a single uniform-key shuffle (span hash);
      3. re-group survivors by doc, sort by position, join with spaces.

    Returns ``(doc_id, clean_text, n_spans, kept_spans)``; a fully
    duplicated document (every span seen earlier) keeps an empty string.
    """
    words = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(span_words)).cast("int")
    # explode the integer chunk index, THEN slice with a Column start —
    # not transform(sequence, lambda): the indexed lambda drops out of
    # codegen (see dedup._word_grams)
    chunked = docs.select(
        F.col(id_col),
        words.alias("_w"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)
        ).alias("pos"),
    )
    spans = chunked.select(
        id_col,
        "pos",
        F.array_join(
            F.slice(F.col("_w"), F.col("pos") * span_words + 1, F.lit(span_words)),
            " ",
        ).alias("span"),
    )
    w = Window.partitionBy("span").orderBy(id_col, "pos")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    kept = ranked.filter(F.col("rn") == 1)
    # n_spans per doc IS the exploded chunk count, greatest(n_chunks, 1)
    # — a narrow projection of docs; aggregating the span table for it
    # re-derived the whole corpus-sized explode+slice a second time
    per_doc = docs.select(
        F.col(id_col),
        F.greatest(n_chunks, F.lit(1)).cast("long").alias("n_spans"),
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "span"))),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("kept_spans"),
        )
    )
    return (
        per_doc.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_spans",
            F.coalesce(F.col("kept_spans"), F.lit(0)).cast("long").alias("kept_spans"),
        )
    )


def dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-doc cross-corpus duplicated-span ratio.

    For each document: of its distinct word ``k``-grams, the fraction
    that appear in at least one other document. High values mean the doc
    is mostly boilerplate shared with the rest of the corpus — the signal
    used to strip duplicated spans (vs dropping whole near-dup docs).

    Two aggregations, one logical shuffle key each:
      1. ``groupBy(gram)`` → number of distinct docs containing it
         (uniform 32-ish-bit key space — scales like exact dedup),
         carrying the gram's doc list so the per-doc side regenerates
         from the GROUPED postings instead of a self-join — the text is
         shingled once and the gram string is never shuffled twice;
      2. ``groupBy(doc_id)`` over exploded ``(doc_id, shared)`` pairs —
         a shuffle of two small columns, not the gram text.

    Returns ``(doc_id, total_ngrams, shared_ngrams, dup_span_ratio)``
    with the ratio rounded to 6dp (same convention as repetition_score).
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(_word_shingles(F.col(text_col), k)).alias("gram"),
    )
    # shingles from _word_shingles are distinct within a doc already,
    # so collect_list per gram is the exact posting list and its size
    # the doc_count the old self-join recomputed
    postings = grams.groupBy("gram").agg(
        F.collect_list(F.col(id_col)).alias("_ids")
    )
    return (
        postings.select(
            F.explode("_ids").alias(id_col),
            (F.size("_ids") > 1).cast("long").alias("_shared"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.sum("_shared").cast("long").alias("shared_ngrams"),
        )
        .select(
            id_col,
            "total_ngrams",
            "shared_ngrams",
            F.round(
                F.col("shared_ngrams") / F.col("total_ngrams").cast("double"), 6
            ).alias("dup_span_ratio"),
        )
    )
