"""Rule-based pronoun coreference (round 5).

The deterministic slice of coreference a web-scale KG extractor can run
on every page: resolve third-person pronouns to the NEAREST PRECEDING
capitalized entity mention within a bounded sentence window (the
classic recency baseline — Hobbs' "naive" step; cf. Lappin & Leass'
salience decay). Feeding resolved subjects into triple extraction is
how pipelines like NELL / Knowledge Vault recover the many facts whose
subject is pronominal.

Contract (all frozen literals shared with the DuckDB oracle):

- tokens: whitespace split of each sentence, punctuation stripped for
  classification (``[^A-Za-z0-9]``);
- entity mention: a maximal SAME-SENTENCE run of tokens matching
  ``^[A-Z][a-z0-9]+$`` whose lowercase form is not a pronoun
  (gaps-and-islands grouping — ``pos - row_number`` per sentence);
- pronoun: lowercase cleaned token in ``PRONOUNS``;
- antecedent: the mention maximal by ``(sentence_id, start_pos)``
  strictly before the pronoun with ``pronoun_sid - mention_sid <=
  window_sents``; unresolved pronouns surface with NULL antecedent.

Scale shape: the antecedent search is a BANDED equi-join — the pronoun
side explodes its ``window_sents + 1`` candidate sentence ids, so the
join key is ``(doc_id, sentence_id)`` and no range predicate ever
reaches the shuffle (the same banding device as the linking/dedup
operators). Window arithmetic is integer-only; the only strings hashed
are tokens. Zero UDFs, zero collects. Reference parity:
hongsam14/sigraph has no NLP coreference surface — this extends the
webtext extraction family SURVEY §2 adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pronoun_coref", "coref_oracle_sql", "PRONOUNS"]

# Frozen contract literal (the oracle embeds the same list).
PRONOUNS = ("he", "she", "it", "they", "him", "her", "them",
            "his", "its", "their")


def pronoun_coref(
    docs: DataFrame,
    window_sents: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> ``(doc_id, sentence_id, pronoun_pos, pronoun, antecedent,
    antecedent_sid, antecedent_pos)`` — one row per pronoun token,
    NULL antecedent columns when nothing resolves in the window."""
    from .corpus import split_sentences

    sents = split_sentences(docs, text_col=text_col, id_col=id_col)
    if id_col != "doc_id":
        sents = sents.withColumnRenamed(id_col, "doc_id")
    toks = (
        sents.select(
            "doc_id",
            F.col("sentence_id").alias("sid"),
            F.posexplode(F.split(F.col("sentence"), r"\s+"))
            .alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn(
            "clean", F.regexp_replace(F.col("tok"), r"[^A-Za-z0-9]", "")
        )
        # two consumers (mentions, pronouns) — materialize the token
        # explode + per-token regex once instead of per consumer
        .localCheckpoint(eager=False)
    )
    is_pron = F.lower(F.col("clean")).isin(*PRONOUNS)
    is_ent = F.col("clean").rlike(r"^[A-Z][a-z0-9]+$") & ~is_pron

    ent_win = Window.partitionBy("doc_id", "sid").orderBy("pos")
    mentions = (
        toks.filter(is_ent)
        .withColumn("grp", F.col("pos") - F.row_number().over(ent_win))
        .groupBy("doc_id", "sid", "grp")
        .agg(
            F.min("pos").alias("start_pos"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "clean"))
                    ),
                    lambda s: s["clean"],
                ),
                " ",
            ).alias("mention"),
        )
        .select(
            F.col("doc_id").alias("mdoc"), F.col("sid").alias("msid"),
            "start_pos", "mention",
        )
    )

    prons = toks.filter(is_pron).select(
        "doc_id", "sid", "pos", F.lower(F.col("clean")).alias("pronoun")
    )
    banded = prons.select(
        "doc_id", "sid", "pos", "pronoun",
        F.explode(
            F.sequence(
                F.greatest(F.col("sid") - window_sents, F.lit(1)),
                F.col("sid"),
            )
        ).alias("band_sid"),
    )
    joined = banded.join(
        mentions,
        (F.col("doc_id") == F.col("mdoc"))
        & (F.col("band_sid") == F.col("msid"))
        & (
            (F.col("msid") < F.col("sid"))
            | (
                (F.col("msid") == F.col("sid"))
                & (F.col("start_pos") < F.col("pos"))
            )
        ),
        "left",
    )
    # most-recent antecedent via algebraic max-struct: NULL fields sort
    # lowest in struct comparisons, so max over (msid, start_pos) is
    # exactly "msid desc nulls last, start_pos desc nulls last, pick
    # one"; mentions are unique per (msid, start_pos) within a pronoun
    # group, so the trailing mention field cannot influence the max.
    # Partial-aggregates map-side — no ranking window, no sort.
    return (
        joined.groupBy("doc_id", "sid", "pos", "pronoun")
        .agg(F.max(F.struct("msid", "start_pos", "mention")).alias("_m"))
        .select(
            "doc_id",
            F.col("sid").cast("int").alias("sentence_id"),
            F.col("pos").cast("int").alias("pronoun_pos"),
            "pronoun",
            F.col("_m.mention").alias("antecedent"),
            F.col("_m.msid").cast("int").alias("antecedent_sid"),
            F.col("_m.start_pos").cast("int").alias("antecedent_pos"),
        )
    )


def coref_oracle_sql(docs_table: str = "documents",
                     window_sents: int = 2) -> str:
    """Full DuckDB statement mirroring ``pronoun_coref`` run over
    12-word-chunk sentences derived from ``docs_table`` with the gate's
    deterministic capitalization/pronoun seeding (see ``q_coref``)."""
    pron_list = ", ".join(f"'{p}'" for p in PRONOUNS)
    pron_arr = "[" + ", ".join(f"'{p}'" for p in
                               ("he", "she", "it", "they")) + "]"
    return rf"""
        WITH co_base AS (
          SELECT doc_id,
                 list_filter(string_split_regex(
                     lower(trim(coalesce(text, ''))), '\s+'),
                     x -> x <> '') AS ws
          FROM {docs_table}),
        co_tok0 AS (
          SELECT doc_id, CAST(i AS INT) AS i1, ws[CAST(i AS INT)] AS w
          FROM co_base, UNNEST(range(1, len(ws) + 1)) AS t(i)),
        co_tok AS (
          SELECT doc_id,
                 CAST(((i1 - 1) // 12) + 1 AS INT) AS sid,
                 CAST((i1 - 1) % 12 AS INT) AS pos,
                 CASE WHEN (i1 - 1) % 11 = 5
                        THEN {pron_arr}[((i1 - 1) % 4) + 1]
                      WHEN (i1 - 1) % 7 <= 1
                        THEN upper(substr(w, 1, 1)) || substr(w, 2)
                      ELSE w END AS clean
          FROM co_tok0),
        co_ent AS (
          SELECT doc_id, sid, pos, clean,
                 pos - row_number() OVER (
                   PARTITION BY doc_id, sid ORDER BY pos) AS grp
          FROM co_tok
          WHERE regexp_matches(clean, '^[A-Z][a-z0-9]+$')
            AND lower(clean) NOT IN ({pron_list})),
        co_m AS (
          SELECT doc_id AS mdoc, sid AS msid, CAST(grp AS INT) AS grp,
                 CAST(min(pos) AS INT) AS start_pos,
                 string_agg(clean, ' ' ORDER BY pos) AS mention
          FROM co_ent GROUP BY 1, 2, 3),
        co_p AS (
          SELECT doc_id, sid, pos, lower(clean) AS pronoun
          FROM co_tok WHERE lower(clean) IN ({pron_list})),
        co_band AS (
          SELECT p.*, CAST(b AS INT) AS band_sid
          FROM co_p p,
               UNNEST(range(greatest(p.sid - {window_sents}, 1),
                            p.sid + 1)) AS t(b)),
        co_j AS (
          SELECT b.doc_id, b.sid, b.pos, b.pronoun,
                 m.msid, m.start_pos, m.mention,
                 row_number() OVER (
                   PARTITION BY b.doc_id, b.sid, b.pos
                   ORDER BY m.msid DESC NULLS LAST,
                            m.start_pos DESC NULLS LAST) AS rn
          FROM co_band b LEFT JOIN co_m m
            ON m.mdoc = b.doc_id AND m.msid = b.band_sid
           AND (m.msid < b.sid
                OR (m.msid = b.sid AND m.start_pos < b.pos)))
        SELECT doc_id, CAST(sid AS INT) AS sentence_id,
               CAST(pos AS INT) AS pronoun_pos, pronoun,
               mention AS antecedent,
               CAST(msid AS INT) AS antecedent_sid,
               CAST(start_pos AS INT) AS antecedent_pos
        FROM co_j WHERE rn = 1
    """
