"""Unsupervised key-sentence / key-phrase mining (round 5).

Two classic extractors a training-data pipeline uses to build summaries,
retrieval keys, and weak labels at corpus scale:

- ``textrank_sentences`` — TextRank extractive summarization (Mihalcea &
  Tarau, EMNLP 2004): per document, a sentence graph weighted by shared
  word counts, scored by damped power iteration, top-k sentences kept.
- ``rake_keywords`` — RAKE (Rose et al., "Automatic Keyword Extraction
  from Individual Documents", 2010): candidate phrases split at
  stopwords/punctuation, scored by summed word degree/frequency ratios.

Exactness device (shared with ``pagerank.py``/``graphalgo.py``): all
scores are BIGINT fixed-point. TextRank iterates ``score*w DIV W`` in
integer micro-units so partial-aggregation order can't perturb a bit;
RAKE quantizes each ``deg(w)/freq(w)`` ratio to micro-units with one
integer division BEFORE the order-free integer sum. Both engines (Spark
and the DuckDB oracle) then agree hash-exactly.

Scale shape: everything is built-in Column algebra — zero UDFs, zero
collects. TextRank's per-document pair join is quadratic in sentences,
so documents are capped at ``max_sentences`` (documented truncation, the
standard guard for web pages with thousands of boilerplate sentences);
the join key is ``(doc_id, word)`` so hot words inside one document
never cross documents. RAKE is two narrow maps + one per-doc-word
aggregation. Reference parity: hongsam14/sigraph has no summarization
surface — this extends the text-analysis family SURVEY §2 adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["textrank_sentences", "rake_keywords", "RAKE_STOPWORDS"]

_SCALE = 1_000_000  # micro-units for all fixed-point scores

# Deliberately small, frozen stopword list: it is part of the operator's
# contract (the oracle embeds the same literal), not a tunable.
RAKE_STOPWORDS = (
    "the|a|an|and|or|of|to|in|on|for|with|is|are|was|were|be|by|as|at|"
    "that|this|it|from|but|not|have|has|had|i|you|he|she|we|they"
)


def _sentence_words(sentences: DataFrame) -> DataFrame:
    """Distinct lowercase alphanumeric tokens per sentence (splitting on
    non-alphanumeric runs strips the sentence-final punctuation that
    ``split_sentences`` keeps attached).

    Dedup happens INSIDE each sentence row (``array_distinct`` before
    the explode): rows are unique per (doc_id, sentence_id), so
    row-local distinct equals the global ``.distinct()`` this used to
    shuffle the whole exploded word table for — zero-shuffle now."""
    ws = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col("sentence")), r"[^a-z0-9]+"),
            lambda w: w != "",
        )
    )
    return sentences.select(
        "doc_id", "sentence_id", F.explode(ws).alias("word")
    )


def textrank_sentences(
    docs: DataFrame,
    top_k: int = 3,
    iters: int = 4,
    max_sentences: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TextRank over the per-document sentence-similarity graph ->
    ``(doc_id, sentence_id, rank, score, sentence)``, ``rank`` 1..top_k
    by score desc then sentence_id asc, ``score`` in BIGINT micro-units.

    Edge weight = number of DISTINCT shared lowercase words between two
    sentences (the integer core of Mihalcea & Tarau's overlap
    similarity; the log-length normalizer is folded into the row-sum
    normalization the power iteration applies anyway). Damping 0.85 as
    ``85/100`` integer arithmetic: with ``W_j`` the weight-sum of
    sentence j,

        score_i <- 150000*SCALE/1e6 + 85 * sum_j(score_j*w_ij DIV W_j) DIV 100

    starting from ``score = SCALE``. Every step is exact BIGINT math, so
    aggregation order is immaterial — the property the oracle pins.
    Isolated sentences decay to the teleport term and rank last by
    position. Documents are truncated to their first ``max_sentences``
    sentences (quadratic-bound guard at web scale).
    """
    from .corpus import split_sentences

    # sents feeds four consumers (word table, initial scores, isolated
    # reinstatement, final sentence join) and words feeds BOTH legs of
    # the pair self-join — without a boundary each consumer re-derives
    # the whole upstream chain (the caller's sentence synthesis is
    # HOF-heavy). Lazy localCheckpoints materialize each once.
    sents = (
        split_sentences(docs, text_col=text_col, id_col=id_col)
        .withColumnRenamed(id_col, "doc_id")
        .filter(F.col("sentence_id") <= max_sentences)
        .localCheckpoint(eager=False)
    )
    words = _sentence_words(sents).localCheckpoint(eager=False)

    # sentence-pair evidence via ONE grouped shuffle + in-place cross
    # explode (the a/b self-join shuffled the word table twice and then
    # aggregated — same device as textreuse/minhash pair generation).
    # Group = sentences containing a word within one document, bounded
    # by max_sentences, so the explode fan-out equals the old join's.
    grouped = words.groupBy("doc_id", "word").agg(
        F.collect_list("sentence_id").alias("_sids")
    )
    edges_half = (
        grouped.select(
            "doc_id", F.explode("_sids").alias("i"),
            F.col("_sids").alias("_s2"),
        )
        .select("doc_id", "i", F.explode("_s2").alias("j"))
        .filter(F.col("i") < F.col("j"))
        .groupBy("doc_id", "i", "j")
        .agg(F.count("*").alias("w"))
    )
    teleport = (15 * _SCALE) // 100
    # GROUPED POWER ITERATION (guide §1.2 "the distributed algorithm"):
    # ``max_sentences`` bounds every document's graph to a CONSTANT
    # (<= 40 nodes, <= 780 half-edges), so the whole damped iteration is
    # O(1) per document — a narrow map over one collected edge array —
    # while the DataFrame-level loop paid (join + aggregate) x iters
    # sequential shuffles of the full edge set. One groupBy collects
    # each document's half-edges; the kernel below mirrors them, builds
    # the per-node weight sums, and unrolls the iterations with
    # let-bound arrays (each round evaluated once). Arithmetic is the
    # SAME exact BIGINT recurrence (teleport + 85*inflow DIV 100 with
    # per-edge sscore*w DIV wtot), so aggregation order still cannot
    # perturb a bit and the oracle is unchanged.
    per_doc = edges_half.groupBy("doc_id").agg(
        F.collect_list(F.struct("i", "j", "w")).alias("_e")
    )

    def _let_s(val: str, var: str, body: str) -> str:
        return f"element_at(transform(array({val}), {var} -> {body}), 1)"

    Z = "CAST(0 AS BIGINT)"
    nodes_s = ("array_sort(array_distinct(concat("
               "transform(_e, x -> x.i), transform(_e, x -> x.j))))")
    pe_s = ("transform(_e, x -> named_struct("
            "'pi', CAST(array_position(ns, x.i) AS INT), "
            "'pj', CAST(array_position(ns, x.j) AS INT), 'w', x.w))")
    wt_s = (f"transform(sequence(1, size(ns)), q -> aggregate(pe, {Z}, "
            f"(a, x) -> a + IF(x.pi = q OR x.pj = q, x.w, {Z})))")

    def _round(pv: str) -> str:
        # inflow over the mirrored edges: (pi, pj, w) contributes
        # prev[pj]*w DIV wtot[pj] to pi and prev[pi]*w DIV wtot[pi]
        # to pj — exactly the symmetric norm_edges join's per-row term
        return (
            "transform(sequence(1, size(ns)), q -> CAST("
            f"{teleport} + (85 * aggregate(pe, {Z}, (a, x) -> a"
            f" + IF(x.pi = q, (element_at({pv}, x.pj) * x.w)"
            f" DIV element_at(wt, x.pj), {Z})"
            f" + IF(x.pj = q, (element_at({pv}, x.pi) * x.w)"
            f" DIV element_at(wt, x.pi), {Z})"
            ")) DIV 100 AS BIGINT))"
        )

    cur = f"transform(ns, n -> CAST({_SCALE} AS BIGINT))"
    for k in range(iters):
        cur = _let_s(cur, f"pv{k}", _round(f"pv{k}"))
    kernel = _let_s(
        nodes_s, "ns",
        _let_s(pe_s, "pe",
               _let_s(wt_s, "wt",
                      f"zip_with(ns, {cur}, (n, s) -> "
                      "named_struct('node', n, 'score', s))")),
    )
    # top-k INSIDE the per-doc array: the sentence table groups by
    # doc_id (co-partitioned with per_doc, so the join adds no
    # exchange) and the rank comes from an in-array sort bounded by
    # max_sentences — this replaces a left join back onto sents, a
    # per-doc ranking window, and a second sents join (three more
    # exchanges of the score table). Ordering is IDENTICAL: sorting
    # structs whose leading fields are (-score, node) ascending is
    # (score desc, node asc), and node is unique per doc so the
    # trailing payload fields never influence the order. Isolated
    # sentences (absent from the kernel's node set) receive no inflow
    # in any round: exactly the teleport term after round 1 (initial
    # SCALE when iters == 0).
    sent_doc = sents.groupBy("doc_id").agg(
        F.collect_list(F.struct("sentence_id", "sentence")).alias("_ss")
    )
    default = F.lit(_SCALE if iters == 0 else teleport).cast("long")
    doc = sent_doc.join(per_doc, "doc_id", "left")

    def _scored(ss):
        from sigraph_spark.functions.hof import let

        def with_kernel(km):
            # km is let-BOUND: a lambda-captured subtree re-evaluates
            # per element in interpreted HOF eval, so referencing the
            # kernel directly inside per_sent re-ran the whole power
            # iteration once per sentence (measured 2.6x the leg)
            def per_sent(s):
                looked = F.get(
                    F.filter(km, lambda x: x["node"] == s["sentence_id"]), 0
                )["score"]
                sc = F.coalesce(looked, default)
                return F.struct(
                    (-sc).alias("_negscore"),
                    s["sentence_id"].alias("node"),
                    sc.alias("score"),
                    s["sentence"].alias("sentence"),
                )

            return F.slice(F.array_sort(F.transform(ss, per_sent)), 1, top_k)

        # NULL kernel (doc with no edges) => every lookup NULL => teleport
        return let(F.expr(kernel), with_kernel)

    return (
        doc.select("doc_id", F.posexplode(_scored(F.col("_ss"))))
        .select(
            "doc_id",
            F.col("col.node").alias("sentence_id"),
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("col.score").alias("score"),
            F.col("col.sentence").alias("sentence"),
        )
    )


def _phrase_table(docs: DataFrame, text_col: str, id_col: str,
                  max_phrase_words: int) -> DataFrame:
    """Candidate phrases: lowercase text with punctuation runs and
    stopword tokens replaced by U+001E, split on it, whitespace-
    normalized, 1..max_phrase_words words. One narrow generate."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    t = F.regexp_replace(t, r"[^a-z0-9\s]+", "\x1e")
    t = F.regexp_replace(t, r"\b(" + RAKE_STOPWORDS + r")\b", "\x1e")
    phrases = F.split(t, "\x1e")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(phrases).alias("raw"),
        )
        .select(
            "doc_id",
            F.trim(F.regexp_replace(F.col("raw"), r"\s+", " "))
            .alias("phrase"),
        )
        .filter(F.col("phrase") != "")
        .withColumn("words", F.split(F.col("phrase"), " "))
        .filter(F.size("words") <= max_phrase_words)
    )


def rake_keywords(
    docs: DataFrame,
    top_k: int = 5,
    max_phrase_words: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAKE -> ``(doc_id, phrase, rank, score)``: per document the
    ``top_k`` DISTINCT candidate phrases by score desc then phrase asc;
    ``score`` = sum over member words of ``deg(w) * SCALE DIV freq(w)``
    in BIGINT micro-units (one integer division per word, then an
    order-free integer sum — the exactness device).

    ``freq(w)`` = occurrences of w across the document's candidate
    phrases; ``deg(w)`` = sum of phrase lengths over those occurrences
    (Rose et al. §1.2: co-occurrence degree including self). Candidate
    phrases are maximal stopword/punctuation-free runs of
    ``<= max_phrase_words`` words.
    """
    phrases = _phrase_table(docs, text_col, id_col, max_phrase_words)
    # two consumers (word stats, the scoring join) — materialize the
    # occurrence explode once instead of re-running the phrase-table
    # regex passes per consumer
    occ = phrases.select(
        "doc_id", "phrase",
        F.size("words").alias("plen"),
        F.explode("words").alias("word"),
    ).localCheckpoint(eager=False)
    stats = occ.groupBy("doc_id", "word").agg(
        F.count("*").alias("freq"),
        F.sum("plen").alias("deg"),
    )
    scored = (
        occ.join(stats, ["doc_id", "word"])
        .groupBy("doc_id", "phrase")
        .agg(
            F.sum(F.expr(f"deg * {_SCALE}L DIV freq")).alias("allscore"),
            F.count("*").alias("n_occ_words"),
            F.first("plen").alias("plen"),
        )
        # each occurrence of the phrase contributes an identical word
        # sum, so divide by the occurrence count to score the phrase
        # TYPE once: occurrences = total joined words / words-per-phrase
        .select(
            "doc_id", "phrase",
            F.expr("allscore DIV (n_occ_words DIV plen)").alias("score"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "phrase",
                F.col("rank").cast("int").alias("rank"), "score")
    )


# --- DuckDB oracle generators (gate parity; same device as
# pagerank.pagerank_oracle_sql: the identical BIGINT arithmetic with the
# iteration loop unrolled into chained CTEs) ---------------------------------


def textrank_oracle_sql(docs_table: str = "documents", top_k: int = 3,
                        iters: int = 4, max_sentences: int = 40,
                        chunk_words: int = 12) -> str:
    """Full DuckDB statement mirroring ``q_textrank``: derive sentences
    as ``chunk_words``-word chunks (the synthetic corpus carries no
    punctuation), build the shared-word graph, run ``iters`` unrolled
    fixed-point rounds, emit the top-``top_k`` rows per document."""
    teleport = (15 * _SCALE) // 100
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""
        tr_t{t} AS (
          SELECT s.doc_id, s.sentence_id AS node,
                 CAST({teleport} + (85 * coalesce(c.inflow, 0)) // 100
                      AS BIGINT) AS score
          FROM tr_s s LEFT JOIN (
            SELECT ne.doc_id, ne.i AS node,
                   sum((p.score * ne.w) // ne.wtot) AS inflow
            FROM tr_ne ne
            JOIN tr_t{t - 1} p
              ON p.doc_id = ne.doc_id AND p.node = ne.j
            GROUP BY 1, 2) c
          ON c.doc_id = s.doc_id AND c.node = s.sentence_id)""")
    return rf"""
        WITH tr_base AS (
          SELECT doc_id,
                 list_filter(string_split_regex(
                     lower(trim(coalesce(text, ''))), '\s+'),
                     x -> x <> '') AS ws
          FROM {docs_table}),
        tr_ch AS (
          SELECT doc_id, CAST(k AS INT) + 1 AS sentence_id,
                 array_to_string(
                   ws[CAST(k AS INT) * {chunk_words} + 1 :
                      CAST(k AS INT) * {chunk_words} + {chunk_words}],
                   ' ') AS chunk,
                 greatest(CAST(ceil(len(ws) / {chunk_words}.0) AS INT), 1)
                   AS nch
          FROM tr_base,
               UNNEST(range(0, greatest(
                 CAST(ceil(len(ws) / {chunk_words}.0) AS INT), 1)))
                 AS t(k)),
        tr_s AS (
          SELECT doc_id, sentence_id,
                 CASE WHEN sentence_id < nch THEN chunk || '.'
                      ELSE chunk END AS sentence
          FROM tr_ch
          WHERE chunk <> '' AND sentence_id <= {max_sentences}),
        tr_w AS (
          SELECT DISTINCT doc_id, sentence_id AS sid, u AS word FROM (
            SELECT doc_id, sentence_id,
                   unnest(string_split_regex(lower(sentence),
                                             '[^a-z0-9]+')) AS u
            FROM tr_s)
          WHERE u <> ''),
        tr_eh AS (
          SELECT a.doc_id, a.sid AS i, b.sid AS j, count(*) AS w
          FROM tr_w a JOIN tr_w b
            ON a.doc_id = b.doc_id AND a.word = b.word AND a.sid < b.sid
          GROUP BY 1, 2, 3),
        tr_e AS (SELECT doc_id, i, j, w FROM tr_eh
                 UNION ALL
                 SELECT doc_id, j AS i, i AS j, w FROM tr_eh),
        tr_ws AS (SELECT doc_id, i AS node, sum(w) AS wtot
                  FROM tr_e GROUP BY 1, 2),
        tr_ne AS (
          SELECT e.doc_id, e.i, e.j, e.w, x.wtot
          FROM tr_e e JOIN tr_ws x
            ON x.doc_id = e.doc_id AND x.node = e.j),
        tr_t0 AS (SELECT doc_id, sentence_id AS node,
                         CAST({_SCALE} AS BIGINT) AS score
                  FROM tr_s),{','.join(rounds)}
        SELECT r.doc_id, CAST(r.node AS INT) AS sentence_id,
               CAST(r.rank AS INT) AS rank,
               CAST(r.score AS BIGINT) AS score, s.sentence
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, node ASC) AS rank
          FROM tr_t{iters}) r
        JOIN tr_s s
          ON s.doc_id = r.doc_id AND s.sentence_id = r.node
        WHERE r.rank <= {top_k}
    """


def rake_oracle_sql(docs_table: str = "documents", top_k: int = 5,
                    max_phrase_words: int = 4) -> str:
    """Full DuckDB statement mirroring ``rake_keywords`` (same stopword
    literal, same micro-unit quantization)."""
    return rf"""
        WITH rk_ph0 AS (
          SELECT doc_id,
                 unnest(string_split(
                   regexp_replace(
                     regexp_replace(lower(coalesce(text, '')),
                                    '[^a-z0-9\s]+', chr(30), 'g'),
                     '\b({RAKE_STOPWORDS})\b', chr(30), 'g'),
                   chr(30))) AS raw
          FROM {docs_table}),
        rk_ph AS (
          SELECT doc_id,
                 trim(regexp_replace(raw, '\s+', ' ', 'g')) AS phrase
          FROM rk_ph0),
        rk_cand AS (
          SELECT doc_id, phrase, string_split(phrase, ' ') AS words
          FROM rk_ph
          WHERE phrase <> ''
            AND len(string_split(phrase, ' ')) <= {max_phrase_words}),
        rk_occ AS (
          SELECT doc_id, phrase, len(words) AS plen, unnest(words) AS word
          FROM rk_cand),
        rk_stats AS (
          SELECT doc_id, word, count(*) AS freq, sum(plen) AS deg
          FROM rk_occ GROUP BY 1, 2),
        rk_scored AS (
          SELECT o.doc_id, o.phrase,
                 sum((s.deg * {_SCALE}) // s.freq) AS allscore,
                 count(*) AS n_occ_words,
                 min(o.plen) AS plen
          FROM rk_occ o JOIN rk_stats s
            ON s.doc_id = o.doc_id AND s.word = o.word
          GROUP BY 1, 2),
        rk_final AS (
          SELECT doc_id, phrase,
                 allscore // (n_occ_words // plen) AS score
          FROM rk_scored)
        SELECT doc_id, phrase, CAST(rank AS INT) AS rank,
               CAST(score AS BIGINT) AS score
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, phrase ASC) AS rank
          FROM rk_final)
        WHERE rank <= {top_k}
    """
