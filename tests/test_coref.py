"""Rule-based pronoun coreference (operators/coref.py) — hand fixtures
for the recency rule, mention islanding, window bounds, and a random
cross-check against a pure-Python mirror of the contract."""

from __future__ import annotations

import re

import pytest

from sigraph_spark.operators.coref import PRONOUNS


def _ref_coref(text: str, window: int = 2) -> list:
    """Pure-Python mirror: same sentence split (marker device), token
    cleaning, per-sentence mention islands, (sid, pos)-recency."""
    parts = re.split("\x1d", re.sub(r"([.!?])\s+", "\\1\x1d", text))
    ments, prons = [], []  # ments: (sid, start_pos, mention_text)
    sid = 0
    for raw in parts:
        sid += 1
        sent = raw.strip()
        if not sent:
            continue
        toks = [t for t in re.split(r"\s+", sent) if t]
        run = None  # [start_pos, [words], last_pos]
        for pos, tok in enumerate(toks):
            clean = re.sub(r"[^A-Za-z0-9]", "", tok)
            if clean.lower() in PRONOUNS:
                prons.append((sid, pos, clean.lower()))
                run = None
            elif re.fullmatch(r"[A-Z][a-z0-9]+", clean):
                if run is not None and run[2] == pos - 1:
                    run[1].append(clean)
                    run[2] = pos
                else:
                    run = [pos, [clean], pos]
                    ments.append((sid, run))
            else:
                run = None
    ments = [(sid, r[0], " ".join(r[1])) for sid, r in ments]
    out = []
    for sid, pos, pron in prons:
        cands = [m for m in ments
                 if (m[0] < sid or (m[0] == sid and m[1] < pos))
                 and sid - m[0] <= window]
        best = max(cands, key=lambda m: (m[0], m[1]), default=None)
        out.append((sid, pos, pron,
                    best[2] if best else None,
                    best[0] if best else None,
                    best[1] if best else None))
    return out


def _run(spark, text, window=2):
    from sigraph_spark.operators.coref import pronoun_coref

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = pronoun_coref(docs, window_sents=window).collect()
    return sorted(
        (r["sentence_id"], r["pronoun_pos"], r["pronoun"],
         r["antecedent"], r["antecedent_sid"], r["antecedent_pos"])
        for r in rows
    )


def test_recency_and_multiword_mention(spark):
    got = _run(spark, "John Smith met Mary. He said it works fine.")
    # both pronouns resolve to the most recent mention: Mary (s1 pos3)
    assert got == [
        (2, 0, "he", "Mary", 1, 3),
        (2, 2, "it", "Mary", 1, 3),
    ]


def test_multiword_wins_when_latest(spark):
    got = _run(spark, "Mary met John Smith. He spoke.")
    assert got == [(2, 0, "he", "John Smith", 1, 2)]


def test_same_sentence_antecedent(spark):
    got = _run(spark, "Mary said she agrees with Bob.")
    assert got == [(1, 2, "she", "Mary", 1, 0)]


def test_window_bound_yields_null(spark):
    text = ("Alice spoke. nothing here. still nothing. "
            "then they left early.")
    got = _run(spark, text, window=2)
    # Alice is 3 sentences back -> outside the 2-sentence window
    assert got == [(4, 1, "they", None, None, None)]
    got3 = _run(spark, text, window=3)
    assert got3 == [(4, 1, "they", "Alice", 1, 0)]


def test_pronoun_never_a_mention_and_punct_stripped(spark):
    got = _run(spark, "He met Mary, then Bob! It ended.")
    # "He" (capitalized pronoun) must not become an antecedent;
    # "Mary," and "Bob!" clean to bare mentions
    assert got == [
        (1, 0, "he", None, None, None),
        (2, 0, "it", "Bob", 1, 4),
    ]


def test_random_matches_reference(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    vocab = (["alpha", "beta", "gamma", "delta"]
             + ["Rome", "Paris", "Tokyo", "Berlin", "Oslo"]
             + list(PRONOUNS[:6]))
    rows = []
    for d in range(8):
        ws = list(rng.choice(vocab, size=80))
        for k in range(11, len(ws), 17):
            ws[k] = ws[k] + "."
        rows.append(" ".join(ws))
    from sigraph_spark.operators.coref import pronoun_coref

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    out = pronoun_coref(docs, window_sents=2).collect()
    for d, text in enumerate(rows):
        exp = sorted(_ref_coref(text, 2))
        got = sorted(
            (r["sentence_id"], r["pronoun_pos"], r["pronoun"],
             r["antecedent"], r["antecedent_sid"], r["antecedent_pos"])
            for r in out if r["doc_id"] == d
        )
        assert got == exp, f"doc {d}"
