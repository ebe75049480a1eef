"""Property-based checks (hypothesis) for the webtext mining operators
with exact python references: quantity normalization (Fraction
arithmetic), pagination chain labeling (python walk), alias-map voting
(reference winner rule), and template fingerprints (python re + md5 —
the cross-engine regex/hash parity the oracles rely on). Few examples,
small inputs — each example is a real Spark job."""

from __future__ import annotations

import hashlib
import re
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ipart=st.integers(min_value=0, max_value=999999),
    frac=st.one_of(st.none(), st.integers(min_value=0, max_value=999)),
    fraclen=st.integers(min_value=1, max_value=3),
    unit=st.sampled_from(
        ["B", "KB", "MB", "GB", "TB", "KiB", "MiB", "GiB", "TiB",
         "Hz", "kHz", "MHz", "GHz", "ms", "s", "min", "h", "d"]
    ),
)
@settings(**_SETTINGS)
def test_quantity_base_matches_fraction_arithmetic(
    spark, ipart, frac, fraclen, unit
):
    from sigraph_spark.operators.quantities import UNITS, extract_quantities

    num = (
        str(ipart) if frac is None
        else f"{ipart}.{str(frac).zfill(fraclen)[:fraclen]}"
    )
    docs = spark.createDataFrame(
        [("u1", f"value {num} {unit} end")], "url string, text string"
    )
    rows = extract_quantities(docs).collect()
    fl = len(num.split(".")[1]) if "." in num else 0
    exact = Fraction(int(num.replace(".", "")), 10 ** fl) * UNITS[unit][1]
    if exact.denominator == 1:
        assert len(rows) == 1
        assert rows[0]["base"] == exact.numerator
        assert rows[0]["unit_class"] == UNITS[unit][0]
    else:
        assert rows == []


@given(
    lens=st.lists(st.integers(min_value=1, max_value=6), min_size=1,
                  max_size=5),
)
@settings(**_SETTINGS)
def test_page_chain_labels_match_python_walk(spark, lens):
    from sigraph_spark.operators.pagination import page_chains

    links, expect = [], set()
    for ci, ln in enumerate(lens):
        pages = [f"c{ci}p{k}" for k in range(ln)]
        for k in range(ln - 1):
            links.append((pages[k], pages[k + 1]))
        if ln >= 2:
            expect |= {(p, pages[0], k) for k, p in enumerate(pages)}
    if not links:
        return
    got = {
        (r["url"], r["head"], r["pos"])
        for r in page_chains(
            spark.createDataFrame(links, "url string, next string")
        ).collect()
    }
    assert got == expect


@given(
    votes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # url id
            st.sampled_from(["AB", "CD"]),
            st.sampled_from(["Alpha Beta", "Any Bus", "Cold Day"]),
        ),
        min_size=1, max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_alias_map_matches_reference_winner_rule(spark, votes):
    from sigraph_spark.operators.abbrev import alias_map

    rows = [(f"u{u}", 0, lng, sh) for u, sh, lng in votes]
    got = {
        (r["short"], r["long"], r["n_pages"])
        for r in alias_map(
            spark.createDataFrame(
                rows, "url string, pair_idx int, long string, short string"
            )
        ).collect()
    }
    # python reference: distinct pages per (short, long), min_pages=2,
    # winner = most pages then lexicographic long
    pages: dict[tuple, set] = {}
    for u, sh, lng in votes:
        pages.setdefault((sh, lng), set()).add(u)
    best: dict[str, tuple] = {}
    for (sh, lng), us in pages.items():
        if len(us) < 2:
            continue
        cand = (-len(us), lng)
        if sh not in best or cand < best[sh]:
            best[sh] = cand
    expect = {(sh, lng, -neg) for sh, (neg, lng) in best.items()}
    assert got == expect


@given(
    html=st.text(
        alphabet="<>/abp1 \"'=x", min_size=0, max_size=60
    ),
)
@settings(**_SETTINGS)
def test_template_id_matches_python_md5(spark, html):
    from sigraph_spark.operators.template import page_structure

    row = page_structure(
        spark.createDataFrame([("u1", html)], "url string, html string")
    ).collect()[0]
    tags = re.findall(r"<([a-z][a-z0-9]*)", html.lower())
    assert row["n_tags"] == len(tags)
    assert row["template_id"] == hashlib.md5(
        ",".join(tags).encode()
    ).hexdigest()
