"""Quantity extraction + exact unit normalization.

Webtext states the same fact in different units — "1.5 GB" vs
"1536 MB" vs "1572864 KiB" — and fusion can only arbitrate them after
normalization to a canonical base. This operator extracts
number+unit mentions and normalizes them with EXACT integer
arithmetic (never floats — float rounding would make the fused KG
engine-dependent):

* inventory (pinned): bytes — B KB MB GB TB (decimal) / KiB MiB GiB
  TiB (binary), base unit BYTES; frequency — Hz kHz MHz GHz, base Hz;
  duration — ms s min h d, base MICROSECONDS;
* the numeric part is 1-6 integer digits with up to 3 decimals — the
  NORMALIZED base then provably fits a BIGINT (999999.999 TiB in bytes
  ~ 1.1e18 < 2^63); the intermediate digits*multiplier product can
  exceed BIGINT (~1.1e21), so it runs in DECIMAL(38,0) — exact and
  ANSI-safe;
* normalization reads the digits AS AN INTEGER (decimal point
  removed): ``base = digits * mult / 10^frac_len``, emitted only when
  the division is exact — "0.5 KB" is 500 bytes, "0.5 B" has no
  integer base and DROPS (consuming its ``q_idx``, the document-order
  mention index);
* longer unit names win the alternation (GiB before B, ms before s).

Scale design: one regexp pass (two zipped group extracts) +
``posexplode`` + a literal CASE ladder — single narrow map, zero
shuffle, zero UDF (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (unit -> (class, multiplier to base)); base: bytes / Hz / microseconds
UNITS: dict[str, tuple[str, int]] = {
    "TiB": ("bytes", 1 << 40), "GiB": ("bytes", 1 << 30),
    "MiB": ("bytes", 1 << 20), "KiB": ("bytes", 1 << 10),
    "TB": ("bytes", 10**12), "GB": ("bytes", 10**9),
    "MB": ("bytes", 10**6), "KB": ("bytes", 10**3), "B": ("bytes", 1),
    "GHz": ("hertz", 10**9), "MHz": ("hertz", 10**6),
    "kHz": ("hertz", 10**3), "Hz": ("hertz", 1),
    "ms": ("micros", 10**3), "s": ("micros", 10**6),
    "min": ("micros", 60 * 10**6), "h": ("micros", 3600 * 10**6),
    "d": ("micros", 86400 * 10**6),
}

QTY_RE = (
    r"\b(\d{1,6}(?:\.\d{1,3})?)\s*("
    + "|".join(sorted(UNITS, key=len, reverse=True))
    + r")\b"
)


def _ladder(unit: Column, pick: int) -> Column:
    out = F.lit(None)
    for u, spec in UNITS.items():
        out = F.when(unit == u, F.lit(spec[pick])).otherwise(out)
    return out


def normalized_base(value_raw: Column, unit: Column) -> Column:
    """Exact base value of (number string, unit), NULL when the
    fraction does not divide. DECIMAL(38,0) keeps digits*mult exact AND
    ANSI-safe: 9 digits of TiB reach ~1.1e21, past BIGINT (a long
    multiply would raise ARITHMETIC_OVERFLOW before any exactness
    filter could run); the final base is <= 999999.999 TiB in bytes
    ~ 1.1e18, which fits BIGINT again after the exact division."""
    digits = F.regexp_replace(value_raw, r"\.", "").cast("decimal(38,0)")
    frac_len = F.when(
        value_raw.contains("."),
        F.length(F.substring_index(value_raw, ".", -1)),
    ).otherwise(F.lit(0))
    scale = F.pow(F.lit(10), frac_len).cast("long")
    prod = digits * _ladder(unit, 1).cast("long")  # stays decimal(38,0)
    return F.when((prod % scale) == 0, (prod / scale).cast("long"))


def extract_quantities(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Docs -> ``(url, q_idx, value_raw, unit, unit_class, base)`` with
    ``base`` the exact BIGINT value in the class base unit."""
    from sigraph_spark.functions.hof import zip_match_groups

    text = F.col(text_col)
    # one group-0 scan + per-match group pulls (was one full-text pass
    # per capture group)
    m = zip_match_groups(text, QTY_RE, ["v", "u"])
    x = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(m).alias("q_idx", "q"),
    ).select(
        "url", "q_idx",
        F.col("q.v").alias("value_raw"), F.col("q.u").alias("unit"),
    )
    return x.select(
        "url", "q_idx", "value_raw", "unit",
        _ladder(F.col("unit"), 0).alias("unit_class"),
        normalized_base(F.col("value_raw"), F.col("unit")).alias("base"),
    ).filter(F.col("base").isNotNull())


def quantity_columns(df: DataFrame, obj_col: str = "object") -> DataFrame:
    """Append ``qty_class`` / ``qty_base`` for the FIRST quantity
    mention in an object literal (NULL when none, or when the fraction
    does not divide) — the cross-unit comparison key fused-KG consumers
    sort/join on ("1.5 GB" == "1500 MB" after this). Narrow map."""
    obj = F.col(obj_col)
    v = F.regexp_extract(obj, QTY_RE, 1)
    u = F.regexp_extract(obj, QTY_RE, 2)
    has = v != ""
    return df.withColumns({
        "qty_class": F.when(has, _ladder(u, 0)),
        "qty_base": F.when(has, normalized_base(v, u)),
    })
