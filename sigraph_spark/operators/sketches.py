"""Portable mergeable HyperLogLog sketches (Flajolet et al. 2007).

Why a hand-rolled HLL when Spark has ``approx_count_distinct``: the
built-in sketch is engine-private — its register state can't be stored
in a table, merged with last month's sketch, or verified by another
engine. At 10^12 documents the question "how many distinct urls per
host, across ALL crawl snapshots ever" must be answered WITHOUT
re-scanning history; the standard production answer is a persisted
register table per snapshot, folded with a ``max`` — the HLL merge is a
semilattice (commutative, associative, idempotent), exactly like the
repo's other incremental state (``merge_claims``, ``minhash_index``).

Portability: the hash is ``dedup.hash32_md5_le`` (engine-exact md5
family) and every derived quantity is integer arithmetic — register
index = top ``p`` bits, rho = leading-zero count of the low ``w`` bits
via the base-2 string-length device (``conv``/``bin`` — exact, no
float log). The estimator's float math is restricted to dyadic
rationals (sums of 2^-rho are EXACT in ieee754 doubles) plus one
mul/div and, on the small-range branch, one ``ln`` — the DuckDB gate
oracle reproduces the whole thing at 6dp (precedent: unigram_logprob).

Scale notes (100 TB): ``hll_registers`` is one groupBy over
(key, register) — map-side combine collapses each partition to at most
|keys| x 2^p rows before the shuffle, so the exchange is bounded by
sketch size, not corpus size. Hot keys (one host = 30% of the crawl)
are absorbed the same way: a register row's partial max is one row per
partition regardless of how many values hashed into it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sigraph_spark.operators.dedup import hash32_md5_le


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_rho(value: Column, p: int) -> tuple[Column, Column]:
    """(register index, rho) of the 32-bit portable hash of ``value``:
    index = the top ``p`` hash bits, rho = 1 + leading zeros of the low
    ``w = 32 - p`` bits (``w + 1`` when they are all zero). The
    leading-zero count uses the length of the base-2 string (exact
    integer device, mirrored in SQL as ``length(ltrim(bin(v),'0'))``).
    """
    w = 32 - p
    h = hash32_md5_le(value.cast("string"))
    idx = F.shiftrightunsigned(h, w).cast("int")
    v = h.bitwiseAND(F.lit((1 << w) - 1))
    bitlen = F.length(F.conv(v.cast("string"), 10, 2))
    rho = F.when(v == 0, F.lit(w + 1)).otherwise(F.lit(w) + 1 - bitlen)
    return idx, rho.cast("int")


def hll_registers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-key HLL register table ``(key..., reg, rho)`` — the persistable
    sketch state. Absent registers mean rho = 0. One algebraic
    (max) aggregation; output bounded by |keys| * 2^p rows."""
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} out of range [4, 18]")
    idx, rho = hll_rho(F.col(value_col), p)
    return (
        df.select(*key_cols, idx.alias("reg"), rho.alias("rho"))
        .groupBy(*key_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, key_cols: list[str]) -> DataFrame:
    """Fold two register tables (semilattice max). ``merge(sketch(A),
    sketch(B)) == sketch(A ∪ B)`` exactly — the property that makes the
    state incremental across crawl snapshots (test-pinned)."""
    return (
        a.unionByName(b)
        .groupBy(*key_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    key_cols: list[str],
    p: int = 12,
) -> DataFrame:
    """Distinct-count estimates from a register table:
    ``(key..., n_registers, estimate)``. Raw HLL estimator with the
    standard linear-counting fallback for the small range (E <= 2.5m
    with empty registers present); the large-range 32-bit correction is
    deliberately omitted — at cardinalities near 2^32 callers should
    raise ``p``, and the oracle must stay branch-for-branch identical.

    Float discipline: sum(2^-rho) is a sum of dyadic rationals — exact
    in doubles — plus (m - n_nonzero) ones; alpha*m^2/S is one mul/div;
    the linear-counting branch adds one ``ln``. Rounded to 6dp, matched
    exactly by the DuckDB oracle."""
    m = 1 << p
    alpha = _alpha(m)
    am2 = alpha * m * m  # one float literal, shared with the oracle
    agg = registers.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(0.5), F.col("rho"))).alias("_s_nonzero"),
    )
    s = F.col("_s_nonzero") + (F.lit(m) - F.col("n_registers"))
    raw = F.lit(am2) / s
    zeros = F.lit(m) - F.col("n_registers")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *key_cols,
        "n_registers",
        F.round(est, 6).alias("estimate"),
    )


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """sketch + estimate in one call (the non-incremental convenience)."""
    return hll_estimate(hll_registers(df, key_cols, value_col, p), key_cols, p)


def hll_python_reference(values, p: int = 12) -> float:
    """Driver-side single-key reference (tests): same arithmetic."""
    import hashlib

    w = 32 - p
    m = 1 << p
    regs: dict[int, int] = {}
    for s in values:
        h = int.from_bytes(
            hashlib.md5(str(s).encode("utf-8")).digest()[:4], "little"
        )
        idx = h >> w
        v = h & ((1 << w) - 1)
        rho = (w + 1) if v == 0 else w + 1 - v.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s_total = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = _alpha(m) * m * m / s_total
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return round(m * math.log(m / zeros), 6)
    return round(raw, 6)


def hll_rho_sql(value_expr: str, p: int) -> tuple[str, str]:
    """(reg_expr, rho_expr) SQL fragments over a column expression —
    the exact DuckDB restatement of :func:`hll_rho` (needs an ``h``
    column bound to the 32-bit hash of the value; see callers)."""
    w = 32 - p
    reg = f"CAST(h >> {w} AS INT)"
    rho = (
        f"CAST(CASE WHEN (h & {(1 << w) - 1}) = 0 THEN {w + 1} "
        f"ELSE {w} + 1 - length(ltrim(bin(CAST(h & {(1 << w) - 1} AS UINTEGER)), '0')) "
        f"END AS INT)"
    )
    _ = value_expr  # the hash column is built by the caller
    return reg, rho


def hll_hash_sql(value_expr: str) -> str:
    """The portable 32-bit hash in DuckDB (matches hash32_md5_le)."""
    return (
        f"CAST(md5_number_upper(CAST({value_expr} AS VARCHAR))"
        f" & 4294967295 AS BIGINT)"
    )


def hll_estimator_sql(
    regs_rel: str,
    keys: list[str],
    p: int,
    prefix: str,
    extra_select: str = "",
) -> str:
    """Estimator fragment over a register relation (keys..., reg, rho):
    one agg CTE ``{prefix}agg`` plus the branch-for-branch estimate
    SELECT (same dyadic-sum + ln discipline as :func:`hll_estimate`).
    ``extra_select`` appends literal columns (e.g. a radius tag)."""
    m = 1 << p
    alpha = _alpha(m)
    ks = ", ".join(keys)
    return f"""
{prefix}agg AS (
  SELECT {ks}, CAST(count(*) AS BIGINT) AS n_registers,
         sum(power(0.5, rho)) + ({m} - count(*)) AS s,
         {m} - count(*) AS zeros
  FROM {regs_rel} GROUP BY {ks})
SELECT {ks}, n_registers,
       round(CASE WHEN {alpha * m * m!r} / s <= {2.5 * m!r}
                   AND zeros > 0
             THEN {float(m)!r} * ln({float(m)!r} / zeros)
             ELSE {alpha * m * m!r} / s END, 6) AS estimate{extra_select}
FROM {prefix}agg
"""


def hll_oracle_sql(
    rel: str,
    key_exprs: list[str],
    value_expr: str,
    p: int = 12,
    prefix: str = "hll_",
) -> str:
    """DuckDB restatement: identical hash (md5_number_upper &
    0xffffffff), identical integer rho device (bin + ltrim), identical
    estimator branches. ``key_exprs`` are (expr AS name) pairs rendered
    by the caller as plain select-list items of ``rel``."""
    keys = [k.split(" AS ")[-1].strip() for k in key_exprs]
    key_sel = ", ".join(key_exprs)
    reg, rho = hll_rho_sql(value_expr, p)
    return f"""
{prefix}h AS (
  SELECT {key_sel}, {hll_hash_sql(value_expr)} AS h
  FROM {rel}),
{prefix}rho AS (
  SELECT {", ".join(keys)}, {reg} AS reg, {rho} AS rho
  FROM {prefix}h),
{prefix}regs AS (
  SELECT {", ".join(keys)}, reg, max(rho) AS rho
  FROM {prefix}rho GROUP BY {", ".join(keys)}, reg),
{hll_estimator_sql(prefix + "regs", keys, p, prefix)}
"""


# --- Count-Min sketch -------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of per-key counts
    (or ``weight_col`` sums): the persistable register table
    ``(j, cell, total)`` — d hash rows x w counters, total BIGINT.

    The frequency dual of the HLL register table: state is O(d * w)
    regardless of key cardinality, merge across crawl snapshots is a
    plain per-cell SUM (commutative/associative — replay caveat: unlike
    the HLL max it is NOT idempotent, so the streaming path must dedup
    batches via the applied-batch ledger first), and estimates
    overcount but never undercount. At 10^12 rows this is how "which
    hosts/entities are hot" stays answerable without materializing the
    full key distribution — the sketch feeds ``skew.choose_salting``'s
    threshold decision with a bounded-size input. Fully integer, so
    the oracle matches bit-for-bit (no float discipline needed at all).

    One algebraic aggregation: rows explode to d (j, cell) pairs
    map-side (narrow), then one (j, cell) sum absorbs any hot key —
    the hot key IS one cell per row j.
    """
    if d > 8:
        raise ValueError("d > 8 buys nothing — raise w instead")
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.select(
        F.col(key_col).cast("string").alias("_k"), wt.alias("_w")
    )
    out = None
    for j in range(d):
        cell = hash32_md5_le(
            F.concat_ws("|", F.lit(str(j)), F.col("_k"))
        ) % F.lit(w)
        part = rows.select(
            F.lit(j).alias("j"), cell.alias("cell"), F.col("_w")
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("j", "cell").agg(F.sum("_w").alias("total"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two sketches of the SAME (w, d) geometry: per-cell sum."""
    return (
        a.unionByName(b).groupBy("j", "cell").agg(F.sum("total").alias("total"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Point estimates for a candidate key table: est(key) = min over
    the d rows of the key's cell counter — >= the true count always,
    == it when the key collides with nothing heavier. d broadcast-side
    lookups (the sketch is O(d*w) rows, always the small side)."""
    k = keys.select(F.col(key_col).cast("string").alias("key")).distinct()
    probes = None
    for j in range(d):
        cell = hash32_md5_le(
            F.concat_ws("|", F.lit(str(j)), F.col("key"))
        ) % F.lit(w)
        part = k.select("key", F.lit(j).alias("j"), cell.alias("cell"))
        probes = part if probes is None else probes.unionByName(part)
    return (
        probes.join(F.broadcast(cms), ["j", "cell"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("total", F.lit(0))).alias("est"))
    )


def cms_oracle_sql(
    rel: str,
    key_expr: str,
    keys_rel: str,
    keys_expr: str,
    w: int = 1024,
    d: int = 4,
    weight_expr: str = "1",
    prefix: str = "cms_",
) -> str:
    """DuckDB restatement of sketch-then-estimate: identical md5 cells,
    identical integer sums and min — bit-exact."""
    P = prefix
    cell = (
        lambda j, key: f"CAST(md5_number_upper('{j}' || '|' || {key})"
        f" & 4294967295 AS BIGINT) % {w}"
    )
    sketch_parts = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {cell(j, key_expr)} AS cell,"
        f" CAST({weight_expr} AS BIGINT) AS w_ FROM {rel}"
        for j in range(d)
    )
    probe_parts = "\nUNION ALL\n".join(
        f"SELECT key, {j} AS j, {cell(j, 'key')} AS cell FROM {P}keys"
        for j in range(d)
    )
    return f"""
{P}rows AS ({sketch_parts}),
{P}sk AS (SELECT j, cell, sum(w_) AS total FROM {P}rows GROUP BY j, cell),
{P}keys AS (SELECT DISTINCT CAST({keys_expr} AS VARCHAR) AS key FROM {keys_rel}),
{P}probes AS ({probe_parts})
SELECT p.key, CAST(min(coalesce(s.total, 0)) AS BIGINT) AS est
FROM {P}probes p LEFT JOIN {P}sk s ON p.j = s.j AND p.cell = s.cell
GROUP BY p.key
"""
