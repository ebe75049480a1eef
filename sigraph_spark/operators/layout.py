"""Z-order (Morton) data-layout clustering for scan pruning.

At 10^12-document scale the dominant query cost is how much of the
table a filter must touch. Sorting the layout by ONE column gives
min/max pruning on that column only; interleaving the bits of SEVERAL
bucketed columns (a Morton / Z-order key, the technique behind Delta
Lake's OPTIMIZE ZORDER BY and the classic UB-tree) bounds EVERY keyed
column's value range within each file/partition, so row-group min/max
statistics prune multi-predicate scans on any of the keys.

Everything here is exact integer arithmetic (no rank windows, no
sampling): a column is bucketed by an explicit [vmin, vmax] range with
``floor((v - vmin) * 2^bits / span)`` and the buckets' bits are
interleaved into one BIGINT — deterministic, engine-reproducible (the
``zorder_key`` gate hash-matches a DuckDB oracle built from the same
unrolled shift/mask terms), and cheap (pure codegen'd Column math, no
shuffle until the final range repartition).

Scale shape: ``cluster_by_zorder`` is repartitionByRange on the z-key +
a within-partition sort — one shuffle, the same cost as any global
sort, after which both keyed columns are locality-bounded per output
file (proved quantitatively in tests/test_layout.py: per-partition key
spans shrink vs a single-column sort layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def int_bucket(col: Column, vmin: int, vmax: int, bits: int = 16) -> Column:
    """Map an integer-valued column from [vmin, vmax] onto
    [0, 2^bits): ``floor((v - vmin) * 2^bits / span)`` with the input
    clamped to the range first. Exact: the product stays far below
    2^52, so the double division is lossless in any engine."""
    if vmax < vmin:
        raise ValueError("vmax < vmin")
    span = vmax - vmin + 1
    if span * (1 << bits) >= (1 << 52):
        raise ValueError("bucket arithmetic would lose precision")
    v = F.greatest(F.lit(int(vmin)), F.least(F.lit(int(vmax)), col.cast("long")))
    scaled = (v - F.lit(int(vmin))) * F.lit(1 << bits)
    return F.floor(scaled / F.lit(span)).cast("long")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already-bucketed)
    column into one Morton key: bit i of column j lands at position
    ``i * len(cols) + j``. ``len(cols) * bits`` must fit a BIGINT."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 62:
        raise ValueError("interleaved key exceeds 62 bits")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zorder_oracle_sql(col_exprs: list[str], bits: int = 16) -> str:
    """The SAME unrolled shift/mask arithmetic as :func:`zorder_key`,
    as an ANSI SQL expression string — used by the gate oracle so the
    two implementations can never drift apart silently."""
    n = len(col_exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(col_exprs):
            # fully parenthesized: '+' binds tighter than '<<' in SQL,
            # so a bare chain of 'a << k + b << m' nests the shifts
            terms.append(f"(((({e}) >> {i}) & 1) << {i * n + j})")
    return " + ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    bucketed: list[Column],
    num_partitions: int,
    bits: int = 16,
    key_name: str = "_zkey",
) -> DataFrame:
    """Lay out ``df`` in Z-order over the given bucketed columns: one
    range shuffle on the Morton key + a within-partition sort. Write
    the result to parquet and every output file carries tight min/max
    ranges on EACH keyed column."""
    keyed = df.withColumn(key_name, zorder_key(bucketed, bits))
    return (
        keyed.repartitionByRange(num_partitions, F.col(key_name))
        .sortWithinPartitions(key_name)
    )


# ---------------------------------------------------------------------------
# Hilbert curve — better range locality than Z-order (consecutive keys
# are Manhattan-adjacent cells, so a 2D range query touches a contiguous
# key span with far fewer fragments)
# ---------------------------------------------------------------------------

def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out: str = "hkey",
) -> DataFrame:
    """Add the Hilbert-curve index of two bucketed coordinates (each in
    [0, 2^bits)) as ``out``.

    Implements the classic bit-level walk (the rot/reflect form of the
    Wikipedia ``xy2d``): per level ``s`` from the top bit down, the
    quadrant digit ``(3*rx) XOR ry`` is accumulated and the frame is
    reflected/swapped. CRITICAL plan shape: each level materializes
    x/y/d as columns in its OWN chained ``select`` — the per-level
    coordinates are referenced several times by the next level, so
    inlining them would grow the expression tree exponentially (~3^bits
    nodes); Catalyst's CollapseProject keeps multi-referenced non-cheap
    projections staged, leaving the plan linear in ``bits`` and still
    one narrow zero-shuffle map. The SQL oracle
    (:func:`hilbert_oracle_sql`) is GENERATED from the same per-level
    formulas as chained CTEs."""
    if 2 * bits > 62:
        raise ValueError("hilbert key exceeds 62 bits")
    n = 1 << bits
    cur = df.select(
        "*",
        F.col(x_col).cast("long").alias("_hx"),
        F.col(y_col).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = F.shiftright(F.col("_hx"), bits - 1 - i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), bits - 1 - i).bitwiseAND(F.lit(1))
        cur = cur.select(
            *[c for c in cur.columns if c not in ("_hx", "_hy", "_hd")],
            (F.col("_hd") + F.lit(s * s)
             * (rx * 3).bitwiseXOR(ry)).alias("_hd"),
            F.when(ry == 1, F.col("_hx"))
            .when(rx == 1, F.lit(n - 1) - F.col("_hy"))
            .otherwise(F.col("_hy")).alias("_hx"),
            F.when(ry == 1, F.col("_hy"))
            .when(rx == 1, F.lit(n - 1) - F.col("_hx"))
            .otherwise(F.col("_hx")).alias("_hy"),
        )
    return cur.withColumnRenamed("_hd", out).drop("_hx", "_hy")


def hilbert_oracle_sql(
    base_cte: str, x_expr: str, y_expr: str, bits: int,
    select_cols: str,
) -> str:
    """Chained-CTE SQL computing the SAME per-level Hilbert walk as
    :func:`with_hilbert_key` — generated from one set of formulas so
    the implementations cannot drift. ``base_cte`` is a CTE body
    (WITHOUT the leading ``WITH``) defining a relation ``h0src``; the
    result selects ``select_cols`` plus ``hkey`` from the final
    level."""
    n = 1 << bits
    parts = [
        f"{base_cte}, h0 AS (SELECT *, CAST(({x_expr}) AS BIGINT) AS hx,"
        f" CAST(({y_expr}) AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM h0src)"
    ]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        sh = bits - 1 - i
        rx, ry = f"((hx >> {sh}) & 1)", f"((hy >> {sh}) & 1)"
        parts.append(
            f"h{i + 1} AS (SELECT * EXCLUDE (hx, hy, hd),"
            f" hd + {s * s} * xor({rx} * 3, {ry}) AS hd,"
            f" CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1"
            f" THEN {n - 1} - hy ELSE hy END AS hx,"
            f" CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1"
            f" THEN {n - 1} - hx ELSE hx END AS hy"
            f" FROM h{i})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT {select_cols}, hd AS hkey FROM h{bits}"
    )


# ---------------------------------------------------------------------------
# Small-file compaction — the OPTIMIZE half of table maintenance (the
# layout keys above are the ZORDER half). At 10^12-document scale a
# streaming/delta-appending table accretes thousands of undersized
# files per partition; scans then pay per-file open/footer costs and
# lose row-group pruning. Compaction is metadata-plane planning (the
# file manifest is ~10^6 rows even at 100 TB) + one narrow data-plane
# rewrite of only the selected files.
# ---------------------------------------------------------------------------


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    size_col: str = "bytes",
    file_col: str = "path",
) -> DataFrame:
    """Deterministic rewrite plan over a file manifest: files already
    >= ``target_bytes`` are kept in place; undersized files are walked
    in (size DESC, path) order and a running pre-sum assigns job =
    floor(prefix_sum / target) — prefix binning with no driver loop.
    Guarantees (test-pinned): every group's input stays < 2x target,
    and the group count is <= ceil(total_small / target) — the
    near-optimal output-file count, which is what compaction is for.
    A group that ends up holding a single file is demoted to 'keep'
    (rewriting one file buys nothing).

    Returns (path, bytes, job, action): action in {'keep',
    'rewrite'}; job is NULL for kept files. The windows are global but
    run over the MANIFEST, not the data — at 100 TB that is millions
    of rows, a single-task metadata pass by design."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    f = files.select(
        F.col(file_col).cast("string").alias("path"),
        F.col(size_col).cast("long").alias("bytes"),
    )
    small = f.filter(F.col("bytes") < target_bytes)
    w = Window.orderBy(F.col("bytes").desc(), F.col("path"))
    jobbed = small.withColumn(
        "job",
        F.floor(
            (F.sum("bytes").over(w) - F.col("bytes"))
            / F.lit(target_bytes)
        ).cast("long"),
    )
    counts = jobbed.groupBy("job").agg(
        F.count(F.lit(1)).alias("_n")
    )
    planned = (
        jobbed.join(counts, "job")
        .withColumn(
            "action",
            F.when(F.col("_n") >= 2, F.lit("rewrite")).otherwise(
                F.lit("keep")
            ),
        )
        .withColumn(
            "job",
            F.when(F.col("_n") >= 2, F.col("job")).cast("long"),
        )
        .drop("_n")
    )
    kept = f.filter(F.col("bytes") >= target_bytes).select(
        "path", "bytes",
        F.lit(None).cast("long").alias("job"),
        F.lit("keep").alias("action"),
    )
    return planned.select("path", "bytes", "job", "action").unionByName(
        kept
    )


def compaction_oracle_sql(manifest_cte: str, target_bytes: int) -> str:
    """DuckDB restatement of :func:`plan_compaction` over a manifest
    CTE exposing (path, bytes) — the gate oracle."""
    return f"""
        WITH m AS ({manifest_cte}),
        small AS (
          SELECT path, bytes,
                 CAST(FLOOR((SUM(bytes) OVER (ORDER BY bytes DESC, path
                    ROWS UNBOUNDED PRECEDING) - bytes)
                    / {target_bytes}) AS BIGINT) AS job
          FROM m WHERE bytes < {target_bytes}),
        counts AS (SELECT job, COUNT(*) AS n FROM small GROUP BY job)
        SELECT s.path, s.bytes,
               CASE WHEN c.n >= 2 THEN s.job END AS job,
               CASE WHEN c.n >= 2 THEN 'rewrite' ELSE 'keep' END AS action
        FROM small s JOIN counts c USING (job)
        UNION ALL
        SELECT path, bytes, NULL, 'keep'
        FROM m WHERE bytes >= {target_bytes}
    """


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int,
) -> dict:
    """Execute a compaction plan over a parquet directory: kept files
    are hard-copied byte-for-byte (metadata plane); rewrite groups are
    read once, tagged by job via a broadcast manifest join on
    input_file_name(), repartitioned so each job lands in exactly one
    task, and written partitionBy(job) -> EXACTLY ONE file per job.
    Returns {n_input, n_kept, n_jobs}."""
    import os
    import shutil

    names = sorted(
        n for n in os.listdir(src_dir)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )
    manifest = [
        (os.path.join(src_dir, n), os.path.getsize(os.path.join(src_dir, n)))
        for n in names
    ]
    plan = plan_compaction(
        spark.createDataFrame(manifest, "path string, bytes long"),
        target_bytes,
    ).collect()  # manifest-sized
    os.makedirs(dst_dir, exist_ok=True)
    kept = [r["path"] for r in plan if r["action"] == "keep"]
    for p in kept:
        shutil.copyfile(
            p, os.path.join(dst_dir, "kept-" + os.path.basename(p))
        )
    rewrite = [(r["path"], r["job"]) for r in plan
               if r["action"] == "rewrite"]
    n_jobs = len({j for _, j in rewrite})
    if rewrite:
        src = spark.read.parquet(*[p for p, _ in rewrite])
        tags = spark.createDataFrame(
            [(os.path.basename(p), j) for p, j in rewrite],
            "_file string, _job long",
        )
        tagged = src.withColumn(
            "_file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        ).join(F.broadcast(tags), "_file").drop("_file")
        (
            tagged.repartition(max(n_jobs, 1), F.col("_job"))
            .write.partitionBy("_job")
            .mode("overwrite")
            .parquet(os.path.join(dst_dir, "compacted"))
        )
    return {"n_input": len(manifest), "n_kept": len(kept),
            "n_jobs": n_jobs}
