"""SPARQL-style basic graph pattern (BGP) matching over the KG edge table.

The reference answers fixed multi-hop provenance questions with one
hand-written Cypher statement per endpoint (``MATCH (a)-[:LAUNCH]->(b)...``
shapes in src/db/query/*.py, surfaced by app/backend routes). This operator
generalizes that family: any conjunctive triple pattern over the
``(src, predicate, dst)`` table compiles to a DataFrame, so a single
operator covers the ad-hoc KG query surface instead of one endpoint per
shape.

Pattern language: each pattern is a ``(subject, predicate, object)`` triple
of terms; a term starting with ``?`` is a variable, anything else is a
constant. The result has one column per variable (name without the ``?``).
``optional`` patterns attach with left-join (SPARQL OPTIONAL) semantics;
``where`` adds post-filters (SQL strings or Columns) over variable columns.

100 TB design: each triple pattern is a *filtered scan* of the edge table —
constant terms become pushed-down parquet/Iceberg predicates, so a
constant-predicate pattern partition-prunes on the predicate/bucket layout
(plans/iceberg_sql.py) and never reads the rest of the table. Patterns then
hash-join on their shared variable columns. Join order is chosen greedily:
start at the most-bound pattern (most constants), then repeatedly attach
the pattern sharing the most already-bound variables — a disconnected BGP
(no shared variable) is the only case that degrades to a Cartesian product,
and that is inherent to the query, not the plan. The greedy order is just
the *initial* tree; AQE re-plans joins with runtime statistics and handles
skewed variable bindings (a hub entity bound to ``?x``) with skew-join
splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]

_POSITIONS = ("src", "predicate", "dst")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _compile_pattern(edges: DataFrame, pattern: Pattern) -> tuple[DataFrame, set[str]]:
    """One triple pattern -> (DataFrame with variable-named columns, vars).

    Constants become filters on the scan (pushed down by Catalyst); a
    variable repeated inside one pattern (e.g. ``(?x, LOOP, ?x)``) becomes
    an intra-pattern equality filter.
    """
    df = edges.select(*_POSITIONS)
    bound: dict[str, str] = {}
    out_cols: list[Column] = []
    for col, term in zip(_POSITIONS, pattern):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in pattern {pattern!r}")
            if name in bound:
                df = df.filter(F.col(col) == F.col(bound[name]))
            else:
                bound[name] = col
                out_cols.append(F.col(col).alias(name))
        else:
            df = df.filter(F.col(col) == F.lit(term))
    if not out_cols:
        # fully-constant pattern: existence test; keep a marker column so
        # the join below degenerates to a semi-ish cross with 0/1 rows.
        return df.select(F.lit(1).alias("_const")).limit(1), set()
    return df.select(*out_cols), set(bound)


def _order_patterns(patterns: Sequence[Pattern]) -> list[int]:
    """Greedy bound-ness order: most constants first, then max shared
    variables with the already-chosen set (ties: more constants, then
    original index — fully deterministic)."""

    def n_const(p: Pattern) -> int:
        return sum(0 if _is_var(t) else 1 for t in p)

    def pvars(p: Pattern) -> set[str]:
        return {t[1:] for t in p if _is_var(t)}

    remaining = list(range(len(patterns)))
    order: list[int] = []
    bound: set[str] = set()
    while remaining:
        if not order:
            pick = max(remaining, key=lambda i: (n_const(patterns[i]), -i))
        else:
            pick = max(
                remaining,
                key=lambda i: (
                    len(pvars(patterns[i]) & bound),
                    n_const(patterns[i]),
                    -i,
                ),
            )
        order.append(pick)
        bound |= pvars(patterns[pick])
        remaining.remove(pick)
    return order


def match_bgp(
    edges: DataFrame,
    patterns: Sequence[Pattern],
    *,
    optional: Sequence[Pattern] = (),
    where: Sequence[Column | str] = (),
    distinct: bool = False,
) -> DataFrame:
    """Match a conjunctive triple pattern against an edge table.

    ``edges`` needs columns ``src, predicate, dst`` (extra columns are
    pruned). Returns one column per distinct variable across ``patterns``
    and ``optional``; optional-only variables are NULL where the optional
    pattern found no match (SPARQL OPTIONAL).
    """
    if not patterns:
        raise ValueError("match_bgp needs at least one required pattern")
    compiled = [_compile_pattern(edges, p) for p in patterns]
    order = _order_patterns(patterns)

    out, bound = compiled[order[0]]
    for idx in order[1:]:
        df, pv = compiled[idx]
        shared = sorted(bound & pv)
        if shared:
            out = out.join(df, on=shared, how="inner")
        elif not pv:
            # constant-only existence pattern: empty scan -> empty result
            out = out.crossJoin(df).drop("_const")
        else:
            # disconnected BGP component — inherent Cartesian product
            out = out.crossJoin(df)
        bound |= pv

    for pat in optional:
        df, pv = _compile_pattern(edges, pat)
        shared = sorted(bound & pv)
        if not shared:
            raise ValueError(
                f"optional pattern {pat!r} shares no variable with the "
                "required patterns — unbounded OPTIONAL is not supported"
            )
        # SPARQL OPTIONAL keeps at most the matching bindings; collapse
        # duplicate optional rows only for exact duplicates (left join
        # multiplies rows per match, which is OPTIONAL semantics too).
        out = out.join(df, on=shared, how="left")
        bound |= pv

    for cond in where:
        out = out.filter(F.expr(cond) if isinstance(cond, str) else cond)
    return out.distinct() if distinct else out
