"""SPARQL 1.1 Update over DataFrame triple/quad stores (round 5).

The graph-store mutation half of the SPARQL surface (W3C SPARQL 1.1
Update): the query engine (``operators/bgp.py``) answers questions;
this module applies change requests and returns the NEW store as a
DataFrame — no in-place mutation, so the result drops into the same
atomic-write/manifest machinery every other table uses
(``plans/pipeline.py``).

Supported operations (separated by ``;`` in one request):

- ``INSERT DATA { t . t ... }`` / ``DELETE DATA { ... }`` — ground
  triples; a ``GRAPH <iri> { ... }`` wrapper targets one named graph
  of a quad store.
- ``DELETE { tpl } INSERT { tpl } WHERE { pattern }`` and the
  one-sided / ``DELETE WHERE { pattern }`` shorthands — the WHERE
  block evaluates through the full query engine (paths, OPTIONAL,
  FILTER, UNION, ... — ``bgp._eval_where``) against the store AS IT
  WAS BEFORE the operation, per spec §3.1.3: deletes and inserts of
  one operation both instantiate from the same binding set.
- ``CLEAR DEFAULT`` / ``CLEAR GRAPH <iri>`` / ``CLEAR ALL``;
- graph management on quad stores (spec §3.2.3-5): ``ADD`` (union
  source into destination), ``COPY`` (destination replaced by
  source), ``MOVE`` (copy then drop source) — each between
  ``DEFAULT`` and/or ``GRAPH <iri>``; source == destination is a
  no-op per spec.

Semantics notes, all pinned in tests:

- RDF graphs are SETS: the result is distinct on (src, predicate,
  dst[, g]); inserting an existing triple is a no-op, deleting a
  non-existent one is a no-op (never an error).
- Template rows with an unbound (NULL-from-OPTIONAL) variable drop —
  the same incomplete-triple rule CONSTRUCT applies.
- Operations apply LEFT TO RIGHT: op k+1 sees op k's writes.

Scale shape: deletes are hash anti-joins on the triple columns,
inserts are unions + one distinct; WHERE evaluation inherits the
query engine's plan shapes. Each operation's result is
``localCheckpoint``-ed (lazy) so a long ``;``-chain doesn't stack
plans. Reference parity: sigraph mutates its graph through Neo4j
upserts (src/app/backend — behavior, not code); this is the
standards-shaped equivalent over DataFrames.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import _eval_where, _is_var, _sparql_term

__all__ = ["update_sparql"]

_TRIPLE_COLS = ("src", "predicate", "dst")


def _split_ops(request: str) -> list[str]:
    """Split a request on top-level ';' (brace-aware)."""
    ops, depth, start = [], 0, 0
    for i, ch in enumerate(request):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        elif ch == ";" and depth == 0:
            ops.append(request[start:i])
            start = i + 1
    ops.append(request[start:])
    return [o for o in (op.strip() for op in ops) if o]


def _parse_data_block(txt: str, quad: bool):
    """Ground triples from a data block -> list of (s, p, o, g) with
    g=None for the default graph. GRAPH wrappers need a quad store."""
    rows = []

    def _take(body: str, g):
        for stmt in re.split(r"\.(?:\s+|\s*$)", body):
            terms = stmt.split()
            if not terms:
                continue
            if len(terms) != 3:
                raise ValueError(
                    f"data triple needs 3 terms, got {terms!r}")
            s, p, o = (_sparql_term(t) for t in terms)
            for t in (s, p, o):
                if _is_var(t):
                    raise ValueError(
                        f"INSERT/DELETE DATA must be ground, got {t!r}")
            rows.append((s, p, o, g))

    pos = 0
    while pos < len(txt):
        m = re.search(r"GRAPH\s+<?([^\s{>]+)>?\s*\{", txt[pos:],
                      re.IGNORECASE)
        if not m:
            _take(txt[pos:], None)
            break
        _take(txt[pos:pos + m.start()], None)
        if not quad:
            raise ValueError(
                "GRAPH data block over a 3-column store — no graphs")
        depth, i = 1, pos + m.end()
        while i < len(txt) and depth:
            depth += {"{": 1, "}": -1}.get(txt[i], 0)
            i += 1
        if depth:
            raise ValueError("unbalanced GRAPH data block")
        _take(txt[pos + m.end():i - 1], m.group(1))
        pos = i
    return rows


def _parse_templates(txt: str) -> list[tuple[str, str, str]]:
    if re.search(r"\bGRAPH\b", txt, re.IGNORECASE):
        raise ValueError(
            "GRAPH inside DELETE/INSERT templates is not supported")
    templates = []
    for stmt in re.split(r"\.(?:\s+|\s*$)", txt):
        terms = stmt.split()
        if not terms:
            continue
        if len(terms) != 3:
            raise ValueError(
                f"template triple needs 3 terms, got {terms!r}")
        templates.append(tuple(_sparql_term(t) for t in terms))
    return templates


def _instantiate(bindings: DataFrame, templates, quad: bool) -> DataFrame:
    """Template triples x binding rows -> distinct non-NULL triples
    (default graph for quad stores: templates are graph-less)."""
    out = None
    for s, p, o in templates:
        cols = []
        for term, alias in zip((s, p, o), _TRIPLE_COLS):
            if _is_var(term):
                v = term[1:]
                if v not in bindings.columns:
                    raise ValueError(
                        f"template var ?{v} is not bound in WHERE")
                cols.append(F.col(v).alias(alias))
            else:
                cols.append(F.lit(term).alias(alias))
        part = bindings.select(*cols)
        out = part if out is None else out.unionByName(part)
    out = out.filter(
        F.col("src").isNotNull() & F.col("predicate").isNotNull()
        & F.col("dst").isNotNull()
    )
    if quad:
        out = out.withColumn("g", F.lit(None).cast("string"))
    return out.distinct()


def _rows_df(store: DataFrame, rows, quad: bool) -> DataFrame:
    spark = store.sparkSession
    if quad:
        return spark.createDataFrame(
            rows, "src string, predicate string, dst string, g string")
    if any(g is not None for *_t, g in rows):
        raise ValueError("GRAPH data block over a 3-column store")
    return spark.createDataFrame(
        [r[:3] for r in rows], "src string, predicate string, dst string")


def _anti_delete(store: DataFrame, rel: DataFrame, cols,
                 quad: bool) -> DataFrame:
    """Anti-join delete on the triple/quad columns. A quad store's
    default graph is ``g = NULL`` and plain ``=`` never matches NULL,
    so ``g`` compares null-safely (``eqNullSafe``) — otherwise deletes
    targeting the default graph silently keep their rows."""
    if not quad:
        return store.join(rel, cols, "left_anti")
    left, right = store.alias("_l"), rel.alias("_r")
    cond = None
    for c in cols:
        lc, rc = F.col(f"_l.{c}"), F.col(f"_r.{c}")
        eq = lc.eqNullSafe(rc) if c == "g" else lc == rc
        cond = eq if cond is None else cond & eq
    return left.join(right, cond, "left_anti")


def _apply_one(store: DataFrame, op: str, quad: bool,
               max_depth: int) -> DataFrame:
    cols = list(store.columns)

    m = re.match(r"(INSERT|DELETE)\s+DATA\s*\{(.*)\}\s*$", op,
                 re.IGNORECASE | re.DOTALL)
    if m:
        rel = _rows_df(store, _parse_data_block(m.group(2), quad), quad)
        if m.group(1).upper() == "INSERT":
            return store.unionByName(rel).distinct()
        return _anti_delete(store, rel, cols, quad)

    m = re.match(r"CLEAR\s+(DEFAULT|ALL|GRAPH\s+<?([^\s>]+)>?)\s*$", op,
                 re.IGNORECASE)
    if m:
        what = m.group(1).upper()
        if what == "ALL":
            return store.limit(0)
        if not quad:
            if what == "DEFAULT":
                return store.limit(0)
            raise ValueError("CLEAR GRAPH over a 3-column store")
        if what == "DEFAULT":
            return store.filter(F.col("g").isNotNull())
        return store.filter(
            F.col("g").isNull() | (F.col("g") != m.group(2)))

    m = re.match(
        r"(ADD|COPY|MOVE)\s+(DEFAULT|GRAPH\s+<?[^\s>]+>?)\s+TO\s+"
        r"(DEFAULT|GRAPH\s+<?[^\s>]+>?)\s*$",
        op, re.IGNORECASE,
    )
    if m:
        if not quad:
            raise ValueError(f"{m.group(1).upper()} needs a quad store")

        def _gname(tok: str):
            if tok.upper() == "DEFAULT":
                return None
            return re.match(r"GRAPH\s+<?([^\s>]+)>?", tok,
                            re.IGNORECASE).group(1)

        verb = m.group(1).upper()
        src_g, dst_g = _gname(m.group(2)), _gname(m.group(3))
        if src_g == dst_g:
            return store  # spec: same-graph ADD/COPY/MOVE is a no-op

        def _in(g):
            return (F.col("g").isNull() if g is None
                    else F.col("g") == g)

        src_rows = store.filter(_in(src_g)).withColumn(
            "g", F.lit(dst_g).cast("string"))
        if verb == "ADD":
            return store.unionByName(src_rows).distinct()
        rest = store.filter(~_in(dst_g) | F.col("g").isNull()
                            if dst_g is not None
                            else F.col("g").isNotNull())
        if verb == "MOVE":
            rest = rest.filter(~_in(src_g) | F.col("g").isNull()
                               if src_g is not None
                               else F.col("g").isNotNull())
        return rest.unionByName(src_rows).distinct()

    m = re.match(r"DELETE\s+WHERE\s*\{(.*)\}\s*$", op,
                 re.IGNORECASE | re.DOTALL)
    if m:
        del_txt = where_txt = m.group(1)
        ins_txt = None
    else:
        m = re.match(
            r"(?:DELETE\s*\{(?P<del>.*?)\}\s*)?"
            r"(?:INSERT\s*\{(?P<ins>.*?)\}\s*)?"
            r"WHERE\s*\{(?P<where>.*)\}\s*$",
            op, re.IGNORECASE | re.DOTALL,
        )
        if not m or (m.group("del") is None and m.group("ins") is None):
            raise ValueError(f"unsupported update operation: {op[:80]!r}")
        del_txt, ins_txt, where_txt = (m.group("del"), m.group("ins"),
                                       m.group("where"))

    bindings = _eval_where(store, where_txt, max_depth)
    out = store
    if del_txt is not None:
        del_rel = _instantiate(bindings, _parse_templates(del_txt), quad)
        out = _anti_delete(out, del_rel, cols, quad)
    if ins_txt is not None:
        ins_rel = _instantiate(bindings, _parse_templates(ins_txt), quad)
        out = out.unionByName(ins_rel)
    return out.distinct()


def update_sparql(store: DataFrame, request: str,
                  max_depth: int = 20) -> DataFrame:
    """Apply a SPARQL 1.1 Update request to a triple store ``(src,
    predicate, dst)`` or quad store ``(src, predicate, dst, g)`` and
    return the new store (same columns, distinct rows)."""
    quad = "g" in store.columns
    out = store.select(*(_TRIPLE_COLS + ("g",) if quad
                         else _TRIPLE_COLS)).distinct()
    ops = _split_ops(request)
    if not ops:
        raise ValueError("empty update request")
    for i, op in enumerate(ops):
        out = _apply_one(out, op, quad, max_depth)
        if i < len(ops) - 1:
            # keep a ;-chain from stacking one giant plan
            out = out.localCheckpoint(eager=False)
    return out
