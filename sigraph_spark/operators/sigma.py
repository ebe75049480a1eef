"""Sigma-rule subset compiler: detection trees -> Catalyst Column predicates.

The reference compiles Sigma YAML through sigma-cli's sysmon pipeline into
OpenSearch Lucene DSL and pages results (``/root/reference/src/rule/
session.py:30-114``, ``src/db/db_session.py:233-345``). We compile the same
detection semantics straight to ``Column`` expressions, so a rule query is
one pushdown-friendly ``docs.filter(...)`` — the reference's 1024-clause
split and search_after pagination machinery disappears (Catalyst handles
arbitrarily wide boolean trees; documented dropped limit, SURVEY.md C5).

Supported subset (what sigraph's fixtures exercise):
* detection items: field: value (exact), field|contains, field|startswith,
  field|endswith, field|re, lists of values (OR), null;
* value-transform modifiers chained before a match modifier, pySigma
  style: ``|base64`` (value matched in its base64 encoding),
  ``|base64offset|contains`` (the three alignment-shifted encodings a
  substring can take inside a base64 stream — the public sigmac/pySigma
  start/end offset table, self-verified in tests against real encodes),
  ``|windash`` (every '-' flag site expanded over the five Sigma-spec
  dash variants ``- / – — ―``; >3 sites raises — loud, not silent), and
  ``|cidr`` (IPv4 dotted-quad membership compiled to an integer
  mask-compare; IPv6 raises). Unknown modifiers now raise at compile
  time instead of silently exact-matching;
* field-presence and field-to-field items (pySigma semantics):
  ``field|exists: true/false`` compiles to ``isNotNull``/``isNull``
  (combining it with any other modifier raises), and
  ``field|fieldref: OtherField`` compares the field to ANOTHER FIELD of
  the same event instead of a literal — plain equality or one of
  ``contains``/``startswith``/``endswith`` (value transforms raise:
  they re-encode literals, which a column reference is not);
* value wildcards ``*``/``?`` compile to LIKE patterns;
* condition grammar: ``and / or / not / ( )`` over selection names plus
  ``1 of them`` / ``all of them`` / ``1 of sel*`` / ``all of sel*``;
* field-name prefixing (reference rewrites ``X:`` -> ``raw_data.Metadata.X``,
  rule/session.py:110-114) via the ``field_prefix`` argument.

Rule parse/compile happens on the driver (plain Python over a dict already
parsed from YAML); executors only ever see the compiled Column tree.
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"\(|\)|[^\s()]+")


def _field_col(field: str, field_prefix: str | None) -> Column:
    name = f"{field_prefix}.{field}" if field_prefix else field
    return F.col(name)


def _like_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")


_TRANSFORM_MODS = (
    "base64", "base64offset", "windash",
    # value re-encodings (pySigma semantics): produce BYTES, so they
    # are only meaningful ahead of a base64/base64offset transform
    "utf16", "utf16le", "utf16be", "wide",
)
_ENC_CODECS = {"utf16le": "utf-16le", "wide": "utf-16le",
               "utf16be": "utf-16be", "utf16": "utf-16le"}  # utf16 adds BOM
_CMP_MODS = ("gt", "gte", "lt", "lte")
_MATCH_MODS = ("contains", "startswith", "endswith", "re", "cidr") + _CMP_MODS
_WINDASH_CHARS = "-/–—―"  # - / en-dash em-dash horizontal bar
# IPv4 dotted quad with octets pinned to 0-255 (a looser \d{1,3} would
# let 300.0.0.1 alias into another network after masking)
_IPV4_RE = r"^((25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(25[0-5]|2[0-4]\d|1?\d?\d)$"


def _windash_variants(s: str) -> list[str]:
    """All Sigma-spec dash-variant expansions of the flag sites.

    Every character in ``_WINDASH_CHARS`` is a site (as pySigma does):
    a rule authored with slash-prefixed flags ('/p:') or a unicode dash
    must expand to all variants too — scanning only '-' would silently
    compile such rules to the literal and miss detections."""
    import itertools

    sites = [i for i, ch in enumerate(s) if ch in _WINDASH_CHARS]
    if not sites:
        return [s]
    if len(sites) > 3:
        raise ValueError(
            f"windash value {s!r} has {len(sites)} dash sites; the "
            f"5-variant expansion would blow up — max 3"
        )
    out = []
    for combo in itertools.product(_WINDASH_CHARS, repeat=len(sites)):
        t = list(s)
        for i, ch in zip(sites, combo):
            t[i] = ch
        out.append("".join(t))
    return out


def _base64offset_variants(s: str) -> list[str]:
    """The three alignment-shifted base64 encodings a byte string can
    take inside an encoded stream (substring at plaintext offset 0/1/2
    mod 3): pad with i lead bytes, encode, strip the lead chars that mix
    with the pad and the tail chars that mix with whatever follows —
    the public sigmac/pySigma offset table, self-verified in tests.
    Accepts bytes (from a preceding utf16/wide encoding transform) or
    str (encoded utf-8)."""
    import base64

    b = s if isinstance(s, bytes) else s.encode("utf-8")
    start = (0, 2, 3)
    end = (None, -3, -2)
    out = []
    for i in range(3):
        enc = base64.b64encode(b" " * i + b).decode("ascii")
        out.append(enc[start[i]:end[(len(b) + i) % 3]])
    return out


def _cidr_predicate(col: Column, value) -> Column:
    """IPv4 CIDR membership as a mask-compare on the dotted quad."""
    import ipaddress

    sval = str(value)
    if ":" in sval:
        raise ValueError(f"cidr modifier: IPv6 ({sval!r}) is not supported")
    net = ipaddress.ip_network(sval, strict=False)
    prefix = net.prefixlen
    mask = ((1 << 32) - (1 << (32 - prefix))) if prefix else 0
    want = int(net.network_address) & mask
    octs = F.split(col, r"\.")
    ipint = None
    for i in range(4):
        part = F.get(octs, i).cast("long") * F.lit(1 << (8 * (3 - i)))
        ipint = part if ipint is None else ipint + part
    # the rlike guard gates the ANSI casts (when() branches are lazy)
    return F.when(
        col.rlike(_IPV4_RE), ipint.bitwiseAND(F.lit(mask)) == F.lit(want)
    ).otherwise(F.lit(False))


def _match_predicate(col: Column, sval: str, matcher: str | None) -> Column:
    """Post-transform scalar match (no wildcard interpretation)."""
    if matcher == "contains":
        return col.contains(sval)
    if matcher == "startswith":
        return col.startswith(sval)
    if matcher == "endswith":
        return col.endswith(sval)
    return col == F.lit(sval)


def _value_predicate(col: Column, value, modifiers: list[str]) -> Column:
    """One (field, modifier chain, scalar value) -> Column predicate."""
    if value is None:
        return col.isNull()
    for m in modifiers:
        if m not in _TRANSFORM_MODS and m not in _MATCH_MODS:
            raise ValueError(f"unsupported Sigma value modifier {m!r}")
    transforms = [m for m in modifiers if m in _TRANSFORM_MODS]
    matchers = [m for m in modifiers if m in _MATCH_MODS]
    if len(matchers) > 1:
        raise ValueError(f"conflicting match modifiers {matchers}")
    matcher = matchers[0] if matchers else None
    sval = str(value)

    if matcher in _CMP_MODS:
        if transforms:
            raise ValueError(
                f"{matcher} cannot combine with value transforms"
            )
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            try:
                fval = float(sval)
            except ValueError:
                raise ValueError(
                    f"{matcher} modifier requires a numeric value, got "
                    f"{value!r}"
                ) from None
        else:
            fval = float(value)
        # try_cast keeps ANSI mode quiet: non-numeric field values
        # become NULL, and NULL comparisons filter as non-matches
        c = col.try_cast("double")
        return {
            "gt": c > F.lit(fval), "gte": c >= F.lit(fval),
            "lt": c < F.lit(fval), "lte": c <= F.lit(fval),
        }[matcher]

    if matcher == "cidr":
        if transforms:
            raise ValueError("cidr cannot combine with value transforms")
        return _cidr_predicate(col, value)
    if matcher == "re":
        if transforms:
            raise ValueError("re cannot combine with value transforms")
        return col.rlike(sval)

    if transforms:
        variants = [sval]
        for t in transforms:
            if t == "windash":
                if any(isinstance(v, bytes) for v in variants):
                    raise ValueError(
                        "windash cannot follow an encoding modifier"
                    )
                variants = [w for v in variants for w in _windash_variants(v)]
            elif t in _ENC_CODECS:
                if any(isinstance(v, bytes) for v in variants):
                    raise ValueError(
                        f"{t} cannot follow another encoding modifier"
                    )
                bom = b"\xff\xfe" if t == "utf16" else b""
                variants = [
                    bom + v.encode(_ENC_CODECS[t]) for v in variants
                ]
            elif t == "base64":
                import base64 as _b64

                variants = [
                    _b64.b64encode(
                        v if isinstance(v, bytes) else v.encode("utf-8")
                    ).decode("ascii")
                    for v in variants
                ]
            else:  # base64offset
                if matcher != "contains":
                    raise ValueError(
                        "base64offset requires a trailing |contains"
                    )
                variants = [
                    w for v in variants for w in _base64offset_variants(v)
                ]
        if any(isinstance(v, bytes) for v in variants):
            raise ValueError(
                "utf16/utf16le/utf16be/wide produce bytes and must be "
                "followed by base64 or base64offset"
            )
        out = None
        for v in variants:
            p = _match_predicate(col, v, matcher)
            out = p if out is None else (out | p)
        return out

    if matcher is not None:
        return _match_predicate(col, sval, matcher)
    if isinstance(value, str) and ("*" in value or "?" in value):
        pat = _like_escape(value).replace("*", "%").replace("?", "_")
        return col.like(pat)
    if isinstance(value, bool):
        return col.cast("boolean") == value
    if isinstance(value, (int, float)):
        return (col == F.lit(value)) | (col == F.lit(sval))
    return col == F.lit(sval)


def _item_predicate(key: str, value, field_prefix: str | None) -> Column:
    """One detection-map entry: ``Field|mod1|mod2...: value-or-list``;
    a trailing ``|all`` ANDs a value list instead of ORing it."""
    parts = key.split("|")
    field, modifiers = parts[0], parts[1:]
    col = _field_col(field, field_prefix)
    if "exists" in modifiers:
        if modifiers != ["exists"]:
            raise ValueError(
                f"exists cannot combine with other modifiers: {modifiers}"
            )
        if not isinstance(value, bool):
            raise ValueError(
                f"exists modifier requires a boolean value, got {value!r}"
            )
        return col.isNotNull() if value else col.isNull()
    mode_all = "all" in modifiers
    modifiers = [m for m in modifiers if m != "all"]
    if "fieldref" in modifiers:
        return _fieldref_predicate(
            col, value, [m for m in modifiers if m != "fieldref"],
            field_prefix, mode_all,
        )
    values = value if isinstance(value, list) else [value]
    preds = [_value_predicate(col, v, modifiers) for v in values]
    out = preds[0]
    for p in preds[1:]:
        out = (out & p) if mode_all else (out | p)
    return out


def _fieldref_predicate(
    col: Column, value, rest: list[str],
    field_prefix: str | None, mode_all: bool,
) -> Column:
    """``field|fieldref[|match]: OtherField`` — compare to another field
    of the same event. Either-side NULL compares as a non-match (Catalyst
    NULL comparison filters the row), matching pySigma's behavior."""
    bad = [m for m in rest if m not in ("contains", "startswith", "endswith")]
    if bad:
        raise ValueError(
            f"fieldref combines only with contains/startswith/endswith, "
            f"got {bad}"
        )
    if len(rest) > 1:
        raise ValueError(f"conflicting match modifiers {rest}")
    matcher = rest[0] if rest else None
    refs = value if isinstance(value, list) else [value]
    preds = []
    for r in refs:
        if not isinstance(r, str):
            raise ValueError(
                f"fieldref modifier requires a field-name string, got {r!r}"
            )
        ref = _field_col(r, field_prefix)
        if matcher == "contains":
            preds.append(col.contains(ref))
        elif matcher == "startswith":
            preds.append(col.startswith(ref))
        elif matcher == "endswith":
            preds.append(col.endswith(ref))
        else:
            preds.append(col == ref)
    out = preds[0]
    for p in preds[1:]:
        out = (out & p) if mode_all else (out | p)
    return out


def _selection_predicate(sel, field_prefix: str | None) -> Column:
    """A selection is a map (AND of items) or a list of maps/strings (OR)."""
    if isinstance(sel, dict):
        preds = [_item_predicate(k, v, field_prefix) for k, v in sel.items()]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if isinstance(sel, list):
        preds = [_selection_predicate(s, field_prefix) for s in sel]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    raise ValueError(f"unsupported selection shape: {type(sel)}")


def _compile_condition(
    condition: str, selections: dict[str, Column]
) -> Column:
    """Recursive-descent parse of the Sigma condition grammar."""
    tokens = _TOKEN_RE.findall(condition)
    pos = 0

    def peek() -> str | None:
        return tokens[pos] if pos < len(tokens) else None

    def take() -> str:
        nonlocal pos
        tok = tokens[pos]
        pos += 1
        return tok

    def parse_or() -> Column:
        left = parse_and()
        while peek() == "or":
            take()
            left = left | parse_and()
        return left

    def parse_and() -> Column:
        left = parse_not()
        while peek() == "and":
            take()
            left = left & parse_not()
        return left

    def parse_not() -> Column:
        if peek() == "not":
            take()
            return ~parse_not()
        return parse_atom()

    def parse_atom() -> Column:
        tok = take()
        if tok == "(":
            inner = parse_or()
            assert take() == ")", "unbalanced parens in condition"
            return inner
        if tok in ("1", "all") and peek() == "of":
            take()  # of
            pat = take()
            names = (
                list(selections)
                if pat == "them"
                else [n for n in selections if fnmatch.fnmatch(n, pat)]
            )
            if not names:
                raise ValueError(f"'of {pat}' matches no selection")
            preds = [selections[n] for n in sorted(names)]
            out = preds[0]
            for p in preds[1:]:
                out = (out & p) if tok == "all" else (out | p)
            return out
        if tok not in selections:
            raise ValueError(f"unknown selection '{tok}' in condition")
        return selections[tok]

    result = parse_or()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in condition: {tokens[pos:]}")
    return result


def compile_rule(rule: dict, field_prefix: str | None = None) -> Column:
    """Compile one parsed Sigma rule dict -> Column predicate.

    ``rule['detection']`` holds named selections + ``condition``. The
    logsource category constraint (reference adds ``raw_data.EventName ==
    category``, db_session.py:258-270) is the caller's concern — pass it as
    an extra filter so this stays a pure detection compiler.
    """
    detection = rule["detection"]
    condition = detection.get("condition", " or ".join(
        k for k in detection if k != "condition"
    ))
    selections = {
        name: _selection_predicate(sel, field_prefix)
        for name, sel in detection.items()
        if name != "condition"
    }
    return _compile_condition(condition, selections)


def apply_rules(
    docs: DataFrame,
    rules: list[dict],
    field_prefix: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Evaluate many rules in ONE pass: each rule becomes a boolean column;
    explode the hits into (doc_id, rule_id) match rows. One scan however
    many rules — the batch analog of the reference's per-rule queries."""
    hit_cols = [
        F.when(compile_rule(r, field_prefix), F.lit(r.get("id", f"rule-{i}")))
        for i, r in enumerate(rules)
    ]
    return (
        docs.select(F.col(id_col), F.array(*hit_cols).alias("_hits"))
        .select(id_col, F.explode(F.filter(F.col("_hits"), lambda x: x.isNotNull())).alias("rule_id"))
    )


# ---------------------------------------------------------------------------
# Sysmon logsource pipeline
# ---------------------------------------------------------------------------
# The reference compiles rules through the open-source pySigma sysmon
# pipeline before the Lucene backend (``/root/reference/src/rule/
# session.py:9,27-28``): a rule whose logsource names a sysmon taxonomy
# category gains an EventID membership predicate and its generic field
# names map onto Sysmon's schema. Without this layer a process_creation
# rule would silently match ANY event whose fields happen to collide.
# The tables below restate that public mapping (Microsoft Sysinternals
# Sysmon event taxonomy + Sigma's generic network/dns field names) as
# driver-side data; compilation stays pure-Column.

SYSMON_CATEGORY_EVENT_IDS: dict[str, tuple[int, ...]] = {
    "process_creation": (1,),
    "file_change": (2,),
    "network_connection": (3,),
    "sysmon_status": (4, 16),
    "process_termination": (5,),
    "driver_load": (6,),
    "image_load": (7,),
    "create_remote_thread": (8,),
    "raw_access_thread": (9,),
    "process_access": (10,),
    "file_event": (11,),
    "registry_add": (12,),
    "registry_delete": (12,),
    "registry_set": (13,),
    "registry_rename": (14,),
    "registry_event": (12, 13, 14),
    "create_stream_hash": (15,),
    "pipe_created": (17, 18),
    "wmi_event": (19, 20, 21),
    "dns_query": (22,),
    "file_delete": (23, 26),
    # Sigma's documented taxonomy name for Sysmon EID 24 is
    # clipboard_change; the capture spelling is kept as an alias
    "clipboard_change": (24,),
    "clipboard_capture": (24,),
    "process_tampering": (25,),
    "file_block_executable": (27,),
    "file_block_shredding": (28,),
    "file_executable_detected": (29,),
    "sysmon_error": (255,),
}

# generic-taxonomy -> Sysmon field renames per category; Sysmon-native
# names (Image, CommandLine, TargetObject, ...) pass through untouched
SYSMON_FIELD_RENAMES: dict[str, dict[str, str]] = {
    "network_connection": {
        "src_ip": "SourceIp",
        "src_port": "SourcePort",
        "dst_ip": "DestinationIp",
        "dst_port": "DestinationPort",
        "dst_host": "DestinationHostname",
    },
    "dns_query": {
        "query": "QueryName",
        "answer": "QueryResults",
    },
}


def _rename_selection(sel, renames: dict[str, str]):
    """Apply field renames inside one selection (maps rename the key part
    before any ``|modifier``; lists recurse)."""
    if isinstance(sel, dict):
        out = {}
        for key, value in sel.items():
            field, sep, mods = key.partition("|")
            out[renames.get(field, field) + sep + mods] = value
        return out
    if isinstance(sel, list):
        return [
            _rename_selection(s, renames) if isinstance(s, (dict, list)) else s
            for s in sel
        ]
    return sel


def compile_sysmon_rule(
    rule: dict,
    field_prefix: str | None = None,
    event_id_field: str = "EventID",
) -> Column:
    """Compile one rule THROUGH the sysmon logsource pipeline:

    1. if ``rule['logsource']['category']`` is a sysmon taxonomy category,
       rename its generic fields (SYSMON_FIELD_RENAMES) before detection
       compilation, and
    2. AND an ``EventID IN (...)`` predicate (SYSMON_CATEGORY_EVENT_IDS)
       onto the compiled detection — the reference's
       ``sysmon_pipeline()`` + backend composition as one Column.

    Categories outside the taxonomy compile as plain detection (no
    EventID constraint) — same pass-through the pipeline applies. The
    EventID field honors ``field_prefix`` like every other field
    (reference prefixes the whole query, rule/session.py:110-114)."""
    category = (rule.get("logsource") or {}).get("category")
    detection = rule["detection"]
    renames = SYSMON_FIELD_RENAMES.get(category or "", {})
    if renames:
        detection = {
            name: (sel if name == "condition" else _rename_selection(sel, renames))
            for name, sel in detection.items()
        }
    base = compile_rule({**rule, "detection": detection}, field_prefix)
    event_ids = SYSMON_CATEGORY_EVENT_IDS.get(category or "")
    if not event_ids:
        return base
    ev_col = _field_col(event_id_field, field_prefix)
    return ev_col.isin(*[F.lit(i) for i in event_ids]) & base


def apply_sysmon_rules(
    docs: DataFrame,
    rules: list[dict],
    field_prefix: str | None = None,
    id_col: str = "doc_id",
    event_id_field: str = "EventID",
) -> DataFrame:
    """One-pass multi-rule evaluation through the sysmon pipeline (the
    sysmon twin of :func:`apply_rules`): (id, rule_id) hit rows, one scan
    for all rules."""
    hit_cols = [
        F.when(
            compile_sysmon_rule(r, field_prefix, event_id_field),
            F.lit(r.get("id", f"rule-{i}")),
        )
        for i, r in enumerate(rules)
    ]
    return (
        docs.select(F.col(id_col), F.array(*hit_cols).alias("_hits"))
        .select(
            id_col,
            F.explode(F.filter(F.col("_hits"), lambda x: x.isNotNull())).alias(
                "rule_id"
            ),
        )
    )


_TIMESPAN_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _timespan_seconds(spec: str) -> int:
    import re as _re

    m = _re.fullmatch(r"(\d+)([smhd])", str(spec).strip())
    if not m:
        raise ValueError(f"bad correlation timespan {spec!r}")
    return int(m.group(1)) * _TIMESPAN_UNITS[m.group(2)]


def _corr_condition(cond: dict) -> Column:
    ops = {"gte": lambda c, v: c >= v, "gt": lambda c, v: c > v,
           "lte": lambda c, v: c <= v, "lt": lambda c, v: c < v,
           "eq": lambda c, v: c == v}
    if not isinstance(cond, dict) or len(cond) != 1:
        raise ValueError(f"correlation condition must be one op: {cond!r}")
    (op, val), = cond.items()
    if op not in ops:
        raise ValueError(f"unsupported correlation condition op {op!r}")
    return ops[op](F.col("agg_value"), int(val))


def apply_correlation(
    events: DataFrame,
    correlation: dict,
    rules: dict,
    ts_col: str = "ts",
    field_prefix: str | None = None,
) -> DataFrame:
    """Sigma META-rule evaluation (the v2 `correlation` rule type —
    sigma-spec Correlation Rules): base rules name event predicates;
    the correlation aggregates their matches per ``group-by`` within
    ``timespan`` windows and alerts where ``condition`` holds.

    Supported types (each a TUMBLING ``timespan`` bucket — epoch DIV
    span, the deterministic bucketing the streaming backends use;
    sliding semantics are a caller policy via overlapping runs):

    - ``event_count``: matching-event count per group+bucket;
    - ``value_count``: DISTINCT values of ``field`` per group+bucket
      (the spray/bruteforce detector — many distinct targets);
    - ``temporal``: how many DISTINCT base rules fired per
      group+bucket, compared against the condition (all-of-N when
      ``gte: N`` — ordering inside the bucket is out of scope for the
      spec's plain temporal type).

    -> ``(rule_id, <group-by cols...>, window_start, agg_value)``.
    Unsupported types/conditions raise loudly (the module contract).
    Scale shape: one filtered union of the base predicates (evaluated
    in the same scan), one groupBy on (group, bucket) with map-side
    partials."""
    ctype = correlation.get("type")
    names = correlation.get("rules") or []
    group_by = correlation.get("group-by") or []
    span = _timespan_seconds(correlation.get("timespan", "1h"))
    cond = _corr_condition(correlation.get("condition", {}))
    rid = correlation.get("id", "correlation")
    if ctype not in ("event_count", "value_count", "temporal"):
        raise ValueError(f"unsupported correlation type {ctype!r}")
    if not names:
        raise ValueError("correlation needs base rules")
    missing = [n for n in names if n not in rules]
    if missing:
        raise ValueError(f"unknown base rules: {missing}")
    if ctype == "temporal" and len(names) < 2:
        raise ValueError("temporal correlation needs >= 2 base rules")

    matched = None
    for n in names:
        part = events.filter(
            compile_rule(rules[n], field_prefix=field_prefix)
        ).withColumn("_rule", F.lit(n))
        matched = part if matched is None else matched.unionByName(part)

    # NTZ timestamps cannot cast to long directly; route through the
    # session-UTC timestamp type (sessions pin UTC — session.py)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    # floor-aligned bucket (pmod, not %): Spark's % truncates toward
    # zero, so pre-1970 (negative-epoch) timestamps would land one
    # bucket above the streaming twin's F.window floor alignment
    bucket = epoch - F.pmod(epoch, F.lit(span))
    g = matched.withColumn("window_start",
                           F.timestamp_seconds(bucket))
    keys = [*group_by, "window_start"]
    if ctype == "event_count":
        agg = g.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("agg_value"))
    elif ctype == "value_count":
        fld = correlation.get("field")
        if not fld:
            raise ValueError("value_count needs a field")
        agg = g.groupBy(*keys).agg(
            F.count_distinct(F.col(fld)).cast("long").alias("agg_value"))
    else:
        agg = g.groupBy(*keys).agg(
            F.count_distinct(F.col("_rule")).cast("long")
            .alias("agg_value"))
    return agg.filter(cond).select(
        F.lit(rid).alias("rule_id"), *keys, "agg_value")


def parse_rules_yaml(texts: list[str]) -> list[dict]:
    """Parse Sigma YAML rule file contents (reference upload path,
    ``/root/reference/src/app/backend/v1/api.py:296-312`` /
    ``src/rule/session.py:62-81``). Multi-document files supported;
    driver-side (rule files are tiny)."""
    import yaml

    rules: list[dict] = []
    for text in texts:
        for doc in yaml.safe_load_all(text):
            if doc and "detection" in doc:
                rules.append(doc)
    return rules
