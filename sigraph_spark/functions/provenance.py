"""SystemProvenance string parsing as pure Column expressions (no UDFs).

Reference semantics (``/root/reference/src/graph/provenance/``):

* A provenance string is ``[name]@[ARTIFACT_TYPE]`` for an artifact or
  ``[name]@[ARTIFACT_TYPE]@[ACTION]@[ACTOR_TYPE]`` for an actor
  (``type.py:109-138``). The name itself may contain ``@`` — type tokens
  bind **rightmost** (``type_extension.py:167-169`` takes the last token as
  the type and joins the rest as the name; ``type_extension.py:260-262``
  takes the last two tokens as action/actor-direction).
* Parent artifacts are derived from the **first two** ``@`` tokens of
  ``parent_system_provenance`` (``type_extension.py:206-207``) — an
  intentional asymmetry with the rightmost-binding artifact parse: a parent
  name containing ``@`` is truncated. We preserve this quirk for parity.
* Invalid inputs raise in the reference (``InvalidInputException``); we are
  set-oriented, so every parser returns a struct with an ``error`` field and
  callers route error rows to a side-output instead of dropping them
  silently (the reference *swallows* errors at
  ``graph_session.py:128-132`` — surfacing them is a documented improvement).

Everything below is whole-stage-codegen-friendly — zero Python on the
executor path, and deliberately NO higher-order functions: token access
is expressed with ``substring_index`` / ``length`` arithmetic instead of
``split`` + lambda-bound ``transform``/``element_at`` chains, because
lambda-bound expression trees drop out of whole-stage codegen into
per-row interpreted eval (measured ~5x slower on the parse stage — the
same cliff as dedup._word_grams documents for shingles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Closed vocabularies, /root/reference/src/graph/provenance/type.py:41-106
ACTION_TYPES: tuple[str, ...] = (
    "LAUNCH", "REMOTE_THREAD", "ACCESS", "TAMPERING",
    "CONNECT", "ACCEPT",
    "CREATE", "RENAME", "DELETE", "MODIFY", "RAW_ACCESS_READ",
    "CREATE_STREAM_HASH",
    "REG_ADD", "REG_DELETE", "REG_SET", "REG_RENAME", "REG_QUERY",
    "LOAD",
)
ACTOR_TYPES: tuple[str, ...] = ("READ_RECV", "WRITE_SEND", "NOT_ACTOR")
ARTIFACT_TYPES: tuple[str, ...] = ("FILE", "REGISTRY", "NETWORK", "PROCESS", "MODULE")

_ARTIFACT_FMT = "[artifact_name]@[artifact_type]"
_ACTOR_FMT = "[artifact_name]@[artifact_type]@[action_type]@[actor_type]"


def _ntokens(c: Column) -> Column:
    """Number of ``@``-delimited tokens (== size(split(c, '@'))): count of
    '@' occurrences + 1, via length arithmetic — codegen'd, no arrays."""
    return (
        F.length(c) - F.length(F.replace(c, F.lit("@"), F.lit(""))) + 1
    )


def _before_suffix(c: Column, suffix: Column) -> Column:
    """The part of ``c`` before the trailing ``@<suffix>`` (i.e. drop the
    suffix and its separator). Empty when the suffix IS the whole string."""
    return F.substring(c, 1, F.length(c) - F.length(suffix) - 1)


def _empty_or_missing_at(c: Column) -> Column:
    """Shared SystemProvenance constructor checks (type.py:125-132)."""
    return (
        F.when(c.isNull() | (c == ""), F.lit("Value cannot be empty"))
        .when(~c.contains("@"), F.lit("Value must contain '@'"))
    )


def _artifact_error(c: Column, type_tok: Column) -> Column:
    """Artifact validation chain given the substring and its (already
    extracted) rightmost type token — shared by the struct parsers and the
    staged projection in operators/graph.parse_events."""
    return (
        _empty_or_missing_at(c)
        .when(type_tok == "", F.lit("Data contains empty tokens: " + _ARTIFACT_FMT))
        .when(~type_tok.isin(*ARTIFACT_TYPES), F.lit("invalid artifact type"))
        .otherwise(F.lit(None))
    )


def _artifact_struct(c: Column) -> Column:
    """Artifact struct from a provenance substring: type = rightmost
    ``@`` token, name = everything before it (may itself contain ``@``)."""
    type_tok = F.substring_index(c, "@", -1)
    name = _before_suffix(c, type_tok)
    error = _artifact_error(c, type_tok)
    ok = error.isNull()
    return F.struct(
        F.when(ok, name).alias("name"),
        F.when(ok, type_tok).alias("artifact_type"),
        error.alias("error"),
    )


def parse_artifact(c: Column) -> Column:
    """``name@TYPE`` -> struct(name, artifact_type, error).

    Mirrors ``ArtifactExtension.from_systemprovenance``
    (type_extension.py:148-182): type = last ``@`` token (rightmost
    binding), name = join of the rest; empty type token and unknown enum
    values are errors.
    """
    return _artifact_struct(c)


def parse_actor(c: Column) -> Column:
    """``name@TYPE@ACTION@ACTOR`` -> struct(name, artifact_type, action,
    actor_type, artifact, error).

    Mirrors ``ActorExtension.from_systemprovenance``
    (type_extension.py:237-277): requires >=4 tokens; the last two are
    action/actor-direction; the prefix re-parses as an artifact. ``artifact``
    is the rendered ``name@TYPE`` node key (type.py:170-172).
    """
    n = _ntokens(c)
    actor_tok = F.substring_index(c, "@", -1)
    last_two = F.substring_index(c, "@", -2)  # "action@actor" (joined)
    action_tok = F.substring_index(last_two, "@", 1)
    # artifact prefix = everything before the trailing "@action@actor";
    # empty when n < 3 — those rows error out via the n<4 format check,
    # and all value fields are CASE-guarded on ok anyway.
    prefix_str = _before_suffix(c, last_two)
    art = _artifact_struct(prefix_str)

    error = (
        _empty_or_missing_at(c)
        .when(n < 4, F.lit("Data is not in the expected format: " + _ACTOR_FMT))
        .when(
            (action_tok == "") | (actor_tok == ""),
            F.lit("Data contains empty tokens: " + _ACTOR_FMT),
        )
        .when(art["error"].isNotNull(), art["error"])
        .when(~action_tok.isin(*ACTION_TYPES), F.lit("invalid action type"))
        .when(~actor_tok.isin(*ACTOR_TYPES), F.lit("invalid actor type"))
        .otherwise(F.lit(None))
    )
    ok = error.isNull()
    return F.struct(
        F.when(ok, art["name"]).alias("name"),
        F.when(ok, art["artifact_type"]).alias("artifact_type"),
        F.when(ok, action_tok).alias("action"),
        F.when(ok, actor_tok).alias("actor_type"),
        F.when(ok, F.concat_ws("@", art["name"], art["artifact_type"])).alias("artifact"),
        error.alias("error"),
    )


def parse_parent_artifact(c: Column) -> Column:
    """Parent provenance -> struct(name, artifact_type, artifact, error).

    Mirrors ``ArtifactExtension.from_parent_action``
    (type_extension.py:185-208): joins the **first two** tokens and parses
    that as an artifact — so ``a@b@PROCESS@...`` yields name ``a`` and type
    token ``b`` (usually the type). Parent names containing ``@`` are
    truncated; quirk preserved deliberately (SURVEY.md §1.3-4).
    """
    first_two = F.substring_index(c, "@", 2)  # first two tokens, joined
    art = _artifact_struct(first_two)
    error = (
        _empty_or_missing_at(c)
        .when(art["error"].isNotNull(), art["error"])
        .otherwise(F.lit(None))
    )
    ok = error.isNull()
    return F.struct(
        F.when(ok, art["name"]).alias("name"),
        F.when(ok, art["artifact_type"]).alias("artifact_type"),
        F.when(ok, F.concat_ws("@", art["name"], art["artifact_type"])).alias("artifact"),
        error.alias("error"),
    )
