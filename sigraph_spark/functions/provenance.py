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

Everything below is whole-stage-codegen-friendly: `split`, `element_at`,
`concat_ws`, `slice`, `isin` — zero Python on the executor path.
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


def _let(value: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``value`` ONCE per row
    and reference it many times via a lambda variable.

    Catalyst's CollapseProject re-inlines intermediate projections, so a
    naive formulation of the parser re-evaluates ``split(c, '@')`` once per
    reference (dozens per row — measured 5x slowdown on the parse stage).
    ``transform`` over a single-element array introduces a named lambda
    variable, which IS evaluated once and shared."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _empty_or_missing_at(c: Column) -> Column:
    """Shared SystemProvenance constructor checks (type.py:125-132)."""
    return (
        F.when(c.isNull() | (c == ""), F.lit("Value cannot be empty"))
        .when(~c.contains("@"), F.lit("Value must contain '@'"))
    )


def _artifact_from_toks(c: Column, toks: Column) -> Column:
    """Artifact struct given the (already-bound) token array."""
    type_tok = F.element_at(toks, -1)
    name = F.concat_ws("@", F.slice(toks, 1, F.size(toks) - 1))
    error = (
        _empty_or_missing_at(c)
        .when(type_tok == "", F.lit("Data contains empty tokens: " + _ARTIFACT_FMT))
        .when(~type_tok.isin(*ARTIFACT_TYPES), F.lit("invalid artifact type"))
        .otherwise(F.lit(None))
    )
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
    return _let(F.split(c, "@"), lambda toks: _artifact_from_toks(c, toks))


def parse_actor(c: Column) -> Column:
    """``name@TYPE@ACTION@ACTOR`` -> struct(name, artifact_type, action,
    actor_type, artifact, error).

    Mirrors ``ActorExtension.from_systemprovenance``
    (type_extension.py:237-277): requires >=4 tokens; the last two are
    action/actor-direction; the prefix re-parses as an artifact. ``artifact``
    is the rendered ``name@TYPE`` node key (type.py:170-172).
    """
    def body(toks: Column) -> Column:
        n = F.size(toks)
        action_tok = F.element_at(toks, -2)
        actor_tok = F.element_at(toks, -1)
        # the artifact prefix re-parses from the SAME bound token array —
        # no re-split (prefix toks = all but the last two). Clamp: the
        # lambda binding evaluates eagerly (no CASE-WHEN laziness), and a
        # negative slice length raises under ANSI; n<4 rows error out via
        # the format check below regardless of the clamped value.
        prefix_toks = F.slice(toks, 1, F.greatest(n - 2, F.lit(0)))
        prefix_str = F.concat_ws("@", prefix_toks)

        def with_art(art: Column) -> Column:
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

        return _let(_artifact_from_toks(prefix_str, prefix_toks), with_art)

    return _let(F.split(c, "@"), body)


def parse_parent_artifact(c: Column) -> Column:
    """Parent provenance -> struct(name, artifact_type, artifact, error).

    Mirrors ``ArtifactExtension.from_parent_action``
    (type_extension.py:185-208): joins the **first two** tokens and parses
    that as an artifact — so ``a@b@PROCESS@...`` yields name ``a`` and type
    token ``b`` (usually the type). Parent names containing ``@`` are
    truncated; quirk preserved deliberately (SURVEY.md §1.3-4).
    """
    def body(toks: Column) -> Column:
        first_two = F.slice(toks, 1, 2)

        def with_art(art: Column) -> Column:
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

        return _let(
            _artifact_from_toks(F.concat_ws("@", first_two), first_two), with_art
        )

    return _let(F.split(c, "@"), body)
