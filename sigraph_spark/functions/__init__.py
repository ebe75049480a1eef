from sigraph_spark.functions.provenance import (  # noqa: F401
    ACTION_TYPES,
    ACTOR_TYPES,
    ARTIFACT_TYPES,
    parse_artifact,
    parse_actor,
    parse_parent_artifact,
)
