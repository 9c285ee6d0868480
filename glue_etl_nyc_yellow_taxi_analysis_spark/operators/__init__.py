from . import (  # noqa: F401
    dedup,
    joins,
    multimodal,
    partitioning,
    sessionize,
    similarity,
    text,
    transforms,
)
