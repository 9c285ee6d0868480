from . import transforms, joins, dedup, similarity, text, sessionize, multimodal  # noqa: F401
