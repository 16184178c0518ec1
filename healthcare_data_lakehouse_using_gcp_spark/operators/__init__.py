from . import dedup, etl, joins, multimodal, similarity, text  # noqa: F401
