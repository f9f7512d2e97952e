from . import dedup, multimodal, similarity, textkit  # noqa: F401
