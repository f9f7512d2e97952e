from . import metrics_stream  # noqa: F401
