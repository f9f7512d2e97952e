from . import metrics_stream, state  # noqa: F401
