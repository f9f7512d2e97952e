from . import explainkit  # noqa: F401
