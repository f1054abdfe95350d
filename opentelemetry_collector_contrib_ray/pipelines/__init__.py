from . import log_pipeline  # noqa: F401
