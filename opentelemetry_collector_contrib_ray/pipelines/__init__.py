from . import builder, log_pipeline  # noqa: F401
