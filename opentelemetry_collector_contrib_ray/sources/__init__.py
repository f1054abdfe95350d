from . import synth, parquet  # noqa: F401
