from . import fluentforward, lines, parquet, synth  # noqa: F401
