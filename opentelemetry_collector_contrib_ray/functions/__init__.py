from . import coerce, regexes, severity, sanitize, templates, timeparse, tokens  # noqa: F401
