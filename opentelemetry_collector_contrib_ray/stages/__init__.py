from . import aggregate, dedup, enrich, parse, route, textstats  # noqa: F401
