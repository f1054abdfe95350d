from . import (  # noqa: F401
    aggregate,
    ann,
    dedup,
    enrich,
    metricstransform,
    multimodal,
    parse,
    route,
    sampling,
    sinks,
    textstats,
    window,
)
