"""CLI entry point: run a declarative pipeline config.

The analogue of the collector binary's ``app.Run()``
(cmd/otelcontribcol/main.go:30-45 — YAML config → component DAG → run):

    python -m opentelemetry_collector_contrib_ray pipeline.yaml
    python -m opentelemetry_collector_contrib_ray pipeline.json --num-cpus 16

Config schema: see ``pipelines.builder.build``. On a cluster, submit the
same command via ``ray job submit``. This module OWNS the Ray session
(guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="opentelemetry_collector_contrib_ray",
        description="Run a declarative parse/enrich/route/aggregate pipeline config",
    )
    ap.add_argument("config", help="pipeline config file (.json or .yaml)")
    ap.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus (local mode)")
    ap.add_argument("--show", type=int, default=5, help="rows of the result to print (0=count only)")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        if args.config.endswith((".yaml", ".yml")):
            import yaml

            config = yaml.safe_load(f)
        else:
            config = json.load(f)

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.builder import build

    t0 = time.perf_counter()
    result = build(config)
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        n = result.count()
        sample = result.take(args.show) if args.show else []
    elif isinstance(result, pa.Table):
        n = len(result)
        sample = result.slice(0, args.show).to_pylist() if args.show else []
    else:
        n = len(result)
        sample = []
    elapsed = time.perf_counter() - t0
    print(json.dumps({"rows": n, "seconds": round(elapsed, 3), "sample": sample}, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
