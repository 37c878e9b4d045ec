"""CLI entry points — reference ``gordo_components/cli/cli.py`` restated.

The reference ships click commands (``gordo build``, ``gordo workflow``,
``gordo client``); the Spark engine keeps the same verbs:

    python -m gordo_components_spark build  --config cfg.yaml --sf-dir DIR --registry DIR
    python -m gordo_components_spark score  --sf-dir DIR --start T0 --end T1 --out DIR
    python -m gordo_components_spark status --registry DIR
    python -m gordo_components_spark check  [--sf-dir DIR] [names...]

``build`` = §3.1 (config → dataset → fit → CV → registry, per machine),
``score`` = §3.3 (bulk predict over a range → parquet sink),
``status`` = watchman, ``check`` = the DuckDB oracle gate replica.
argparse instead of click: click isn't a guaranteed dependency here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(cpus: int | None = None):
    from gordo_components_spark.session import get_spark

    return get_spark("gordo-spark-cli", cpus=cpus)


def cmd_build(args: argparse.Namespace) -> int:
    import yaml

    from gordo_components_spark.builder import ModelBuilder
    from gordo_components_spark.plans.model_registry import ModelRegistry
    from gordo_components_spark.workflow import load_config

    with open(args.config) as f:
        machines = load_config(f.read())
    registry = ModelRegistry(args.registry)
    spark = _spark(args.cpus)
    results = []
    for machine in machines:
        _, meta = ModelBuilder(machine.as_config(), registry=registry).build(
            spark, args.sf_dir
        )
        results.append(
            {
                "machine": machine.name,
                "model_key": meta["model_key"],
                "n_samples": meta.get("dataset", {}).get("n_samples"),
                "total_threshold": meta.get("cv_scores", {}).get("total_threshold"),
            }
        )
        print(json.dumps(results[-1]))
    return 0


def cmd_score(args: argparse.Namespace) -> int:
    from gordo_components_spark.client import predict_date_range

    spark = _spark(args.cpus)
    scored = predict_date_range(spark, args.sf_dir, args.start, args.end)
    scored.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"out": args.out, "rows": n}))
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    from gordo_components_spark.client import watchman_status
    from gordo_components_spark.plans.model_registry import ModelRegistry

    for row in watchman_status(ModelRegistry(args.registry)):
        print(json.dumps(row))
    return 0


def cmd_check(args: argparse.Namespace) -> int:
    sys.argv = ["oracle_check"] + (args.names or []) + ["--sf", args.sf_dir]
    tools_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import oracle_check

    return oracle_check.main()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gordo_components_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build models for a machine-config YAML (§3.1)")
    b.add_argument("--config", required=True)
    b.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    b.add_argument("--registry", required=True)
    b.add_argument("--cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("score", help="bulk anomaly scoring over a date range (§3.3)")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("--start", required=True)
    s.add_argument("--end", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--cpus", type=int, default=None)
    s.set_defaults(fn=cmd_score)

    st = sub.add_parser("status", help="watchman: list deployed models")
    st.add_argument("--registry", required=True)
    st.set_defaults(fn=cmd_status)

    c = sub.add_parser("check", help="DuckDB oracle gate replica")
    c.add_argument("names", nargs="*")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    c.set_defaults(fn=cmd_check)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
