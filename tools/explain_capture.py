"""Capture ``explain("formatted")`` for registry queries to text files.

Optimization-round deliverable: ``plans/$PLANS_ROUND/<query>_<label>.txt`` holds
the formatted physical plan for every query examined, so plan claims in
OPTIMIZATION_r<N>.md can be checked without running Spark.

Usage:
    python tools/explain_capture.py <label> [names...]   # default: bench set
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from gordo_components_spark.registry import load_all  # noqa: E402
from gordo_components_spark.session import get_spark  # noqa: E402


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    if not names:
        names = sorted(n for n, s in registry.items() if "bench" in s.tags)
    out_dir = os.path.join(HERE, "plans", os.environ.get("PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gordo-spark-explain")
    for name in names:
        spec = registry[name]
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{label}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
