"""Registry-wide physical-plan census → PLAN_AUDIT.json.

tests/test_plan_properties.py asserts the scale-critical shapes for the
most expensive queries; this tool sweeps EVERY registered query's
``explain("formatted")`` output and records the properties the 100 TB
design review cares about:

- anti-patterns (hard FAIL, nonzero exit): ``CartesianProduct``,
  ``BatchEvalPython`` (row-at-a-time Python UDF), and any
  ``BroadcastNestedLoopJoin`` whose join type is NOT ``Cross`` — a
  non-equi join fallback that replicates a possibly-large side.  An
  explicit ``crossJoin(broadcast(tiny))`` compiles to BNLJ *Cross*
  BuildRight and is the sanctioned scalar-frame pattern (1-row aggs,
  query vectors): counted separately, never flagged.
- posture counts (recorded for round-over-round comparison): shuffle /
  broadcast / reused exchanges, parquet scans, scans with PushedFilters
  or PartitionFilters, cache (InMemoryRelation) hits, Arrow islands
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas — the
  sanctioned Python path).

Whole-stage codegen is NOT counted: with AQE on, codegen subtrees are
assigned per query stage at execution time, so a pre-execution plan
shows none (verified: ``explain("codegen")`` on an unexecuted AQE plan
reports 0 subtrees even with ``spark.sql.codegen.wholeStage=true``).

A plan is built (never executed) per query; faces that do eager driver
work to BUILD their plan (index walks, island training) pay that once,
exactly as the harness does.

Usage:
    python tools/plan_audit.py [out.json]      # default PLAN_AUDIT.json
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gordo_components_spark.registry import load_all
from gordo_components_spark.session import get_spark

# details-section node headers: "(N) <NodeName>" — exactly once per node
_NODE_TYPES = {
    "shuffles": r"Exchange$",
    "broadcasts": r"BroadcastExchange$",
    "reused_exchanges": r"ReusedExchange",
    "parquet_scans": r"Scan parquet",
    "cached_scans": r"InMemoryTableScan",
    "arrow_islands": r"(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)",
    "sort_merge_joins": r"SortMergeJoin",
    "broadcast_hash_joins": r"BroadcastHashJoin$",
    "shuffled_hash_joins": r"ShuffledHashJoin",
}


def _audit_plan(plan: str) -> dict:
    entry = {
        k: len(re.findall(rf"^\(\d+\) {pat}", plan, re.M))
        for k, pat in _NODE_TYPES.items()
    }
    entry["pushdown_scans"] = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    entry["partition_pruned"] = len(re.findall(r"PartitionFilters: \[[^\]]", plan))
    bnlj_types = re.findall(r"BroadcastNestedLoopJoin (\w+)", plan)
    entry["scalar_cross_bnlj"] = sum(1 for t in bnlj_types if t == "Cross")
    hits = []
    if "CartesianProduct" in plan:
        hits.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        hits.append("BatchEvalPython")
    bad_bnlj = sorted({t for t in bnlj_types if t != "Cross"})
    if bad_bnlj:
        hits.append(f"BroadcastNestedLoopJoin[{','.join(bad_bnlj)}]")
    entry["anti_patterns"] = hits
    return entry


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_AUDIT.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry = load_all()
    spark = get_spark("gordo-plan-audit")
    report: dict[str, dict] = {}
    violations: list[str] = []
    for name, spec in registry.items():
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            entry = _audit_plan(buf.getvalue())
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            report[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            violations.append(f"{name}: plan build failed")
            continue
        report[name] = entry
        if entry["anti_patterns"]:
            violations.append(f"{name}: {', '.join(entry['anti_patterns'])}")
        print(
            f"{name:32s} "
            f"{'FAIL ' + ','.join(entry['anti_patterns']) if entry['anti_patterns'] else 'ok'}",
            flush=True,
        )

    summary = {
        "n_queries": len(registry),
        "n_violations": len(violations),
        "violations": violations,
        "totals": {
            k: sum(e.get(k, 0) for e in report.values() if "error" not in e)
            for k in (*_NODE_TYPES, "pushdown_scans", "partition_pruned", "scalar_cross_bnlj")
        },
        "note": (
            "plan census at "
            + sf_dir
            + "; anti-patterns gate the exit code, posture counts are "
            "recorded for round-over-round comparison. Reproduce: "
            "python tools/plan_audit.py"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump({"summary": summary, "queries": report}, fh, indent=1)
    print(f"wrote {out_path}: {len(registry)} queries, {len(violations)} violations")
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
