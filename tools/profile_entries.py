"""Per-entry profiling harness for the optimization rounds.

Times a named subset of registry entries exactly the way bench.py does
(noop sink, 1 warmup + min of 3, cache cleared between runs) and, for
batch entries, also records:

- plan_ms: wall time of .explain-style plan generation (analysis +
  optimization + physical planning, no execution) — separates "Spark is
  planning" from "Spark is computing" at fixture scale;
- the formatted plan written to plans/r11/<name>_<tag>.txt when --plans
  is passed (the judge-checkable artifact).

Usage:
  python tools/profile_entries.py [--plans-dir DIR] [--plans TAG] name1 ...

--plans TAG writes <name>_<TAG>.txt under --plans-dir (default
plans/$SPARK_GRAFT_ROUND, default round r12) relative to the repo root,
which is derived from this file's location (r11 ADVICE: the hardcoded
/root/repo + r11 paths broke outside that checkout/round).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from forgottenlandapp_etl_spark.plans import QUERIES  # noqa: E402
from forgottenlandapp_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    REPO_ROOT, "plans", os.environ.get("SPARK_GRAFT_ROUND", "r12")
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    global PLANS_DIR
    args = sys.argv[1:]
    tag = None
    while args and args[0].startswith("--"):
        if args[0] == "--plans-dir":
            PLANS_DIR = args[1]
        elif args[0] == "--plans":
            tag = args[1]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
        args = args[2:]
    names = args
    spark = build_session(app_name="profile-entries")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not in registry", flush=True)
            continue
        spark.sparkContext.setJobDescription(name)
        # plan-only time (build the DataFrame + produce the physical plan)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        build_ms = round((time.perf_counter() - t0) * 1000, 1)
        t0 = time.perf_counter()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plan_ms = round((time.perf_counter() - t0) * 1000, 1)
        if tag:
            os.makedirs(PLANS_DIR, exist_ok=True)
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
        spark.catalog.clearCache()
        # bench-identical timing: warmup + min of 3
        materialize(QUERIES[name](spark, SF_DIR))
        spark.catalog.clearCache()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, SF_DIR))
            spark.catalog.clearCache()
            runs.append(time.perf_counter() - t0)
        sec = round(min(runs), 4)
        n_exchange = plan.count("Exchange")
        n_python = sum(
            plan.count(k)
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas")
        )
        out[name] = {
            "sec": sec,
            "build_ms": build_ms,
            "plan_ms": plan_ms,
            "exchanges": n_exchange,
            "python_nodes": n_python,
        }
        print(
            f"{name}: {sec}s  build={build_ms}ms plan={plan_ms}ms "
            f"exchanges={n_exchange} py={n_python}",
            flush=True,
        )
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
