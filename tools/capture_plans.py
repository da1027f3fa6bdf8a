"""Capture .explain("formatted") for registered checks into plans/r13/.

Usage:
    python tools/capture_plans.py before [name ...]
    python tools/capture_plans.py after  [name ...]

With no names, captures the bench DRIVER_SUBSET.  Plans are captured at
the bench SF (SPARK_GRAFT_SF_DIR, default sf0.1) without executing the
query (explain only), so capture is cheap and does not disturb a
concurrently running bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from bench import DRIVER_SUBSET
    from dronedb_spark.session import get_spark
    from dronedb_spark.suite import load_all

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture", cpus=4)
    registry = load_all()
    if not names:
        names = [n for n in DRIVER_SUBSET if n in registry]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        chk = registry.get(name)
        if chk is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = chk.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # scratch-dir checks may need execution
            plan = f"(capture failed: {type(e).__name__}: {e})\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}_{tag}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
