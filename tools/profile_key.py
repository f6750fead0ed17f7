"""Per-key profiling helper (optimization rounds).

Times one key: builder (query construction, which for two-phase/iterative
builders executes jobs) vs action (noop write), N runs, plus the plan.

Usage: python tools/profile_key.py [sf_dir] key [key ...] [--runs N] [--explain]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traj_sim_spark_spark import registry  # noqa: E402
from traj_sim_spark_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    explain = "--explain" in sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    keys = args[1:] if args and os.path.isdir(args[0]) else args
    registry.load_all()
    spark = get_session("profile")
    # warm scan path
    registry.QUERIES["rel_scan_project"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for key in keys:
        fn = registry.QUERIES[key]
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{key} run {r} build")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            spark.sparkContext.setJobDescription(f"{key} run {r} action")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            print(
                f"{key} run{r}: build={t1-t0:.3f}s action={t2-t1:.3f}s "
                f"total={t2-t0:.3f}s",
                flush=True,
            )
        if explain:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            print(buf.getvalue())
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
