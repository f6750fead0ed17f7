"""Dump .explain("formatted") for given keys to plans/<round>/<key>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> key [key ...]   [--sf=DIR] [--round=rNN]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traj_sim_spark_spark import registry  # noqa: E402
from traj_sim_spark_spark.session import get_session  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    rnd = "r13"
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--round="):
            rnd = a.split("=", 1)[1]
        else:
            args.append(a)
    OUT = os.path.join(_ROOT, "plans", rnd)
    tag, keys = args[0], args[1:]
    os.makedirs(OUT, exist_ok=True)
    registry.load_all()
    spark = get_session("plans")
    for key in keys:
        df = registry.QUERIES[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
