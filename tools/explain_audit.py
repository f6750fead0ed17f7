"""Physical-plan audit: dump `.explain(formatted)` for the headline
queries and scan for scale red flags, writing PLANS.md at the repo root.

Red flags checked per plan (the 100-TB discipline, SURVEY.md §4):
- CartesianProduct without a broadcast on one side (unblocked quadratic)
- BatchEvalPython (row-at-a-time Python UDF in the plan; only
  Arrow-batched ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  are allowed)
- Parquet scans selecting every column when the query projects few
  (column pruning failure, detected as ReadSchema listing >12 fields)

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traj_sim_spark_spark import registry  # noqa: E402
from traj_sim_spark_spark.session import get_session  # noqa: E402

# streaming queries run to completion inside their builder (memory sink),
# so their returned DataFrame is the materialized batch table — the
# streaming plan itself is asserted in tests/test_streaming.py instead.
# EVERY registered key is audited (round-3 upgrade from the 120-key
# headline list): the registry IS the audit scope, so a new operator
# cannot ship un-audited. Builders execute their driver-scalar phases
# (tau_k collects, iterative loops) during construction — that is part
# of the audited surface, and the sf0.01 default keeps it minutes-cheap.
def audit_keys() -> list[str]:
    registry.load_all()
    return list(registry.QUERIES)


def flags_for(plan: str) -> list[str]:
    out = []
    if "CartesianProduct" in plan and "Broadcast" not in plan:
        out.append("UNBLOCKED-CARTESIAN")
    if "BatchEvalPython" in plan:
        out.append("ROW-AT-A-TIME-PYTHON-UDF")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        if m.group(1).count(",") + 1 > 12:
            out.append("WIDE-SCAN(>12 cols)")
            break
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry.load_all()
    keys = audit_keys()
    spark = get_session("explain_audit")
    sections = []
    failures = []
    for key in keys:
        df = registry.QUERIES[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        fl = flags_for(plan)
        if fl:
            failures.append((key, fl))
        head = f"## {key}" + (f"  ⚠ {', '.join(fl)}" if fl else "")
        sections.append(f"{head}\n\n```\n{plan.strip()}\n```\n")
    doc = (
        "# PLANS — physical-plan audit (auto-generated)\n\n"
        f"`python tools/explain_audit.py {sf_dir}` — "
        f"{len(keys)} plans (every registered key), "
        f"{len(failures)} with red flags.\n\n"
        "Red-flag rules: no CartesianProduct without broadcast, no "
        "row-at-a-time Python UDFs (BatchEvalPython), no >12-column "
        "Parquet scans. See tools/explain_audit.py.\n\n" + "\n".join(sections)
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write(doc)
    for key, fl in failures:
        print(f"FLAG {key}: {', '.join(fl)}")
    print(f"== {len(keys)} plans audited, {len(failures)} flagged ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
