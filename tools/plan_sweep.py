"""Plan sweep for the optimization rounds: capture .explain("formatted")
for named queries and emit per-entry physical-plan statistics for ALL
corpus entries (Exchange count, join strategies, Python-eval nodes,
pushed filters) so plan regressions and optimization targets can be
triaged without running anything.

Usage:
  python tools/plan_sweep.py plans/r16 --suffix before [NAME ...]
      # writes plans/r16/<name>_<suffix>.txt for each NAME (default:
      # bench HEADLINE) and plans/r16/plan_stats_<suffix>.json for all
      # corpus entries
  python tools/plan_sweep.py plans/r16 --suffix after --stats-only
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PLAN_TOKENS = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "FlatMapGroupsInPandas",
    "Window",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Generate",
]


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(text: str) -> dict:
    stats: dict = {}
    for tok in PLAN_TOKENS:
        # count operator headers like "* Sort (12)" / "Exchange (3)" /
        # "SortMergeJoin Inner (11)" / "BroadcastHashJoin LeftOuter
        # BuildRight (5)"; word-boundary so "SortMergeJoin" doesn't
        # count as "Sort". The tree prefix may contain ':' on the left
        # branch of a binary node (":- HashAggregate (8)" /
        # ":  +- Exchange (7)") — the r16 mid-sweep missed those and
        # undercounted every operator nested under a join's left side.
        # No mandatory whitespace before the token (ADVICE r16): a
        # root operator at column 0 ("Sort (5)" outside an
        # AdaptiveSparkPlan wrapper) must count too; the char class
        # cannot consume letters, so SortMergeJoin still never counts
        # as Sort.
        n = len(re.findall(rf"(?m)^[\s:*+-]*{tok}\b[a-zA-Z ]*\(", text))
        if n:
            stats[tok] = n
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    nonempty = [p for p in pushed if p.strip()]
    stats["scans"] = len(re.findall(r"Scan parquet", text))
    stats["scans_with_pushed"] = len(nonempty)
    return stats


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    out_dir = args[0]
    names = args[1:]
    suffix = "before"
    for f in flags:
        if f.startswith("--suffix="):
            suffix = f.split("=", 1)[1]
    stats_only = "--stats-only" in flags

    os.makedirs(out_dir, exist_ok=True)

    from healthcare_data_lakehouse_using_gcp_spark import corpus
    from healthcare_data_lakehouse_using_gcp_spark.session import get_spark

    spark = get_spark(app_name="plan_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = corpus.queries()

    if not names:
        import bench

        names = list(bench.HEADLINE)

    all_stats: dict[str, dict] = {}
    failed: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)
            text = explain_str(df)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        all_stats[name] = plan_stats(text)
        if not stats_only and name in names:
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(text)
    with open(os.path.join(out_dir, f"plan_stats_{suffix}.json"), "w") as fh:
        json.dump({"stats": all_stats, "failed": failed}, fh, indent=1, sort_keys=True)
    print(json.dumps({"entries": len(all_stats), "failed": failed}))
    spark.stop()


if __name__ == "__main__":
    main()
