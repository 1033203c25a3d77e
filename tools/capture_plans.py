#!/usr/bin/env python3
"""Capture a per-gate physical-plan digest -> PLANS_GATES.md.

For every __spark_entry__.queries() entry, builds the DataFrame at the
given sf dir (no execution — static optimized plan) and extracts the
properties the plan is supposed to prove: parquet scans with their
PushedFilters/ReadSchema, every Exchange and its partitioning keys,
Arrow/pandas nodes, and broadcast joins. The driver/judge can then DIFF
plans round-over-round, not just result hashes.

    python tools/capture_plans.py [sf_dir] [out_md]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def digest(plan: str) -> dict:
    """Pull the load-bearing lines out of an explain('formatted') dump:
    the detail section has one '(n) OpName\\n<key: value lines>' block per
    operator."""
    blocks = re.findall(
        r"^\(\d+\) ([^\n]+)\n((?:(?!\(\d+\) )[^\n]*\n)*)", plan, re.M
    )
    scans = []
    exchanges = []
    for op, body in blocks:
        op = op.strip()
        if op.startswith("Scan parquet") or op.startswith("BatchScan"):
            pf = re.search(r"PushedFilters: \[([^\]]*)\]", body)
            rs = re.search(r"ReadSchema: ([^\n]+)", body)
            scans.append({
                "pushed": (pf.group(1).strip() if pf else "")[:160],
                "schema": (rs.group(1).strip() if rs else "")[:160],
            })
        elif op.startswith("Exchange"):
            arg = re.search(r"Arguments: ([^\n]+)", body)
            part = (arg.group(1) if arg else "")[:110]
            # keep only the partitioning expression, drop shuffle ids
            part = re.sub(r", \[plan_id=\d+\]", "", part)
            part = re.sub(r"#\d+L?", "", part)  # expr ids churn run-to-run
            exchanges.append(part)
    arrow = re.findall(
        r"(FlatMapGroupsInPandas|FlatMapGroupsInArrow|MapInPandas|MapInArrow"
        r"|ArrowEvalPython|BatchEvalPython)",
        plan,
    )
    bhj = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    return {
        "scans": scans, "exchanges": exchanges,
        "arrow": sorted(set(arrow)), "broadcast_joins": bhj,
        "sortmerge_joins": smj, "codegen_spans": wsc,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS_GATES.md"

    import __spark_entry__ as entry
    from document_retrieval_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    qs = entry.queries()
    lines = [
        "# PLANS_GATES — per-gate physical-plan digest (generated)",
        "",
        f"Source: `tools/capture_plans.py {sf_dir}` — static optimized plans",
        "(no execution; AQE runtime re-plans not applied). Regenerate each",
        "round and diff: a gate whose scan loses its PushedFilters, whose",
        "join degrades broadcast->sort-merge, or which grows an Exchange has",
        "regressed even if its result hash still matches.",
        "",
    ]
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            d = digest(plan)
            lines.append(f"## {name}")
            lines.append("")
            if d["scans"]:
                lines.append("- scans:")
                for s in d["scans"][:6]:
                    pf = s["pushed"] or "(none)"
                    lines.append(f"  - pushed: `{pf}`")
            lines.append(
                f"- exchanges: {len(d['exchanges'])}"
                + (
                    " — " + "; ".join(f"`{e}`" for e in d["exchanges"][:4])
                    if d["exchanges"]
                    else ""
                )
            )
            lines.append(
                f"- joins: {d['broadcast_joins']} broadcast, "
                f"{d['sortmerge_joins']} sort-merge; "
                f"codegen spans: {d['codegen_spans']}; "
                f"python/arrow nodes: {', '.join(d['arrow']) or 'none'}"
            )
            lines.append("")
        except Exception as e:  # keep going; a broken gate shows up here
            lines.append(f"## {name}")
            lines.append("")
            lines.append(f"- ERROR capturing plan: {e}")
            lines.append("")
            continue
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md} ({len(qs)} gates)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
