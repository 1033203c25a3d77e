#!/usr/bin/env python3
"""Round-4 interleaved scaling campaign: term-dict vs string path, 2 vs 8
pinned cores, per-phase attribution + host capacity controls.

Each probe is a fresh CPU-pinned subprocess (tools/profile_scaling.py);
modes and core counts interleave within every rep so window-to-window host
swings hit all cells equally. NOTHING else may run during the campaign
(even disjoint-core Spark work steals memory bandwidth — BENCH.md r3).

    python tools/campaign_r4.py [reps] [n_conv]   # default 3 reps, 160k conv

Writes one JSON line per probe to CAMPAIGN_r4.jsonl and a summary to
stdout: per-mode best-pair raw efficiency eff = T_2c / (4 * T_8c).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "CAMPAIGN_r4.jsonl"


def _probe(cores: int, mode: str, n_conv: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_TERM_DICT"] = "1" if mode == "dict" else "0"
    cmd = [sys.executable, "tools/profile_scaling.py", str(cores), str(n_conv)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    t0 = time.time()
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=1800
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    rec = json.loads(line)
    rec.update({"mode": mode, "wall": round(time.time() - t0, 1)})
    return rec


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_conv = int(sys.argv[2]) if len(sys.argv) > 2 else 160_000

    import bench

    # warm the corpus cache once so no probe pays generation
    bench._mk_corpus(n_conv)

    cells: dict[tuple[str, int], list[dict]] = {}
    with open(OUT, "a") as f:
        for rep in range(reps):
            for mode in ("dict", "nodict"):
                for cores in (2, 8):
                    ctrl = bench._host_control(cores)
                    rec = _probe(cores, mode, n_conv)
                    rec.update({"rep": rep, "control": ctrl})
                    cells.setdefault((mode, cores), []).append(rec)
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(
                        f"rep{rep} {mode}@{cores}c total="
                        f"{rec.get('phases', {}).get('total')}s "
                        f"ctrl={ctrl}",
                        flush=True,
                    )

    summary = {}
    for mode in ("dict", "nodict"):
        t2 = min(r["phases"]["total"] for r in cells[(mode, 2)])
        t8 = min(r["phases"]["total"] for r in cells[(mode, 8)])
        # per-phase best-of (phases are independent best picks — the
        # per-phase attribution number, not the filed raw efficiency)
        ph2 = {
            k: min(r["phases"][k] for r in cells[(mode, 2)])
            for k in cells[(mode, 2)][0]["phases"]
        }
        ph8 = {
            k: min(r["phases"][k] for r in cells[(mode, 8)])
            for k in cells[(mode, 8)][0]["phases"]
        }
        summary[mode] = {
            "t_2c_best": t2,
            "t_8c_best": t8,
            "eff_best_pair": round(t2 / (4 * t8), 3),
            "phase_eff": {
                k: round(ph2[k] / (4 * ph8[k]), 3)
                for k in ph2
                if ph8[k] > 0
            },
        }
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
