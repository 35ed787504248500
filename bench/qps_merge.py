"""Merge rep pairs from multiple bench/qps_scaling.py runs into ONE
qps_scaling_<low>_<high>.json: all reps published, the healthy-pair
rule (launch AND post-run control >= gate at BOTH levels) applied
uniformly across every pair ever run — no per-run or per-metric
selection.

Usage: python bench/qps_merge.py out.json run1.json run2.json ...
"""

from __future__ import annotations

import json
import sys

GATE = 0.95


def healthy(r: dict) -> bool:
    return (
        r["cpu_control_2_8"] >= GATE
        and r.get("cpu_control_post", 0) >= GATE
    )


def main() -> None:
    out_path, *ins = sys.argv[1:]
    lo_reps, hi_reps = [], []
    for p in ins:
        with open(p) as f:
            d = json.load(f)
        lo_reps.extend(d["reps"]["low"])
        hi_reps.extend(d["reps"]["high"])
    pairs = [
        (lo, hi)
        for lo, hi in zip(lo_reps, hi_reps)
        if healthy(lo) and healthy(hi)
    ]
    result = {
        "reps": {"low": lo_reps, "high": hi_reps},
        "gate_control": GATE,
        "healthy_pairs": len(pairs),
        "status": "ok" if pairs else "partial",
    }
    ratio = hi_reps[0]["cores"] / lo_reps[0]["cores"]
    if pairs:
        for key in (
            "qps_plain", "qps_bucketed", "qps_1k_plain", "qps_1k_bucketed"
        ):
            lo_best = max(lo[key] for lo, _hi in pairs)
            hi_best = max(hi[key] for _lo, hi in pairs)
            result["best_" + key] = {"low": lo_best, "high": hi_best}
            result["scaling_efficiency_" + key] = round(
                (hi_best / lo_best) / ratio, 3
            )
    else:
        result["note"] = (
            "no rep pair launched AND finished at control >= "
            f"{GATE}: scaling ratios not claimed"
        )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "reps"}))


if __name__ == "__main__":
    main()
