#!/usr/bin/env python3
"""Merge the two ScaleR19 records (sf1, sf10) into SCALE_r{N}.json with
per-operator scaling ratios. ratio_linear = (wall10/wall1) / (rows10/rows1):
1.0 = perfectly linear in corpus rows, <1 sublinear, >1.3 flagged.

Iterates the UNION of both records' op names (r19 advice: an op present
in only one record used to be silently dropped), and keeps "failed or
missing on one side" in its own list rather than conflating it with
"scales worse than 1.3x linear"."""
import json, sys

sf1 = json.load(open(sys.argv[1]))
sf10 = json.load(open(sys.argv[2]))
out = sys.argv[3]
note = sys.argv[4] if len(sys.argv) > 4 else ""

rows_ratio = sf10["docs"] / sf1["docs"]  # docs/emb/lineitem all scale 10x
ops = {}
flagged = []          # ran at both SFs, ratio_linear > 1.3
errored_or_missing = []  # err at either SF, or absent from one record
for name in sorted(set(sf1["ops"]) | set(sf10["ops"])):
    r1 = sf1["ops"].get(name)
    r10 = sf10["ops"].get(name)
    if not r1 or not r10 or "err" in r1 or "err" in r10:
        ops[name] = {"sf1": r1, "sf10": r10, "ratio_linear": None}
        errored_or_missing.append(name)
        continue
    ratio = (r10["wall_s"] / max(r1["wall_s"], 1e-9)) / rows_ratio
    heap_ratio = r10["peak_driver_mb"] / max(r1["peak_driver_mb"], 1)
    ops[name] = {
        "sf1": r1, "sf10": r10,
        "ratio_linear": round(ratio, 2),
        "driver_heap_ratio": round(heap_ratio, 2),
    }
    # cross-SF resolution of verdicts launch-order cannot settle: on
    # stages no wider than the scheduler every task is first-wave, so the
    # probe stamps indeterminate_small_stage (or data_skew) — but a max
    # task that stays flat while rows grow 10x is a FIXED one-time cost,
    # and one that grows with rows is volume-driven skew. Only emitted
    # when both sides carry the skew facts (older records lack them).
    unresolved = {"indeterminate_small_stage", "data_skew"}
    if (r1.get("skew_attribution") in unresolved
            or r10.get("skew_attribution") in unresolved):
        m1, m10 = r1.get("skew_max_task_ms"), r10.get("skew_max_task_ms")
        if m1 is not None and m10 is not None:
            ops[name]["skew_resolution"] = (
                "fixed_cost_not_volume" if m10 <= 2 * max(m1, 1)
                else "volume_driven")
    if ratio > 1.3:
        flagged.append(name)

rec = {
    "round": 20,
    "method": "tools/ScaleR19 via tools/run_scale.sh (8g heap, 32 cores); "
              "sf10 = ScaleUp sf0.1 --rotate--> sf1 --tag--> sf10; "
              "ratio_linear = (wall_sf10/wall_sf1)/10; bar: <=1.3; "
              "skew readings carry a structured skew_attribution verdict "
              "(even / first_task_one_time_cost / immaterial / data_skew) "
              "plus the facts it derives from",
    "rows": {"sf1": {k: sf1[k] for k in ("docs", "embeddings", "lineitem")},
             "sf10": {k: sf10[k] for k in ("docs", "embeddings", "lineitem")}},
    "shuffle_partitions": {"sf1": sf1["shuffle_partitions"],
                           "sf10": sf10["shuffle_partitions"]},
    "ops": ops,
    "flagged_over_1p3_linear": flagged,
    "errored_or_missing": errored_or_missing,
    "notes": note,
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps({k: v["ratio_linear"] for k, v in ops.items()}, indent=0))
print("flagged:", flagged)
print("errored_or_missing:", errored_or_missing)
