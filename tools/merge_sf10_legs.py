"""Merge single-shot sf10 leg readings (/tmp/sf10_legs.json) into
SCALING_LOCAL_r11.json and recompute alpha_big_huge — companion to the
round-11 time-boxed scaling run (the full runner was split so the
cheap sf10 legs could land before the wall clock; see SCALING.md)."""
import json
import math
import sys

scal = json.load(open("SCALING_LOCAL_r11.json"))
legs = json.load(open("/tmp/sf10_legs.json"))
for name, sec in legs.items():
    e = scal["entries"].setdefault(name, {})
    e["sf10"] = sec
    if "sf1" in e:
        e["alpha_big_huge"] = round(math.log10(sec / e["sf1"]), 3)
scal.setdefault("runs_per_tier", {})["sf10"] = 1
scal["note"] = (
    "round-11 time-boxed run: small/mid/big legs are min-of-2, sf10 legs "
    "min-of-2 single-session readings on a slow/erratic host (see "
    "BENCH_NOTES_r11.md) — compare exponents, not seconds"
)
json.dump(scal, open("SCALING_LOCAL_r11.json", "w"), indent=1)
print(json.dumps({n: r for n, r in scal["entries"].items() if "sf10" in r}, indent=1))
