#!/usr/bin/env python3
"""Regenerate BenchExpectations.secondsAtSf01 from a bench_full.json.

Usage: python3 tools/refresh_expectations.py bench_full.json [solo.json]

`solo.json` (optional) maps query -> seconds for queries whose in-suite
reading was itself flagged and then solo-adjudicated; per the round-13
verdict rule, such a query's snapshot carries min(in-suite, solo) so the
regression guardrail tracks real cost, never churn. Prints the Scala map
body to stdout — paste into BenchExpectations.scala.
Builder-side tool only.
"""
import json, sys

bench = json.load(open(sys.argv[1]))
solo = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else {}
qs = dict(bench["queries"])
for name, sec in solo.items():
    if name in qs:
        qs[name] = min(qs[name], sec)
for name in sorted(qs):
    suffix = "  // solo-adjudicated" if name in solo and solo[name] < bench["queries"][name] else ""
    print(f'    "{name}" -> {round(qs[name], 4)},{suffix}')
