#!/usr/bin/env python3
"""Regenerate BenchExpectations.secondsAtSf01 from a bench_full.json.

Usage: python3 tools/snapshot_expectations.py [bench_full.json]

Reads the contract line's per-query map, rounds to 4 decimals, and rewrites
the map literal inside src/main/scala/graft/BenchExpectations.scala in
place, leaving everything outside the `secondsAtSf01` body untouched.
Refuses a run whose sf dir is not sf0.1 (the snapshot's scale).
"""
import json
import re
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
scala_path = "src/main/scala/graft/BenchExpectations.scala"

with open(bench_path) as f:
    data = json.load(f)
if not data.get("sf", "").endswith("sf0.1"):
    sys.exit(f"refusing: {bench_path} is for sf={data.get('sf')!r}, snapshot is sf0.1")
queries = data["queries"]

entries = "\n".join(
    f'    "{name}" -> {round(sec, 4)},' for name, sec in sorted(queries.items())
)
body = f"  val secondsAtSf01: Map[String, Double] = Map(\n{entries}\n  )"

with open(scala_path) as f:
    src = f.read()
# Match from the map declaration through its closing paren, whether that
# paren sits on its own line (this script's output format) or trails the
# last entry (hand-edited form). The object's closing brace anchors the end.
new, n = re.subn(
    r"  val secondsAtSf01: Map\[String, Double\] = Map\(.*?\)(?=\n\})",
    body, src, count=1, flags=re.S)
assert n == 1, "secondsAtSf01 map literal not found"
with open(scala_path, "w") as f:
    f.write(new)
print(f"wrote {len(queries)} entries (total {data['value']:.1f}s) to {scala_path}")
