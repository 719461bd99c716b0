#!/usr/bin/env python3
"""Local simulation of the driver's bench-parse gate.

Usage: python3 tools/check_bench.py <stdout-capture-file>

BENCH_r01.json showed the driver keeps only a bounded tail of the sbt stdout
(~3000 chars) and parses the JSON metric line out of it; the r1 line was
longer than the window and its head was cut off ("parsed": null). This
script replays that failure mode: it takes the LAST 3000 chars of the
capture, finds the last line containing '"metric"', and json.loads it.
Also validates bench.json in cwd if present.

Dev-only tooling (driver-side python); not part of the shipped library.
"""
import json
import sys

TAIL = 3000


def main():
    raw = open(sys.argv[1], errors="replace").read()
    tail = raw[-TAIL:]
    lines = [l for l in tail.splitlines() if '"metric"' in l]
    if not lines:
        print("FAIL: no metric line inside the %d-char tail" % TAIL)
        sys.exit(1)
    line = lines[-1]
    try:
        parsed = json.loads(line)
    except json.JSONDecodeError as e:
        print("FAIL: metric line in tail is not valid JSON (%s)" % e)
        print("line head: %r" % line[:120])
        sys.exit(1)
    # BENCH_r04.json shows the driver parses the LAST metric line it finds,
    # i.e. the O(1) tail summary (metric/value/n_queries/...), NOT the full
    # per-query line — so that is what this gate validates
    for k in ("metric", "value", "unit", "sf"):
        assert k in parsed, "missing key %s" % k
    nq = parsed.get("n_queries", len(parsed.get("queries", [])))
    print("PASS: tail-parsed metric line, %d chars, %d queries, total %.1fs, %d errors" %
          (len(line), nq, parsed["value"], parsed.get("n_errors", 0)))
    try:
        full = json.load(open("bench.json"))
        print("PASS: bench.json parses, keys: %s" % sorted(full.keys()))
    except FileNotFoundError:
        print("WARN: no bench.json in cwd")


if __name__ == "__main__":
    main()
