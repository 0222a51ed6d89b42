#!/usr/bin/env python3
"""Mechanical fold of iso_bench raw passes into one gated artifact.

Round 17 folded two better spot minima into BENCH_ISO_r17.json by hand
(commit 802dd02) — disclosed, but a norm, not a check (VERDICT r17
"What's wrong" #3 / ADVICE #2). This tool makes the rule mechanical and
one-sided-bias-proof by construction:

  POLICY (fixed, declared up front): per query, keep the MINIMUM median
  across ALL given passes — every pass is consulted for every query, so
  the fold can never keep an improvement while ignoring a same-file
  regression (the r17 one-direction-folding concern).

Usage:
    python3 tools/iso_fold.py OUT.json PASS1.jsonl [PASS2.jsonl ...]

Each kept median is written as its OWN single-query line stamped with
its provenance (`"source_pass": "<basename>"`) — never the source line
verbatim: a multi-query source line (e.g. a round-robin artifact fed as
a pass) would smuggle its co-travelling non-minimum medians past the
policy via load_iso's last-wins merge. The artifact opens with a
self-describing fold header:
    {"metric":"iso_fold","policy":"min-median-of-passes","passes":[...]}

Failure readings never vanish (review r18): a query that CRASHED in any
pass (median -1, Bench's crash marker) REFUSES the fold — a crash is
code or infra, not one-sided noise, and min-of-passes must not paper
over it with an older success; re-run the pass or drop it explicitly.
A query whose every appearance was TRUNCATED (global deadline) is
carried through in a marker line's "truncated" field so bench_gate
reports it instead of silently comparing nothing.

bench_gate.py --iso VERIFIES folded artifacts (VERDICT r17 order #3):
every source_pass must cite a committed pass containing that median,
AND the declared min policy is recomputed from the cited passes — a
folded median above the true cross-pass minimum fails the gate. Raw
passes therefore must be committed alongside the folded artifact.
"""
import json
import os
import sys


def pass_lines(path: str):
    """Yield each metric:total doc in a pass file."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                continue
            if doc.get("metric") != "total":
                continue
            yield doc


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, passes = sys.argv[1], sys.argv[2:]
    best: dict = {}       # query -> (median, source_basename, spread|None)
    truncated: set = set()
    for p in passes:
        base = os.path.basename(p)
        for doc in pass_lines(p):
            spreads = {**doc.get("spread", {}), **doc.get("extra_spread", {})}
            truncated.update(doc.get("truncated", []))
            merged = {**doc.get("queries", {}), **doc.get("extra", {})}
            for q, med in merged.items():
                if med == -1:
                    sys.exit(f"iso_fold: REFUSED — {q} crashed (median -1) "
                             f"in {base}; a crash is not one-sided noise, "
                             "so min-of-passes must not fold past it. "
                             "Re-run that pass or drop it explicitly.")
                if med is None or med <= 0:
                    continue
                if q not in best or med < best[q][0]:
                    best[q] = (med, base, spreads.get(q))
    if not best:
        sys.exit(f"iso_fold: no per-query medians found in {passes}")
    only_truncated = sorted(truncated - set(best))
    with open(out, "w") as f:
        header = {"metric": "iso_fold", "policy": "min-median-of-passes",
                  "passes": [os.path.basename(p) for p in passes]}
        f.write(json.dumps(header) + "\n")
        for q in sorted(best):
            med, base, spread = best[q]
            line = {"metric": "total", "queries": {q: med},
                    "source_pass": base}
            if spread is not None:
                line["spread"] = {q: spread}
            f.write(json.dumps(line) + "\n")
        if only_truncated:
            # queries with no valid median in ANY pass: surface as
            # TRUNCATED through the gate, never a silent omission
            f.write(json.dumps({"metric": "total", "queries": {},
                                "truncated": only_truncated}) + "\n")
    print(f"iso_fold: {len(best)} queries folded from {len(passes)} "
          f"pass(es) into {out} (policy: min-median-of-passes"
          + (f"; {len(only_truncated)} truncated-only carried through"
             if only_truncated else "") + ")")


if __name__ == "__main__":
    main()
