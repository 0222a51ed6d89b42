#!/usr/bin/env python3
"""Registry/correctness drift gate (VERDICT r7 item 3, r8 item 3).

The driver's CORRECTNESS_r{N}.json only contains entries for queries that
REACHED the comparison stage — a query that fails analysis (e.g. r7/r8's
q03 UNRESOLVED_COLUMN) silently disappears instead of surfacing as `err`,
so "all listed pass" can mask a broken query. This gate closes that hole:
every key in the committed REGISTRY.txt (pinned to the live
`SparkEntry.queries` keyset by `RegistrySpec`) must appear in the
correctness file, and every present entry must be fully green.

    python3 tools/correctness_gate.py REGISTRY.txt CORRECTNESS_r09.json

Exit 1 on ANY missing key, red entry, or unknown extra key.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    registry = {ln.strip() for ln in open(sys.argv[1]) if ln.strip()}
    correctness = json.load(open(sys.argv[2]))

    missing = sorted(registry - set(correctness))
    extra = sorted(set(correctness) - registry)
    red = sorted(
        name for name, e in correctness.items()
        if not (e.get("rows_match") and e.get("schema_match")
                and e.get("hash_match")) or e.get("err"))

    print(f"registry keys : {len(registry)}  ({sys.argv[1]})")
    print(f"correctness   : {len(correctness)}  ({sys.argv[2]})")
    print(f"present+green : {len(set(correctness) & registry) - len([r for r in red if r in registry])}")
    for name in missing:
        print(f"MISSING : {name}  (query never reached the comparison stage — "
              f"likely analysis/runtime error; check bench errors)")
    for name in red:
        print(f"RED     : {name}  {correctness[name]}")
    for name in extra:
        print(f"UNKNOWN : {name}  (in correctness file but not in registry)")

    if missing or red or extra:
        print(f"FAIL — {len(missing)} missing, {len(red)} red, {len(extra)} unknown")
        return 1
    print(f"PASS — {len(registry)}/{len(registry)} registry queries present and green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
