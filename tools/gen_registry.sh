#!/bin/bash
# Regenerate REGISTRY.txt — the committed list of every SparkEntry.queries
# key, consumed by tools/correctness_gate.py. RegistrySpec pins this file
# to the live registry, so run this after adding/removing a query and
# commit the result.
cd "$(dirname "$0")/.."
grep -hoE '"[qx][0-9]+_[A-Za-z0-9_]+" ->' \
  src/main/scala/graft/engine/Queries.scala \
  src/main/scala/graft/engine/IndicatorQueries.scala \
  src/main/scala/graft/ext/ExtQueries.scala \
  src/main/scala/graft/ext/CurationQueries.scala \
  | sed -E 's/" ->//; s/"//' | sort -u > REGISTRY.txt
wc -l REGISTRY.txt
