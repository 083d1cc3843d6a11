#!/usr/bin/env bash
# Regenerate the hand-drifting counts in README.md from ground truth
# (VERDICT r7 #7: the README said 314 tests when the suite had 328 —
# counts must be injected, not hand-maintained).
#
# Usage: scripts/refresh_readme_counts.sh [sbt-test-log]
#   - test/suite counts parse from the given sbt test log (default:
#     /tmp/sbt_test.log); if the log is missing or has no summary line,
#     the test counts are left untouched and a warning prints.
#   - the query-inventory count greps the QueryDef registry (the same
#     `"name" -> QueryDef(` shape SparkEntry assembles verbatim, so the
#     grep IS the registry size).
set -euo pipefail
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/sbt_test.log}"

# a capture taken on a loaded host self-flags (Bench.scala's start-load
# gate, VERDICT r10 #4) — refuse BEFORE touching anything
if [[ -f BENCH_LOCAL.json ]] && python3 - <<'EOF'
import json, sys
sys.exit(0 if json.load(open('BENCH_LOCAL.json')).get('invalid_capture') else 1)
EOF
then
  echo "ERROR: BENCH_LOCAL.json carries invalid_capture:true (loaded host" >&2
  echo "at capture start) — discard it (git checkout BENCH_LOCAL.json) and" >&2
  echo "re-capture in a quiet window." >&2
  exit 1
fi

# recursive over the queries tree — the per-family files live in
# queries/llm/ since the r10 split
NQUERIES=$(grep -rhoE '"[a-z0-9_]+" -> QueryDef\(' src/main/scala/graft/queries/ | sort -u | wc -l)
sed -i -E "s/full [0-9]+-query inventory/full ${NQUERIES}-query inventory/" README.md

# bench-metric count and total from the committed record
if [[ -f BENCH_LOCAL.json ]]; then
  NMETRICS=$(python3 -c "import json; print(len(json.load(open('BENCH_LOCAL.json'))['queries']))")
  sed -i -E "s/\([0-9]+ bench metrics/(${NMETRICS} bench metrics/" README.md
  TOTAL=$(python3 -c "import json; print(round(json.load(open('BENCH_LOCAL.json'))['value']))")
  sed -i -E "s/[0-9]+ s total\. The record is self-defending/${TOTAL} s total. The record is self-defending/" README.md
fi

# a FULL green suite is part of the blessed-record checklist (VERDICT
# r13 #1: the r13 "blessed record" commits shipped with a red suite) —
# refuse to bless without a fresh sbt test log showing zero failures
if [[ ! -f "$LOG" ]] || ! grep -qE 'Tests: succeeded [0-9]+,' "$LOG"; then
  echo "ERROR: no sbt test summary in $LOG — run 'sbt test 2>&1 | tee $LOG'" >&2
  echo "first; a blessed record requires a full green suite." >&2
  exit 1
fi
if ! grep -qE 'Tests: succeeded [0-9]+, failed 0,' "$LOG" || \
   grep -qE '\*\*\* [0-9]+ TEST(S)? FAILED|Suites: completed [0-9]+, aborted [1-9]' "$LOG"; then
  echo "ERROR: $LOG shows test failures — fix the suite before blessing." >&2
  exit 1
fi
NTESTS=$(grep -oE 'Tests: succeeded [0-9]+,' "$LOG" | tail -1 | grep -oE '[0-9]+')
NSUITES=$(grep -oE 'Suites: completed [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+')
sed -i -E "s/# [0-9]+ tests, [0-9]+ suites/# ${NTESTS} tests, ${NSUITES} suites/" README.md

grep -nE "tests, [0-9]+ suites|query inventory" README.md
