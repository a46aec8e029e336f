#!/usr/bin/env bash
# Three-SF oracle sweep — run before every end-of-round commit.
#
# The r2(sum(double)) / decimal-literal ulp failure class (CLAUDE.md:
# q09, q79) only shows up at untested group counts: a query can be
# hash-green at the sf0.01 driver gate and flip a cent at sf0.001 or
# sf0.1. This script runs graft.Verify + scripts/check_oracle.py at
# ALL THREE SFs so that class fails here instead of at the judge.
#
# check_oracle.py always exits 0, so pass/fail is parsed from its
# "FAIL" lines. Per-SF logs land in /tmp/sweep_<sf>{,_oracle}.log.
#
# A FOURTH corpus outside the driver family catches boundary-class
# bugs that need more groups than any shipped SF: pass an ABSOLUTE
# path to a GenData-generated corpus and the sweep runs the
# documents/embeddings-family oracle subset on it (Verify's "@docs"
# sentinel — the other tables don't exist there).
#
# Usage: scripts/sweep_oracle.sh            # all three SFs
#        scripts/sweep_oracle.sh sf0.1      # just one
#        scripts/sweep_oracle.sh /tmp/stress_x3   # generated corpus
#        scripts/sweep_oracle.sh sf0.001 sf0.01 sf0.1 /tmp/stress_x3
set -u
cd "$(dirname "$0")/.."
if [ $# -gt 0 ]; then SFS=("$@"); else SFS=(sf0.001 sf0.01 sf0.1); fi
FAIL=0
for SF in "${SFS[@]}"; do
  case "$SF" in
    /*) DIR="$SF"; SUBSET=" @docs"; SF="gen_$(basename "$SF")" ;;
    *)  DIR="/root/testdata/$SF"; SUBSET="" ;;
  esac
  OUT="/tmp/sweep_${SF}"
  rm -rf "$OUT"
  echo "=== $SF ($DIR): graft.Verify -> $OUT"
  if ! sbt -batch "runMain graft.Verify $DIR $OUT$SUBSET" >"/tmp/sweep_${SF}.log" 2>&1; then
    echo "FAIL $SF: Verify crashed (see /tmp/sweep_${SF}.log)"; FAIL=1; continue
  fi
  if ! python3 scripts/check_oracle.py "$DIR" "$OUT" >"/tmp/sweep_${SF}_oracle.log" 2>&1; then
    echo "FAIL $SF: check_oracle crashed (see /tmp/sweep_${SF}_oracle.log)"; FAIL=1; continue
  fi
  tail -1 "/tmp/sweep_${SF}_oracle.log" | sed "s/^/    $SF: /"
  if grep -q '^FAIL' "/tmp/sweep_${SF}_oracle.log"; then
    grep '^FAIL' "/tmp/sweep_${SF}_oracle.log" | sed "s/^/    $SF /"
    FAIL=1
  fi
  # a green run must END with "N/N oracle queries match" where the
  # two counts agree — a checker that silently compared nothing (or
  # died without a traceback) must not read as a pass
  if ! tail -1 "/tmp/sweep_${SF}_oracle.log" | grep -qE '^([0-9]+)/\1 oracle queries match$'; then
    echo "FAIL $SF: no N/N match line (see /tmp/sweep_${SF}_oracle.log)"; FAIL=1
  fi
done
if [ "$FAIL" -ne 0 ]; then echo "SWEEP: FAIL"; exit 1; fi
echo "SWEEP: all SFs green"
