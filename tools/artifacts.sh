#!/bin/sh
# Regenerate every verification artifact in one pass, in the order that
# keeps timings clean (plans first; then the two oracle sweeps; a settle
# pause so the 1-minute loadavg decays from our own sweep; bench LAST so
# nothing competes with the timed runs).
#
#   sh tools/artifacts.sh
#
# Outputs: PLANS.md, /tmp/checks_001.txt, /tmp/checks_01.txt (paste into
# CHECKS_LOCAL.md / SCALECHECK.md), and bench JSON on stdout.
#
# No pipelines around check.py: its non-zero exit on a FAILing query
# must stop the script (a `| tee | tail` chain would swallow it under
# plain POSIX sh, where set -e only sees the last pipe stage).
set -e
cd "$(dirname "$0")/.."
python tools/plan_audit.py /root/testdata/sf0.01 > /dev/null
python tools/check.py /root/testdata/sf0.01 > /tmp/checks_001.txt
tail -1 /tmp/checks_001.txt
python tools/check.py /root/testdata/sf0.1 > /tmp/checks_01.txt
tail -1 /tmp/checks_01.txt
# scale rungs (VERDICT r10 "Next #3": the full sf3 sweep joins sf1 in
# the per-round chain — the rung that catches size-gated code paths;
# scale_sweep refuses a contended host, generates missing data, and
# writes head-stamped artifacts to .testdata/sweep_sf{1,3}.json —
# copy those over artifacts/ and diff against the committed priors
# for the SCALECHECK section). The sweeps gate on host idleness and
# the preceding check saturates the 1-minute loadavg, so wait for it
# to decay below the gate before each sweep (max 5 min).
# waits for BOTH loadavg decay and the previous stage's JVM teardown —
# a check.py JVM lingers a few seconds past its python's exit, and the
# sweep's orphan-JVM detector (correctly) refuses to start next to it
wait_idle() {
  i=0
  while { pgrep -x java > /dev/null \
          || [ "$(awk -v c="$(nproc)" '{exit !($1 > 0.45 * c)}' /proc/loadavg; echo $?)" = "0" ]; } \
        && [ "$i" -lt 30 ]; do
    sleep 10; i=$((i + 1))
  done
}
wait_idle
python tools/scale_sweep.py 1.0
cp .testdata/sweep_sf1.json artifacts/sweep_sf1.json
wait_idle
python tools/scale_sweep.py 3.0
cp .testdata/sweep_sf3.json artifacts/sweep_sf3.json
# let the 1-minute loadavg decay below bench.py's host_contended
# threshold — the sweeps above saturate every core right before this
sleep 75
python bench.py
