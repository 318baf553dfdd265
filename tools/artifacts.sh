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
# let the 1-minute loadavg decay below bench.py's host_contended
# threshold — the sweeps above saturate every core right before this
sleep 75
python bench.py
