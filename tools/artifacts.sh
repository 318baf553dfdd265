#!/bin/sh
# Regenerate every verification artifact in one pass, in the order that
# keeps timings clean (plans first — it executes nothing; then the two
# oracle sweeps; bench LAST so nothing competes with the timed runs).
#
#   sh tools/artifacts.sh
#
# Outputs: PLANS.md, /tmp/checks_001.txt, /tmp/checks_01.txt (paste into
# CHECKS_LOCAL.md / SCALECHECK.md), and bench JSON on stdout.
set -e
cd "$(dirname "$0")/.."
python tools/plan_audit.py /root/testdata/sf0.01 > /dev/null
python tools/check.py /root/testdata/sf0.01 | tee /tmp/checks_001.txt | tail -1
python tools/check.py /root/testdata/sf0.1 | tee /tmp/checks_01.txt | tail -1
python bench.py
