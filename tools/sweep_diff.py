"""Diff a fresh scale-sweep artifact against the committed prior.

The per-round discipline (VERDICT r10 "Next #3") wants every sf3 sweep
DIFFED against the last committed one, so a status flip or a vanished
query is a loud line in SCALECHECK instead of a silent artifact
overwrite.

Usage: python tools/sweep_diff.py <new.json> <git-ref:path>
   e.g. python tools/sweep_diff.py .testdata/sweep_sf3.json \
            HEAD:artifacts/sweep_sf3.json
"""

from __future__ import annotations

import json
import subprocess
import sys


def load(spec: str) -> dict:
    if ":" in spec:  # git ref, e.g. HEAD:artifacts/sweep_sf3.json
        out = subprocess.run(
            ["git", "show", spec], capture_output=True, text=True, check=True)
        return json.loads(out.stdout)
    with open(spec) as fh:
        return json.load(fh)


def main() -> None:
    new = load(sys.argv[1])
    old = load(sys.argv[2])
    nq, oq = new["queries"], old["queries"]
    flips = {
        k: (oq[k]["status"], nq[k]["status"])
        for k in sorted(set(nq) & set(oq))
        if nq[k]["status"] != oq[k]["status"]
    }
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    n_ok = sum(1 for v in nq.values() if v["status"] == "ok")
    print(f"new: {new.get('summary', '')} (head {new.get('head')}"
          f"{'+dirty' if new.get('dirty') else ''})")
    print(f"old: {old.get('summary', '')} (head {old.get('head')}"
          f"{'+dirty' if old.get('dirty') else ''})")
    print(f"queries: {len(nq)} now / {len(oq)} before; ok now: {n_ok}")
    print(f"status flips: {flips or 'none'}")
    print(f"added: {added or 'none'}")
    print(f"removed: {removed or 'none'}")
    sys.exit(1 if flips or removed else 0)


if __name__ == "__main__":
    main()
