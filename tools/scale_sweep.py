"""One-command scale sweep (VERDICT r9 "What's missing #2").

Does, in order, everything the r9 sf1/sf3 manual protocol did:
  1. asserts host idleness — no orphan JVMs, 1-minute load under half
     the cores (orphan JVMs have polluted timings before; a sweep that
     starts contended is not evidence);
  2. generates the SF dir with tools/gen_testdata.py if missing;
  3. runs the FULL oracle sweep (every queries() + extra_queries()
     entry vs its DuckDB oracle — rows + schema + value hash) via
     tools/check.py;
  4. optionally times a query subset via tools/scale_bench.py
     (--bench [names...]);
  5. writes one self-describing artifact to
     .testdata/sweep_<tag>.json with HEAD + host stamps, and appends a
     summary line to stdout for SCALECHECK.md.

Usage:
  python tools/scale_sweep.py 1.0                  # sf1, oracle sweep
  python tools/scale_sweep.py 3.0 --only graph_ --bench
  python tools/scale_sweep.py 1.0 --force-contended   # override gate
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def assert_idle(force: bool) -> dict:
    """No foreign JVMs, load under half the cores — else abort (the
    r9 lesson: super-linear-looking sweep rows were contention, and
    every one cost an adjudication)."""
    me = os.getpid()
    jvms = []
    out = subprocess.run(["pgrep", "-a", "java"], capture_output=True,
                         text=True).stdout
    for ln in out.splitlines():
        pid = int(ln.split()[0])
        # our own session's JVM children have us as an ancestor; a
        # quick parent walk beats parsing /proc trees exactly
        anc, p = set(), pid
        for _ in range(10):
            try:
                with open(f"/proc/{p}/stat") as fh:
                    p = int(fh.read().split()[3])
            except OSError:
                break
            anc.add(p)
            if p <= 1:
                break
        if me not in anc:
            jvms.append(ln.strip())
    load = os.getloadavg()[0]
    cpus = os.cpu_count() or 1
    state = {"orphan_jvms": jvms, "load_1m": round(load, 2), "cpus": cpus}
    if (jvms or load > 0.5 * cpus) and not force:
        print(f"HOST NOT IDLE: {state} — kill the JVMs / wait for load "
              "to decay, or pass --force-contended (the artifact will "
              "carry the contention flag)", file=sys.stderr)
        raise SystemExit(2)
    return state


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "1.0"
    only = ""
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    bench_names: list[str] | None = None
    if "--bench" in sys.argv:
        rest = sys.argv[sys.argv.index("--bench") + 1:]
        bench_names = [a for a in rest if not a.startswith("--")]
    force = "--force-contended" in sys.argv

    from bench import provenance

    tag = "sf" + re.sub(r"\.0$", "", sf)
    sf_dir = os.path.join(HERE, ".testdata", tag)
    idle = assert_idle(force)

    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        print(f"generating {sf_dir} (sf={sf})...", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "gen_testdata.py"),
             sf, sf_dir], check=True)

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "check.py"), sf_dir]
        + ([only] if only else []),
        capture_output=True, text=True)
    sweep_sec = round(time.time() - t0, 1)
    rows = {}
    summary = ""
    for ln in proc.stdout.splitlines():
        m = re.match(r"(ok|FAIL|weak) +(\w+): (.*)", ln)
        if m:
            rows[m.group(2)] = {"status": m.group(1), "detail": m.group(3)}
        elif re.match(r"\d+ ok,", ln):
            summary = ln.strip()

    bench_log = None
    if bench_names is not None:
        subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "scale_bench.py"),
             sf_dir, f"sweep-{tag}"] + bench_names, check=True,
            stdout=subprocess.DEVNULL)
        bench_log = os.path.join(HERE, ".testdata", "scale_log.jsonl")

    artifact = {
        "sf": sf, "sf_dir": sf_dir, "only": only or None,
        "summary": summary, "sweep_sec": sweep_sec,
        "idleness": idle, "forced": force,
        "queries": rows,
        "bench_log": bench_log,
        **provenance(),
    }
    scope = f"_{only.rstrip('_')}" if only else ""
    out_path = os.path.join(HERE, ".testdata", f"sweep_{tag}{scope}.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"# SCALECHECK line — {tag}: {summary} in {sweep_sec}s "
          f"(head {artifact['head']}{'+dirty' if artifact['dirty'] else ''}, "
          f"host {artifact['host_fingerprint']}, load_1m {idle['load_1m']})")
    print(f"artifact: {out_path}")
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
