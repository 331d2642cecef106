#!/usr/bin/env python
"""Round measurement protocol: wait for a quiet box, then run the full
bench at sf0.1 and sf1 plus the minhash cut-cost comparison, writing one
JSON file per run under /tmp. Timing on this shared sandbox is only
meaningful below ~2 loadavg, so each step blocks on a quiet window
first (same rationale as bench.py --scaling's _wait_quiet)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_quiet(threshold: float = 2.5, timeout_s: float = 7200.0) -> float:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = os.getloadavg()[0]
        if load < threshold:
            return load
        time.sleep(20)
    return os.getloadavg()[0]


def run(cmd: list[str], out_path: str, env: dict | None = None) -> None:
    load = wait_quiet()
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       env={**os.environ, **(env or {})})
    rec = {"cmd": cmd, "env": env, "rc": r.returncode,
           "load_at_start": load, "wall_s": round(time.time() - t0, 1)}
    for line in reversed(r.stdout.strip().splitlines() or [""]):
        try:
            rec["result"] = json.loads(line)
            break
        except ValueError:
            continue
    if "result" not in rec:
        rec["stdout_tail"] = r.stdout[-2000:]
        rec["stderr_tail"] = r.stderr[-2000:]
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"{out_path}: rc={r.returncode} wall={rec['wall_s']}s",
          flush=True)


def main() -> None:
    py = sys.executable
    run([py, "bench.py"], "/tmp/r3_bench_sf01.json")
    run([py, "bench.py"], "/tmp/r3_bench_sf1.json",
        {"SPARK_GRAFT_SF_DIR": "/tmp/sf1"})
    run([py, "scripts/bench_minhash_cut.py", "/root/testdata/sf0.1"],
        "/tmp/r3_mcut_sf01.json")
    run([py, "scripts/bench_minhash_cut.py", "/tmp/sf1"],
        "/tmp/r3_mcut_sf1.json")
    print("all done", flush=True)


if __name__ == "__main__":
    main()
