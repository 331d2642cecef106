#!/usr/bin/env python
"""Round-4 post-fix measurement chain: quiet-gated bench_r4 at sf0.1
and sf1, then a full bench.py at sf0.1, merging per-query minima with
any prior best file so a loaded rerun never clobbers a quiet result."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEST = "/tmp/bench_r4_best.json"


def wait_quiet(threshold: float = 2.5, timeout_s: float = 7200.0) -> float:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = os.getloadavg()[0]
        if load < threshold:
            return load
        time.sleep(20)
    return os.getloadavg()[0]


def last_json(text: str) -> dict | None:
    for line in reversed(text.strip().splitlines() or [""]):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def merge_best(sf_dir: str, queries: dict) -> None:
    best = {}
    if os.path.exists(BEST):
        with open(BEST) as f:
            best = json.load(f)
    cur = best.setdefault(sf_dir, {})
    for name, rec in queries.items():
        old = cur.get(name)
        if old is None or rec["sec"] < old["sec"]:
            cur[name] = rec
    with open(BEST, "w") as f:
        json.dump(best, f, indent=1)


def main() -> None:
    py = sys.executable
    for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1"):
        for attempt in range(2):
            load = wait_quiet()
            r = subprocess.run([py, "scripts/bench_r4.py", sf_dir],
                               capture_output=True, text=True, cwd=REPO)
            rec = last_json(r.stdout)
            post = os.getloadavg()[0]
            print(f"{sf_dir} attempt {attempt}: rc={r.returncode} "
                  f"pre={load:.1f}", flush=True)
            if rec and "queries" in rec:
                merge_best(sf_dir, rec["queries"])
    # full headline bench at sf0.1 (quiet-gated, single run recorded raw)
    load = wait_quiet()
    r = subprocess.run([py, "bench.py"], capture_output=True, text=True,
                       cwd=REPO)
    rec = last_json(r.stdout)
    with open("/tmp/r4_bench_sf01.json", "w") as f:
        json.dump({"load_at_start": load, "result": rec}, f, indent=1)
    print("all done", flush=True)


if __name__ == "__main__":
    main()
