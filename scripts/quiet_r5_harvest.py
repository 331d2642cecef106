#!/usr/bin/env python
"""Round-5 opportunistic quiet-window harvester.

The sandbox is shared and external load (loadavg 35-42 for most of the
round) destroys timing runs. This loops for a bounded wall-clock,
sleeping until the 1-minute loadavg drops below the gate, then fires
ONE measurement per quiet window, alternating between:

  - flagship throughput (local[32], repl=2048, sf0.1), and
  - the 8->32 scaling pair (local[8] then local[32], identical input),

appending every result to /tmp/r5_harvest.jsonl. `touch
/tmp/bench_pause` pauses it (so foreground pytest/bench runs don't
collide); removing the file resumes. Best-of results get merged into
BENCH/THROUGHPUT.md and BENCH/scaling_runs.jsonl by hand afterwards —
a loaded rerun never clobbers a quiet-window record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/r5_harvest.jsonl"
PAUSE = "/tmp/bench_pause"
GATE = 2.0
DEADLINE_S = float(os.environ.get("HARVEST_DEADLINE_S", "16200"))


def emit(rec: dict) -> None:
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def throughput_once(cpus: str, repl: str) -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_SCALING_REPL=repl)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--throughput"],
            env=env, capture_output=True, text=True, cwd=REPO,
            timeout=1500)
    except subprocess.TimeoutExpired:
        # an externally-loaded 8-core leg can blow any budget — log
        # and move on instead of killing the whole harvester
        emit({"kind": "timeout", "cpus": cpus})
        return None
    if out.returncode != 0:
        emit({"kind": "error", "cpus": cpus, "rc": out.returncode,
              "stderr_tail": out.stderr[-500:]})
        return None
    try:
        return json.loads(out.stdout.strip().splitlines()[-1])
    except (IndexError, ValueError):
        emit({"kind": "error", "cpus": cpus, "rc": 0,
              "stdout_tail": out.stdout[-300:]})
        return None


def main() -> None:
    t0 = time.time()
    turn = 0
    while time.time() - t0 < DEADLINE_S:
        if os.path.exists(PAUSE) or os.getloadavg()[0] >= GATE:
            time.sleep(20)
            continue
        load0 = os.getloadavg()[0]
        if turn % 2 == 1:
            r = throughput_once("32", "2048")
            if r:
                emit({"kind": "throughput", "load_pre": load0, **r})
        else:
            lo = throughput_once("8", "2048")
            if lo:
                emit({"kind": "scaling_lo", "load_pre": load0, **lo})
                # the lo leg itself leaves loadavg elevated (~13 from
                # our own 8-core job) — wait for decay before gating
                # the hi leg, else the pair never completes
                decay_deadline = time.time() + 600
                while (time.time() < decay_deadline
                       and (os.getloadavg()[0] >= GATE
                            or os.path.exists(PAUSE))):
                    time.sleep(15)
                if os.getloadavg()[0] < GATE and not os.path.exists(PAUSE):
                    hi = throughput_once("32", "2048")
                    if hi:
                        eff = (hi["triples_per_sec"]
                               / lo["triples_per_sec"] / 4.0)
                        emit({"kind": "scaling_pair", "lo": lo, "hi": hi,
                              "efficiency": round(eff, 3)})
                else:
                    emit({"kind": "scaling_hi_skipped",
                          "loadavg_1m": os.getloadavg()[0]})
        turn += 1
        time.sleep(10)
    emit({"kind": "done", "wall_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
