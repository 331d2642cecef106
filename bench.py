#!/usr/bin/env python
"""Benchmark harness.

Default: run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}.

--scaling: re-exec itself at two parallelism levels (local[8] and
local[32]) on identical input and report throughput at both plus
scaling efficiency (BASELINE.md protocol: sandbox proxy for N → 4N
executors), writing BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries (subset of __spark_entry__.queries(); flagship first)
HEADLINE = [
    "jsonld_doc_triples",
    "nquads_roundtrip",
    "canonicalize_anon",
    "entity_link",
    "dedup_exact",
    "minhash_pairs",
    "simhash",
    "fingerprint",
    "quality_score",
    "token_count_bpe",
    "cosine_topk",
    "ann_topk",
    "media_features",
    "cc_components",
    "lineitem_agg",
    "top_orders",
    "window_running",
]


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def run_once() -> dict:
    import __spark_entry__ as E
    from jsonld_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # warm the JVM JIT, the Python UDF worker pool, and the Arrow channel
    # once before timing (worker fork/init otherwise lands on query #1)
    qs["dedup_exact"](spark, SF_DIR).count()
    qs["jsonld_doc_triples"](spark, SF_DIR).count()
    total = 0.0
    n_triples = 0
    for name in HEADLINE:
        best, n = None, 0
        for _ in range(2):  # best-of-2: steady state, not scheduler noise
            t0 = time.perf_counter()
            n = qs[name](spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        rows[name] = n
        total += best
        if name == "jsonld_doc_triples":
            n_triples = n
    triples_per_sec = n_triples / timings["jsonld_doc_triples"] \
        if timings.get("jsonld_doc_triples") else 0.0
    result = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "cpus": int(CPUS),
        "rows": rows,
        "triples_per_sec": round(triples_per_sec, 1),
    }
    spark.stop()
    return result


def run_scaling() -> None:
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    tp8 = results["8"]["triples_per_sec"]
    tp32 = results["32"]["triples_per_sec"]
    eff = tp32 / (4 * tp8) if tp8 else 0.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("# BENCH results — scaling protocol (BASELINE.md)\n\n")
        f.write(f"Corpus: `{SF_DIR}` (sf={sf_of(SF_DIR)}), identical input "
                f"at both parallelism levels.\n\n")
        f.write("| parallelism | headline total (s) | flagship triples/sec |\n")
        f.write("|---|---|---|\n")
        for cpus in ("8", "32"):
            r = results[cpus]
            f.write(f"| local[{cpus}] | {r['value']} | "
                    f"{r['triples_per_sec']} |\n")
        f.write(f"\nScaling efficiency local[8]→local[32] "
                f"(throughput@4N / (4 × throughput@N)): **{eff:.3f}** "
                f"(target ≥ 0.8 per BASELINE.json)\n\n")
        f.write("Per-query seconds:\n\n```json\n")
        f.write(json.dumps({c: results[c]["queries"] for c in results},
                           indent=2))
        f.write("\n```\n")
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "tp8": tp8, "tp32": tp32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_once()))
