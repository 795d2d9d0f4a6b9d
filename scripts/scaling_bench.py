#!/usr/bin/env python
"""Scaling-efficiency evidence run (BASELINE.json north_rule).

The rule asks for throughput scaling efficiency >= 0.8 from N to 4N
executors.  No real cluster exists in this sandbox, so we run the
IDENTICAL job on IDENTICAL input at local[8] and local[32] on the same
32-core box (cores as the executor-count proxy) and report

    efficiency = throughput_32 / (4 * throughput_8)
               = T_8 / (4 * T_32)

Each parallelism level runs in its own subprocess (fresh JVM, no cache
bleed).  Raw results append to BENCH/scaling_runs.jsonl; the curated
analysis (bandwidth controls, Amdahl decomposition) is BENCH/BASELINE.md.

Usage:  python scripts/scaling_bench.py [n_files]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUN_SNIPPET = """
import json, sys, time, os
sys.path.insert(0, {repo!r})
# default 8g heap: measured 3x FASTER at 32 cores than 48g on this box
# (oversized heap wrecks GC geometry + page cache; see memory notes)
from polyminhash_spark.session import build_session
from polyminhash_spark.config import default_config
from polyminhash_spark.pipeline import run_pipeline

spark = build_session(app_name="polyminhash-scaling", master="local[{cores}]",
                      shuffle_partitions={parts})
src = spark.read.parquet({corpus!r})
src.count()  # warm the scan outside the timed window
cfg = default_config()
_kb = os.environ.get("POLYMINHASH_BAND_KEY_BITS")
if _kb:  # band-key-width experiment (BENCH/BASELINE.md r5)
    cfg = cfg.with_(band_key_bits=int(_kb))
t0 = time.time()
res = run_pipeline(spark, src, cfg, collect_metrics=False)
n_clusters = res.clusters.select("cluster_id").distinct().count()
wall = time.time() - t0
print(json.dumps({{"cores": {cores}, "wall_sec": round(wall, 2),
                   "clusters": n_clusters}}))
spark.stop()
"""


def _load1() -> float:
    return os.getloadavg()[0]


def run_level(cores: int, corpus: str,
              repeats: int = int(os.environ.get(
                  "POLYMINHASH_SCALING_REPEATS", "2"))) -> dict:
    """Best-of-N wall time for one parallelism level.  The sandbox host
    has noisy neighbors (load >> 0 with zero container processes), so a
    single run has ~2x variance; the MIN over repeats is the honest
    throughput estimate (interference only ever adds time).  Cleanliness
    is judged on AMBIENT load (before each run) — the after-reading
    always includes our own just-finished burst.  Threshold 1.5:
    measured ambient 3.5 inflates a 32-core run 2.5-4x (it steals
    cores AND memory bandwidth), so 4.0 was far too lenient."""
    runs = []
    for _ in range(repeats):
        waited = 0
        while _load1() > 1.5 and waited < 900:
            time.sleep(15)
            waited += 15
        load_before = _load1()
        code = RUN_SNIPPET.format(repo=REPO, cores=cores, corpus=corpus,
                                  parts=cores * 2)
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=3600)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            # surface the subprocess failure (a silent IndexError here
            # hid a GCLocker heap crash during the 2.6M campaign) —
            # 2.6M+ files need POLYMINHASH_DRIVER_MEM=12g
            # exception-class lines first (a Java stack's tail loses the
            # "Caused by" header — the 5.2M r5 crash was undiagnosable
            # from the tail alone), then the raw tail for context
            errs = [l for l in out.stderr.splitlines()
                    if "Error" in l or "Exception" in l][:25]
            print(f"run at {cores} cores produced no result; "
                  "error lines:\n" + "\n".join(errs)
                  + "\nstderr tail:\n" + out.stderr[-3000:],
                  file=sys.stderr)
            raise RuntimeError(f"scaling run failed at {cores} cores")
        r = json.loads(lines[-1])
        r["host_load_before"] = round(load_before, 1)
        runs.append(r)
    best = min(runs, key=lambda r: r["wall_sec"])
    best["all_wall_sec"] = [r["wall_sec"] for r in runs]
    best["all_load_before"] = [r["host_load_before"] for r in runs]
    return best


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    corpus = f"/tmp/polyminhash_scaling_corpus_{n_files}_s42.parquet"
    if not os.path.exists(corpus):
        from polyminhash_spark.corpus import CorpusParams, write_corpus_parquet
        t0 = time.time()
        write_corpus_parquet(corpus, CorpusParams(n_files=n_files,
                                                  dup_frac=0.2, seed=42))
        print(f"corpus generated in {time.time()-t0:.0f}s", file=sys.stderr)

    r8 = run_level(8, corpus)
    r32 = run_level(32, corpus)
    clean = max(r8["all_load_before"] + r32["all_load_before"]) < 2.0
    assert r8["clusters"] == r32["clusters"], "parallelism changed results!"

    tp8 = n_files / r8["wall_sec"]
    tp32 = n_files / r32["wall_sec"]
    eff = tp32 / (4 * tp8)
    result = {
        "n_files": n_files,
        "clusters": r32["clusters"],
        "wall_sec_8": r8["wall_sec"], "wall_sec_32": r32["wall_sec"],
        "all_wall_sec_8": r8["all_wall_sec"],
        "all_wall_sec_32": r32["all_wall_sec"],
        "files_per_sec_8": round(tp8, 1), "files_per_sec_32": round(tp32, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
        "ambient_load_before_runs": r8["all_load_before"] + r32["all_load_before"],
        "clean_measurement": clean,
    }
    print(json.dumps(result))
    if clean and "--write" in sys.argv:
        # append the raw result to BENCH/scaling_runs.jsonl; the curated
        # analysis (controls, Amdahl decomposition, methodology) lives in
        # BENCH/BASELINE.md and is maintained by hand from these runs
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
