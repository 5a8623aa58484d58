"""Round-6 scaling evidence (VERDICT r5 #1 / #8 'done' criteria).

Same pinned protocol as round 5 (local-cluster[1,4,3072] vs [4,4,3072],
SGSPARK_SHUFFLE_PARTITIONS=128 at BOTH levels, subprocess per run, min
stat, leading control pair), but POOLED: >=3 paired runs per variant in
one session so single-pair noise (squares r5: 1.116 vs 0.901) is
visible and the reported statistic is min-pooled over n>=3
(min over 4-core walls / min over 16-core walls / 4).

Event logs stay on via SGSPARK_EXTRA_CONF so the effective stage width
is verifiable from the recorded stages (round-5 audit rule).

Usage: python tools/scaling_r6.py [variant ...]
       (default: control ngon64_2m concave squares)
Appends to BENCH/SCALING_R6_RAW.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "SCALING_R6_RAW.md")

BASE_ENV = {
    "SGSPARK_MASTER": "local-cluster",
    "SGSPARK_EXEC_CORES": "4",
    "SGSPARK_EXEC_MEM_MB": "3072",
    "SGSPARK_SHUFFLE_PARTITIONS": "128",
    "SPARK_GRAFT_SCALE": "1600",
    "SPARK_GRAFT_FORCE_KERNEL": "1",
    "SPARK_GRAFT_ONLY": "spatial_pipeline",
    "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
    # event logs ALWAYS on (round-5 audit rule): effective stage width is
    # verifiable from the recorded stages, not the harness's intent
    "SGSPARK_EXTRA_CONF": ("spark.eventLog.enabled=true;"
                           "spark.eventLog.dir=file:///tmp/ev_r6"),
}

VARIANTS = {
    "squares": {},
    "concave": {"SGSPARK_CONCAVE_ZONES": "1"},
    # the round-5 weak-watch variant: 64-vertex stars at 2M docs — the
    # most bytes-per-candidate-hungry workload; round 6's chained pack
    # (~2x fewer bytes/edge) targets exactly this residual
    "ngon64_2m": {"SGSPARK_NGON_ZONES": "64", "SPARK_GRAFT_SCALE": "400"},
    "ngon64_1m": {"SGSPARK_NGON_ZONES": "64", "SPARK_GRAFT_SCALE": "200"},
}

N_PAIRS = int(os.environ.get("SCALING_PAIRS", "3"))


def log(line: str):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def bench_run(cores: int, extra: dict) -> float:
    env = {**os.environ, **BASE_ENV, **extra,
           "SPARK_GRAFT_CPUS": str(cores)}
    t0 = time.time()
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        log(f"    RUN FAILED ({cores} cores): {out.stderr[-500:]}")
        return float("nan")
    r = json.loads(lines[-1])
    sec = r["queries"]["spatial_pipeline"]
    log(f"    {cores:2d} cores: spatial_pipeline {sec}s "
        f"(wall {round(time.time() - t0, 1)}s, n_docs {r['n_docs']})")
    return float(sec)


def control_run() -> None:
    script = r'''
import os, time
from pyspark.sql import SparkSession, functions as F
cores = int(os.environ["SPARK_GRAFT_CPUS"])
n_exec = max(cores // 4, 1)
spark = (SparkSession.builder.master(f"local-cluster[{n_exec},4,3072]")
         .config("spark.executor.memory", "3072m")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "4g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
N = 6_000_000_000
dim = spark.range(100000).withColumnRenamed("id", "k") \
    .withColumn("v", F.xxhash64(F.col("k") * 7))
def make(n):
    d = spark.range(n, numPartitions=64).withColumn("k", F.col("id") % 100000)
    return d.join(F.broadcast(dim), "k").agg(
        F.count("*").alias("n"),
        F.sum(F.hash(F.col("id"), F.col("v")).cast("long")).alias("s"))
make(N // 10).collect()
t0 = time.time()
make(N).collect()
print(f'CTRL {time.time()-t0:.2f}')
'''
    for cores in (4, 16):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=1800)
        sec = [l for l in out.stdout.splitlines() if l.startswith("CTRL")]
        log(f"    control {cores:2d} cores: "
            f"{sec[0].split()[1] if sec else 'FAILED ' + out.stderr[-200:]}s")


def main():
    variants = sys.argv[1:] or ["control", "ngon64_2m", "concave", "squares"]
    log(f"\n## scaling_r6 session {time.strftime('%Y-%m-%d %H:%M')} "
        f"(variants: {variants}, pairs per variant: {N_PAIRS})")
    for v in variants:
        if v == "control":
            log("  control (pure-Spark 6e9-row broadcast-agg):")
            control_run()
            continue
        extra = VARIANTS[v]
        t4s, t16s = [], []
        for pair in range(1, N_PAIRS + 1):
            log(f"  {v} pair {pair}:")
            t4 = bench_run(4, extra)
            t16 = bench_run(16, extra)
            if t4 == t4 and t16 == t16:
                log(f"    -> paired efficiency: {round(t4 / t16 / 4, 3)}")
                t4s.append(t4)
                t16s.append(t16)
        if t4s:
            log(f"  {v} POOLED (n={len(t4s)}): min4={min(t4s)} "
                f"min16={min(t16s)} "
                f"min-pooled efficiency={round(min(t4s) / min(t16s) / 4, 3)}")


if __name__ == "__main__":
    main()
