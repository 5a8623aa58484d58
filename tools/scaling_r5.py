"""Round-5 scaling evidence runs (VERDICT r4 #1 'done' criterion).

Pinned protocol (BENCH/SCALING_RUNS_KERNEL.md): local-cluster[1,4,3072]
(N = 4 cores) vs local-cluster[4,4,3072] (4N = 16 cores), separate
executor JVMs, SGSPARK_SHUFFLE_PARTITIONS=128 at BOTH levels (round-5
audit: bench.py had overridden the env pin since round 2, so earlier
sessions effectively ran 16@4c / 32@16c; fixed, and 128 chosen so the
pair stage runs >=8 waves at 16 cores — straggler amortization),
SPARK_GRAFT_FORCE_KERNEL=1 (fully distributed join), 8M interleaved docs
(SPARK_GRAFT_SCALE=1600) vs 15k zones, subprocess per run, min stat,
PAIRED runs (4-core then 16-core back-to-back per pair).

Zone shapes per variant: squares (rect fast path), concave (6-edge
L-shapes), ngon64 (64-vertex star polygons — the >32-edge workload the
round-5 cell-subset pack exists for).  A same-session pure-Spark control
pair records today's box ceiling.

Usage: python tools/scaling_r5.py [variant ...]   (default: control
ngon64 concave)  Results appended to BENCH/SCALING_R5_RAW.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "SCALING_R5_RAW.md")

BASE_ENV = {
    "SGSPARK_MASTER": "local-cluster",
    "SGSPARK_EXEC_CORES": "4",
    "SGSPARK_EXEC_MEM_MB": "3072",
    "SGSPARK_SHUFFLE_PARTITIONS": "128",
    "SPARK_GRAFT_SCALE": "1600",
    "SPARK_GRAFT_FORCE_KERNEL": "1",
    "SPARK_GRAFT_ONLY": "spatial_pipeline",
    "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
}

VARIANTS = {
    "squares": {},
    "concave": {"SGSPARK_CONCAVE_ZONES": "1"},
    # ngon64 zones fan out ~131 pairs/point (r200-2000 stars cover the
    # world many times over), so 8M docs would blow the per-run timeout;
    # 1M docs keeps the 4-core run ~550s while compute still dominates
    # the ~15s fixed costs.  Efficiency is a within-pair ratio, so the
    # scale choice only needs to be identical across the pair.
    "ngon64": {"SGSPARK_NGON_ZONES": "64", "SPARK_GRAFT_SCALE": "200"},
}


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
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    code = open("/tmp/control_r5.py").read() if os.path.exists(
        "/tmp/control_r5.py") else None
    # inline control: same shape as round-4's /tmp/control_bench2.py
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
    variants = sys.argv[1:] or ["control", "ngon64", "concave"]
    log(f"\n## scaling_r5 session {time.strftime('%Y-%m-%d %H:%M')} "
        f"(variants: {variants})")
    for v in variants:
        if v == "control":
            log("  control (pure-Spark 6e9-row broadcast-agg):")
            control_run()
            continue
        extra = VARIANTS[v]
        for pair in (1, 2):
            log(f"  {v} pair {pair}:")
            t4 = bench_run(4, extra)
            t16 = bench_run(16, extra)
            if t4 == t4 and t16 == t16:
                log(f"    -> paired efficiency: {round(t4 / t16 / 4, 3)}")


if __name__ == "__main__":
    main()
