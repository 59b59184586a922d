#!/usr/bin/env python
"""Multi-JVM scaling evidence — the closest sandbox emulation of the
north rule's N→4N EXECUTOR criterion.

local[32] shares one JVM (scheduler + Arrow feeders compete with 32
Python workers), which is exactly what a real multi-executor cluster
does NOT do. This harness runs the north-star job as FOUR independent
8-core Spark processes (4 JVMs, taskset-pinned to disjoint 8-core
slices, each processing a quarter of the input, launched concurrently)
and compares aggregate throughput against ONE 8-core process — i.e.
4 executors vs 1 executor with per-executor resources held fixed.

Efficiency = (total images / concurrent wall) / (4 × single-process
throughput). Each measurement is min-of-N against host noise.

Prints one JSON line and appends nothing; copy results into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from rsgislib_spark.session import get_spark
from rsgislib_spark.pipeline import north_star

sf_dir = sys.argv[1]
rep = int(sys.argv[2])
spark = get_spark(master="local[8]", app_name="multijvm",
                  shuffle_partitions=16,
                  extra_conf={{"spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
                              "spark.driver.memory": "10g"}})
north_star(spark, sf_dir, n_partitions=128, replicate=rep).collect()  # warmup
t0 = time.perf_counter()
north_star(spark, sf_dir, n_partitions=128, replicate=rep).collect()
print(f"WALL {{time.perf_counter() - t0:.3f}}", flush=True)
spark.stop()
"""


def run_single(sf_dir: str, rep: int, cpuset: str) -> float:
    p = subprocess.run(
        ["taskset", "-c", cpuset, sys.executable, "-c", CHILD.format(repo=REPO),
         sf_dir, str(rep)],
        capture_output=True, text=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith("WALL "):
            return float(line.split()[1])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep_total = 128
    n_imgs_base = 20000  # sf0.1 part rows
    total_imgs = n_imgs_base * rep_total

    # 1 executor: one 8-core JVM does ALL the work (replicate 128)
    singles = [run_single(sf_dir, rep_total, "0-7") for _ in range(2)]
    t1 = min(singles)
    thr1 = total_imgs / t1

    # 4 executors: four 8-core JVMs, each a quarter (replicate 32),
    # launched concurrently on disjoint core slices
    # Fairness: like the single measurement, use each child's TIMED
    # section (startup + full-size warmup excluded). The four timed
    # sections run concurrently (startups are concurrent too), so the
    # aggregate compute wall is the max of the four child walls.
    walls4 = []
    for _ in range(2):
        procs = []
        for cs in ("0-7", "8-15", "16-23", "24-31"):
            procs.append(subprocess.Popen(
                ["taskset", "-c", cs, sys.executable, "-c",
                 CHILD.format(repo=REPO), sf_dir, str(rep_total // 4)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            ))
        child_walls = []
        for p in procs:
            out, _ = p.communicate()
            for line in out.splitlines():
                if line.startswith("WALL "):
                    child_walls.append(float(line.split()[1]))
        if len(child_walls) != 4:
            raise RuntimeError(f"expected 4 child walls, got {child_walls}")
        walls4.append(max(child_walls))
    t4 = min(walls4)
    thr4 = total_imgs / t4
    eff = (thr4 / thr1) / 4.0
    print(json.dumps({
        "metric": "multijvm_scaling_1x8_to_4x8",
        "single_wall_s": round(t1, 2), "single_images_per_sec": round(thr1, 1),
        "quad_wall_s": round(t4, 2), "quad_images_per_sec": round(thr4, 1),
        "efficiency": round(eff, 3),
        "singles_all": [round(w, 2) for w in singles],
        "quad_all": [round(w, 2) for w in walls4],
    }))


if __name__ == "__main__":
    main()
