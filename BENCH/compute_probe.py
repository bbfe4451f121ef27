"""Pure-compute N vs 4N probe -> BENCH/compute_probe.json.

Separates ENGINE scaling from HOST limits: the maintenance pipeline is
shuffle/write-heavy, and this host's memory subsystem does not scale
4x with 4x threads (bandwidth ceiling ~3.1-3.7x, plus documented
overcommit stalls on concurrent fresh-page writes).  This probe runs a
shuffle-free, write-free, codegen-only job — generate the deterministic
corpus and sha256-hash every row's content, count the digests — at the
same two cluster sizes as BENCH/cluster_scaling.py.  Near-ceiling
scaling here demonstrates the engine's compute path (whole-stage
codegen over 128 independent partitions, zero driver involvement)
introduces no scaling bottleneck of its own; the gap between this
number and the full-pipeline number is the shuffle/write fraction,
whose binding resource on one box is the shared memory bus — the
resource a real 4N cluster multiplies by adding nodes.

Usage: python BENCH/compute_probe.py [n_files] [rounds]  (default 2000000 3)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "BENCH"))

from maintenance_scaling import measure_hardware_ceiling  # noqa: E402

EXEC_CORES = 8
EXEC_MEM_MB = 4096

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from engine import corpus
from engine.session import get_spark

n_exec, n_files = int(sys.argv[1]), int(sys.argv[2])
os.environ["SPARK_DRIVER_MEM"] = "4g"
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/spark-local"
exec_gc = f"-XX:+UseParallelGC -XX:ParallelGCThreads=8 -Xmn1g"
spark = get_spark(
    app_name=f"probe-{{n_exec}}", master=f"local-cluster[{{n_exec}},8,4096]",
    shuffle_partitions=32,
    extra_conf={{
        "spark.executor.memory": "4096m",
        "spark.executor.extraJavaOptions": exec_gc,
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -Xmn1g",
        "spark.scheduler.minRegisteredResourcesRatio": "1.0",
        "spark.scheduler.maxRegisteredResourcesWaitingTime": "120s",
        "spark.locality.wait": "0s",
    }},
)
deadline = time.monotonic() + 120
while time.monotonic() < deadline:
    if spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() >= n_exec + 1:
        break
    time.sleep(0.5)

def job(n):
    df = corpus.generate_corpus(spark, n_files=n, n_repos=50, skew=True,
                                partitions=128)
    return df.select(F.sha2("content", 256).alias("s")).agg(
        F.count("s")).collect()[0][0]

job(2000)  # codegen/JIT warmup
print(json.dumps({{"ready": n_exec}}), flush=True)
for line in sys.stdin:
    if line.strip() != "go":
        break
    t0 = time.monotonic()
    n = job(n_files)
    assert n == n_files
    print(json.dumps({{"n_exec": n_exec, "seconds": round(time.monotonic() - t0, 3)}}),
          flush=True)
"""


def run_level(n_exec: int, n_files: int) -> float:
    script = WORKER.format(repo=REPO)
    fd, path = tempfile.mkstemp(suffix=".py")
    with os.fdopen(fd, "w") as f:
        f.write(script)
    proc = subprocess.Popen(
        [sys.executable, path, str(n_exec), str(n_files)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)
    try:
        while True:
            line = proc.stdout.readline()
            if not line:
                raise RuntimeError(f"probe worker {n_exec} died")
            if line.startswith("{") and "ready" in line:
                break
        proc.stdin.write("go\n")
        proc.stdin.flush()
        while True:
            line = proc.stdout.readline()
            if not line:
                raise RuntimeError(f"probe worker {n_exec} died mid-trial")
            if line.startswith("{") and "seconds" in line:
                return json.loads(line)["seconds"]
    finally:
        try:
            proc.stdin.write("quit\n")
            proc.stdin.flush()
        except Exception:
            pass
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
        os.unlink(path)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ratios, ceilings, t1s, t4s = [], [], [], []
    for r in range(rounds):
        ceilings.append(measure_hardware_ceiling(8, 32, 1.5)["speedup"])
        order = (1, 4) if r % 2 == 0 else (4, 1)
        times = {}
        for n_exec in order:
            times[n_exec] = run_level(n_exec, n_files)
        t1s.append(times[1])
        t4s.append(times[4])
        ratios.append(times[1] / times[4])
        print(f"round {r}: N {times[1]}s, 4N {times[4]}s -> "
              f"{ratios[-1]:.2f}x (ceiling {ceilings[-1]:.2f}x)",
              file=sys.stderr, flush=True)
    out = {
        "workload": "generate + sha256 + count (codegen only: no shuffle, "
                    "no write, no python)",
        "n_files": n_files, "rounds": rounds,
        "t_1exec": t1s, "t_4exec": t4s,
        "paired_ratios": ratios,
        "ceiling_samples": ceilings,
        "speedup": statistics.median(ratios),
        "ceiling": statistics.median(ceilings),
        "efficiency_vs_ceiling": statistics.median(ratios)
        / statistics.median(ceilings),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "compute_probe.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
