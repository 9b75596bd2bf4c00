"""Multi-executor scaling evidence on a localhost Spark standalone cluster.

The north rule asks for the identical job at N and 4N *executors* with
throughput scaling efficiency >= 0.8. local[N] mode cannot represent that
faithfully: all N threads share one JVM heap (allocation-rate walls that a
real cluster never sees) and one process tree. This harness instead runs a
real standalone master + worker and sizes the job with
``spark.executor.cores=2`` fixed, varying only ``spark.cores.max``:

    N  cluster:  spark.cores.max=4   -> 2 executors x 2 cores
    4N cluster:  spark.cores.max=16  -> 8 executors x 2 cores

Each executor is its own JVM with its own heap and its own Python workers —
the same isolation a cluster node gives. The whole process tree (master,
worker, executors, Python workers, driver) is pinned to ``2 x cores.max``
CPUs via inherited ``sched_setaffinity`` so the small cluster cannot borrow
the idle host (one core per executor thread + one per Python worker, the
same budget a real node allocates). The package ships to executors via
``spark.submit.pyFiles`` — the actual ``--py-files`` mode the north rule
requires.

Usage:
    python scripts/scaling_cluster.py half <cores_max> <corpus> <out.json>
    python scripts/scaling_cluster.py combine  # reads BENCH/cluster_*.json
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark

SPARK_DIR = os.path.dirname(pyspark.__file__)
SPARK_CLASS = os.path.join(SPARK_DIR, "bin", "spark-class")
MASTER_URL = "spark://127.0.0.1:7077"
PYFILES_ZIP = os.path.join(REPO, "dist", "imdedup_plus_spark.zip")


def _kill_daemons() -> None:
    # kill only java daemons (a naive pkill -f would match any shell whose
    # command line mentions the class name — including our own caller)
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                if fh.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode(errors="replace")
            if "org.apache.spark.deploy" in cmd:
                os.kill(int(pid), signal.SIGKILL)
        except (OSError, ProcessLookupError):
            continue
    time.sleep(2)


def _start_cluster(worker_cores: int) -> list[subprocess.Popen]:
    env = dict(os.environ)
    env["SPARK_LOCAL_DIRS"] = "/dev/shm/spark-local"
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    procs = []
    procs.append(
        subprocess.Popen(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8090"],
            stdout=open("/tmp/sc_master.log", "w"), stderr=subprocess.STDOUT, env=env,
        )
    )
    time.sleep(6)
    procs.append(
        subprocess.Popen(
            [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker", MASTER_URL,
             "--host", "127.0.0.1", "--cores", str(worker_cores),
             "--memory", "80g", "--webui-port", "8091",
             "--work-dir", "/tmp/spark-worker"],
            stdout=open("/tmp/sc_worker.log", "w"), stderr=subprocess.STDOUT, env=env,
        )
    )
    time.sleep(6)
    return procs


def run_half(cores_max: int, corpus: str) -> dict:
    # pin BEFORE starting daemons: master/worker/executors/python workers
    # all inherit the mask (2 CPUs per executor core: task thread + python)
    os.sched_setaffinity(0, range(min(2 * cores_max, os.cpu_count())))
    _kill_daemons()
    procs = _start_cluster(worker_cores=cores_max)
    try:
        from pyspark.sql import SparkSession, functions as F

        from imdedup_plus_spark import candidates as C, clustering as CL
        from imdedup_plus_spark import signatures as S
        from imdedup_plus_spark.config import SCALE_CONFIG as CFG

        spark = (
            SparkSession.builder.appName(f"scaling-{cores_max}")
            .master(MASTER_URL)
            .config("spark.executor.cores", "2")
            .config("spark.executor.memory", "8g")
            .config("spark.cores.max", str(cores_max))
            .config("spark.submit.pyFiles", PYFILES_ZIP)
            .config("spark.pyspark.python", sys.executable)
            .config("spark.ui.enabled", "false")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
            .config("spark.sql.files.maxPartitionBytes", "16m")
            .config("spark.sql.shuffle.partitions", "256")
            # on a loopback cluster every block is "remote enough": the 3s
            # default locality wait makes small-task stages trickle 2-4
            # tasks at a time after a localCheckpoint pins blocks
            .config("spark.locality.wait", "100ms")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        docs = spark.read.parquet(corpus)
        n_docs = docs.count()
        idc = "url" if "url" in docs.columns else "doc_id"
        if dict(docs.dtypes).get(idc) == "string":
            docs = docs.withColumn("__doc_key__", F.xxhash64(F.col(idc)))
            idc = "__doc_key__"
        # warm executors/IO (untimed, identical at both sizes)
        docs.select("text").write.format("noop").mode("overwrite").save()
        t0 = time.time()
        sig = S.signature_kernel_arrow(docs, CFG, idc).persist()
        sig.count()
        t1 = time.time()
        bands = S.explode_bands(sig, CFG, idc)
        ver = C.verify_pairs_kernel(
            C.candidate_pairs(bands, CFG, idc), sig, CFG, idc
        ).localCheckpoint(eager=True)
        n_ver = ver.count()
        t2 = time.time()
        cl = CL.clusters_from_pairs(sig, ver, idc)
        cl.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        spark.stop()
        n_exec = cores_max // 2
        return {
            "cluster": f"{n_exec} executors x 2 cores (cores.max={cores_max})",
            "n_docs": n_docs,
            "n_verified_pairs": n_ver,
            "wall_sec": round(t3 - t0, 2),
            "docs_per_sec": round(n_docs / (t3 - t0), 1),
            "stage_sec": {
                "signatures": round(t1 - t0, 2),
                "pairs_verify": round(t2 - t1, 2),
                "cc_clusters": round(t3 - t2, 2),
            },
        }
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)
        _kill_daemons()


def combine() -> None:
    with open(os.path.join(REPO, "BENCH", "cluster_N.json")) as fh:
        rn = json.load(fh)
    with open(os.path.join(REPO, "BENCH", "cluster_4N.json")) as fh:
        r4 = json.load(fh)
    eff = round(r4["docs_per_sec"] / (4 * rn["docs_per_sec"]), 3)
    print(json.dumps({"N": rn, "4N": r4, "scaling_efficiency": eff}, indent=2))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(
            f"\n## Multi-executor scaling run (standalone cluster), corpus = {rn['n_docs']} docs\n\n"
            "Real standalone master + worker on this host; executors are separate\n"
            "JVMs (2 cores + 8g heap + own Python workers each); package shipped\n"
            "via spark.submit.pyFiles; process tree pinned to 2 x cores.max CPUs.\n\n"
            "| cluster size | wall sec | docs/sec |\n|---|---|---|\n"
            f"| N ({rn['cluster']}) | {rn['wall_sec']} | {rn['docs_per_sec']} |\n"
            f"| 4N ({r4['cluster']}) | {r4['wall_sec']} | {r4['docs_per_sec']} |\n\n"
            f"**Scaling efficiency = {r4['docs_per_sec']} / (4 x {rn['docs_per_sec']}) "
            f"= {eff}** (target >= 0.8)\n"
        )


if __name__ == "__main__":
    if sys.argv[1] == "half":
        cores_max, corpus, out = int(sys.argv[2]), sys.argv[3], sys.argv[4]
        r = run_half(cores_max, corpus)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(out, "w") as fh:
            json.dump(r, fh)
        print(json.dumps(r))
    elif sys.argv[1] == "combine":
        combine()
