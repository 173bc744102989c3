"""Where does the high scaling leg idle? Event-log stage/task timeline
for the timed north-rule job (`bench._timed_scale_job`).

The clean v8 pairs show efficiency = conservation x utilization-ratio:
the 8-core leg keeps only ~52% of its cores busy vs ~67% at 2 cores
(e.g. pair ts=1787064742: 47.7 CPU-s / 11.39 s / 8 cores vs
42.4 / 31.61 / 2), so ~0.78 of the gap is IDLE slots, not extra work.
This tool attributes that idle: per-stage wall, task-time sum, slot
occupancy (tasks running over time vs the core budget), stage-tail
raggedness (last-task finish vs per-wave ideal), and inter-stage /
inter-job driver gaps where zero tasks run.

    python tools/diag_scale_stages.py [cores] [corpus_parquet]

Run it pinned like a real leg:
    taskset -c 0-7 python tools/diag_scale_stages.py 8
"""

from __future__ import annotations

import glob
import gzip
import importlib.util as _ilu
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVDIR = "/tmp/mashspark_eventlogs"


def _load_bench():
    spec = _ilu.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _events(path: str):
    # eventlog v2 writes a rolling DIRECTORY of events_N_* files
    files = (sorted(glob.glob(os.path.join(path, "events_*")))
             if os.path.isdir(path) else [path])
    # drop .zstd entries whose decompressed twin is also in the list
    # (a prior run's unzstd leaves the plain file next to the original)
    plain = {f for f in files if not f.endswith(".zstd")}
    files = [f for f in files if not (f.endswith(".zstd") and f[:-5] in plain)]
    for fp in files:
        if fp.endswith(".zstd"):
            import subprocess
            plain = fp[:-5]
            subprocess.run(["unzstd", "-f", "-q", fp, "-o", plain], check=True)
            fp = plain
        op = gzip.open if fp.endswith(".gz") else open
        with op(fp, "rt") as f:
            for line in f:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def analyze(evpath: str, t0_ms: float, t1_ms: float, cores: int) -> dict:
    """Stage table + occupancy over the [t0, t1] wall window (epoch ms)."""
    stages: dict = {}
    tasks: list = []
    for ev in _events(evpath):
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub is None or comp is None or comp < t0_ms or sub > t1_ms:
                continue
            stages[sid] = {
                "name": si.get("Stage Name", "")[:60],
                "sub": sub, "comp": comp,
                "wall": (comp - sub) / 1e3,
                "n_tasks": si.get("Number of Tasks", 0),
            }
        elif e == "SparkListenerTaskEnd":
            ti = ev.get("Task Info") or {}
            lt, ft = ti.get("Launch Time"), ti.get("Finish Time")
            if lt is None or ft is None or ft < t0_ms or lt > t1_ms:
                continue
            tm = ev.get("Task Metrics") or {}
            tasks.append({
                "stage": ev.get("Stage ID"), "launch": lt, "finish": ft,
                "run": (ft - lt) / 1e3,
                "cpu": (tm.get("Executor CPU Time") or 0) / 1e9,
                "deser": (tm.get("Executor Deserialize Time") or 0) / 1e3,
                "gc": (tm.get("JVM GC Time") or 0) / 1e3,
            })

    # slot-occupancy timeline over the timed window at 50 ms resolution
    if tasks:
        t0_ms = max(t0_ms, min(t["launch"] for t in tasks))
        t1_ms = min(t1_ms, max(t["finish"] for t in tasks))
    res = 0.05
    n_bins = max(1, int((t1_ms - t0_ms) / 1e3 / res) + 1)
    occ = [0.0] * n_bins
    for t in tasks:
        a = max(t["launch"], t0_ms)
        b = min(t["finish"], t1_ms)
        ia, ib = int((a - t0_ms) / 1e3 / res), int((b - t0_ms) / 1e3 / res)
        for i in range(ia, min(ib + 1, n_bins)):
            occ[i] += 1.0
    idle_bins = sum(1 for v in occ if v == 0)
    out_stages = []
    for sid in sorted(stages):
        s = stages[sid]
        st = [t for t in tasks if t["stage"] == sid]
        run_sum = sum(t["run"] for t in st)
        cpu_sum = sum(t["cpu"] for t in st)
        # tail: how much of the stage wall the LAST finishing task(s)
        # spent running alone relative to a balanced wave split
        last_finish = max((t["finish"] for t in st), default=s["comp"])
        sorted_fin = sorted(t["finish"] for t in st)
        # wall after the second-to-last task finished = single-task tail
        tail = 0.0
        if len(sorted_fin) >= 2:
            tail = (sorted_fin[-1] - sorted_fin[-2]) / 1e3
        out_stages.append({
            "id": sid, "name": s["name"], "n_tasks": s["n_tasks"],
            "wall": round(s["wall"], 2),
            "task_run_sum": round(run_sum, 2),
            "task_cpu_sum": round(cpu_sum, 2),
            "avg_slots_busy": round(run_sum / s["wall"], 2) if s["wall"] else 0,
            "single_task_tail": round(tail, 2),
            "gc": round(sum(t["gc"] for t in st), 2),
            "deser": round(sum(t["deser"] for t in st), 2),
        })
    wall = (t1_ms - t0_ms) / 1e3
    run_sum = sum(t["run"] for t in tasks)
    return {
        "cores": cores, "window_wall": round(wall, 2),
        "n_stages": len(out_stages), "n_tasks": len(tasks),
        "task_run_sum": round(run_sum, 2),
        "task_cpu_sum": round(sum(t["cpu"] for t in tasks), 2),
        "avg_slots_busy": round(run_sum / wall, 2),
        "zero_task_sec": round(idle_bins * res, 2),
        "stages": out_stages,
    }


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bench = _load_bench()
    path = sys.argv[2] if len(sys.argv) > 2 else bench.SCALE_PATH

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    os.environ["MASHSPARK_DRIVER_MEM"] = bench.SCALE_MEM
    os.environ["MASHSPARK_PRETOUCH"] = "1"
    from mashspark.session import get_spark

    spark = get_spark(
        cores=cores, shuffle_partitions=16, app_name=f"diag-scale-{cores}",
        extra_conf={"spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": f"file://{EVDIR}"})
    spark.sparkContext.setLogLevel("ERROR")
    cfg = bench._config()
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    from pyspark.sql import functions as F

    warm = docs.where(F.col("doc_id") % 6 == 0)
    bench._timed_scale_job(spark, warm, cfg, cores, n_docs)  # warm-up
    spark.sparkContext._jvm.System.gc()
    time.sleep(2.0)
    t0 = time.time() * 1e3
    r = bench._timed_scale_job(spark, docs, cfg, cores, n_docs)
    t1 = time.time() * 1e3
    print(json.dumps({"leg": r}))
    spark.stop()
    time.sleep(1.0)
    logs = sorted(glob.glob(os.path.join(EVDIR, "*")), key=os.path.getmtime)
    rep = analyze(logs[-1], t0, t1, cores)
    rep["input_partitions"] = docs.rdd.getNumPartitions() if False else None
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
