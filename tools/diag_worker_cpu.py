"""Diagnose the vanishing python-worker CPU in the scaling legs.

Round-3 v7/256k pairs recorded cpu_python_sec_low = 5-8 core-s vs
cpu_python_sec_high = 125-148 core-s for identical work. Hypothesis:
bench._tree_cpu_sec() only sees LIVE descendants at snapshot time, so
python workers that exit between t0 and the end snapshot take their
accumulated utime with them (they are reaped by the JVM, not by us, so
RUSAGE_CHILDREN never sees them either).

This script runs the exact timed scale job at a given core count with a
0.25 s sampling monitor that tracks every descendant pid's cumulative
CPU and keeps the last-seen value for pids that vanish. It prints:
  - end-snapshot tree CPU (what bench.py records today)
  - monitor-accumulated CPU (live-at-end + vanished pids)
  - per-pid lifecycle for python processes (spawn, death, last CPU)

Usage: taskset -c 0-1 python tools/diag_worker_cpu.py 2 /tmp/corpus
"""
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


class TreeCpuMonitor:
    """Samples /proc for this process's descendant tree; remembers the
    last cumulative CPU of every pid ever seen so dead workers still
    count. Also records each pid's comm and lifetime."""

    def __init__(self, interval=0.25):
        self.interval = interval
        self.seen = {}  # pid -> [comm, first_ts, last_ts, last_cpu]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _sample(self):
        import glob

        hz = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        procs = {}
        for stat in glob.glob("/proc/[0-9]*/stat"):
            try:
                with open(stat) as fh:
                    raw = fh.read()
            except OSError:
                continue
            rp = raw.rindex(")")
            pid = int(raw.split(" ", 1)[0])
            comm = raw[raw.index("(") + 1:rp]
            rest = raw[rp + 2:].split()
            procs[pid] = (int(rest[1]), comm,
                          (int(rest[11]) + int(rest[12])) / hz)
        members = {me}
        grew = True
        while grew:
            grew = False
            for pid, (ppid, _c, _u) in procs.items():
                if pid not in members and ppid in members:
                    members.add(pid)
                    grew = True
        now = time.time()
        for pid in members:
            if pid not in procs:
                continue
            _ppid, comm, cpu = procs[pid]
            ent = self.seen.get(pid)
            if ent is None:
                self.seen[pid] = [comm, now, now, cpu]
            else:
                ent[2] = now
                ent[3] = max(ent[3], cpu)

    def _loop(self):
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(self.interval)
        self._sample()

    def start(self):
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def total(self):
        return round(sum(e[3] for e in self.seen.values()), 2)


def main():
    cores = int(sys.argv[1])
    path = sys.argv[2]
    spark = bench._open_scale_session(cores)
    cfg = bench._config()
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    from pyspark.sql import functions as F

    warm = docs.where(F.col("doc_id") % 6 == 0)
    bench._timed_scale_job(spark, warm, cfg, cores, n_docs)
    spark.sparkContext._jvm.System.gc()
    time.sleep(2.0)

    mon = TreeCpuMonitor()
    mon._sample()  # synchronous baseline before the timed window
    mon.start()
    t0 = time.time()
    cpu0_snapshot = bench._tree_cpu_sec()
    mon0 = mon.total()
    res = bench._timed_scale_job(spark, docs, cfg, cores, n_docs)
    cpu1_snapshot = bench._tree_cpu_sec()
    mon.stop()
    wall = time.time() - t0

    live_now = set()
    import glob

    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            live_now.add(int(os.path.basename(os.path.dirname(stat))))
        except ValueError:
            pass
    pyinfo = []
    for pid, (comm, first, last, cpu) in sorted(mon.seen.items()):
        if "python" in comm or "java" in comm:
            pyinfo.append({
                "pid": pid, "comm": comm,
                "born_rel": round(first - t0, 1),
                "last_seen_rel": round(last - t0, 1),
                "alive_at_end": pid in live_now,
                "cpu_sec": round(cpu, 2),
            })
    print(json.dumps({
        "cores": cores, "wall": round(wall, 2),
        "bench_recorded": res,
        "snapshot_delta": round(cpu1_snapshot - cpu0_snapshot, 2),
        "monitor_delta": round(mon.total() - mon0, 2),
        "procs": pyinfo,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
