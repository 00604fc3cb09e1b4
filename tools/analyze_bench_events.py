#!/usr/bin/env python
"""Post-process a Spark event log written by an instrumented bench run
(SPARK_GRAFT_EVENTLOG_DIR + the bench's per-query setJobDescription
labels) into a per-query cost table — the round-12 session-outlier
diagnosis (VERDICT r11 item 2).

Per query: job count, stage count, task count, sum of task run time,
sum of task GC time, scheduler/launch overhead (job wall - task wall),
and the single longest task. Queries whose WALL time far exceeds their
task time are driver/scheduling-bound; queries with high GC-to-run
ratios are allocation-bound; one giant task = skew or an interpreted
expression.

Usage: python tools/analyze_bench_events.py /tmp/bench_events_r12 [top_n]
"""

from __future__ import annotations

import io
import json
import os
import sys
from collections import defaultdict


def main(event_dir: str, top_n: int = 30) -> int:
    files = [
        os.path.join(event_dir, f)
        for f in os.listdir(event_dir)
        if not f.startswith(".")
    ]
    # rollingeventlog dirs hold the parts; plain files are themselves logs
    paths = []
    for f in files:
        if os.path.isdir(f):
            paths.extend(
                os.path.join(f, p)
                for p in sorted(os.listdir(f))
                if p.startswith("events_") or p.startswith("eventlog")
            )
        else:
            paths.append(f)
    paths = [p for p in paths if 'appstatus' not in os.path.basename(p)]

    job_desc: dict[int, str] = {}
    job_wall: dict[int, float] = {}
    job_start: dict[int, float] = {}
    stage_to_job: dict[int, int] = {}
    per_stage = defaultdict(lambda: [0, 0.0, 0.0, 0.0])  # tasks, run, gc, maxrun

    for path in paths:
        if path.endswith('.zstd'):
            import subprocess

            proc = subprocess.Popen(
                ["zstd", "-dc", path], stdout=subprocess.PIPE
            )
            fh = io.TextIOWrapper(proc.stdout)
        else:
            fh = open(path)
        with fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    job_desc[jid] = props.get("spark.job.description", "?")
                    job_start[jid] = ev.get("Submission Time", 0)
                    for sid in ev.get("Stage IDs", []):
                        stage_to_job[sid] = jid
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in job_start:
                        job_wall[jid] = (
                            ev.get("Completion Time", 0) - job_start[jid]
                        ) / 1000.0
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    run = m.get("Executor Run Time", 0) / 1000.0
                    gc = m.get("JVM GC Time", 0) / 1000.0
                    s = per_stage[sid]
                    s[0] += 1
                    s[1] += run
                    s[2] += gc
                    s[3] = max(s[3], run)

    agg = defaultdict(lambda: [0, 0, 0, 0.0, 0.0, 0.0, 0.0])
    # per query: jobs, stages, tasks, wall, run, gc, maxtask
    for jid, desc in job_desc.items():
        a = agg[desc]
        a[0] += 1
        a[3] += job_wall.get(jid, 0.0)
    for sid, (tasks, run, gc, mx) in per_stage.items():
        desc = job_desc.get(stage_to_job.get(sid, -1), "?")
        a = agg[desc]
        a[1] += 1
        a[2] += tasks
        a[4] += run
        a[5] += gc
        a[6] = max(a[6], mx)

    rows = sorted(agg.items(), key=lambda kv: -kv[1][3])
    print(
        f"{'query':40s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s} "
        f"{'wall_s':>8s} {'task_s':>8s} {'gc_s':>6s} {'max_t':>6s} {'overhead':>8s}"
    )
    for desc, (jobs, stages, tasks, wall, run, gc, mx) in rows[:top_n]:
        print(
            f"{desc[:40]:40s} {jobs:5d} {stages:6d} {tasks:6d} "
            f"{wall:8.2f} {run:8.2f} {gc:6.2f} {mx:6.2f} {wall - run:8.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_events_r12",
            int(sys.argv[2]) if len(sys.argv) > 2 else 30,
        )
    )
