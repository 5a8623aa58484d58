"""Round-7 profiling helper: parse a Spark event log and print per-job /
per-stage wall + task-time attribution (guide §1: measure first).

Usage:
  1. run something with SGSPARK_EXTRA_CONF="spark.eventLog.enabled=true;
     spark.eventLog.dir=file:///tmp/ev_r7" (mkdir first)
  2. python tools/profile_r7.py /tmp/ev_r7/<app-id>  [min_ms]
"""

from __future__ import annotations

import json
import sys


def main(path: str, min_ms: float = 50.0):
    jobs = {}        # id -> dict
    stages = {}      # id -> dict
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", "")[:90],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "callsite": (ev.get("Properties") or {}).get(
                        "callSite.short", ""),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                st = stages.setdefault(sid, {})
                st.update({
                    "name": si.get("Stage Name", "")[:80],
                    "wall": (t1 - t0) if t0 and t1 else 0,
                    "tasks": si.get("Number of Tasks", 0),
                })
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {"name": "?", "wall": 0,
                                             "tasks": 0})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + \
                    m.get("Executor Run Time", 0)
                st["cpu_ms"] = st.get("cpu_ms", 0) + \
                    m.get("Executor CPU Time", 0) / 1e6
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                sr = (m.get("Shuffle Read Metrics") or {})
                st["sh_read"] = st.get("sh_read", 0) + \
                    sr.get("Remote Bytes Read", 0) + \
                    sr.get("Local Bytes Read", 0)
                st["fetch_ms"] = st.get("fetch_ms", 0) + \
                    sr.get("Fetch Wait Time", 0)
                sw = (m.get("Shuffle Write Metrics") or {})
                st["sh_write"] = st.get("sh_write", 0) + \
                    sw.get("Shuffle Bytes Written", 0)
                py = [a for a in (ev.get("Task Executor Metrics") or {})]
                _ = py

    t_first = min(j["t0"] for j in jobs.values()) if jobs else 0
    print(f"{'job':>4} {'rel_t0':>8} {'wall_ms':>8}  stages(wall_ms)  desc")
    for jid in sorted(jobs):
        j = jobs[jid]
        wall = j.get("t1", j["t0"]) - j["t0"]
        if wall < min_ms:
            continue
        sdesc = []
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if s and s.get("wall", 0) >= min_ms:
                sdesc.append(
                    f"s{sid}:{s['wall']}ms/{s['tasks']}t"
                    f"/task{int(s.get('task_ms', 0))}ms"
                    f"/cpu{int(s.get('cpu_ms', 0))}ms")
        print(f"{jid:>4} {j['t0'] - t_first:>8} {wall:>8}  "
              f"{' '.join(sdesc)}  {j['callsite'] or j['desc']}")
    total_wall = sum(j.get("t1", j["t0"]) - j["t0"] for j in jobs.values())
    print(f"\njobs total wall: {total_wall} ms; "
          f"stage task-time top:")
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1].get(
            "task_ms", 0))[:15]:
        print(f"  s{sid:<4} wall={s.get('wall', 0):>6} "
              f"task={int(s.get('task_ms', 0)):>7} "
              f"cpu={int(s.get('cpu_ms', 0)):>7} "
              f"gc={int(s.get('gc_ms', 0)):>5} "
              f"shR={s.get('sh_read', 0) >> 10:>7}K "
              f"shW={s.get('sh_write', 0) >> 10:>7}K "
              f"fetch={int(s.get('fetch_ms', 0)):>5} {s['name']}")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 50.0)
