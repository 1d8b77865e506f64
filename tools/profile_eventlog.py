#!/usr/bin/env python3
"""Parse a Spark event log into per-query stage/time attribution.

Jobs are labeled by Bench via setJobDescription(<query name>), so every
SparkListenerJobStart carries spark.job.description. For each label this
aggregates: job count, stage count, task count, sum of task executorRunTime /
shuffle bytes / input bytes, and wall-ish stage span (sum of per-stage
completion - submission).

Usage: profile_eventlog.py <eventlog file> [top_n]
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    stage_to_label = {}
    per = defaultdict(lambda: defaultdict(float))

    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                label = (ev.get("Properties") or {}).get(
                    "spark.job.description") or "(unlabeled)"
                per[label]["jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    stage_to_label[sid] = label
            elif e == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                label = stage_to_label.get(si.get("Stage ID"), "(unlabeled)")
                per[label]["stages"] += 1
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp:
                    per[label]["stage_span_s"] += (comp - sub) / 1e3
                per[label]["tasks"] += si.get("Number of Tasks", 0)
            elif e == "SparkListenerTaskEnd":
                label = stage_to_label.get(ev.get("Stage ID"), "(unlabeled)")
                tm = ev.get("Task Metrics") or {}
                per[label]["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                per[label]["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                per[label]["deser_s"] += tm.get(
                    "Executor Deserialize Time", 0) / 1e3
                per[label]["result_ser_s"] += tm.get(
                    "Result Serialization Time", 0) / 1e3
                srm = tm.get("Shuffle Read Metrics") or {}
                per[label]["sh_read_mb"] += (
                    srm.get("Remote Bytes Read", 0)
                    + srm.get("Local Bytes Read", 0)) / 1e6
                per[label]["fetch_wait_s"] += srm.get(
                    "Fetch Wait Time", 0) / 1e3
                swm = tm.get("Shuffle Write Metrics") or {}
                per[label]["sh_write_mb"] += swm.get(
                    "Shuffle Bytes Written", 0) / 1e6
                per[label]["sh_write_s"] += swm.get(
                    "Shuffle Write Time", 0) / 1e9
                im = tm.get("Input Metrics") or {}
                per[label]["input_mb"] += im.get("Bytes Read", 0) / 1e6

    rows = sorted(per.items(), key=lambda kv: -kv[1]["stage_span_s"])
    hdr = ("label", "jobs", "stages", "tasks", "span_s", "run_s", "gc_s",
           "shR_mb", "shW_mb", "in_mb")
    print(("{:38s}" + "{:>7s}" * (len(hdr) - 1)).format(*hdr))
    for label, m in rows[:top_n]:
        print("{:38s}{:7.0f}{:7.0f}{:7.0f}{:7.1f}{:7.1f}{:7.1f}{:7.0f}"
              "{:7.0f}{:7.0f}".format(
                  label[:38], m["jobs"], m["stages"], m["tasks"],
                  m["stage_span_s"], m["run_s"], m["gc_s"], m["sh_read_mb"],
                  m["sh_write_mb"], m["input_mb"]))


if __name__ == "__main__":
    main()
