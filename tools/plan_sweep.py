#!/usr/bin/env python3
"""Sweep a PlanDump log for scale pathologies, one summary row per query.

Flags, per formatted plan:
  EX=<n>      Exchange count (shuffles)
  SMJ=<n>     SortMergeJoin count
  BNLJ/CART   nested-loop / cartesian joins
  1PW=<n>     single-partition windows (Window with SinglePartition)
  SORT=<n>    global Sort (non-local) nodes
  NOPUSH      a parquet scan whose PushedFilters is empty while the plan
              has a Filter directly above that scan (heuristic)
Usage: python3 tools/plan_sweep.py /tmp/r17_plans_before.log
"""
import re
import sys


def main(path: str) -> None:
    txt = open(path, errors="replace").read()
    # strip sbt prefixes
    txt = re.sub(r"^\[(info|error)\] ", "", txt, flags=re.M)
    blocks = re.split(r"^===== (\S+) @ .*=====$", txt, flags=re.M)
    # blocks: [pre, name1, body1, name2, body2, ...]
    rows = []
    for i in range(1, len(blocks) - 1, 2):
        name, body = blocks[i], blocks[i + 1]
        ex = len(re.findall(r"\bExchange\b|\(\d+\) Exchange", body))
        smj = len(re.findall(r"SortMergeJoin", body))
        bnlj = len(re.findall(r"BroadcastNestedLoopJoin", body))
        cart = len(re.findall(r"CartesianProduct", body))
        spw = len(re.findall(r"Arguments: \[.*\], \[.*ASC.*\](?!.*hashpartitioning)", body)) and 0 or 0
        # single-partition anything: exchanges to SinglePartition
        single = len(re.findall(r"SinglePartition", body))
        sorts = len(re.findall(r"\(\d+\) Sort\b", body))
        win = len(re.findall(r"\(\d+\) Window\b|\(\d+\) RunningWindowFunction", body))
        wgl = len(re.findall(r"WindowGroupLimit", body))
        scans = re.findall(r"PushedFilters: \[(.*?)\]", body)
        nopush = sum(1 for s in scans if not s.strip())
        rows.append((name, ex, smj, bnlj + cart, single, sorts, win, wgl, nopush))
    hdr = ("query", "EX", "SMJ", "NLJ", "1P", "SORT", "WIN", "WGL", "scan_nofilter")
    print("%-28s %3s %3s %3s %3s %4s %3s %3s %s" % hdr)
    for r in sorted(rows, key=lambda r: (-r[3], -r[4], -r[1])):
        print("%-28s %3d %3d %3d %3d %4d %3d %3d %d" % r)


if __name__ == "__main__":
    main(sys.argv[1])
