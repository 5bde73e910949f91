#!/usr/bin/env python3
"""Paired A/B for a query subset: alternate two classpaths in one window,
report per-query minima and after/before ratios. Same rationale as
tools/seal_bench.py (host steal makes single runs unreadable); this is the
inner-loop variant for optimization work on a handful of queries.

Usage: python3 tools/ab_pair.py --queries q1,q2 [--before /tmp/cls_before]
           [--after target/scala-2.13/classes] [--passes 2] [--reps 2]
"""
import argparse, json, os, subprocess, sys

def bench(classes, queries, reps, cpus, sf_dir):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_REPS=str(reps),
               SPARK_GRAFT_BENCH_ONLY=queries,
               SPARK_GRAFT_BENCH_OUT=f"/tmp/ab_pass_{os.getpid()}.json")
    r = subprocess.run(["java", "-cp", f"{classes}:/opt/spark/jars/*",
                        "graft.Bench"], env=env, capture_output=True, text=True)
    line = next((l for l in r.stdout.splitlines()
                 if l.startswith('{"metric"')), None)
    if line is None:
        sys.exit(f"no JSON from bench:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}")
    return json.loads(line)

def fold(acc, res):
    for k, med in res["queries"].items():
        lo = res.get("spread", {}).get(k, [med])[0]
        acc[k] = min(acc.get(k, float("inf")), lo, med)
    if res.get("errors"):
        sys.exit(f"bench errors: {res['errors']}")

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--before", default="/tmp/cls_before")
    ap.add_argument("--after", default="target/scala-2.13/classes")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    a = ap.parse_args()
    before, after = {}, {}
    for p in range(a.passes):
        fold(before, bench(a.before, a.queries, a.reps, a.cpus, a.sf_dir))
        fold(after, bench(a.after, a.queries, a.reps, a.cpus, a.sf_dir))
        print(f"[ab] pass {p+1}/{a.passes} done", flush=True)
    print(f"{'query':24s} {'before':>8s} {'after':>8s} {'ratio':>6s}")
    for k in sorted(before, key=lambda k: -before[k]):
        r = after[k] / before[k] if k in after else float("nan")
        print(f"{k:24s} {before[k]:8.3f} {after.get(k, float('nan')):8.3f} {r:6.3f}")
    tb, ta = sum(before.values()), sum(after.values())
    print(f"{'TOTAL':24s} {tb:8.3f} {ta:8.3f} {ta/tb:6.3f}")

if __name__ == "__main__":
    main()
