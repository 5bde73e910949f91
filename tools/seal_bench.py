#!/usr/bin/env python3
"""Noise-immune sealing bench (r17): interleave the CURRENT build with a
worktree build of the PREVIOUS round's bench commit, pass by pass, in one
wall-clock window, and record the per-query paired ratio in BENCH_FULL.json.

Why: r14->r15 (0.64x) and r15->r16 (1.24x) both showed uniform, code-free
pairwise shifts -- host windows, re-attributed by hand each round with
interleaved probes. This promotes that attribution method INTO the sealing
artifact: both binaries sample the same window, so a paired ratio > ~1.2x is
a real finding by construction, and a uniform window divides out.

Usage:
  python3 tools/seal_bench.py --prev <commit> [--sf-dir /root/testdata/sf0.1]
      [--passes 2] [--reps 2] [--cpus 32] [--out BENCH_FULL.json]

Per binary: `passes` JVM invocations of graft.Bench, each with
SPARK_GRAFT_BENCH_REPS=`reps` internal interleaved passes; invocations
alternate current/previous. Per-query value = min over all observed times
(the established sum-of-minima protocol). Output keeps the BENCH_FULL
schema ("queries" = current minima) and adds "prev_queries", "paired_prev"
(current/prev per query), "paired_median", and "prev_commit".
"""
import argparse, json, os, statistics, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, cwd=None, env=None, check=True):
    print(f"[seal] $ {' '.join(cmd)}" + (f"  (cwd={cwd})" if cwd else ""),
          flush=True)
    return subprocess.run(cmd, cwd=cwd, env=env, check=check,
                          capture_output=True, text=True)


def build_worktree(commit):
    wt = f"/tmp/graft_seal_{commit[:12]}"
    if not os.path.isdir(wt):
        run(["git", "worktree", "add", "--detach", wt, commit], cwd=REPO)
    marker = os.path.join(wt, ".seal_built")
    if not os.path.exists(marker):
        r = run(["sbt", "-batch", "compile"], cwd=wt)
        if "[success]" not in r.stdout:
            sys.exit(f"worktree build failed:\n{r.stdout[-2000:]}")
        open(marker, "w").close()
    return os.path.join(wt, "target/scala-2.13/classes")


def bench_pass(classes, sf_dir, cpus, reps):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_REPS=str(reps),
               # each Bench invocation (including the PREVIOUS binary's)
               # would otherwise write ./BENCH_FULL.json — an interrupted
               # sealing run must never leave the artifact of record
               # holding a single-binary pass
               SPARK_GRAFT_BENCH_OUT=f"/tmp/seal_pass_{os.getpid()}.json")
    cp = f"{classes}:/opt/spark/jars/*"
    r = subprocess.run(["java", f"-cp", cp, "graft.Bench"], env=env,
                       capture_output=True, text=True)
    line = next((l for l in r.stdout.splitlines() if l.startswith('{"metric"')),
                None)
    if line is None:
        sys.exit(f"bench pass produced no JSON:\n{r.stdout[-2000:]}\n"
                 f"{r.stderr[-2000:]}")
    return json.loads(line)


def fold_minima(acc, result):
    for name, med in result["queries"].items():
        lo = result.get("spread", {}).get(name, [med, med])[0]
        acc[name] = min(acc.get(name, float("inf")), lo, med)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True,
                    help="previous round's bench-of-record commit")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2,
                    help="JVM invocations per binary (alternated)")
    ap.add_argument("--reps", type=int, default=2,
                    help="internal interleaved reps per invocation")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_FULL.json"))
    args = ap.parse_args()

    cur_classes = os.path.join(REPO, "target/scala-2.13/classes")
    r = run(["sbt", "-batch", "compile"], cwd=REPO)
    if "[success]" not in r.stdout:
        sys.exit(f"current build failed:\n{r.stdout[-2000:]}")
    prev_classes = build_worktree(args.prev)

    cur_min, prev_min, raw = {}, {}, []
    contaminated = False
    for p in range(args.passes):
        # alternate within the same window: current pass p, then previous
        # pass p -- a host shift lands on both sides of every pair
        for label, classes, acc in (("cur", cur_classes, cur_min),
                                    ("prev", prev_classes, prev_min)):
            res = bench_pass(classes, args.sf_dir, args.cpus, args.reps)
            contaminated |= bool(res.get("load_contaminated"))
            raw.append({"pass": p, "binary": label,
                        "total": res.get("value"),
                        "loadavg_start": res.get("loadavg_start"),
                        "loadavg_end": res.get("loadavg_end"),
                        "load_contaminated": res.get("load_contaminated"),
                        "errors": res.get("errors", {})})
            # a query that ERRORS would silently vanish from the minima
            # and read as a speedup in the totals — a current-binary
            # error fails the sealing run outright
            if res.get("errors"):
                msg = f"[seal] pass {p} {label} had query errors: {res['errors']}"
                if label == "cur":
                    sys.exit(msg + " -- sealing aborted, fix before sealing")
                print(msg + " (previous binary -- recorded, pairs dropped)",
                      flush=True)
            fold_minima(acc, res)
            print(f"[seal] pass {p} {label}: total={res.get('value'):.1f}s "
                  f"load_end={res.get('loadavg_end')}", flush=True)

    paired = {q: cur_min[q] / prev_min[q]
              for q in cur_min if q in prev_min and prev_min[q] > 0}
    # set differences are first-class artifact fields: a query present in
    # the previous binary but absent now is a removal/regression-to-crash
    # and must not hide inside a smaller total
    only_prev = sorted(set(prev_min) - set(cur_min))
    # a query absent from prev minima can be error-DROPPED there rather
    # than genuinely new this round — label the two cases apart
    prev_errs = set()
    for entry in raw:
        if entry["binary"] == "prev":
            prev_errs |= set(entry.get("errors", {}))
    only_cur_all = set(cur_min) - set(prev_min)
    error_dropped = sorted(only_cur_all & prev_errs)
    only_cur = sorted(only_cur_all - prev_errs)
    if only_prev:
        print(f"[seal] WARNING: {len(only_prev)} query(ies) in the previous "
              f"binary are MISSING from the current one: {only_prev}",
              flush=True)
    if error_dropped:
        print(f"[seal] WARNING: {len(error_dropped)} query(ies) ERRORED in "
              f"the previous binary (pair dropped, not new): {error_dropped}",
              flush=True)
    out = {
        "metric": "bench_full_paired",
        "value": round(sum(cur_min.values()), 3),
        "unit": "sec",
        "sf": args.sf_dir,
        "queries": {q: round(v, 6) for q, v in sorted(cur_min.items())},
        "prev_commit": args.prev,
        "prev_queries": {q: round(v, 6) for q, v in sorted(prev_min.items())},
        "paired_prev": {q: round(v, 4) for q, v in sorted(paired.items())},
        "paired_median": round(statistics.median(paired.values()), 4)
        if paired else None,
        "passes": args.passes, "reps_per_pass": args.reps,
        "load_contaminated": contaminated,
        "missing_in_current": only_prev,
        "new_in_current": only_cur,
        "error_dropped_in_prev": error_dropped,
        "pass_log": raw,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    n_q = len(cur_min)
    movers = {q: r for q, r in paired.items() if r > 1.2 or r < 0.8}
    print(f"[seal] wrote {args.out}: {n_q} queries, "
          f"sum-of-minima {out['value']}s = {out['value']/max(n_q,1):.3f} s/q, "
          f"paired median {out['paired_median']}, "
          f"{len(movers)} paired mover(s) outside [0.8, 1.2]: "
          f"{dict(sorted(movers.items(), key=lambda kv: -kv[1])[:10])}",
          flush=True)


if __name__ == "__main__":
    main()
