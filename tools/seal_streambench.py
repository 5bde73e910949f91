#!/usr/bin/env python3
"""Noise-immune sealing for the STREAMING twins (r18, verdict r17 #3):
the batch bench got the paired protocol in r17 (tools/seal_bench.py);
the streaming twins were still hand-paired — three interleaved passes
quoted in PERF.md but absent from any committed artifact. This is the
same protocol for graft.tools.StreamBench: alternate JVM invocations of
the CURRENT build and a worktree build of the PREVIOUS round's bench
commit in one wall-clock window, fold per-twin minima, and write
STREAMBENCH_FULL.json with per-twin `paired_prev` ratios.

Pairing matters MORE here than for the batch bench: the toy twins
(50-doc micro-batches) have a ±2x single-run spread — absolute wall
seconds across sessions are meaningless, only the same-window ratio is
evidence (r17 PERF.md).

Usage:
  python3 tools/seal_streambench.py --prev <commit>
      [--sf-dir /root/testdata/sf0.1] [--passes 3] [--cpus 32]
      [--out STREAMBENCH_FULL.json]
"""
import argparse, json, os, statistics, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from seal_bench import build_worktree, run  # shared worktree-build logic


def stream_pass(classes, sf_dir, cpus):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    cp = f"{classes}:/opt/spark/jars/*"
    r = subprocess.run(["java", "-cp", cp, "graft.tools.StreamBench"],
                       env=env, capture_output=True, text=True)
    twins = {}
    for line in r.stdout.splitlines():
        if line.startswith('{"twin"'):
            d = json.loads(line)
            twins[d["twin"]] = d
    if not twins:
        sys.exit(f"stream pass produced no twin lines:\n{r.stdout[-2000:]}\n"
                 f"{r.stderr[-2000:]}")
    return twins


def loadavg():
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True,
                    help="previous round's bench-of-record commit")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3,
                    help="JVM invocations per binary (alternated)")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "STREAMBENCH_FULL.json"))
    args = ap.parse_args()

    r = run(["sbt", "-batch", "compile"], cwd=REPO)
    if "[success]" not in r.stdout:
        sys.exit(f"current build failed:\n{r.stdout[-2000:]}")
    cur_classes = os.path.join(REPO, "target/scala-2.13/classes")
    prev_classes = build_worktree(args.prev)

    cur_min, prev_min, raw = {}, {}, []
    for p in range(args.passes):
        for label, classes, acc in (("cur", cur_classes, cur_min),
                                    ("prev", prev_classes, prev_min)):
            la0 = loadavg()
            twins = stream_pass(classes, args.sf_dir, args.cpus)
            for name, d in twins.items():
                if name not in acc or d["wall_s"] < acc[name]["wall_s"]:
                    acc[name] = d
            raw.append({"pass": p, "binary": label,
                        "wall_s": {n: d["wall_s"] for n, d in twins.items()},
                        "loadavg_start": la0, "loadavg_end": loadavg()})
            print(f"[seal-stream] pass {p} {label}: " +
                  " ".join(f"{n}={d['wall_s']:.1f}s"
                           for n, d in sorted(twins.items())), flush=True)

    paired = {n: round(cur_min[n]["wall_s"] / prev_min[n]["wall_s"], 4)
              for n in cur_min if n in prev_min and prev_min[n]["wall_s"] > 0}
    only_prev = sorted(set(prev_min) - set(cur_min))
    if only_prev:
        print(f"[seal-stream] WARNING: twin(s) missing from current binary: "
              f"{only_prev}", flush=True)
    out = {
        "metric": "streambench_paired",
        "sf": args.sf_dir,
        "twins": {n: {k: d[k] for k in
                      ("rows", "wall_s", "rows_per_s", "batches",
                       "mean_batch_ms", "state") if k in d}
                  for n, d in sorted(cur_min.items())},
        "prev_commit": args.prev,
        "prev_wall_s": {n: d["wall_s"] for n, d in sorted(prev_min.items())},
        "paired_prev": dict(sorted(paired.items())),
        "paired_median": round(statistics.median(paired.values()), 4)
        if paired else None,
        "passes": args.passes,
        "missing_in_current": only_prev,
        "pass_log": raw,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    movers = {n: v for n, v in paired.items() if v > 1.2 or v < 0.8}
    print(f"[seal-stream] wrote {args.out}: {len(cur_min)} twins, "
          f"paired median {out['paired_median']}, "
          f"{len(movers)} mover(s) outside [0.8, 1.2]: {movers}", flush=True)


if __name__ == "__main__":
    main()
