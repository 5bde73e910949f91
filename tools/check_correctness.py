#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: load our parquet result and run the oracle SQL in DuckDB
against views named after the testdata tables; compare schema-insensitively
(columns sorted by name, rows sorted, values stringified with float
normalization) and report match/mismatch.
"""
import json
import math
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    # Dtype- and sign-sensitive: the driver hashes (dtype, value) pairs, so
    # 5 (int64) != 5.0 (float64) and -0.0 != 0.0. repr() keeps both.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def norm_df(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    # Driver-calibrated sensitivity (from CORRECTNESS_r01): int-vs-float is a
    # hash mismatch, but int width (int32 vs int64) and timestamp resolution
    # (ns vs us) are not — compare numpy dtype KIND, not the full dtype.
    kinds = [df[c].dtype.kind for c in df.columns]
    return sorted(rows), list(df.columns), kinds


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    results = {}
    oracle_secs = {}
    oracle_cpu = {}
    for qdir in sorted(out.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            mine = pd.read_parquet(qdir)
        except Exception as e:
            results[name] = f"READ_FAIL: {e}"
            continue
        if name not in oracle:
            results[name] = f"NO_ORACLE rows={len(mine)}"
            continue
        try:
            t0 = time.monotonic()
            c0 = time.process_time()
            ref = con.sql(oracle[name]).df()
            oracle_secs[name] = time.monotonic() - t0
            oracle_cpu[name] = time.process_time() - c0
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {e}"
            continue
        m_rows, m_cols, m_dt = norm_df(mine)
        r_rows, r_cols, r_dt = norm_df(ref)
        if m_cols != r_cols:
            results[name] = f"SCHEMA_MISMATCH mine={m_cols} oracle={r_cols}"
        elif m_dt != r_dt:
            results[name] = (
                f"DTYPE_MISMATCH "
                f"mine={list(zip(m_cols, m_dt))} oracle={list(zip(r_cols, r_dt))}"
            )
        elif m_rows == r_rows:
            results[name] = f"OK rows={len(m_rows)}"
        else:
            diff = [
                (a, b) for a, b in zip(m_rows, r_rows) if a != b
            ][:3]
            results[name] = (
                f"VALUE_MISMATCH rows mine={len(m_rows)} oracle={len(r_rows)} "
                f"first_diffs={diff}"
            )

    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith('OK') else 'FAIL'} {k}: {results[k]}")
    print(f"\n{n_ok}/{len(results)} queries match")

    # Oracle-suite budget guardrail (the r11 failure mode: the DuckDB
    # suite silently grew past the driver's budget and the round's
    # correctness artifact came back EMPTY). Scaled to the fraction of
    # the suite this run exercised, so targeted runs still guard their
    # share. Override with GRAFT_ORACLE_BUDGET_SECS; the full-suite
    # reference point is ~61 s at sf0.01 (r12), budget 90 s.
    total = sum(oracle_secs.values())
    budget = float(os.environ.get("GRAFT_ORACLE_BUDGET_SECS", "90"))
    slow = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:5]
    # full_run counts ATTEMPTED oracles (results carries ORACLE_FAILs
    # too), so a run with many oracle errors can't silently disable the
    # guardrail (r13 ADVICE).
    attempted = sum(1 for v in results.values() if not v.startswith("NO_ORACLE")
                    and not v.startswith("READ_FAIL"))
    full_run = attempted >= 0.9 * len(oracle)
    print(f"oracle suite: {total:.1f}s over {len(oracle_secs)} queries "
          f"(budget {budget:.0f}s, {'watched' if full_run else 'full-suite only'}); "
          "slowest: " + ", ".join(f"{k}={v:.1f}s" for k, v in slow))
    # WARN, do not fail: this runs on a shared VM where PERF.md documents
    # ~1,000 s CPU-steal bursts — a steal burst during the DuckDB pass
    # must not flip an all-green correctness run to exit 1 (r13 ADVICE).
    # The budget is a regression tripwire for combinatorial oracle SQL,
    # and a genuine regression shows up round over round in this line.
    if full_run and total > budget:
        print(f"WARN oracle-budget: suite took {total:.1f}s > {budget:.0f}s "
              "— either host CPU steal (ignore) or a combinatorial oracle "
              "regression (see COVERAGE.md 'oracle-suite budget'; "
              "MATERIALIZE the offending CTE chain). Correctness verdict "
              "is unaffected by this warning.")
    # Steal-insensitive HARD gate (r14 ADVICE): process_time() counts
    # only CPU this process burned (summed across DuckDB's threads), so
    # a host steal burst cannot trip it, while a combinatorial oracle
    # regression (accidental cross join, un-materialized CTE chain)
    # burns real CPU and does. Summed thread-CPU scales with core count
    # (DuckDB parallelizes per query), so the default budget scales
    # with it too: 900 s on the 32-core reference host (~6x headroom
    # over the ~140 s a healthy full suite burns there), pro-rated for
    # other hosts so a wider box cannot false-fail a green run.
    total_cpu = sum(oracle_cpu.values())
    cores = os.cpu_count() or 32
    cpu_budget = float(os.environ.get(
        "GRAFT_ORACLE_CPU_BUDGET_SECS", str(900 * max(1.0, cores / 32.0))))
    slow_cpu = sorted(oracle_cpu.items(), key=lambda kv: -kv[1])[:5]
    print(f"oracle suite CPU: {total_cpu:.1f}s (hard budget {cpu_budget:.0f}s); "
          "top: " + ", ".join(f"{k}={v:.1f}s" for k, v in slow_cpu))
    cpu_blown = full_run and total_cpu > cpu_budget
    if cpu_blown:
        print(f"FAIL oracle-cpu-budget: suite burned {total_cpu:.1f}s CPU > "
              f"{cpu_budget:.0f}s — steal-insensitive, so this IS a "
              "combinatorial oracle regression. Fix the offending SQL.")
    return 0 if (n_ok == len(results) and not cpu_blown) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
