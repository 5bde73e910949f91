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
import sys
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
            ref = con.sql(oracle[name]).df()
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
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
