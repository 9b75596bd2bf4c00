"""Local mirror of the driver's correctness gate.

Runs entry() on sf0.001, then every queries()[k] at sf0.01 against
oracle_sql()[k] in DuckDB: row count, column names, and order-insensitive
value comparison. Exit code 1 on any mismatch.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from imdedup_plus_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def rowset(cols, rows):
    """Canonicalize THE WAY THE DRIVER DOES: pandas sort_values over the
    name-sorted columns. The round-2 mirror sorted Python tuples, which
    happily compares list cells — so 4 ARRAY-column queries passed locally
    while the official gate errored with 'unhashable type: list'. pandas
    sort_values raises on list cells exactly like the driver."""
    import pandas as pd

    order = [cols[i] for i in sorted(range(len(cols)), key=lambda i: cols[i])]
    df = pd.DataFrame(
        [[norm(v) for v in r] for r in rows], columns=list(cols), dtype=object
    )[order]
    df = df.sort_values(by=order, kind="mergesort").reset_index(drop=True)
    return [tuple(r) for r in df.itertuples(index=False, name=None)]


def main() -> int:
    import __spark_entry__ as E

    sf_small, sf_corr = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]")

    t0 = time.time()
    res = E.entry(spark)
    n = res.count()
    print(f"entry(): {n} rows, schema={res.columns} ({time.time()-t0:.1f}s)")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_corr}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    # optional argv name filters (substring match) for quick iteration,
    # e.g. `python scripts/driver_check.py span_clean pack`
    if len(sys.argv) > 1:
        pats = sys.argv[1:]
        qs = {k: v for k, v in qs.items() if any(p in k for p in pats)}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_corr)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {ex}")
            continue
        if name not in os_:
            print(f"ok   {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(os_[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {ex}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        sset, dset = rowset(scols, srows), rowset(dcols, drows)
        ok_rows = sset == dset
        status = "ok  " if (ok_cols and ok_rows) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: spark {len(srows)} rows vs duckdb {len(drows)} "
            f"cols_match={ok_cols} values_match={ok_rows} ({time.time()-t0:.1f}s)"
        )
        if not ok_cols:
            print(f"     spark cols: {sorted(scols)}\n     duck  cols: {sorted(dcols)}")
        if not ok_rows:
            sonly = [r for r in sset if r not in set(dset)][:3]
            donly = [r for r in dset if r not in set(sset)][:3]
            print(f"     spark-only: {sonly}\n     duck-only : {donly}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
