#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]

Expects `outdir` to contain Verify.scala's output (one parquet dir per
query + oracle_sql.json). Runs each oracle in DuckDB against the sfdir
tables and compares rows / schema (sorted column names + dtypes) /
value hash (columns sorted by name, rows sorted) with the Spark result.
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        cells = []
        for v in t:
            if isinstance(v, float):
                cells.append(f"{v:.6f}")
            elif isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                cells.append(str(list(v)))
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    # Keep DuckDB's spill files out of the repo (a 1.19 GB temp blob was
    # once committed by accident); /tmp is tmpfs-or-disk but never tracked.
    con.execute("SET temp_directory='/tmp/graft_duckdb_tmp'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            ora_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fails += 1
            continue
        rows_ok = len(spark_df) == len(ora_df)
        # the driver compares column NAMES only; dtype diffs are warnings
        schema_ok = sorted(spark_df.columns) == sorted(ora_df.columns)
        s_schema = sorted(zip(spark_df.columns, [str(d) for d in spark_df.dtypes]))
        o_schema = sorted(zip(ora_df.columns, [str(d) for d in ora_df.dtypes]))
        hash_ok = canon(spark_df) == canon(ora_df)
        status = "ok  " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
        warn = "" if s_schema == o_schema else " [dtype-diff]"
        print(f"{status} {name}: rows={rows_ok}({len(spark_df)}/{len(ora_df)}) "
              f"schema={schema_ok} hash={hash_ok}{warn}")
        if not schema_ok:
            print(f"     spark={s_schema}\n     oracle={o_schema}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
