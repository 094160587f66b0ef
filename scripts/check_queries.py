"""Spot-check selected registry queries vs their DuckDB oracles with the
driver's exact comparator. Usage: python scripts/check_queries.py q1 q2 ...
(no args → all). Env: SF_DIR overrides /root/testdata/sf0.01."""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as ent
from etna_spark.session import get_spark


def value_hash(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return repr(round(v, 9))
        return str(v)

    lines = sorted(
        ",".join(norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    names = sys.argv[1:]
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("check-queries", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = ent.queries(), ent.oracle_sql()
    fails = []
    for name in names or sorted(qs):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as e:
            print(f"  {name:34s} ERROR {type(e).__name__}: {e}")
            fails.append(name)
            continue
        if name in osql:
            odf = con.sql(osql[name]).df()
            ok = (len(sdf) == len(odf)
                  and sorted(sdf.columns) == sorted(odf.columns)
                  and value_hash(sdf) == value_hash(odf))
            status = "OK" if ok else (
                f"FAIL rows={len(sdf)}/{len(odf)} "
                f"schema={sorted(sdf.columns) == sorted(odf.columns)}"
            )
            if not ok:
                fails.append(name)
        else:
            status = f"rows-only({len(sdf)})"
        print(f"  {name:34s} {status:14s} {time.time() - t0:5.1f}s")
    print("FAILS:", fails if fails else "none")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
