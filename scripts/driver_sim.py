"""Simulate the graft driver: import __spark_entry__ from a NEUTRAL cwd,
smoke-check entry(), then run each query vs its DuckDB oracle at sf0.01
with order-insensitive value-hash comparison (hash of sorted stringified rows).

Persists the FULL-surface result to FULLSURFACE.json (same row shape as the
driver's CORRECTNESS files) — the driver's own recording window covers only
the first 50 registry entries, so this artifact is the every-query evidence;
copy it to FULLSURFACE_r{N}.json and commit it each round."""
import json, os, sys, hashlib, time
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as ent
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. entry smoke
t0=time.time()
df = ent.entry(spark)
rows = df.collect()
print(f"ENTRY: rows={len(rows)} schema={[(f.name,f.dataType.simpleString()) for f in df.schema.fields]} {time.time()-t0:.1f}s")
assert len(rows) >= 0

# 2. oracle comparison at sf0.01
sf="/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def value_hash(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    def norm(v):
        if v is None: return "NULL"
        if isinstance(v, float):
            if v != v: return "NaN"
            return repr(round(v, 9))
        return str(v)
    lines = sorted(",".join(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

qs, osql = ent.queries(), ent.oracle_sql()
print(f"queries={len(qs)} with_oracle={len(osql)}")
fails=[]
record={}
for name, fn in sorted(qs.items()):
    t0=time.time()
    try:
        sdf = fn(spark, sf).toPandas()
    except Exception as e:
        fails.append(name)
        record[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": None,
                        "oracle_rows": None, "err": f"{type(e).__name__}: {e}"}
        print(f"  {name:28s} ERROR {type(e).__name__} {time.time()-t0:5.1f}s")
        continue
    if name in osql:
        odf = con.sql(osql[name]).df()
        ok_rows = len(sdf)==len(odf)
        ok_schema = sorted(sdf.columns)==sorted(odf.columns)
        ok_hash = value_hash(sdf)==value_hash(odf)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else f"FAIL rows={ok_rows} schema={ok_schema} hash={ok_hash}"
        if not (ok_rows and ok_schema and ok_hash): fails.append(name)
        record[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                        "hash_match": ok_hash, "spark_rows": len(sdf),
                        "oracle_rows": len(odf), "err": None}
    else:
        status = f"rows-only({len(sdf)})"
        record[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": len(sdf),
                        "oracle_rows": None, "err": "no_oracle"}
    print(f"  {name:28s} {status:12s} n={len(sdf):7d} {time.time()-t0:5.1f}s")
out_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/FULLSURFACE.json"
with open(out_path, "w") as f:
    json.dump(record, f, indent=1)
print("FAILS:", fails if fails else "none")
print("wrote", out_path)
spark.stop()
sys.exit(1 if fails else 0)
