"""Simulate the graft driver: import __spark_entry__ from a NEUTRAL cwd,
smoke-check entry(), then run each query vs its DuckDB oracle at sf0.01
with order-insensitive value-hash comparison (hash of sorted stringified rows)."""
import sys, hashlib, time
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
for name, fn in sorted(qs.items()):
    t0=time.time()
    sdf = fn(spark, sf).toPandas()
    if name in osql:
        odf = con.sql(osql[name]).df()
        ok_rows = len(sdf)==len(odf)
        ok_schema = sorted(sdf.columns)==sorted(odf.columns)
        ok_hash = value_hash(sdf)==value_hash(odf)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else f"FAIL rows={ok_rows} schema={ok_schema} hash={ok_hash}"
        if not (ok_rows and ok_schema and ok_hash): fails.append(name)
    else:
        status = f"rows-only({len(sdf)})"
    print(f"  {name:28s} {status:12s} n={len(sdf):7d} {time.time()-t0:5.1f}s")
print("FAILS:", fails if fails else "none")
spark.stop()
