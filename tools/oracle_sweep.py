import ray, duckdb, pandas as pd, hashlib, time, json, sys
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E
import pyarrow as pa
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
qs, osql = E.queries(), E.oracle_sql()
def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"): df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)
def h(df):
    return hashlib.md5(pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()).hexdigest()
res = {}
for k, fn in qs.items():
    t0 = time.time()
    try:
        r = fn(sf)
        if isinstance(r, pa.Table): rdf = r.to_pandas()
        elif isinstance(r, pd.DataFrame): rdf = r
        else: rdf = r.to_pandas()
        tq = time.time() - t0
        if k in osql:
            t1 = time.time()
            odf = con.execute(osql[k]).df()
            to = time.time() - t1
            a, b = norm(rdf), norm(odf)
            ok = len(a)==len(b) and list(a.columns)==list(b.columns) and (h(a)==h(b))
            res[k] = {"ok": bool(ok), "rows": len(a), "orows": len(b), "q_s": round(tq,2), "o_s": round(to,2)}
        else:
            res[k] = {"ok": None, "rows": len(rdf), "q_s": round(tq,2)}
    except Exception as e:
        res[k] = {"ok": False, "err": str(e)[:200], "q_s": round(time.time()-t0,2)}
    print(json.dumps({k: res[k]}), flush=True)
bad = [k for k,v in res.items() if v.get("ok") is False]
print("TOTAL", len(res), "BAD", bad, flush=True)
json.dump(res, open("/tmp/oracle_sweep.json","w"), indent=1)
ray.shutdown()
