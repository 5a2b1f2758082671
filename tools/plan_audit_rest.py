import sys, os, io, re, contextlib, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
qs = e.queries()
sf = "/root/testdata/sf0.1"
det = set(json.load(open("/root/repo/BENCH_DETAIL.json"))["queries"])
rows = []
for name in sorted(set(qs) - det):
    try:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        rows.append({
            "n": name,
            "exch": len(re.findall(r"\bExchange\b", p)),
            "single": len(re.findall(r"SinglePartition", p)),
            "py": len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|PythonMapInArrow", p)),
            "cart": len(re.findall(r"CartesianProduct", p)),
            "smj": len(re.findall(r"SortMergeJoin", p)),
            "nofilt": len(re.findall(r"PushedFilters: \[\]", p)),
        })
    except Exception as ex:
        rows.append({"n": name, "err": str(ex)[:150]})
    print("done", name, flush=True)
json.dump(rows, open("/tmp/plan_audit_rest.json","w"), indent=0)
