import sys, os, io, re, contextlib, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
qs = e.queries()
sf = "/root/testdata/sf0.1"
det = json.load(open("/root/repo/BENCH_DETAIL.json"))["queries"]
rows = []
for name in sorted(det):
    try:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        stats = {
            "n": name, "sec": det[name],
            "exch": len(re.findall(r"\bExchange\b", p)),
            "single": len(re.findall(r"SinglePartition", p)),
            "py": len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|PythonMapInArrow", p)),
            "bhj": len(re.findall(r"BroadcastHashJoin", p)),
            "smj": len(re.findall(r"SortMergeJoin", p)),
            "shj": len(re.findall(r"ShuffledHashJoin", p)),
            "nlj": len(re.findall(r"BroadcastNestedLoopJoin", p)),
            "cart": len(re.findall(r"CartesianProduct", p)),
            "wins": len(re.findall(r"\bWindow\b", p)),
            "nofilter_scan": len(re.findall(r"PushedFilters: \[\]", p)),
            "scans": len(re.findall(r"Scan parquet|FileScan", p)),
        }
        rows.append(stats)
    except Exception as ex:
        rows.append({"n": name, "sec": det[name], "err": str(ex)[:120]})
    print("done", name, flush=True)
json.dump(rows, open("/tmp/plan_audit.json","w"), indent=0)
