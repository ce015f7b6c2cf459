"""Driver-style cold smoke: load __spark_entry__ by path from a foreign
cwd, run entry() and one query (what the driver's t1 check does)."""

import importlib.util
import os
import sys

os.chdir("/")  # deliberately foreign cwd
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
sys.modules["__spark_entry__"] = mod
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = mod.entry(spark)
rows = df.collect()
print("entry rows:", len(rows), "schema:", df.columns)
q = mod.queries()["pricing_summary"](spark, "/root/testdata/sf0.01")
print("query rows:", q.count())
print("oracle keys:", len(mod.oracle_sql()), "query keys:", len(mod.queries()))
