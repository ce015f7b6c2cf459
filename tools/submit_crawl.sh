#!/bin/bash
# Literal `spark-submit --py-files` run of the crawl engine against the
# standalone cluster (tools/cluster.sh must be up). The zip carries the
# whole engine plus the entry/fixture modules; no repo checkout is
# needed on the workers.
#   tools/submit_crawl.sh <cores_max> [sf_dir] [mirrors]
set -e
cd "$(dirname "$0")/.."
CORES=${1:-8}; SF=${2:-/root/testdata/sf0.01}; M=${3:-5}
ZIP=/tmp/infinitycrawler_pyfiles.zip

python - <<'EOF'
import os, zipfile
zp = "/tmp/infinitycrawler_pyfiles.zip"
with zipfile.ZipFile(zp, "w") as zf:
    for root, _dirs, files in os.walk("infinitycrawler_spark"):
        for name in files:
            if name.endswith(".py"):
                full = os.path.join(root, name)
                zf.write(full, full)
    zf.write("__spark_entry__.py", "__spark_entry__.py")
    # fixture builder imported by the job at zip root
    zf.write("tools/bench_scaling.py", "bench_scaling.py")
print("built", zp)
EOF

SPARK_HOME="${SPARK_HOME:-$(python3 -c 'import pyspark, os; print(os.path.dirname(pyspark.__file__))')}"
exec "$SPARK_HOME/bin/spark-submit" \
  --master "${SPARK_MASTER:-spark://127.0.0.1:7077}" \
  --py-files "$ZIP" \
  --conf spark.cores.max="$CORES" \
  --conf spark.executor.cores=2 \
  --conf spark.executor.memory=10g \
  --conf spark.driver.memory=12g \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.local.dir=/dev/shm/spark-local \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.locality.wait=0s \
  --conf spark.executorEnv.OMP_NUM_THREADS=1 \
  --conf spark.executorEnv.OPENBLAS_NUM_THREADS=1 \
  --conf spark.executorEnv.MKL_NUM_THREADS=1 \
  tools/submit_crawl.py "$CORES" "$SF" "$M"
