#!/bin/bash
# Local Spark standalone cluster — REAL multi-JVM evidence for the
# north rule's "N vs 4N executor clusters" criterion: one master JVM +
# K worker JVMs on this box, each worker hosting one dedicated-cores
# executor, driver in its own JVM. Usage:
#   tools/cluster.sh start <n_workers> <cores_per_worker> [mem_per_worker]
#   tools/cluster.sh stop
set -e
SPARK_HOME="$(python3 -c 'import pyspark, os; print(os.path.dirname(pyspark.__file__))')"
export SPARK_HOME
export SPARK_WORKER_DIR=/dev/shm/spark-worker
export SPARK_LOG_DIR=/tmp/spark-cluster-logs
mkdir -p "$SPARK_LOG_DIR"

case "$1" in
  start)
    N=${2:-4}; CORES=${3:-2}; MEM=${4:-12g}
    nohup "$SPARK_HOME/bin/spark-class" org.apache.spark.deploy.master.Master \
      --host 127.0.0.1 --port 7077 --webui-port 8091 \
      > "$SPARK_LOG_DIR/master.log" 2>&1 &
    echo $! > /tmp/spark-master.pid
    sleep 5
    for i in $(seq 1 "$N"); do
      nohup "$SPARK_HOME/bin/spark-class" org.apache.spark.deploy.worker.Worker \
        spark://127.0.0.1:7077 --host 127.0.0.1 --cores "$CORES" \
        --memory "$MEM" --webui-port $((8091 + i)) \
        > "$SPARK_LOG_DIR/worker$i.log" 2>&1 &
      echo $! >> /tmp/spark-workers.pid
    done
    sleep 5
    grep -c "Successfully registered" "$SPARK_LOG_DIR"/worker*.log | paste -sd' '
    echo "cluster up: $N workers x $CORES cores @ spark://127.0.0.1:7077"
    ;;
  stop)
    [ -f /tmp/spark-workers.pid ] && xargs -r kill < /tmp/spark-workers.pid 2>/dev/null || true
    [ -f /tmp/spark-master.pid ] && xargs -r kill < /tmp/spark-master.pid 2>/dev/null || true
    rm -f /tmp/spark-workers.pid /tmp/spark-master.pid
    pkill -f org.apache.spark.deploy.worker.Worker 2>/dev/null || true
    pkill -f org.apache.spark.deploy.master.Master 2>/dev/null || true
    echo "cluster stopped"
    ;;
  *)
    echo "usage: $0 start <n_workers> <cores_per_worker> [mem] | stop" >&2
    exit 1
    ;;
esac
