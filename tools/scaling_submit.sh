#!/bin/bash
# North-rule scaling campaign: identical spark-submit job at local[N] and
# local[4N], FRESH JVM per run, interleaved trials, tmpfs shuffle dirs
# cleaned between runs. Usage: scaling_submit.sh [lo] [hi] [mult] [trials]
set -u
LO=${1:-4}; HI=${2:-16}; MULT=${3:-120}; TRIALS=${4:-3}
JAR=/root/repo/target/scala-2.13/dedupespark_2.13-0.1.0.jar
run_level() { # cores
  local CORES=$1
  rm -rf /dev/shm/graft-spark; mkdir -p /dev/shm/graft-spark
  /opt/spark/bin/spark-submit --master "local[$CORES]" \
    --class graft.ClusterBench \
    --driver-memory 40g \
    --conf spark.sql.shuffle.partitions=$(( CORES * 4 )) \
    --conf spark.sql.autoBroadcastJoinThreshold=256m \
    --conf spark.sql.adaptive.coalescePartitions.parallelismFirst=false \
    --conf spark.sql.adaptive.advisoryPartitionSizeInBytes=16m \
    --conf spark.local.dir=/dev/shm/graft-spark \
    --conf spark.ui.enabled=false \
    "$JAR" /root/testdata/sf0.1 "$MULT" 2>/dev/null | grep -E '^\{"docs"'
}
for t in $(seq 1 "$TRIALS"); do
  echo "trial $t lo[$LO]: $(run_level "$LO")"
  echo "trial $t hi[$HI]: $(run_level "$HI")"
done
rm -rf /dev/shm/graft-spark
