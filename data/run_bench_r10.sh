#!/bin/bash
# bracketed bench run: host probe, bench, host probe
TAG=$1
cd /root/repo
echo "probe_before: $(python3 data/hostprobe.py)" > data/bench_r10_${TAG}.probe
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  python bench.py > data/bench_r10_${TAG}.out 2> data/bench_r10_${TAG}.err
echo "probe_after: $(python3 data/hostprobe.py)" >> data/bench_r10_${TAG}.probe
echo done
