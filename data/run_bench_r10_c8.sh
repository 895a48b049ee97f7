#!/bin/bash
cd /root/repo
echo "probe_before: $(python3 data/hostprobe.py)" > data/bench_r10_c8.probe
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 BENCH_REPEAT=1 \
  python bench.py > data/bench_r10_c8.out 2> data/bench_r10_c8.err
echo "probe_after: $(python3 data/hostprobe.py)" >> data/bench_r10_c8.probe
echo done
