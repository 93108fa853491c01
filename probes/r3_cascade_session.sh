#!/bin/bash
# Straggler-cascade measurement session (post palette-removal + cascade).
#   nohup bash probes/r3_cascade_session.sh > probes/out/r3_cascade.log 2>&1 &
set -u
cd /root/repo
stamp() { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

echo "[$(stamp)] step 1: 1M incoherent-leg decomp (cascade auto-on now)"
timeout 3600 python probes/r3_vol1m_b.py 2>&1 | tee probes/out/r3_vol1m_b2.log

echo "[$(stamp)] step 2: config 1 (cascade auto-on: rounds=11, grid=128)"
timeout 2500 python -m raytrace_tpu.apps.benchmark --configs 1 2>&1 \
  | tee probes/out/r3_cfg1_cascade.log

echo "[$(stamp)] step 3: volume_fast FULL pipeline bench"
RAYTRACE_TPU_TRACER=volume_fast timeout 3600 python bench.py 2>&1 \
  | tee probes/out/r3_bench_volfast2.log

echo "[$(stamp)] step 4: config 5 volume_fast 4K"
timeout 3600 python -m raytrace_tpu.apps.benchmark --configs 5 \
  --tracer volume_fast 2>&1 | tee probes/out/r3_cfg5_volfast2.log

echo "[$(stamp)] session done"
