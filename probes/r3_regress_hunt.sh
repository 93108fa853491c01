#!/bin/bash
# Config-1 regression hunt: (a) pre-palette bisect on today's HW,
# (b) fixed cost decomposition on HEAD.  Sequential — one TPU.
set -u
cd /root/repo
stamp() { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

echo "[$(stamp)] bisect: config 1 at pre-palette commit ($(git -C .bisect/pre_palette rev-parse --short HEAD))"
(cd .bisect/pre_palette && timeout 2500 python -m raytrace_tpu.apps.benchmark --configs 1) 2>&1 \
  | tee probes/out/r3_cfg1_prepalette.log

echo "[$(stamp)] decomp on HEAD"
timeout 7200 python probes/r3_cfg1_decomp.py 2>&1 | tee probes/out/r3_cfg1_decomp.log

echo "[$(stamp)] hunt done"
