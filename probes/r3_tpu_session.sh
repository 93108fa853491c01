#!/bin/bash
# Round-3 TPU measurement session.  Run when the axon tunnel is up:
#   nohup bash probes/r3_tpu_session.sh > probes/out/r3_session.log 2>&1 &
# Sequenced by value: the driver bench gate first, then the VERDICT items.
# Each step is timeout-bounded; logs are line-buffered per step.
set -u
cd /root/repo
mkdir -p probes/out
stamp() { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

echo "[$(stamp)] step 0: vol-kernel Mosaic smoke (escape+jump scalars are new)"
timeout 900 python - <<'EOF' 2>&1 | tee probes/out/r3_smoke.log
import numpy as np, jax, jax.numpy as jnp
from raytrace_tpu.ops.trace_jax import fuse_volume
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
solid = np.zeros((256, 256, 256), bool); solid[:40] = True
from raytrace_tpu.world.chunk import minefield_from_solid
from raytrace_tpu.materials import PACKED_MATERIALS
mats = np.where(solid, np.uint32(PACKED_MATERIALS[5]), np.uint32(0))
fused = fuse_volume(jnp.asarray(mats), minefield_from_solid(jnp.asarray(solid)))
t = build_vol_tables(fused)
o = jnp.tile(jnp.asarray([[0.5, 0.5, 60.0]], jnp.float32), (256, 1))
d = jnp.tile(jnp.asarray([[0.01, 0.01, -1.0]], jnp.float32), (256, 1))
for kw in ({}, {"approach_jump": True}, {"escape": False}):
    r = trace_rays_vol(t, fused, o, d, jnp.zeros(3, jnp.int32), **kw)
    print(kw, "air:", int(r["air"].sum()), "hit ok:", bool((~r["air"]).any()))
print("MOSAIC SMOKE OK")
EOF

echo "[$(stamp)] step 1: headline bench (fused) — the driver gate"
timeout 2500 python bench.py 2>&1 | tee probes/out/r3_bench_fused.log

echo "[$(stamp)] step 2: config 1 post-palette baseline (no compaction)"
timeout 2500 python -m raytrace_tpu.apps.benchmark --configs 1 2>&1 \
  | tee probes/out/r3_cfg1_base.log

echo "[$(stamp)] step 3: config 1 compact_cap A/B"
for cc in 16384 32768; do
  echo "[$(stamp)]   compact_cap=$cc"
  RAYTRACE_TPU_COMPACT_CAP=$cc timeout 2500 \
    python -m raytrace_tpu.apps.benchmark --configs 1 2>&1 \
    | tee probes/out/r3_cfg1_cc$cc.log
done

echo "[$(stamp)] step 3b: config 1 cost decomposition (per-round + compact A/B)"
# ~10 jitted variants at 150-350 s compile each on a slow-tunnel day.
timeout 7200 python probes/r3_cfg1_decomp.py 2>&1 \
  | tee probes/out/r3_cfg1_decomp.log

echo "[$(stamp)] step 4: config 3 (full + interactive presets)"
timeout 3600 python -m raytrace_tpu.apps.benchmark --configs 3 2>&1 \
  | tee probes/out/r3_cfg3.log

echo "[$(stamp)] step 5: config 5 (tiled 4K, now on the Pallas denoise chain)"
timeout 3600 python -m raytrace_tpu.apps.benchmark --configs 5 2>&1 \
  | tee probes/out/r3_cfg5.log

echo "[$(stamp)] step 5b: config 5 on arbitrary content (volume_fast)"
timeout 3600 python -m raytrace_tpu.apps.benchmark --configs 5 \
  --tracer volume_fast 2>&1 | tee probes/out/r3_cfg5_volfast.log

echo "[$(stamp)] step 6: volume_fast FULL pipeline at the bench shape"
RAYTRACE_TPU_TRACER=volume_fast timeout 3600 python bench.py 2>&1 \
  | tee probes/out/r3_bench_volfast.log

echo "[$(stamp)] step 7: config 4 (dat format) + config 2 confirm"
timeout 2500 python -m raytrace_tpu.apps.benchmark --configs 4,2 2>&1 \
  | tee probes/out/r3_cfg4_2.log

echo "[$(stamp)] session done"
