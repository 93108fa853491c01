"""Test configuration: force the CPU backend with 8 virtual devices.

All tests run without a TPU (golden comparisons are exact on CPU); the
8-device virtual mesh exercises the multi-chip tile-split path.
"""

import os

# Force (not setdefault): the ambient environment may pin JAX_PLATFORMS to a
# remote TPU platform; tests must run on local CPU with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# The env vars above are advisory; in this environment the axon TPU plugin
# wins platform selection regardless, so force local CPU through the config
# API (this is what actually works on jax 0.9) with 8 virtual devices for
# the multi-chip tile-split tests.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np
import pytest


def _world_tag():
    """Fingerprint of the world definition, so cached worlds self-invalidate
    when the terrain function changes (heights sampled at fixed probes)."""
    from raytrace_tpu.world.heightmap import height_at
    import jax.numpy as jnp

    xs = jnp.asarray([0, 37, -1290, 511, 40000], jnp.int32)
    ys = jnp.asarray([0, -89, 777, -40000, 123], jnp.int32)
    hs = np.asarray(height_at(xs, ys, 0)).tolist()
    return "h" + "_".join(str(int(v)) for v in hs)


@pytest.fixture(scope="session")
def small_world():
    """A 128^3 generated world region (origin chunk-aligned at -64).

    Cached on disk: worldgen on 1 CPU core dominates suite time otherwise.
    The cache key embeds a world fingerprint, so a changed terrain function
    regenerates instead of silently using a stale world.
    """
    from raytrace_tpu.world.generate import generate_box

    cache = Path(__file__).parent / f".world_cache_{_world_tag()}.npz"
    if cache.exists():
        try:
            d = np.load(cache)
            return {
                "materials": d["materials"],
                "minefield": d["minefield"],
                "solid": d["solid"],
                "origin": (-64, -64, -64),
            }
        except Exception:
            pass
    box = generate_box((-64, -64, -64), (128, 128, 128), seed=0)
    out = {
        "materials": np.asarray(box["materials"]),
        "minefield": np.asarray(box["minefield"]),
        "solid": np.asarray(box["solid"]),
        "origin": (-64, -64, -64),
    }
    try:
        np.savez_compressed(cache, **out)
    except OSError:
        pass
    return out


@pytest.fixture(scope="session")
def full_world_volume():
    """A full 256^3 generated region (world [-128,128)^3), disk-cached."""
    cache = Path(__file__).parent / f".world_cache_full_{_world_tag()}.npz"
    if cache.exists():
        try:
            d = np.load(cache)
            return d["materials"], d["minefield"]
        except Exception:
            pass
    from raytrace_tpu.world.generate import generate_box

    box = generate_box((-128, -128, -128), (256, 256, 256), seed=0)
    mats = np.asarray(box["materials"])
    mf = np.asarray(box["minefield"])
    try:
        np.savez_compressed(cache, materials=mats, minefield=mf)
    except OSError:
        pass
    return mats, mf


@pytest.fixture(scope="session")
def world_volume(small_world):
    """The small world embedded in a full 256^3 toroidal volume.

    World voxel w maps to texel (w + 128) % 256; the embedded region spans
    world [-64, 64)^3 -> texels [64, 192)^3.  Outside the region the volume
    is air with minefield 6 (empty chunks).
    """
    mats = np.zeros((256, 256, 256), np.uint32)
    mf = np.full((256, 256, 256), 6, np.uint8)
    mats[64:192, 64:192, 64:192] = small_world["materials"]
    mf[64:192, 64:192, 64:192] = small_world["minefield"]
    return mats, mf
