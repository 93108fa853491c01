"""Test configuration: force the CPU backend with 8 virtual devices.

All tests run without a TPU (golden comparisons are exact on CPU); the
8-device virtual mesh exercises the multi-chip tile-split path.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_world():
    """A 128^3 generated world region (origin chunk-aligned at -64).

    Session-scoped: worldgen on 1 CPU core is the slow part of the suite.
    """
    from raytrace_tpu.world.generate import generate_box

    box = generate_box((-64, -64, -64), (128, 128, 128), seed=0)
    return {
        "materials": np.asarray(box["materials"]),
        "minefield": np.asarray(box["minefield"]),
        "solid": np.asarray(box["solid"]),
        "origin": (-64, -64, -64),
    }


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
