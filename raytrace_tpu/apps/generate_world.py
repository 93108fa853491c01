"""Offline world pre-generation CLI.

Reference: src/bin/generate.rs — iterate a RADIUS=32 cube of chunks (64^3
chunks), force each into the disk cache, print % complete and ETA.

TPU-native difference: chunks are generated on device in z-column batches
(heights are computed once per column of 16 chunks) and written through the
LZ4 cache; a 64^3-chunk world is ~16.7 G voxels, so the default radius here
is smaller — pass --radius 32 for the full reference sweep.

Usage: python -m raytrace_tpu.apps.generate_world [--radius N] [--dir PATH]
"""

from __future__ import annotations

import argparse

import numpy as np

from ..constants import CHUNK_SIZE
from ..utils.perf import StatTracker
from ..world.storage import ChunkStorage


def run(radius: int = 4, storage_dir=None, seed: int = 0, print_every: int = 64):
    storage = ChunkStorage(storage_dir, seed=seed)
    side = radius * 2
    tracker = StatTracker(side * side * side, "chunks")
    from ..world.generate import generate_box

    for cz in range(-radius, radius):
        for cy in range(-radius, radius):
            # Generate a whole x-row of chunks in one device call.
            box = generate_box(
                (-radius * CHUNK_SIZE, cy * CHUNK_SIZE, cz * CHUNK_SIZE),
                (side * CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE),
                seed=seed,
            )
            mats = np.asarray(box["materials"])
            mf = np.asarray(box["minefield"])
            for ci in range(side):
                cx = ci - radius
                coord = (cx, cy, cz)
                if not storage.has_chunk(coord):
                    sl = np.s_[:, :, ci * CHUNK_SIZE : (ci + 1) * CHUNK_SIZE]
                    blob = storage._encode(mats[sl], mf[sl])
                    try:
                        storage.path_for(coord).write_bytes(blob)
                    except OSError as err:
                        print(f"WARNING: failed to write {coord}: {err}")
                tracker.advance()
                if tracker.done % print_every == 0:
                    print(f"\r{tracker.status()}   ", end="", flush=True)
    print(f"\n{tracker.status()}")
    return tracker


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--radius", type=int, default=4)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ns = ap.parse_args()
    run(ns.radius, ns.dir, ns.seed)


if __name__ == "__main__":
    main()
