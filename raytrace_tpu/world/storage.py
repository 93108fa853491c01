"""Chunk disk cache.

Reference: src/world/chunk_storage.rs — generate-or-load with an
LZ4-compressed on-disk format, file per chunk named by zero-padded hex
coordinates, warn-and-regenerate on corrupt files.

File format matches the reference payload layout (chunk_storage.rs:42-68):
LZ4-compressed stream of [materials: u32 x 64^3 little-endian][minefield:
u8 x 64^3].  Compression uses the framework's native C++ LZ4 block codec
(native/raytrace_native.cpp) through ctypes; if the extension has not been
built, a zlib fallback is used with a distinct magic so the two formats are
never confused.

Deliberate container divergence: the reference wraps the payload in the
LZ4 *frame* format (chunk_storage.rs:42-68 via `lz4::EncoderBuilder`);
this cache writes its own magic-tagged block container (RTL4 header +
raw-size word + LZ4 blocks).  The decompressed payload bytes are
identical, but the two caches are not byte-interoperable on disk — a
reference cache cannot be read by this framework or vice versa.  Chunks
regenerate deterministically from the seed, so nothing is lost by the
divergence.

TPU-native role: this cache is the *host-side* persistence layer ("the only
checkpoint/resume mechanism", SURVEY §5).  The hot path renders straight from
device-generated terrain; the cache exists for parity (offline pre-gen CLI,
resume across runs) and to cut regeneration cost for host-driven tools.
"""

from __future__ import annotations

import os
import struct
import zlib
from pathlib import Path

import numpy as np

from ..constants import CHUNK_VOLUME
from ..native import lz4_available, lz4_compress, lz4_decompress

_MAGIC_LZ4 = b"RTL4"
_MAGIC_ZLIB = b"RTZL"
_MAT_BYTES = CHUNK_VOLUME * 4
_MIN_BYTES = CHUNK_VOLUME
_RAW_BYTES = _MAT_BYTES + _MIN_BYTES


def default_storage_dir() -> Path:
    base = os.environ.get("RAYTRACE_TPU_HOME")
    if base:
        return Path(base) / "world"
    config = os.environ.get("XDG_CONFIG_HOME", str(Path.home() / ".config"))
    return Path(config) / "raytrace_tpu" / "world"


class ChunkStorage:
    """Generate-or-load packed chunk data with an on-disk cache."""

    def __init__(self, storage_dir: str | Path | None = None, seed: int = 0):
        self.storage_dir = Path(storage_dir) if storage_dir else default_storage_dir()
        self.storage_dir.mkdir(parents=True, exist_ok=True)
        self.seed = seed
        self._generate_fn = None

    # -- paths (reference chunk_storage.rs:37-40) --
    def path_for(self, coord) -> Path:
        x, y, z = (int(c) & 0xFFFFFFFFFFFFFFFF for c in coord)
        return self.storage_dir / f"{x:016X}{y:016X}{z:016X}"

    def has_chunk(self, coord) -> bool:
        return self.path_for(coord).exists()

    # -- serialization --
    @staticmethod
    def _encode(materials: np.ndarray, minefield: np.ndarray) -> bytes:
        raw = materials.astype("<u4").tobytes() + minefield.astype(np.uint8).tobytes()
        if lz4_available():
            body = lz4_compress(raw)
            magic = _MAGIC_LZ4
        else:
            body = zlib.compress(raw, 4)
            magic = _MAGIC_ZLIB
        return magic + struct.pack("<I", len(raw)) + body

    @staticmethod
    def _decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
        magic, (raw_len,) = blob[:4], struct.unpack("<I", blob[4:8])
        body = blob[8:]
        if magic == _MAGIC_LZ4:
            raw = lz4_decompress(body, raw_len)
        elif magic == _MAGIC_ZLIB:
            raw = zlib.decompress(body)
        else:
            raise ValueError(f"bad chunk magic {magic!r}")
        if len(raw) != _RAW_BYTES:
            raise ValueError(f"bad chunk payload size {len(raw)}")
        materials = np.frombuffer(raw[:_MAT_BYTES], dtype="<u4").reshape(64, 64, 64)
        minefield = np.frombuffer(raw[_MAT_BYTES:], dtype=np.uint8).reshape(64, 64, 64)
        return materials.copy(), minefield.copy()

    # -- generation --
    def _generate(self, coord) -> tuple[np.ndarray, np.ndarray]:
        # Import here so numpy-only users of the cache don't pull in jax.
        from .generate import generate_chunk

        materials, minefield = generate_chunk(coord, seed=self.seed)
        return np.asarray(materials), np.asarray(minefield)

    def _generate_and_store(self, coord):
        materials, minefield = self._generate(coord)
        try:
            self.path_for(coord).write_bytes(self._encode(materials, minefield))
        except OSError as err:
            # Warn-and-continue (reference chunk_storage.rs:84-90).
            print(f"WARNING: Failed to write chunk data for {coord}: {err}")
        return materials, minefield

    def borrow_packed_chunk_data(self, coord) -> tuple[np.ndarray, np.ndarray]:
        """(materials u32 (Z,Y,X), minefield u8 (Z,Y,X)) for a chunk coord.

        Cache-hit reads, corrupt files warn and regenerate
        (reference chunk_storage.rs:95-151).
        """
        path = self.path_for(coord)
        if path.exists():
            try:
                return self._decode(path.read_bytes())
            except (ValueError, OSError) as err:
                print(f"WARNING: Failed to read chunk data for {coord}: {err}")
        return self._generate_and_store(coord)
