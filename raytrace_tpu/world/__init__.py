from .noise import basic_multi, mountain_noise2, perlin2  # noqa: F401
from .heightmap import generate_heightmap, height_at  # noqa: F401
from .generate import generate_box, generate_chunk  # noqa: F401
from .chunk import minefield_from_solid, pack_chunk, occupancy_pyramid  # noqa: F401
from .storage import ChunkStorage  # noqa: F401
