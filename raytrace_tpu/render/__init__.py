from .camera import Camera, compute_triple_euler_vector  # noqa: F401
from .streaming import TerrainStreamer, Position  # noqa: F401
from .pipeline import Pipeline, FrameUniforms  # noqa: F401
