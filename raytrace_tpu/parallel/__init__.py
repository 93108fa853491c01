from .tiles import render_frame_tiled, make_tile_mesh  # noqa: F401
