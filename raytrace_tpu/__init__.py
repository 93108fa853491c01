"""raytrace_tpu: a TPU-native voxel path tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
someguynamedjosh/raytrace (Rust + GLSL/Vulkan).  See README.md for the
architecture map and reference-parity notes.
"""

from . import constants  # noqa: F401
from .materials import MATERIALS, Material  # noqa: F401

__version__ = "0.1.0"


def create_instance(game=None, **pipeline_kwargs):
    """Build the renderer (world + pipeline) — the reference's module-level
    entry point (src/render/mod.rs:36-43 create_instance).

    Returns the Pipeline; the "Core" (device bring-up) of the reference has
    no equivalent here — XLA/PJRT owns the device.
    """
    from .render.pipeline import Pipeline

    return Pipeline(**pipeline_kwargs)
