from .reference_tracer import trace_rays_np, render_gbuffers_np  # noqa: F401
from .golden import compare_images  # noqa: F401
