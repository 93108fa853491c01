from .shading import sun_color, sample_sky, sun_direction, filmic_curve  # noqa: F401
from .trace_jax import trace_rays, render_gbuffers  # noqa: F401
from .denoise import bilateral_denoise, denoise_chain  # noqa: F401
from .finalize import finalize_frame  # noqa: F401
