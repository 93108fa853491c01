from .coords import (  # noqa: F401
    copy_3d_clipped,
    fill_3d_clipped,
    to_linear_3d,
    from_linear_3d,
)
from .perf import RingBufferAverage, StatTracker  # noqa: F401
