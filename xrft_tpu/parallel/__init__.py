from .mesh import axis_links, make_mesh, shard_labeled  # noqa: F401
from .pencil import pencil_fftn  # noqa: F401
from .api import (  # noqa: F401
    sharded,
    sharded_coherence,
    sharded_cross_phase,
    sharded_cross_spectrum,
    sharded_csd,
    sharded_fft,
    sharded_isotropic_cross_spectrum,
    sharded_isotropic_power_spectrum,
    sharded_power_spectrum,
    sharded_welch,
)
