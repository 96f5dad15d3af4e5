from .mesh import make_mesh, shard_labeled  # noqa: F401
from .pencil import pencil_fftn  # noqa: F401
from .api import sharded_fft, sharded_power_spectrum  # noqa: F401
