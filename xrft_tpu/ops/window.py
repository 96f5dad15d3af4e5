"""Window functions: host-generated, device-applied.

Windows are a pure function of (window name, axis length), so they are
generated host-side with ``scipy.signal.windows`` (``sym=False``, matching
the reference's periodic-window convention) and embedded in the compiled
program as constants; the N-D window is the separable outer product over
the transform dims, applied via dim-aligned broadcasting — XLA fuses the
multiply into the surrounding pipeline.

Reference: ``_apply_window`` (``/root/reference/xrft/xrft.py:39-103``) with
the same 22-name allowlist and the window-and-windowed-array return pair.
"""

from __future__ import annotations

import warnings
from functools import reduce as _reduce
import operator

import numpy as np
import scipy.signal as sps

from ..labeled import Coord, LabeledArray

__all__ = ["apply_window", "WINDOW_TYPES"]

# Allowlist mirrors the reference (/root/reference/xrft/xrft.py:48-72);
# all are parameter-free callables in scipy.signal.windows except the
# parameterized families, which scipy handles via defaults or errors.
WINDOW_TYPES = [
    "hann", "hamming", "kaiser", "tukey", "parzen", "taylor", "boxcar",
    "barthann", "bartlett", "blackman", "blackmanharris", "bohman",
    "chebwin", "cosine", "dpss", "exponential", "flattop", "gaussian",
    "general_cosine", "general_gaussian", "general_hamming", "triang",
    "nuttall",
]


def apply_window(da: LabeledArray, dims, window_type="hann"):
    """Build the separable N-D window over `dims` and apply it.

    Returns ``(window, windowed_da)`` like the reference; `window` is a
    LabeledArray over the transform dims only (host-constant data).
    """
    if window_type is True:
        window_type = "hann"
        warnings.warn(
            "Please provide the name of window adhering to "
            "scipy.signal.windows. The boolean option will be deprecated in "
            "future releases.",
            FutureWarning,
        )
    elif window_type not in WINDOW_TYPES:
        raise NotImplementedError(
            f"Window type {window_type} not supported. Please adhere to "
            "scipy.signal.windows for naming convention."
        )

    if dims is None:
        dims = list(da.dims)
    elif isinstance(dims, str):
        dims = [dims]

    win_func = getattr(sps.windows, window_type)

    windows = []
    for d in dims:
        w = np.asarray(win_func(da.sizes[d], sym=False))
        coords = {d: da.coords[d]} if d in da.coords else None
        windows.append(LabeledArray(w, dims=(d,), coords=coords))

    # outer product in reversed order, matching the reference's
    # reduce(operator.mul, windows[::-1])
    window = _reduce(operator.mul, windows[::-1])
    return window, da * window
