"""get_spacing utility (port of /root/reference/xrft/tests/test_utils.py)."""

import numpy as np
import numpy.testing as npt
import pytest

from xrft_tpu.labeled import Coord
from xrft_tpu.utils import get_spacing


def test_get_spacing_numeric():
    c = Coord(("x",), np.linspace(0, 9, 10), name="x")
    npt.assert_allclose(get_spacing(c), 1.0)
    c = Coord(("x",), np.arange(5) * 0.25 + 3, name="x")
    npt.assert_allclose(get_spacing(c), 0.25)


def test_get_spacing_datetime():
    t = np.arange("2000-01-01", "2000-01-11",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    c = Coord(("time",), t, name="time")
    npt.assert_allclose(get_spacing(c), 86400.0)


def test_get_spacing_uneven_raises():
    c = Coord(("x",), np.array([0.0, 1.0, 2.5]), name="x")
    with pytest.raises(ValueError, match="evenly spaced"):
        get_spacing(c)
