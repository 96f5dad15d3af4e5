"""cftime coordinate handling, exercised with a stub module (cftime is an
optional dependency, absent from this image — gated exactly like the
reference, /root/reference/xrft/xrft.py:199-206).
"""

import sys
import types

import numpy as np
import numpy.testing as npt
import pytest

from xrft_tpu.coords import diff_coord, lag_coord
from xrft_tpu.labeled import Coord


class _FakeCFDate:
    """Minimal cftime-datetime stand-in: has .calendar, orders by _days."""

    def __init__(self, days, calendar="noleap"):
        self._days = days
        self.calendar = calendar

    def __lt__(self, o):
        return self._days < o._days

    def __gt__(self, o):
        return self._days > o._days

    def __eq__(self, o):
        return self._days == o._days

    def __hash__(self):
        return hash(self._days)


@pytest.fixture
def stub_cftime(monkeypatch):
    mod = types.ModuleType("cftime")

    def date2num(dates, units, calendar):
        assert units.startswith("seconds since 1800-01-01")
        arr = np.asarray(dates, dtype=object)
        if arr.ndim == 0:
            return arr.item()._days * 86400.0
        return np.array([d._days * 86400.0 for d in arr.ravel()]).reshape(
            arr.shape
        )

    mod.date2num = date2num
    monkeypatch.setitem(sys.modules, "cftime", mod)
    return mod


def test_diff_coord_cftime(stub_cftime):
    dates = np.array([_FakeCFDate(i) for i in range(10)], dtype=object)
    c = Coord(("time",), dates, name="time")
    d = diff_coord(c)
    npt.assert_allclose(d, 86400.0)  # daily spacing in seconds


def test_lag_coord_cftime(stub_cftime):
    dates = np.array([_FakeCFDate(i) for i in range(11)], dtype=object)
    c = Coord(("time",), dates, name="time")
    # midpoint element N//2 = day 5, decoded to seconds
    assert lag_coord(c) == 5 * 86400.0


def test_cftime_coord_is_valid(stub_cftime):
    from xrft_tpu.coords import is_valid_fft_coord

    dates = np.array([_FakeCFDate(i) for i in range(4)], dtype=object)
    assert is_valid_fft_coord(Coord(("t",), dates, name="t"))
