"""Randomized parity sweep: the full fft kwarg space against an
independent numpy implementation of the reference semantics
(/root/reference/xrft/xrft.py:307-476).  Catches interaction bugs between
flags that the targeted tests don't combine.
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.signal as sps

from xrft_tpu import LabeledArray, fft
from xrft_tpu.config import complex_mode


def numpy_reference_fft(values, coords_list, axes, real_axis, shift,
                        detrend, window, true_phase, true_amplitude):
    """Independent numpy model of the reference's fft semantics."""
    v = np.asarray(values, dtype=np.float64)
    ndim = v.ndim

    delta = []
    lags = []
    flips = []
    for a, c in zip(axes, coords_list):
        d = np.diff(c)
        delta.append(abs(d[0]))
        cc = c if c[-1] > c[0] else c[::-1]
        lags.append(cc[len(cc) // 2])
        if c[-1] < c[0]:
            flips.append(a)

    if detrend == "constant":
        v = v - v.mean(axis=tuple(axes), keepdims=True)
    elif detrend == "linear":
        # orthogonal-regressor hyperplane fit == lstsq on regular grids
        mean = v.mean(axis=tuple(axes), keepdims=True)
        fit = mean
        nel = np.prod([v.shape[a] for a in axes])
        for a in axes:
            n = v.shape[a]
            i = np.arange(n) - (n - 1) / 2
            shp = [1] * ndim
            shp[a] = n
            iv = i.reshape(shp)
            css = (i**2).sum() * (nel / n)
            slope = (v * iv).sum(axis=tuple(axes), keepdims=True) / css
            fit = fit + slope * iv
        v = v - fit

    if window is not None:
        for a in axes:
            w = sps.windows.get_window(window, v.shape[a], fftbins=True)
            shp = [1] * ndim
            shp[a] = v.shape[a]
            v = v * w.reshape(shp)

    if true_phase and flips:
        v = np.flip(v, axis=flips)
    if true_phase:
        v = np.fft.ifftshift(v, axes=axes)

    if real_axis is None:
        F = np.fft.fftn(v, axes=axes)
    else:
        F = np.fft.rfftn(v, axes=axes)
        shift = False
    if shift:
        F = np.fft.fftshift(F, axes=axes)

    for a, d, lag in zip(axes, delta, lags):
        n = values.shape[a]
        if real_axis is not None and a == axes[-1]:
            f = np.fft.rfftfreq(n, d)
        else:
            f = np.fft.fftfreq(n, d)
            if shift:
                f = np.fft.fftshift(f)
        if true_phase:
            shp = [1] * ndim
            shp[a] = f.size
            F = F * np.exp(-2j * np.pi * f * lag).reshape(shp)
    if true_amplitude:
        F = F * np.prod(delta)
    return F


CASES = []
rng = np.random.RandomState(99)
for i in range(24):
    ndim = rng.randint(1, 4)
    shape = tuple(rng.choice([8, 12, 15, 16, 20]) for _ in range(ndim))
    n_t = rng.randint(1, ndim + 1)
    tdims = sorted(rng.choice(ndim, size=n_t, replace=False).tolist())
    CASES.append(dict(
        seed=i,
        shape=shape,
        tdims=tdims,
        real=bool(rng.rand() < 0.3),
        shift=bool(rng.rand() < 0.5),
        detrend=[None, "constant", "linear"][rng.randint(3)],
        window=[None, "hann", "blackman"][rng.randint(3)],
        true_phase=bool(rng.rand() < 0.5),
        true_amplitude=bool(rng.rand() < 0.5),
        decreasing=bool(rng.rand() < 0.3),
        engine=[None, "matmul", "hp"][rng.randint(3)],
    ))

# larger 1-D/2-D cases exercising the stacked engine's multi-level radix
# plans (sizes > direct_dft_max) and the hp four-step composition
for i, shape in enumerate([(384,), (512,), (6, 256), (192, 20)]):
    ndim = len(shape)
    CASES.append(dict(
        seed=100 + i,
        shape=shape,
        tdims=list(range(ndim)),
        real=bool(i % 2),
        shift=bool(i % 2 == 0),
        detrend=[None, "linear"][i % 2],
        window=[None, "hann"][(i + 1) % 2],
        true_phase=True,
        true_amplitude=True,
        decreasing=False,
        engine=["matmul", "hp"][i % 2],
    ))


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"case{c['seed']}")
@pytest.mark.parametrize("mode", ["native", "split"])
def test_fft_fuzz_vs_numpy_reference(case, mode):
    rs = np.random.RandomState(case["seed"])
    shape = case["shape"]
    dims = [f"d{i}" for i in range(len(shape))]
    coords = {}
    coords_list = []
    for i, n in enumerate(shape):
        dx = 0.1 + rs.rand()
        x0 = rs.randn() * 3
        c = x0 + dx * np.arange(n)
        if case["decreasing"] and i in case["tdims"] and rs.rand() < 0.5:
            c = c[::-1].copy()
        coords[dims[i]] = c
        if i in case["tdims"]:
            coords_list.append(c)
    vals = rs.randn(*shape)
    da = LabeledArray(vals, dims=dims, coords=coords)

    tnames = [dims[i] for i in case["tdims"]]
    real_dim = tnames[-1] if case["real"] else None
    axes = list(case["tdims"])

    kwargs = dict(
        dim=tnames, shift=case["shift"], detrend=case["detrend"],
        window=case["window"], true_phase=case["true_phase"],
        true_amplitude=case["true_amplitude"],
    )
    with complex_mode(mode):
        got = fft(da, real_dim=real_dim, engine=case.get("engine"), **kwargs)

    # reference model: real axis moved last like the library does
    if real_dim is not None:
        order = [i for i in range(len(shape)) if i != case["tdims"][-1]] \
            + [case["tdims"][-1]]
        v_ref = np.transpose(vals, order)
        coords_ref = [coords[dims[i]] for i in case["tdims"][:-1]] \
            + [coords[dims[case["tdims"][-1]]]]
        axes_ref = [order.index(i) for i in case["tdims"]]
        F = numpy_reference_fft(v_ref, coords_ref, axes_ref,
                                real_axis=axes_ref[-1],
                                shift=case["shift"], detrend=case["detrend"],
                                window=case["window"],
                                true_phase=case["true_phase"],
                                true_amplitude=case["true_amplitude"])
        inv = np.argsort(order)
        F = np.transpose(F, inv)
    else:
        F = numpy_reference_fft(vals, coords_list, axes, None,
                                case["shift"], case["detrend"],
                                case["window"], case["true_phase"],
                                case["true_amplitude"])

    scale = max(np.abs(F).max(), 1e-12)
    # hp on the CPU test backend: XLA:CPU FMA contraction degrades the
    # df64 elementwise tails to ~1e-11 (the int8 DFT itself stays exact;
    # strict bounds are pinned on-chip in scripts/chip_checks.py)
    atol = 2e-10 if case.get("engine") == "hp" else 5e-11
    npt.assert_allclose(got.values / scale, F / scale, atol=atol)
