"""The fused one-sided PSD path (ops/psd_fused.py): raw-layout |F|^2 with
folded window weights and spectral detrend.

Pins exact agreement (f64, ~1e-12) between the fused route
(engine='matmul', which takes it whenever applicable) and the generic
XLA-FFT route for the same reference semantics
(``/root/reference/xrft/xrft.py:685-750``), across the kwarg grid the
fusion specializes on, plus the raw-layout engine helpers themselves.
"""

import numpy as np
import numpy.testing as npt
import pytest

import xrft_tpu
from xrft_tpu import LabeledArray
from xrft_tpu.ops import carray, psd_fused, stacked_fft


def _field(shape, trend=True, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(*shape)
    if trend:
        # strong hyperplane trend so the spectral-detrend terms matter
        for ax, n in enumerate(shape):
            sl = [None] * len(shape)
            sl[ax] = slice(None)
            d = d + 0.05 * (ax + 1) * np.arange(n)[tuple(sl)]
        d = d + 2.0
    return d


def _check(da, dims, rtol=1e-10, applicable=True, **kw):
    half = dims[-1] if dims else list(da.dims)[-1]
    shift = kw.get("shift", True)
    fkw = {k: v for k, v in kw.items()
           if k not in ("scaling", "window_correction")}
    fkw.update({"true_phase": False, "true_amplitude": False})
    assert psd_fused.fused_psd_applicable(
        da, dims or list(da.dims), half, shift,
        {**fkw, "engine": "matmul"}) == applicable
    ref = xrft_tpu.power_spectrum(da, dim=dims, engine="xla", **kw)
    got = xrft_tpu.power_spectrum(da, dim=dims, engine="matmul", **kw)
    assert got.dims == ref.dims
    for c in ref.coords:
        npt.assert_allclose(got.coords[c].values, ref.coords[c].values,
                            atol=1e-12)
    scale = float(np.abs(np.asarray(ref.values)).max())
    npt.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                        atol=rtol * scale)
    return got


@pytest.mark.parametrize("window", [None, "hann", "blackman"])
@pytest.mark.parametrize("detrend", [None, "constant", "linear"])
@pytest.mark.parametrize("shift", [True, False])
def test_fused_psd_parity_grid(window, detrend, shift):
    da = LabeledArray(
        _field((3, 64, 48)), dims=("t", "y", "x"),
        coords={"y": np.arange(64) * 0.5, "x": np.arange(48) * 0.25},
    )
    _check(da, ["y", "x"], window=window, detrend=detrend, shift=shift)


def test_fused_psd_half_dim_not_trailing():
    # dim order selects half=y, which sits mid-array: the fused path
    # transposes it trailing and restores the original order in the
    # single-epilogue reshape
    da = LabeledArray(
        _field((4, 32, 24)), dims=("t", "y", "x"),
        coords={"y": np.arange(32) * 1.0, "x": np.arange(24) * 2.0},
    )
    _check(da, ["x", "y"], window="hann", detrend="linear")


def test_fused_psd_3d_transform_and_interleaved_batch():
    da = LabeledArray(
        _field((2, 16, 24, 32)), dims=("t", "z", "y", "x"),
        coords={"z": np.arange(16) * 1.0, "y": np.arange(24) * 0.5,
                "x": np.arange(32) * 0.25},
    )
    _check(da, ["z", "y", "x"], window="hann", detrend="linear")
    da2 = LabeledArray(
        _field((3, 40, 5, 36)), dims=("a", "y", "b", "x"),
        coords={"y": np.arange(40) * 1.0, "x": np.arange(36) * 1.0},
    )
    _check(da2, ["y", "x"], window="tukey", detrend="constant")


def test_fused_psd_multi_level_plans():
    # y = 2048 -> (16, 128): exercises the elementwise weight placement
    # before a multi-level axis and the folded-twiddle final dot
    da = LabeledArray(
        _field((2, 2048, 16)), dims=("t", "y", "x"),
        coords={"y": np.arange(2048) * 1.0, "x": np.arange(16) * 1.0},
    )
    _check(da, ["y", "x"], window="hann", detrend="linear")


def test_fused_psd_three_level_plan():
    # 32768 -> (2, 128, 128): the explicit inter-level twiddle pass
    da = LabeledArray(
        _field((1, 32768, 8), trend=True), dims=("t", "y", "x"),
        coords={"y": np.arange(32768) * 1.0, "x": np.arange(8) * 1.0},
    )
    _check(da, ["y", "x"], window="hann", detrend="linear")


def test_fused_psd_scalings():
    da = LabeledArray(
        _field((2, 64, 48)), dims=("t", "y", "x"),
        coords={"y": np.arange(64) * 1.0, "x": np.arange(48) * 1.0},
    )
    _check(da, ["y", "x"], window="hann", detrend="linear",
           scaling="spectrum", window_correction=True)
    _check(da, ["y", "x"], window="hann", scaling="false_density")


def test_fused_psd_f32_grade(monkeypatch):
    # the fused route must not degrade f32 accuracy: it agrees with the
    # unfused one-sided matmul path to ~1e-4 (the internal transpose
    # changes the detrend reductions' f32 accumulation order, which the
    # trend-dominated field amplifies at a few low-wavenumber bins; both
    # routes sit at the engine's inherent f32 grade vs the f64 truth)
    coords = {"y": np.arange(256) * 1.0, "x": np.arange(192) * 1.0}
    d = _field((2, 256, 192)).astype(np.float32)
    da = LabeledArray(d, dims=("t", "y", "x"), coords=coords)
    kw = dict(dim=["y", "x"], window="hann", detrend="linear",
              engine="matmul")
    got = xrft_tpu.power_spectrum(da, **kw)
    monkeypatch.setattr(psd_fused, "fused_psd_applicable",
                        lambda *a, **k: False)
    old = xrft_tpu.power_spectrum(da, **kw)
    scale = float(np.abs(np.asarray(old.values)).max())
    npt.assert_allclose(np.asarray(got.values), np.asarray(old.values),
                        atol=1e-4 * scale)
    ref = xrft_tpu.power_spectrum(
        LabeledArray(d.astype(np.float64), dims=("t", "y", "x"),
                     coords=coords),
        dim=["y", "x"], window="hann", detrend="linear", engine="xla")
    npt.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                        atol=5e-4 * scale)


def test_fused_psd_not_applicable_fallbacks():
    da = LabeledArray(
        _field((2, 32, 24)), dims=("t", "y", "x"),
        coords={"y": np.arange(32) * 1.0, "x": np.arange(24) * 1.0},
    )
    # complex input, single transform dim, xla engine: all must decline
    assert not psd_fused.fused_psd_applicable(
        da, ["y", "x"], "x", True, {"engine": "xla"})
    cda = da.copy(data=carray.ComplexPair(da.data, da.data))
    assert not psd_fused.fused_psd_applicable(
        cda, ["y", "x"], "x", True, {"engine": "matmul"})
    assert not psd_fused.fused_psd_applicable(
        da, ["y", "x"], "x", True,
        {"engine": "matmul", "true_phase": True})
    assert not psd_fused.fused_psd_applicable(
        da, ["y", "x"], "x", True,
        {"engine": "matmul", "detrend": "quadratic"})
    # unknown kwargs must fall through to the generic path's error
    assert not psd_fused.fused_psd_applicable(
        da, ["y", "x"], "x", True, {"engine": "matmul", "bogus": 1})


def test_raw_layout_roundtrip_matches_standard_epilogue():
    # raw planes + raw_to_standard == the engine's own epilogue, per kind
    rng = np.random.RandomState(3)
    x = rng.randn(3, 48, 64)
    for kind, axes in [("rfft", [1, 2]), ("fft", [1, 2])]:
        std = carray.to_numpy(stacked_fft.fft_nd_stacked(x, axes, kind))
        a, layout = stacked_fft.fft_nd_stacked(x, axes, kind, raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        got = (np.asarray(stacked_fft.raw_to_standard(re, layout))
               + 1j * np.asarray(stacked_fft.raw_to_standard(im, layout)))
        npt.assert_allclose(got, std, atol=1e-11 * np.abs(std).max())


def test_engine_pre_weights_parity():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 2048)
    w = np.hanning(2048)
    ref = np.fft.fft(x * w, axis=1)
    got = carray.to_numpy(stacked_fft.fft_nd_stacked(
        x, [1], "fft", pre_weights={1: w}))
    npt.assert_allclose(got, ref, atol=1e-11 * np.abs(ref).max())
    # direct plan: weight folded into the dot rows
    x2 = rng.randn(2, 96)
    w2 = np.hanning(96)
    ref2 = np.fft.fft(x2 * w2, axis=1)
    got2 = carray.to_numpy(stacked_fft.fft_nd_stacked(
        x2, [1], "fft", pre_weights={1: w2}))
    npt.assert_allclose(got2, ref2, atol=1e-12 * np.abs(ref2).max())


def test_fused_cross_spectrum_parity():
    """The fused raw-layout cross spectrum equals the generic two-fft
    path for both true_phase settings (the phase factors cancel exactly
    in F1*conj(F2) for shared ascending coords)."""
    from xrft_tpu.config import config as _cfg
    from xrft_tpu.ops import carray

    rng = np.random.RandomState(7)
    B, NY, NX = 2, 64, 96
    coords = {"y": np.arange(NY) * 0.5, "x": np.arange(NX) * 0.25}
    a = LabeledArray(rng.randn(B, NY, NX), dims=("t", "y", "x"),
                     coords=coords)
    b = LabeledArray(rng.randn(B, NY, NX), dims=("t", "y", "x"),
                     coords=coords)
    for tp in (True, False):
        for kw in ({}, dict(window="hann", detrend="linear"),
                   dict(shift=False)):
            got = xrft_tpu.cross_spectrum(a, b, dim=["y", "x"],
                                          true_phase=tp, **kw)
            old = _cfg.stacked_fft
            _cfg.stacked_fft = "never"  # forces the generic two-fft path
            try:
                ref = xrft_tpu.cross_spectrum(a, b, dim=["y", "x"],
                                              true_phase=tp, **kw)
            finally:
                _cfg.stacked_fft = old
            g = carray.to_numpy(got.data)
            r = carray.to_numpy(ref.data)
            scale = np.abs(r).max()
            npt.assert_allclose(g / scale, r / scale, atol=2e-6)
            assert got.dims == ref.dims


def test_fused_cross_decreasing_coords_excluded():
    """Decreasing coords under true_phase conjugate both transforms and
    flip Im(C)'s sign — the fused route must decline and the generic
    path keep reference semantics."""
    from xrft_tpu.ops import psd_fused

    rng = np.random.RandomState(8)
    NX = 32
    coords = {"x": (np.arange(NX) * 1.0)[::-1]}
    a = LabeledArray(rng.randn(4, NX), dims=("t", "x"), coords=coords)
    b = LabeledArray(rng.randn(4, NX), dims=("t", "x"), coords=coords)
    assert not psd_fused.fused_cross_applicable(
        a, b, ["x"], "x", True, {}, True)
    # and the public function still works (generic path)
    out = xrft_tpu.cross_spectrum(a, b, dim=["x"], true_phase=True)
    assert "freq_x" in out.dims


def test_fused_cross_window_true_warns_once():
    """window=True on the fused cross path emits exactly ONE FutureWarning
    per call (the shared front half runs once per input; reference shim
    warns once, /root/reference/xrft/xrft.py:42-47)."""
    import warnings

    rng = np.random.RandomState(9)
    NY, NX = 32, 48
    coords = {"y": np.arange(NY) * 0.5, "x": np.arange(NX) * 0.25}
    a = LabeledArray(rng.randn(NY, NX), dims=("y", "x"), coords=coords)
    b = LabeledArray(rng.randn(NY, NX), dims=("y", "x"), coords=coords)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = xrft_tpu.cross_spectrum(a, b, dim=["y", "x"], window=True,
                                      true_phase=False, engine="matmul")
    n_future = sum(1 for w in rec if issubclass(w.category, FutureWarning))
    assert n_future == 1
    ref = xrft_tpu.cross_spectrum(a, b, dim=["y", "x"], window="hann",
                                  true_phase=False, engine="matmul")
    npt.assert_allclose(carray.to_numpy(got.data),
                        carray.to_numpy(ref.data), rtol=1e-10)


# ---------------------------------------------------------------------------
# USER-requested one-sided estimators (real_dim=...) on the fused route
# ---------------------------------------------------------------------------

def _check_one_sided(da, dims, real_dim, rtol=1e-10, **kw):
    """engine='xla' rides the generic fft()+abs2+doubling tail; 'matmul'
    must take the fused one-sided route and agree exactly (reference
    semantics /root/reference/xrft/xrft.py:685-750, shift forced False
    for real transforms at :400-404)."""
    ref = xrft_tpu.power_spectrum(da, dim=dims, real_dim=real_dim,
                                  engine="xla", **kw)
    got = xrft_tpu.power_spectrum(da, dim=dims, real_dim=real_dim,
                                  engine="matmul", **kw)
    assert got.dims == ref.dims
    for c in ref.coords:
        npt.assert_allclose(got.coords[c].values, ref.coords[c].values,
                            atol=1e-12)
    scale = float(np.abs(np.asarray(ref.values)).max())
    npt.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                        atol=rtol * scale)
    return got


@pytest.mark.parametrize("window", [None, "hann"])
@pytest.mark.parametrize("detrend", [None, "linear"])
@pytest.mark.parametrize("scaling", ["density", "spectrum",
                                     "false_density"])
def test_one_sided_psd_parity_grid(window, detrend, scaling):
    da = LabeledArray(
        _field((3, 48, 64)), dims=("t", "y", "x"),
        coords={"y": np.arange(48) * 0.5, "x": np.arange(64) * 0.25},
    )
    got = _check_one_sided(da, ["y", "x"], "x", window=window,
                           detrend=detrend, scaling=scaling)
    assert got.sizes["freq_x"] == 64 // 2 + 1


@pytest.mark.parametrize("nx", [31, 32])
def test_one_sided_psd_nyquist_parity(nx):
    # doubling spares DC always, Nyquist only for even N
    da = LabeledArray(
        _field((4, 16, nx)), dims=("t", "y", "x"),
        coords={"y": np.arange(16) * 1.0, "x": np.arange(nx) * 0.5},
    )
    _check_one_sided(da, ["y", "x"], "x")


def test_one_sided_psd_real_dim_not_last():
    # dim order lists the real dim first; fused route reorders half-last
    # and restores the caller's output order
    da = LabeledArray(
        _field((4, 32, 24)), dims=("t", "y", "x"),
        coords={"y": np.arange(32) * 1.0, "x": np.arange(24) * 2.0},
    )
    _check_one_sided(da, ["x", "y"], "x", window="hann", detrend="linear")


def test_one_sided_psd_1d_and_window_correction():
    da = LabeledArray(
        _field((8, 64)), dims=("t", "x"),
        coords={"x": np.arange(64) * 0.25},
    )
    _check_one_sided(da, ["x"], "x", window="hann",
                     window_correction=True)


def test_one_sided_psd_segmented():
    # chunks_to_segments + real_dim: stacking happens up front, the
    # fused one-sided route then sees plain batch dims; Nyquist parity
    # follows the SEGMENT length (documented divergence, spectra.py)
    da = LabeledArray(
        _field((2, 64, 64)), dims=("t", "y", "x"),
        coords={"y": np.arange(64) * 0.5, "x": np.arange(64) * 0.5},
    ).chunk({"y": 32, "x": 32})
    ref = xrft_tpu.power_spectrum(da, dim=["y", "x"], real_dim="x",
                                  engine="xla", chunks_to_segments=True,
                                  window="hann")
    got = xrft_tpu.power_spectrum(da, dim=["y", "x"], real_dim="x",
                                  engine="matmul", chunks_to_segments=True,
                                  window="hann")
    assert got.dims == ref.dims == ("t", "y_segment", "freq_y",
                                    "x_segment", "freq_x")
    scale = float(np.abs(np.asarray(ref.values)).max())
    npt.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                        atol=1e-10 * scale)


@pytest.mark.parametrize("true_phase", [False, True])
@pytest.mark.parametrize("scaling", ["density", "spectrum"])
def test_one_sided_cross_parity(true_phase, scaling):
    rng = np.random.RandomState(3)
    NY, NX = 32, 48
    coords = {"y": np.arange(NY) * 0.5, "x": np.arange(NX) * 0.25}
    a = LabeledArray(rng.randn(4, NY, NX), dims=("t", "y", "x"),
                     coords=coords)
    b = LabeledArray(rng.randn(4, NY, NX), dims=("t", "y", "x"),
                     coords=coords)
    ref = xrft_tpu.cross_spectrum(a, b, dim=["y", "x"], real_dim="x",
                                  engine="xla", true_phase=true_phase,
                                  scaling=scaling, window="hann")
    got = xrft_tpu.cross_spectrum(a, b, dim=["y", "x"], real_dim="x",
                                  engine="matmul", true_phase=true_phase,
                                  scaling=scaling, window="hann")
    assert got.dims == ref.dims
    rv = carray.to_numpy(ref.data)
    gv = carray.to_numpy(got.data)
    scale = float(np.abs(rv).max())
    npt.assert_allclose(gv, rv, atol=1e-10 * scale)


@pytest.mark.parametrize("dec_dim", ["y", "x"])
def test_one_sided_decreasing_coords(dec_dim):
    # decreasing coordinates (reference flip at
    # /root/reference/xrft/xrft.py:435-442) through the one-sided route
    rng = np.random.RandomState(5)
    NY, NX = 32, 48
    coords = {"y": np.arange(NY) * 0.5, "x": np.arange(NX) * 0.25}
    coords[dec_dim] = coords[dec_dim][::-1].copy()
    da = LabeledArray(rng.randn(4, NY, NX), dims=("t", "y", "x"),
                      coords=coords)
    _check_one_sided(da, ["y", "x"], "x", window="hann")


def test_direct_prune_knob_parity():
    """config.direct_prune_max gates the single-dot prune plan; 0 keeps
    the factorized plans — both must agree with the generic path (keeps
    the multi-level prune branch covered now that the default takes the
    direct plan for sizes up to 1024)."""
    from xrft_tpu.config import config as _cfg

    da = LabeledArray(
        _field((3, 32, 256)), dims=("t", "y", "x"),
        coords={"y": np.arange(32) * 0.5, "x": np.arange(256) * 0.25},
    )
    got_direct = _check_one_sided(da, ["y", "x"], "x", window="hann")
    old = _cfg.direct_prune_max
    _cfg.direct_prune_max = 0
    try:
        got_fact = _check_one_sided(da, ["y", "x"], "x", window="hann")
    finally:
        _cfg.direct_prune_max = old
    npt.assert_allclose(np.asarray(got_direct.values),
                        np.asarray(got_fact.values), rtol=1e-10)


def test_fused_psd_zero_length_batch_dim():
    """A zero-length batch dim must trace cleanly through the fused
    route (regression: the sublane-pad sort key divided by the size)."""
    da = LabeledArray(
        np.zeros((0, 16, 32)), dims=("t", "y", "x"),
        coords={"y": np.arange(16) * 1.0, "x": np.arange(32) * 1.0},
    )
    ps2 = xrft_tpu.power_spectrum(da, dim=["y", "x"], engine="matmul")
    assert ps2.shape == (0, 16, 32)
    ps1 = xrft_tpu.power_spectrum(da, dim=["y", "x"], real_dim="x",
                                  engine="matmul")
    assert ps1.shape == (0, 16, 17)
