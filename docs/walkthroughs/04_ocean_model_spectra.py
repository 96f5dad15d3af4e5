# %% [markdown]
# # Realistic example: ocean-model output spectra
#
# Narrative walkthrough mirroring the reference's MITgcm notebook
# (`/root/reference/doc/MITgcm_example.ipynb`) on synthetic model-like
# fields (the original reads a private MITgcm channel run; shapes and
# call signatures are kept).  Where the reference chunks over `time` and
# `Z` for dask parallelism, batch dims here vectorize inside one XLA
# program and can shard over a device mesh with zero collectives.
# Executed by CI (tests/test_walkthroughs.py).

# %%
import numpy as np
import numpy.testing as npt

import xrft_tpu
from xrft_tpu import LabeledArray


def _channel_like(rng, nt, nz, ny, nx, dx=5e3):
    """A synthetic 'channel flow' stack: red-spectrum eddies + mean shear,
    standing in for MITgcm UVEL/WVEL/PHIHYD."""
    ky = np.fft.fftfreq(ny, dx)[:, None]
    kx = np.fft.fftfreq(nx, dx)[None, :]
    K = np.sqrt(ky**2 + kx**2)
    K[0, 0] = K[0, 1]
    amp = K ** (-1.5)
    fields = []
    for _ in range(nt * nz):
        ph = np.exp(2j * np.pi * rng.rand(ny, nx))
        f = np.fft.ifftn(amp * ph).real
        fields.append(f / f.std())
    out = np.asarray(fields, np.float32).reshape(nt, nz, ny, nx)
    # add a linear 'mean shear' trend the detrend step must remove
    out += np.linspace(0, 1, ny)[None, None, :, None].astype(np.float32)
    return out


def main():
    rng = np.random.RandomState(42)
    nt, nz, ny, nx = 3, 2, 64, 64
    dx = 5e3
    coords = {
        "time": np.arange(nt) * 86400.0,
        "Zl": -np.arange(nz) * 10.0,
        "YC": np.arange(ny) * dx,
        "XC": np.arange(nx) * dx,
    }
    u = LabeledArray(_channel_like(rng, nt, nz, ny, nx), dims=("time", "Zl", "YC", "XC"), coords=coords)
    w = LabeledArray(_channel_like(rng, nt, nz, ny, nx), dims=("time", "Zl", "YC", "XC"), coords=coords)
    b = LabeledArray(_channel_like(rng, nt, nz, ny, nx), dims=("time", "Zl", "YC", "XC"), coords=coords)

    # %% [markdown]
    # ## Discrete Fourier transform of a 4-D stack
    #
    # The notebook: `xrft.dft(w.chunk({"time": 1, "Zl": 1}), dim=["XC"],
    # detrend="linear", window=True)` — batch dims (`time`, `Zl`) ride
    # along vectorized.

    # %%
    what = xrft_tpu.dft(w, dim=["XC"], detrend="linear", window=True,
                        true_phase=False, true_amplitude=False)
    assert what.dims == ("time", "Zl", "YC", "freq_XC")
    assert "spacing" in what.coords["freq_XC"].attrs

    # %% [markdown]
    # ## Surface eddy kinetic energy spectrum
    #
    # `power_spectrum(..., dim=["XC", "YC"], detrend="linear",
    # window=True, density=False)` — the legacy `density=False` spelling
    # is honored like the reference.

    # %%
    uhat2 = xrft_tpu.power_spectrum(
        u.isel(Zl=0), dim=["XC", "YC"], detrend="linear", window=True,
        density=False)
    assert uhat2.dims == ("time", "freq_YC", "freq_XC")
    assert np.all(np.isfinite(np.asarray(uhat2.values)))

    # %% [markdown]
    # ## Isotropic wavenumber spectrum
    #
    # Azimuthal aggregation over radial bins; the synthetic field's
    # spectral slope is recovered by the log-log fit.

    # %%
    uiso2 = xrft_tpu.isotropic_power_spectrum(
        u.isel(time=0, Zl=0), dim=["XC", "YC"], detrend="linear",
        window=True)
    assert uiso2.dims == ("freq_r",)
    kr = uiso2.coords["freq_r"].values
    vals = np.asarray(uiso2.values)
    sel = (kr > kr[2]) & (kr < kr[kr.size // 2])
    _, slope, _ = xrft_tpu.fit_loglog(kr[sel], vals[sel])
    assert -5.0 < slope < -1.0  # red spectrum recovered

    # %% [markdown]
    # ## Cross spectrum: w x b
    #
    # The notebook checks `cross_spectrum(w, b)` equals
    # `F(w) * conj(F(b))` (density=False raw mode).

    # %%
    whatbhat = xrft_tpu.cross_spectrum(
        w, b, dim=["XC", "YC"], detrend="linear", window=True,
        density=False, true_phase=False)
    # density=False ("false_density" raw mode) keeps the amplitude-true
    # transforms unscaled: F(w) * conj(F(b)) with true_amplitude=True
    what2 = xrft_tpu.fft(w, dim=["XC", "YC"], detrend="linear",
                         window=True, true_phase=False,
                         true_amplitude=True)
    bhat2 = xrft_tpu.fft(b, dim=["XC", "YC"], detrend="linear",
                         window=True, true_phase=False,
                         true_amplitude=True)
    ref = np.asarray(what2.values) * np.conj(np.asarray(bhat2.values))
    scale = np.abs(ref).max()
    npt.assert_allclose(np.asarray(whatbhat.values), ref,
                        atol=1e-6 * scale)

    # %% [markdown]
    # ## 3-D shell spectra (beyond the reference)
    #
    # The reference's isotropic estimators are 2-D-only; here a 3-D
    # volume reduces to a spherical-shell spectrum directly (the
    # standard turbulence E(k) reduction), conserving the total.

    # %%
    import warnings

    vol = LabeledArray(
        rng.randn(12, 24, 24, 24).astype(np.float32),
        dims=("time", "Z", "YC", "XC"),
        coords={"Z": np.arange(24) * 1.0, "YC": np.arange(24) * 1.0,
                "XC": np.arange(24) * 1.0})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ek = xrft_tpu.isotropic_power_spectrum(
            vol, dim=["Z", "YC", "XC"], truncate=False)
    ps3 = xrft_tpu.power_spectrum(vol, dim=["Z", "YC", "XC"])
    assert ek.dims == ("time", "freq_r")
    npt.assert_allclose(np.asarray(ek.values).sum(axis=-1),
                        np.asarray(ps3.values).sum(axis=(-3, -2, -1)),
                        rtol=1e-5)

    # %% [markdown]
    # ## Scaling out: the same pipeline over a device mesh
    #
    # What dask chunking does for the reference, `jax.sharding` does
    # here — including sharded *transform* dims (which dask cannot do):
    # see examples/sharded_fft_example.py and
    # xrft_tpu.parallel.sharded_power_spectrum.
    return True


if __name__ == "__main__":
    main()
    print("ok")
