# %% [markdown]
# # Parallelized Bartlett's method (chunks -> segments)
#
# Narrative walkthrough mirroring the reference's chunk notebook
# (`/root/reference/doc/chunk_example.ipynb`): declaring chunk lengths and
# transforming with `chunks_to_segments=True` reshapes each chunk into a
# `<dim>_segment` dimension — the periodogram of each segment computes
# independently and averaging over segments gives Bartlett's estimate.
#
# Where the reference inherits this from dask chunking, here `.chunk()`
# declares logical segment lengths as metadata and the reshape happens
# inside the jit-compiled program; segment dims can additionally be
# sharded across devices as pure batch parallelism.  Executed by CI
# (tests/test_walkthroughs.py).

# %%
import numpy as np
import numpy.testing as npt

import xrft_tpu
from xrft_tpu import LabeledArray


def main():
    rng = np.random.RandomState(0)
    n = int(2**8)
    da = LabeledArray(rng.rand(n, n // 2, n // 2).astype(np.float32),
                      dims=("time", "y", "x"))

    # %% [markdown]
    # ## One dimension
    #
    # Four time segments of length n/4; parity with an explicit reshape +
    # per-segment FFT.

    # %%
    daft = xrft_tpu.dft(da.chunk({"time": n // 4}), dim=["time"],
                        shift=False, chunks_to_segments=True,
                        true_phase=False, true_amplitude=False)
    assert daft.dims == ("time_segment", "freq_time", "y", "x")

    data_rs = np.asarray(da.values).reshape(4, n // 4, n // 2, n // 2)
    ref = np.fft.fftn(data_rs, axes=[1])
    npt.assert_allclose(np.asarray(daft.values), ref, atol=1e-3)

    # %% [markdown]
    # ## Bartlett's power spectral estimate
    #
    # The segment-wise PSD, averaged over segments (and here the spatial
    # dims), is the variance-reduced estimate.

    # %%
    ps = xrft_tpu.power_spectrum(da.chunk({"time": n // 4}), dim=["time"],
                                 chunks_to_segments=True, shift=False)
    assert "time_segment" in ps.dims
    bartlett = ps.mean(dim=["time_segment", "y", "x"])
    assert bartlett.dims == ("freq_time",)
    # white noise: flat spectrum away from the DC bin (uniform [0,1) data
    # has a large mean)
    v = np.asarray(bartlett.values)
    body = v[1:]
    assert body.std() / body.mean() < 0.5

    # %% [markdown]
    # ## Two dimensions
    #
    # Chunking two spatial dims yields a segment dim per axis.

    # %%
    daft2 = xrft_tpu.dft(da.chunk({"y": 32, "x": 32}), dim=["y", "x"],
                         shift=False, chunks_to_segments=True,
                         true_phase=False, true_amplitude=False)
    assert daft2.dims == ("time", "y_segment", "freq_y", "x_segment",
                          "freq_x")
    data_rs2 = np.asarray(da.values).reshape(n, 4, 32, 4, 32)
    ref2 = np.fft.fftn(data_rs2, axes=[2, 4])
    npt.assert_allclose(np.asarray(daft2.values), ref2, atol=1e-3)

    # %% [markdown]
    # The full estimator stack composes with segmenting: windowed,
    # detrended 2-D PSD per segment (the notebook's final example).

    # %%
    ps2 = xrft_tpu.power_spectrum(
        da.chunk({"y": 64, "x": 64}), dim=["y", "x"],
        chunks_to_segments=True, window=True, detrend="linear")
    assert ps2.dims == ("time", "y_segment", "freq_y", "x_segment",
                        "freq_x")

    # %% [markdown]
    # ## Overlapping segments and coherence (beyond the reference)
    #
    # dask chunks cannot overlap, so the reference stops at
    # non-overlapping (Bartlett) segments.  Here segments are static
    # strided windows: `segment_overlap` is scipy.signal.welch's
    # `noverlap`, and the Welch-averaged magnitude-squared `coherence`
    # estimator comes with it.

    # %%
    import scipy.signal as sps

    fs = 8.0  # time coord spacing 1/8
    tt = np.arange(n) / fs
    t1d = LabeledArray(
        np.asarray(da.values)[:, 0, 0], dims=["time"],
        coords={"time": tt},
    ).chunk({"time": 32})
    ps_ov = xrft_tpu.power_spectrum(
        t1d, dim="time", real_dim="time", window="hann",
        chunks_to_segments=True, segment_overlap=16,
        window_correction=True,
    ).mean("time_segment")
    f_ref, p_ref = sps.welch(np.asarray(t1d.values), fs=fs, window="hann",
                             nperseg=32, noverlap=16, detrend=False)
    npt.assert_allclose(np.asarray(ps_ov["freq_time"].values), f_ref)
    npt.assert_allclose(np.asarray(ps_ov.values), p_ref, rtol=1e-4,
                        atol=1e-6 * p_ref.max())

    # %%
    rng2 = np.random.RandomState(0)
    shared = np.sin(2 * np.pi * 2.0 * tt)
    xa = LabeledArray(shared + 0.5 * rng2.randn(n), dims=["time"],
                      coords={"time": tt}).chunk({"time": 32})
    ya = LabeledArray(0.5 * shared + 0.5 * rng2.randn(n), dims=["time"],
                      coords={"time": tt}).chunk({"time": 32})
    coh = xrft_tpu.coherence(xa, ya, dim="time", real_dim="time",
                             chunks_to_segments=True, segment_overlap=16)
    fc, c_ref = sps.coherence(np.asarray(xa.values), np.asarray(ya.values),
                              fs=fs, window="hann", nperseg=32,
                              noverlap=16, detrend=False)
    npt.assert_allclose(np.asarray(coh.values), c_ref, rtol=1e-4,
                        atol=1e-6)
    # the shared 2 Hz line is coherent; the rest is noise
    v = np.asarray(coh.values)
    assert v[np.argmin(np.abs(fc - 2.0))] > 0.7

    # %% [markdown]
    # ## The scipy namesakes (round 4)
    #
    # `welch`, `csd`, and `spectrogram` wrap the segment machinery with
    # scipy.signal's exact defaults — one call replaces the
    # chunk/estimate/mean assembly above for users porting scipy code.

    # %%
    w1 = xrft_tpu.welch(xa, dim="time", seglen=32)  # 50% overlap default
    f_w, p_w = sps.welch(np.asarray(xa.values), fs=fs, window="hann",
                         nperseg=32, noverlap=16, detrend="constant")
    npt.assert_allclose(np.asarray(w1.values), p_w, rtol=1e-4,
                        atol=1e-6 * p_w.max())

    c1 = xrft_tpu.csd(xa, ya, dim="time", seglen=32)
    f_c, p_c = sps.csd(np.asarray(xa.values), np.asarray(ya.values),
                       fs=fs, window="hann", nperseg=32, noverlap=16,
                       detrend="constant")
    npt.assert_allclose(np.asarray(c1.values), p_c, rtol=1e-4,
                        atol=1e-6 * np.abs(p_c).max())

    sg = xrft_tpu.spectrogram(xa, dim="time", seglen=32)
    f_s, t_s, p_s = sps.spectrogram(np.asarray(xa.values), fs=fs,
                                    window="hann", nperseg=32,
                                    detrend="constant", mode="psd")
    npt.assert_allclose(np.asarray(sg["time_segment"].values), t_s)
    npt.assert_allclose(np.asarray(sg.values).T, p_s, rtol=1e-4,
                        atol=1e-6 * p_s.max())

    # %% [markdown]
    # The family is completed by the single-segment `periodogram` and
    # the analytic-signal pair `hilbert`/`envelope` (all scipy
    # namesakes; the mask and transform pair stage into one XLA
    # program).

    # %%
    pg = xrft_tpu.periodogram(xa, dim="time")
    f_p, p_p = sps.periodogram(np.asarray(xa.values), fs=fs)
    npt.assert_allclose(np.asarray(pg.values), p_p, rtol=1e-4,
                        atol=1e-6 * p_p.max())

    env = xrft_tpu.envelope(xa, dim="time")
    env_ref = np.abs(sps.hilbert(np.asarray(xa.values, np.float64)))
    npt.assert_allclose(np.asarray(env.values), env_ref, rtol=1e-4,
                        atol=1e-6 * env_ref.max())

    # %% [markdown]
    # Rate changes ride the polyphase family (`firwin`/`upfirdn`/
    # `resample_poly`/`decimate`, scipy namesakes): the FIR taps are
    # host-static design, the zero-stuff/filter/downsample is one XLA
    # program, and the time coordinate is rebuilt on the input's base.

    # %%
    half = xrft_tpu.decimate(xa, 2, dim="time")
    half_ref = sps.decimate(np.asarray(xa.values, np.float64), 2,
                            ftype="fir")
    npt.assert_allclose(np.asarray(half.values), half_ref, rtol=1e-4,
                        atol=1e-6 * np.abs(half_ref).max())
    npt.assert_allclose(np.asarray(half.coords["time"].values),
                        np.asarray(xa.coords["time"].values)[::2])

    # %% [markdown]
    # Inverse transforms segment too (each freq chunk is an independent
    # inverse transform) — a capability pinned by
    # tests/test_transform.py::test_ifft_chunks_to_segments.
    return True


if __name__ == "__main__":
    main()
    print("ok")
