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
    # Inverse transforms segment too (each freq chunk is an independent
    # inverse transform) — a capability pinned by
    # tests/test_transform.py::test_ifft_chunks_to_segments.
    return True


if __name__ == "__main__":
    main()
    print("ok")
