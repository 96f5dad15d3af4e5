"""Prototype: stacked-complex single-dot four-step rfft + y-fft (round 2).

Compares HLO cost (bytes accessed / optimal_seconds) and on-chip time of
the stacked formulation against the current pair engine.  Dev tool.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from xrft_tpu.ops import carray, matmul_fft
from xrft_tpu.ops.carray import ComplexPair
from xrft_tpu.ops.matmul_fft import _dft_matrix_np, _twiddle_np, _precision

B, N = 8, 4096
rng = np.random.RandomState(0)
data = rng.randn(B, N, N).astype(np.float32)
x = jnp.asarray(data)


def stacked_w(wc: np.ndarray, real_in: bool, rdt=np.float32) -> jnp.ndarray:
    """complex (j, k) DFT matrix -> stacked real weight.

    real_in:  (j, 2, k)   out[c'] = x @ (Re W, Im W)
    complex:  (2, j, 2, k) with [ci, j, co, k]:
              out_re = re@Re - im@Im ; out_im = re@Im + im@Re
    """
    wr, wi = wc.real.astype(rdt), wc.imag.astype(rdt)
    if real_in:
        return jnp.asarray(np.stack([wr, wi], axis=1))  # (j, 2, k)
    w = np.empty((2,) + wc.shape[:1] + (2,) + wc.shape[1:], rdt)
    w[0, :, 0, :] = wr
    w[1, :, 0, :] = -wi
    w[0, :, 1, :] = wi
    w[1, :, 1, :] = wr
    return jnp.asarray(w)


def twiddle_mul(a, tw_c, m_axis, prec_dtype=np.float32):
    """a: (..., m, ..., c, k) with c at -2, k at -1; tw: complex (k, m)."""
    nd = a.ndim
    shape = [1] * nd
    shape[m_axis] = tw_c.shape[1]
    shape[-1] = tw_c.shape[0]
    twr = jnp.asarray(tw_c.real.astype(prec_dtype).T.reshape(shape))
    twi = jnp.asarray(tw_c.imag.astype(prec_dtype).T.reshape(shape))
    re = lax.index_in_dim(a, 0, nd - 2, keepdims=False)
    im = lax.index_in_dim(a, 1, nd - 2, keepdims=False)
    # after dropping c, m_axis unchanged (m_axis < nd-2), k at -1
    sh2 = shape[:nd - 2] + shape[nd - 1:]
    twr = twr.reshape(sh2)
    twi = twi.reshape(sh2)
    out_re = re * twr - im * twi
    out_im = re * twi + im * twr
    return jnp.stack([out_re, out_im], axis=nd - 2)


def rfft_stacked(v, n1=64):
    """v real (..., n); returns stacked (..., 2, n//2+1)-ish laid out as
    (..., K, k1) pre-flatten; full epilogue flatten included."""
    n = v.shape[-1]
    n2 = n // n1
    prec = _precision()
    a = v.reshape(v.shape[:-1] + (n1, n2))          # (..., j1, m)
    w1 = stacked_w(_dft_matrix_np(n1, -1), real_in=True)   # (j1, 2, k1)
    # contract j1 (axis -2) -> out (..., m, 2, k1)
    a = lax.dot_general(a, w1, (((a.ndim - 2,), (0,)), ((), ())),
                        precision=prec)
    a = twiddle_mul(a, _twiddle_np(n1, n2, -1), a.ndim - 3)  # (..., m, 2, k1)
    kcols = n2 // 2 + 1
    w2 = stacked_w(_dft_matrix_np(n2, -1)[:, :kcols], real_in=False)
    # contract (m, c) = axes (-3, -2) -> out (..., k1, 2, K)
    a = lax.dot_general(a, w2, (((a.ndim - 3, a.ndim - 2), (1, 0)), ((), ())),
                        precision=prec)
    # epilogue: (..., k1, 2, K) -> (..., 2, K, k1) -> (..., 2, K*k1) -> slice
    perm = tuple(range(a.ndim - 3)) + (a.ndim - 2, a.ndim - 1, a.ndim - 3)
    a = jnp.transpose(a, perm)
    a = a.reshape(a.shape[:-2] + (kcols * n1,))
    return a[..., : n // 2 + 1]


def ffty_stacked(s, n1=64):
    """s stacked (..., 2, ny, mx) complex along axis -2=c? No: layout
    (..., c, y, x): transform along y (axis -2), c at axis -3."""
    nd = s.ndim
    ny = s.shape[-2]
    n2 = ny // n1
    prec = _precision()
    a = s.reshape(s.shape[:-2] + (n1, n2, s.shape[-1]))  # (..., c, j1, m, x)
    w1 = stacked_w(_dft_matrix_np(n1, -1), real_in=False)  # (ci, j1, c, k1)
    # contract (c, j1) = axes (-4, -3) -> out (..., m, x, 2, k1)
    a = lax.dot_general(a, w1, (((nd - 3, nd - 2), (0, 1)), ((), ())),
                        precision=prec)
    a = twiddle_mul(a, _twiddle_np(n1, n2, -1), a.ndim - 4)  # m at -4
    w2 = stacked_w(_dft_matrix_np(n2, -1), real_in=False)   # (ci, m, c, k2)
    # contract (m, c) = axes (-4, -2) -> out (..., x, k1, 2, k2)
    a = lax.dot_general(a, w2, (((a.ndim - 4, a.ndim - 2), (1, 0)), ((), ())),
                        precision=prec)
    # epilogue -> (..., 2, k2, k1, x) -> (..., 2, ny, x)
    perm = tuple(range(a.ndim - 4)) + (a.ndim - 2, a.ndim - 1, a.ndim - 3,
                                       a.ndim - 4)
    a = jnp.transpose(a, perm)
    return a.reshape(a.shape[:-3] + (n1 * n2, a.shape[-1]))


def psd_stacked(v):
    """windowless PSD core: rfft_x then fft_y then |.|^2, all stacked."""
    s = rfft_stacked(v)               # (..., 2, 2049) with y at -3
    # rearrange to (..., 2, y, kx): currently (B, y, 2, kx)
    s = jnp.moveaxis(s, -2, -3)       # (B, 2, y, kx)
    f = ffty_stacked(s)               # (B, 2, y, kx)
    return f[..., 0, :, :] ** 2 + f[..., 1, :, :] ** 2


def report(name, f, *args):
    c = jax.jit(f).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"{name:28s} bytes {ca.get('bytes accessed', 0)/1e9:6.2f} GB  "
          f"flops {ca.get('flops', 0)/1e9:7.1f} G  "
          f"optimal {ca.get('optimal_seconds', 0)*1e3:6.1f} ms", flush=True)
    return c


def timeit(fn, *args, iters=5):
    out = fn(*args)
    leaves = [v for v in jax.tree_util.tree_leaves(out) if hasattr(v, "dtype")]
    float(jnp.sum(leaves[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [v for v in jax.tree_util.tree_leaves(out)
                  if hasattr(v, "dtype")]
        float(jnp.sum(leaves[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


if __name__ == "__main__":
    sel = sys.argv[1:] or ["rfft", "ffty", "psd"]
    null = jax.jit(lambda v: jnp.sum(v[0, 0, :8]))
    t_null = timeit(null, x)
    print(f"null: {t_null:.2f} ms")

    if "rfft" in sel:
        report("rfft_stacked64", rfft_stacked, x)
        t = timeit(jax.jit(rfft_stacked), x)
        print(f"  measured: {t - t_null:.2f} ms")
        got = jax.jit(rfft_stacked)(x)
        g = np.asarray(got)
        gc = g[..., 0:1, :] if False else None
        # correctness: stacked layout (B, y, 2, k)? rfft_stacked returns
        # (..., 2, K) on last two axes of a (B, N(y-rows), n) input ->
        # (B, N, 2, 2049)
        ref = np.fft.rfft(data[0, :4].astype(np.float64), axis=-1)
        gr = g[0, :4, 0, :] + 1j * g[0, :4, 1, :]
        print("  rel err:", np.abs(gr - ref).max() / np.abs(ref).max())

    if "ffty" in sel:
        M = N // 2 + 1
        sc = jnp.asarray(rng.randn(B, 2, N, M).astype(np.float32))
        report("ffty_stacked64", ffty_stacked, sc)
        t = timeit(jax.jit(ffty_stacked), sc)
        print(f"  measured: {t - t_null:.2f} ms")
        got = np.asarray(jax.jit(ffty_stacked)(sc))
        scn = np.asarray(sc)
        ref = np.fft.fft((scn[0, 0, :, :8] + 1j * scn[0, 1, :, :8])
                         .astype(np.complex128), axis=-2)
        gr = got[0, 0, :, :8] + 1j * got[0, 1, :, :8]
        print("  rel err:", np.abs(gr - ref).max() / np.abs(ref).max())

    if "psd" in sel:
        report("psd_stacked", psd_stacked, x)
        t = timeit(jax.jit(psd_stacked), x)
        print(f"  measured: {t - t_null:.2f} ms")
        ref = np.abs(np.fft.fft(np.fft.rfft(
            data[0].astype(np.float64), axis=-1), axis=-2)) ** 2
        got = np.asarray(jax.jit(psd_stacked)(x))[0]
        print("  rel err:", np.abs(got - ref).max() / ref.max())


def rfft_stacked_tw(v, n1=64):
    """rfft with the twiddle folded into a k1-batched second dot."""
    n = v.shape[-1]
    n2 = n // n1
    prec = _precision()
    a = v.reshape(v.shape[:-1] + (n1, n2))          # (..., j1, m)
    w1 = stacked_w(_dft_matrix_np(n1, -1), real_in=True)   # (j1, 2, k1)
    a = lax.dot_general(a, w1, (((a.ndim - 2,), (0,)), ((), ())),
                        precision=prec)              # (..., m, 2, k1)
    kcols = n2 // 2 + 1
    # batched weight: for each k1, (T[k1,:,None,None] * W2)[m, 2, K] stacked
    tw = _twiddle_np(n1, n2, -1)                     # (k1, m)
    w2c = _dft_matrix_np(n2, -1)[:, :kcols]          # (m, K)
    wb = np.empty((n1, 2, n2, 2, kcols), np.float32)
    for k1 in range(n1):
        wc = tw[k1][:, None] * w2c                   # (m, K) complex
        wb[k1, 0, :, 0, :] = wc.real
        wb[k1, 1, :, 0, :] = -wc.imag
        wb[k1, 0, :, 1, :] = wc.imag
        wb[k1, 1, :, 1, :] = wc.real
    wbj = jnp.asarray(wb)                            # (k1, ci, m, c, K)
    # lhs (..., m, ci, k1): batch k1 (-1); contract (m=-3, ci=-2)
    out = lax.dot_general(
        a, wbj,
        (((a.ndim - 3, a.ndim - 2), (2, 1)), ((a.ndim - 1,), (0,))),
        precision=prec)                              # (k1, ..., 2, K)
    # epilogue: (k1, B, R, 2, K) -> (B, R, 2, K, k1) -> (..., 2, K*k1)
    nd = out.ndim
    perm = tuple(range(1, nd - 2)) + (nd - 2, nd - 1, 0)
    out = jnp.transpose(out, perm)
    out = out.reshape(out.shape[:-2] + (kcols * n1,))
    return out[..., : n // 2 + 1]


if "tw" in sys.argv:
    report("rfft_stacked_tw64", rfft_stacked_tw, x)
    t0 = timeit(jax.jit(rfft_stacked_tw), x)
    null2 = timeit(jax.jit(lambda v: jnp.sum(v[0, 0, :8])), x)
    print(f"  measured: {t0 - null2:.2f} ms")
    got = jax.jit(rfft_stacked_tw)(x)
    g = np.asarray(got)
    ref = np.fft.rfft(data[0, :4].astype(np.float64), axis=-1)
    gr = g[0, :4, 0, :] + 1j * g[0, :4, 1, :]
    print("  rel err:", np.abs(gr - ref).max() / np.abs(ref).max())


def _batched_tw_w(n1, n2, sign, kcols=None, roll=0, rdt=np.float32):
    """(k1, ci, m, co, K) weight: T[k1,m] * W_n2[m,K], stacked complex."""
    tw = _twiddle_np(n1, n2, sign)
    w2c = _dft_matrix_np(n2, sign)
    if roll:
        w2c = np.roll(w2c, roll, axis=1)
    if kcols is not None:
        w2c = w2c[:, :kcols]
    K = w2c.shape[1]
    wb = np.empty((n1, 2, n2, 2, K), rdt)
    wc = tw[:, :, None] * w2c[None, :, :]          # (k1, m, K)
    wb[:, 0, :, 0, :] = wc.real
    wb[:, 1, :, 0, :] = -wc.imag
    wb[:, 0, :, 1, :] = wc.imag
    wb[:, 1, :, 1, :] = wc.real
    return jnp.asarray(wb)


def psd_full(v, n1x=64, n1y=64):
    """detrend(linear)+hann window + rfft_x + fft_y(shift) + |.|^2 with a
    single deferred epilogue."""
    Bv, Ny, Nx = v.shape
    prec = _precision()
    # ---- detrend + window (elementwise + small reductions)
    i = jnp.arange(Nx, dtype=jnp.float32) - (Nx - 1) / 2
    jy = jnp.arange(Ny, dtype=jnp.float32) - (Ny - 1) / 2
    vm = v - v.mean(axis=(-2, -1), keepdims=True)
    sy = (vm * jy[:, None]).sum(axis=-2, keepdims=True) / (jy**2).sum()
    sx = (vm * i[None, :]).sum(axis=-1, keepdims=True) / (i**2).sum()
    vd = vm - jy[:, None] * sy - sx * i[None, :]
    import scipy.signal as sps
    w1d = sps.windows.hann(Nx, sym=False).astype(np.float32)
    w1dy = sps.windows.hann(Ny, sym=False).astype(np.float32)
    a = vd * (jnp.asarray(w1dy)[:, None] * jnp.asarray(w1d)[None, :])

    # ---- x: rfft, two dots, twiddle folded, pruned
    n2x = Nx // n1x
    a = a.reshape(Bv, Ny, n1x, n2x)                       # (B,Y,j1,m)
    w1 = stacked_w(_dft_matrix_np(n1x, -1), real_in=True)  # (j1,2,k1)
    a = lax.dot_general(a, w1, (((2,), (0,)), ((), ())), precision=prec)
    # (B,Y,m,2,k1)
    kcx = n2x // 2 + 1
    wbx = _batched_tw_w(n1x, n2x, -1, kcols=kcx)           # (k1,ci,m,co,K)
    a = lax.dot_general(a, wbx, (((2, 3), (2, 1)), ((4,), (0,))),
                        precision=prec)                    # (k1x,B,Y,2,Kx)

    # ---- y: fft, two dots, twiddle folded, fftshift rolled in
    n2y = Ny // n1y
    a = a.reshape(n1x, Bv, n1y, n2y, 2, kcx)               # (k1x,B,j1y,my,c,Kx)
    w1y = stacked_w(_dft_matrix_np(n1y, -1), real_in=False)  # (ci,j1y,co,k1y)
    a = lax.dot_general(a, w1y, (((2, 4), (1, 0)), ((), ())),
                        precision=prec)                    # (k1x,B,my,Kx,2,k1y)
    wby = _batched_tw_w(n1y, n2y, -1, roll=0)              # (k1y,ci,my,co,K2y)
    a = lax.dot_general(a, wby, (((2, 4), (2, 1)), ((5,), (0,))),
                        precision=prec)                    # (k1y,k1x,B,Kx,2,K2y)

    # ---- mag^2 + epilogue
    ps = a[..., 0, :] ** 2 + a[..., 1, :] ** 2             # (k1y,k1x,B,Kx,K2y)
    ps = jnp.transpose(ps, (2, 4, 0, 3, 1))                # (B,K2y,k1y,Kx,k1x)
    ps = ps.reshape(Bv, n2y * n1y, kcx * n1x)[..., : Nx // 2 + 1]
    return ps


if "full" in sys.argv:
    report("psd_full", psd_full, x)
    t0 = timeit(jax.jit(psd_full), x)
    null2 = timeit(jax.jit(lambda v: jnp.sum(v[0, 0, :8])), x)
    print(f"  measured: {t0 - null2:.2f} ms  (null {null2:.2f})")
    got = np.asarray(jax.jit(psd_full)(x))[0]
    # numpy oracle
    import scipy.signal as sps
    v = data[0].astype(np.float64)
    i = np.arange(N) - (N - 1) / 2
    vm = v - v.mean()
    syy = (vm * i[:, None]).sum(axis=0) / (i**2).sum()
    sxx = (vm * i[None, :]).sum(axis=1) / (i**2).sum()
    vd = vm - i[:, None] * syy[None, :] - sxx[:, None] * i[None, :]
    w = sps.windows.hann(N, sym=False)
    F = np.fft.fft(np.fft.rfft(vd * (w[:, None] * w[None, :]), axis=-1),
                   axis=-2)
    ref = np.abs(F) ** 2
    print("  rel err:", np.abs(got - ref).max() / ref.max())


if "parts" in sys.argv:
    import scipy.signal as sps
    w2d = jnp.asarray((sps.windows.hann(N, sym=False)[:, None]
                       * sps.windows.hann(N, sym=False)[None, :])
                      .astype(np.float32))

    def dw_only(v):
        i = jnp.arange(N, dtype=jnp.float32) - (N - 1) / 2
        jy = i
        vm = v - v.mean(axis=(-2, -1), keepdims=True)
        sy = (vm * jy[:, None]).sum(axis=-2, keepdims=True) / (jy**2).sum()
        sx = (vm * i[None, :]).sum(axis=-1, keepdims=True) / (i**2).sum()
        return (vm - jy[:, None] * sy - sx * i[None, :]) * w2d

    def xpart(v):
        prec = _precision()
        a = v.reshape(B, N, 64, 64)
        w1 = stacked_w(_dft_matrix_np(64, -1), real_in=True)
        a = lax.dot_general(a, w1, (((2,), (0,)), ((), ())), precision=prec)
        wbx = _batched_tw_w(64, 64, -1, kcols=33)
        return lax.dot_general(a, wbx, (((2, 3), (2, 1)), ((4,), (0,))),
                               precision=prec)

    def ypart(a):
        prec = _precision()
        a = a.reshape(64, B, 64, 64, 2, 33)
        w1y = stacked_w(_dft_matrix_np(64, -1), real_in=False)
        a = lax.dot_general(a, w1y, (((2, 4), (1, 0)), ((), ())),
                            precision=prec)
        wby = _batched_tw_w(64, 64, -1)
        return lax.dot_general(a, wby, (((2, 4), (2, 1)), ((5,), (0,))),
                               precision=prec)

    def epilogue(a):
        ps = a[..., 0, :] ** 2 + a[..., 1, :] ** 2
        ps = jnp.transpose(ps, (2, 4, 0, 3, 1))
        return ps.reshape(B, N, 33 * 64)[..., : N // 2 + 1]

    null2 = timeit(jax.jit(lambda v: jnp.sum(v[0, 0, :8])), x)
    print(f"null {null2:.2f}")
    for name, f, arg in [
        ("dw_only", dw_only, x),
        ("xpart", xpart, x),
    ]:
        report(name, f, arg)
        print(f"  measured: {timeit(jax.jit(f), arg) - null2:.2f} ms")
    ax = jax.jit(xpart)(x)
    for name, f, arg in [
        ("ypart", ypart, ax),
        ("epilogue", epilogue, jax.jit(ypart)(ax)),
    ]:
        report(name, f, arg)
        print(f"  measured: {timeit(jax.jit(f), arg) - null2:.2f} ms")


def _merged_tw_w(n1, n2, sign, kcols=None, roll=0, rdt=np.float32):
    """(k1, ci, m, 2*K) weight: T[k1,m]*W_n2[m,K], c-major-merged output."""
    tw = _twiddle_np(n1, n2, sign)
    w2c = _dft_matrix_np(n2, sign)
    if roll:
        w2c = np.roll(w2c, roll, axis=1)
    if kcols is not None:
        w2c = w2c[:, :kcols]
    K = w2c.shape[1]
    wc = tw[:, :, None] * w2c[None, :, :]          # (k1, m, K) complex
    wb = np.empty((n1, 2, n2, 2 * K), rdt)
    wb[:, 0, :, :K] = wc.real
    wb[:, 1, :, :K] = -wc.imag
    wb[:, 0, :, K:] = wc.imag
    wb[:, 1, :, K:] = wc.real
    return jnp.asarray(wb)


def psd_padfree(v, r0x=32, r0y=32):
    """Pad-free interleaved schedule: x1, y1, x2(batched W-lhs),
    y2(batched W-rhs merged), mag+epilogue."""
    Bv, Ny, Nx = v.shape
    mx, my = Nx // r0x, Ny // r0y
    prec = _precision()
    import scipy.signal as sps
    i = jnp.arange(Nx, dtype=jnp.float32) - (Nx - 1) / 2
    jy = jnp.arange(Ny, dtype=jnp.float32) - (Ny - 1) / 2
    vm = v - v.mean(axis=(-2, -1), keepdims=True)
    sy = (vm * jy[:, None]).sum(axis=-2, keepdims=True) / (jy**2).sum()
    sx = (vm * i[None, :]).sum(axis=-1, keepdims=True) / (i**2).sum()
    vd = vm - jy[:, None] * sy - sx * i[None, :]
    w1d = sps.windows.hann(Nx, sym=False).astype(np.float32)
    w1dy = sps.windows.hann(Ny, sym=False).astype(np.float32)
    a = vd * (jnp.asarray(w1dy)[:, None] * jnp.asarray(w1d)[None, :])

    # x1: W-lhs, contract j1x -> (2, k1x, B, Y, mx)
    a = a.reshape(Bv, Ny, r0x, mx)
    w1x = stacked_w(_dft_matrix_np(r0x, -1), real_in=True)   # (j,2,k)
    w1x = jnp.moveaxis(w1x, 0, -1)                            # (2,k,j)
    a = lax.dot_general(w1x, a, (((2,), (2,)), ((), ())), precision=prec)
    # y1: W-lhs complex, contract (c, j1y) -> (2, k1y, k1x, B, my, mx)
    a = a.reshape(2, r0x, Bv, r0y, my, mx)
    w1y = stacked_w(_dft_matrix_np(r0y, -1), real_in=False)  # (ci,j,2,k)
    a = lax.dot_general(w1y, a, (((0, 1), (0, 3)), ((), ())),
                        precision=prec)
    # x2: batched k1x, W-lhs, twiddle folded, pruned Kx=mx//2+1
    kcx = mx // 2 + 1
    wbx = _batched_tw_w(r0x, mx, -1, kcols=kcx)              # (k1,ci,m,2,K)
    # lhs wbx: batch k1x@0, contract (ci@1, m@2), free (2, K)
    # rhs a: batch k1x@2, contract (c@0, mx@5), free (k1y, B, my)
    a = lax.dot_general(wbx, a, (((1, 2), (0, 5)), ((0,), (2,))),
                        precision=prec)                       # (k1x,2,Kx,k1y,B,my)
    # y2: batched k1y, W-rhs, twiddle folded, merged (2*K2y)
    wby = _merged_tw_w(r0y, my, -1)                           # (k1y,ci,my,2K)
    # lhs a: batch k1y@3, contract (c@1, my@5), free (k1x, Kx, B)
    a = lax.dot_general(a, wby, (((1, 5), (1, 2)), ((3,), (0,))),
                        precision=prec)                       # (k1y,k1x,Kx,B,2K2y)
    # mag + epilogue
    K2y = my
    ps = a[..., :K2y] ** 2 + a[..., K2y:] ** 2                # (k1y,k1x,Kx,B,K2y)
    ps = jnp.transpose(ps, (3, 4, 0, 2, 1))                   # (B,K2y,k1y,Kx,k1x)
    ps = ps.reshape(Bv, Ny, kcx * r0x)[..., : Nx // 2 + 1]
    return ps


if "padfree" in sys.argv:
    for r0 in (32, 64):
        f = lambda v, r=r0: psd_padfree(v, r, r)
        report(f"psd_padfree r0={r0}", f, x)
        t0 = timeit(jax.jit(f), x)
        null2 = timeit(jax.jit(lambda v: jnp.sum(v[0, 0, :8])), x)
        print(f"  measured: {t0 - null2:.2f} ms  (null {null2:.2f})")
    got = np.asarray(jax.jit(lambda v: psd_padfree(v, 32, 32))(x))[0]
    import scipy.signal as sps
    v = data[0].astype(np.float64)
    i = np.arange(N) - (N - 1) / 2
    vm = v - v.mean()
    syy = (vm * i[:, None]).sum(axis=0) / (i**2).sum()
    sxx = (vm * i[None, :]).sum(axis=1) / (i**2).sum()
    vd = vm - i[:, None] * syy[None, :] - sxx[:, None] * i[None, :]
    w = sps.windows.hann(N, sym=False)
    F = np.fft.fft(np.fft.rfft(vd * (w[:, None] * w[None, :]), axis=-1),
                   axis=-2)
    ref = np.abs(F) ** 2
    print("  rel err:", np.abs(got - ref).max() / ref.max())
