"""On-chip timing of candidate rfft / axis-(-2) FFT formulations (round 2).

Development tool, not part of the suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xrft_tpu.ops import carray, matmul_fft
from xrft_tpu.ops.carray import ComplexPair
from xrft_tpu.ops.matmul_fft import (
    _dft_matrix_np, _twiddle_np, _tw_const, _wparts, _precision,
)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    leaves = [v for v in jax.tree_util.tree_leaves(out) if hasattr(v, "dtype")]
    float(jnp.sum(leaves[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [v for v in jax.tree_util.tree_leaves(out) if hasattr(v, "dtype")]
        float(jnp.sum(leaves[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


B, N = 8, 4096
rng = np.random.RandomState(0)
data = rng.randn(B, N, N).astype(np.float32)
x = jnp.asarray(data)

null = jax.jit(lambda v: jnp.sum(v[0, 0, :8]))
t_null = timeit(null, x)
print(f"null: {t_null:.2f} ms")


SEL = sys.argv[1:] or None


def run(name, fn, *args):
    if SEL and not any(name.startswith(s) for s in SEL):
        return None
    t = timeit(jax.jit(fn), *args)
    print(f"{name:42s} {t:8.2f} ms   (-null {t - t_null:7.2f})", flush=True)
    return t - t_null


# ---- A: current packed rfft
run("A  packed rfft (current)",
    lambda v: matmul_fft.matmul_fft_nd(v, [-1], "rfft"), x)

# ---- B: full real-input fft, slice half
def rfft_full_slice(v):
    out = matmul_fft.fft_last(v, -1)
    return out[..., : N // 2 + 1]

run("B  full fft_last + slice", rfft_full_slice, x)


# ---- C: pruned four-step rfft: only compute needed tail columns
def rfft_pruned(v, n1=128):
    n = v.shape[-1]
    n2 = n // n1
    prec = _precision()
    rdt = np.float32
    w1r, w1i = _wparts(_dft_matrix_np(n1, -1), rdt)
    a = v.reshape(v.shape[:-1] + (n1, n2))
    # step 1: contract j1 (axis -2), real input -> 2 matmuls
    br = jnp.einsum("...jm,jk->...km", a, w1r, precision=prec)
    bi = jnp.einsum("...jm,jk->...km", a, w1i, precision=prec)
    tw = _tw_const(_twiddle_np(n1, n2, -1), rdt)
    b = ComplexPair(br, bi) * tw
    # step 3: tail DFT over m2 with only k2 = 0..n2/2 columns (outputs
    # k = k2*n1 + k1 cover 0..n/2 when k2 <= n2/2), fused output swap
    kcols = n2 // 2 + 1
    w2 = _dft_matrix_np(n2, -1)[:, :kcols]
    w2r, w2i = _wparts(w2, rdt)
    cr = jnp.einsum("...km,mK->...Kk", b.re, w2r, precision=prec) \
        - jnp.einsum("...km,mK->...Kk", b.im, w2i, precision=prec)
    ci = jnp.einsum("...km,mK->...Kk", b.re, w2i, precision=prec) \
        + jnp.einsum("...km,mK->...Kk", b.im, w2r, precision=prec)
    out = ComplexPair(cr.reshape(cr.shape[:-2] + (kcols * n1,)),
                      ci.reshape(ci.shape[:-2] + (kcols * n1,)))
    return out[..., : n // 2 + 1]

run("C  pruned rfft n1=128", rfft_pruned, x)
run("C64 pruned rfft n1=64", lambda v: rfft_pruned(v, 64), x)
run("C256 pruned rfft n1=256", lambda v: rfft_pruned(v, 256), x)

# check C numerics
if not SEL or any(s.startswith("C") for s in SEL):
    got = jax.jit(rfft_pruned)(x)
    ref = np.fft.rfft(data[0, :4].astype(np.float64), axis=-1)
    gotn = carray.to_numpy(got)[0, :4]
    print("C rel err:", np.abs(gotn - ref).max() / np.abs(ref).max())


# ---- D: y-axis fft via moveaxis (current) vs direct axis -2
M = N // 2 + 1
xc = ComplexPair(jnp.asarray(rng.randn(B, N, M).astype(np.float32)),
                 jnp.asarray(rng.randn(B, N, M).astype(np.float32)))

run("D0 fft y (current moveaxis)",
    lambda v: matmul_fft.matmul_fft_nd(v, [-2], "fft"), xc)


def fft_axis_m2(v, n1=128):
    n = v.shape[-2]
    n2 = n // n1
    prec = _precision()
    rdt = np.float32
    w1r, w1i = _wparts(_dft_matrix_np(n1, -1), rdt)
    a = carray.reshape(v, v.shape[:-2] + (n1, n2, v.shape[-1]))
    # contract j1 (axis -3)
    def mm1(t, w):
        return jnp.einsum("...jnm,jk->...knm", t, w, precision=prec)
    b = ComplexPair(mm1(a.re, w1r) - mm1(a.im, w1i),
                    mm1(a.re, w1i) + mm1(a.im, w1r))
    twn = _twiddle_np(n1, n2, -1)
    tw = ComplexPair(jnp.asarray(twn.real.astype(rdt))[..., None],
                     jnp.asarray(twn.imag.astype(rdt))[..., None])
    b = b * tw
    w2r, w2i = _wparts(_dft_matrix_np(n2, -1), rdt)
    # contract m2 (axis -2), emit swapped (K, k1) layout for free flatten
    def mm2(t, w):
        return jnp.einsum("...knm,nK->...Kkm", t, w, precision=prec)
    c = ComplexPair(mm2(b.re, w2r) - mm2(b.im, w2i),
                    mm2(b.re, w2i) + mm2(b.im, w2r))
    return carray.reshape(c, v.shape[:-2] + (n, v.shape[-1]))

run("D1 fft y direct axis -2 n1=128", fft_axis_m2, xc)
run("D1b fft y direct axis -2 n1=64", lambda v: fft_axis_m2(v, 64), xc)

if not SEL or any(s.startswith("D1") for s in SEL):
    gotd = jax.jit(fft_axis_m2)(xc)
    refd = np.fft.fft(carray.to_numpy(xc).astype(np.complex128)[0, :, :8],
                      axis=-2)
    gd = carray.to_numpy(gotd)[0, :, :8]
    print("D rel err:", np.abs(gd - refd).max() / np.abs(refd).max())

# ---- P: precision sweep on the pruned rfft + y fft
from xrft_tpu.config import config as _cfg
if not SEL or any(s.startswith("P") for s in SEL):
    for prec_name in ("highest", "high", "default"):
        _cfg.matmul_precision = prec_name
        t1 = timeit(jax.jit(lambda v: rfft_pruned(v, 64)), x)
        t2 = timeit(jax.jit(lambda v: matmul_fft.matmul_fft_nd(v, [-2], "fft")), xc)
        got = jax.jit(lambda v: rfft_pruned(v, 64))(x)
        ref = np.fft.rfft(data[0, :4].astype(np.float64), axis=-1)
        err = np.abs(carray.to_numpy(got)[0, :4] - ref).max() / np.abs(ref).max()
        print(f"P {prec_name:8s} rfft64 {t1 - t_null:7.2f} ms  ffty {t2 - t_null:7.2f} ms  rfft rel err {err:.2e}", flush=True)
    _cfg.matmul_precision = "highest"
