"""A/B microbench: dec1_refine_conv0's fused-up conv emitter variants.

Round-4 trace: at batch 256, the lhs_dilation=2 6x6 conv
(256,128,128,128)->(256,256,256,64) runs at ~60% of its FLOP floor under
XLA's EmitOutputBatchInLanes emitter, while dec0's same-FLOP conv hits 91%
under EmitOutputBatchInSublanes. This script times mathematically-equivalent
formulations on the real chip to find one XLA lowers with the good emitter.

Run from /root/repo: python scripts/ab_dec1.py [batch]
"""

import os
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = M = 128
CIN = 128
CO = 64
DT = jnp.bfloat16
ITERS = 30


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)  # compile
    s = float(jnp.asarray(out).reshape(-1)[0])  # sync
    t0 = time.perf_counter()
    out = f(*args)
    s = float(jnp.asarray(out).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:36s} {dt:8.3f} ms/iter  (sink {s:.3e})", flush=True)
    return dt


def chain(body, x, k):
    """Run ITERS dependent applications inside one jit; return scalar sink."""
    def step(i, carry):
        y = body(carry, k)
        # fold output into a perturbation of the input's first pixel
        delta = (jnp.mod(jnp.sum(y.astype(jnp.float32)), 1.0)).astype(x.dtype)
        return carry.at[0, 0, 0, 0].add(delta * 1e-6)

    xf = lax.fori_loop(0, ITERS, step, x)
    return jnp.sum(xf.astype(jnp.float32)).reshape(1)


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, N, M, CIN), DT)
k3 = jax.random.normal(key, (3, 3, CIN, CO), DT)


def make_k6(kernel):
    G = np.zeros((6, 3), np.float32)
    for u in range(3):
        G[u : u + 4, u] = [0.25, 0.75, 0.75, 0.25]
    Gj = jnp.asarray(G, kernel.dtype)
    return jnp.einsum("mu,nv,uvio->mnio", Gj, Gj, kernel)


# ---- A: current production form -------------------------------------------
def v_current(x, k):
    k6 = make_k6(k)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp, k6, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---- B: phase conv 3x3 -> 4*CO channels at low res (no d2s) ----------------
def make_phase_kernel(kernel):
    """(3,3,CIN,4*CO): output channels = [ph(0,0),ph(0,1),ph(1,0),ph(1,1)]xCO."""
    k6 = make_k6(kernel)  # (6,6,CIN,CO)
    # y[2i+p, 2j+q] = sum_{m,n} k6[m,n] d[2i+p+m-1, 2j+q+n-1]; d nonzero at
    # even indices = xp. taps m where (p+m-1) even -> m odd when p=0? derive:
    # index 2i+p+m-1 = 2*(i+a) -> m = 2a+1-p. For p=0: m in {1,3,5} -> a 0..2
    # For p=1: m in {0,2,4} -> a 0..2 ... both give 3 taps over xp[i-?]
    ks = []
    for p in range(2):
        for q in range(2):
            mm = [2 * a + 1 - p for a in range(3)]
            nn = [2 * a + 1 - q for a in range(3)]
            ks.append(k6[jnp.asarray(mm)][:, jnp.asarray(nn)])  # (3,3,CIN,CO)
    return jnp.concatenate(ks, axis=-1)  # (3,3,CIN,4CO)


def v_phase_only(x, k):
    kp = make_phase_kernel(k)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp, kp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def v_phase_d2s(x, k):
    y = v_phase_only(x, k)  # (B,N,M,4CO)
    y = y.reshape(B, N, M, 2, 2, CO)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * N, 2 * M, CO)


# ---- C: H-dilated only, W phases in channels + reshape ---------------------
def v_hdil_wphase(x, k):
    k6 = make_k6(k)  # (6,6,CIN,CO)
    # along W keep dilation-phase decomposition in channels:
    kparts = []
    for q in range(2):
        nn = [2 * a + 1 - q for a in range(3)]
        kparts.append(k6[:, jnp.asarray(nn)])  # (6,3,CIN,CO)
    kw = jnp.concatenate(kparts, axis=-1)  # (6,3,CIN,2CO)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(
        xp, kw, (1, 1), ((1, 1), (0, 0)), lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B,2N,M,2CO)
    y = y.reshape(B, 2 * N, M, 2, CO)
    return y.reshape(B, 2 * N, 2 * M, CO)


# ---- D: batch in two halves ------------------------------------------------
def v_batch_split(x, k):
    y0 = v_current(x[: B // 2], k)
    y1 = v_current(x[B // 2 :], k)
    return jnp.concatenate([y0, y1], axis=0)


# ---- E: co padded to 128 (emitter probe; 2x FLOPs) -------------------------
def v_co128(x, k):
    kpad = jnp.concatenate([k, k], axis=-1)  # (3,3,CIN,128)
    k6 = make_k6(kpad)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp, k6, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---- F: output feature-major (NCHW out) ------------------------------------
def v_out_nchw(x, k):
    k6 = make_k6(k)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp, k6, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NCHW"))


# ---- G: two convs over channel halves, summed ------------------------------
def v_cin_split(x, k):
    y0 = v_current(x[..., : CIN // 2], k[:, :, : CIN // 2])
    y1 = v_current(x[..., CIN // 2 :], k[:, :, CIN // 2 :])
    return y0 + y1


# ---- parity check (tiny batch; big-batch outputs are ~4 GB in f32) ---------
def _at_small(fn, xs, k):
    global B
    Bs, B = B, xs.shape[0]
    try:
        return jax.jit(fn)(xs, k)
    finally:
        B = Bs


xs = x[:2]
ref = np.asarray(_at_small(v_current, xs, k3), np.float32)
for name, fn in [("phase_d2s", v_phase_d2s), ("hdil_wphase", v_hdil_wphase)]:
    got = np.asarray(_at_small(fn, xs, k3), np.float32)
    err = float(np.max(np.abs(got - ref)))
    print(f"parity {name}: max abs err {err:.2e}", flush=True)

variants = [
    ("current lhsdil 6x6", v_current),
    ("phase 3x3->4co (no d2s)", v_phase_only),
    ("phase + d2s", v_phase_d2s),
    ("hdil + wphase reshape", v_hdil_wphase),
    ("batch split 2x", v_batch_split),
    ("co padded 128 (2x flops)", v_co128),
    ("out NCHW", v_out_nchw),
    ("cin split 2x", v_cin_split),
]

for name, fn in variants:
    try:
        timeit(name, functools.partial(chain, fn), x, k3)
    except Exception as e:
        print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)
