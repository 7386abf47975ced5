"""Pallas fused peak kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.confmaps import make_confmaps
from sleap_tpu.ops.grid import make_grid_vectors
from sleap_tpu.ops.pallas_peaks import find_global_peaks_integral_pallas
from sleap_tpu.ops.peak_finding import find_global_peaks


def test_pallas_matches_xla_path():
    xv, yv = make_grid_vectors(64, 64, 1)
    pts = jnp.array([[17.3, 25.6], [40.8, 11.2], [5.1, 60.9]])
    cms = make_confmaps(pts, xv, yv, 2.0)[None]
    a, av = find_global_peaks(cms, threshold=0.2, refinement="integral")
    b, bv = find_global_peaks_integral_pallas(cms, threshold=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(av), np.asarray(bv), atol=1e-6)


def test_pallas_threshold_nan():
    cms = jnp.zeros((2, 32, 32, 3)).at[0, 5, 5, 0].set(0.1).at[1, 7, 9, 2].set(0.9)
    pts, vals = find_global_peaks_integral_pallas(cms, threshold=0.2, interpret=True)
    pts = np.asarray(pts)
    assert np.isnan(pts[0]).all()
    assert np.isnan(pts[1, :2]).all()
    np.testing.assert_allclose(pts[1, 2], [9, 7], atol=0.5)


def test_pallas_nonmultiple_of_block():
    """Map counts not divisible by the block size are padded correctly."""
    cms = jnp.zeros((1, 16, 16, 3)).at[0, 4, 6, 1].set(1.0)
    pts, vals = find_global_peaks_integral_pallas(cms, threshold=0.2, interpret=True)
    pts = np.asarray(pts)
    np.testing.assert_allclose(pts[0, 1], [6, 4], atol=0.3)
    assert np.isnan(pts[0, 0]).all() and np.isnan(pts[0, 2]).all()


def _planted_maps(seed=0, S=2, H=64, W=128, C=3, n=5):
    rng = np.random.RandomState(seed)
    cms = np.zeros((S, H, W, C), np.float32)
    yv, xv = np.mgrid[0:H, 0:W]
    for s in range(S):
        for c in range(C):
            for _ in range(n):
                cy, cx = rng.randint(2, H - 2), rng.randint(2, W - 2)
                amp = rng.uniform(0.3, 1.0)
                cms[s, :, :, c] += amp * np.exp(
                    -((yv - cy) ** 2 + (xv - cx) ** 2) / (2 * 1.5**2)
                )
    cms += rng.uniform(0, 0.05, cms.shape).astype(np.float32)
    return jnp.asarray(cms)


@pytest.mark.parametrize("refinement", [None, "integral"])
def test_pallas_local_peaks_matches_xla(refinement):
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas
    from sleap_tpu.ops.peak_finding import find_local_peaks

    cms = _planted_maps()
    S, H, W, C = cms.shape
    K = 8
    pk, vals, mask = find_local_peaks(
        cms, max_peaks=K, threshold=0.2, refinement=refinement, use_pallas=False
    )
    flat = jnp.transpose(cms, (0, 3, 1, 2)).reshape(S * C, H, W)
    pk2, v2 = find_local_peaks_fused_pallas(
        flat,
        max_peaks=K,
        threshold=0.2,
        refine=refinement == "integral",
        interpret=True,
    )
    pk2 = np.asarray(pk2).reshape(S, C, K, 2)
    v2 = np.asarray(v2).reshape(S, C, K)
    m2 = np.isfinite(v2)
    ma = np.asarray(mask)
    assert (ma == m2).all()
    np.testing.assert_allclose(np.asarray(pk)[ma], pk2[ma], atol=1e-5)
    np.testing.assert_allclose(np.asarray(vals)[ma], v2[ma], atol=1e-6)


def test_pallas_local_peaks_few_peaks_padding():
    """Maps with fewer than K peaks fill remaining slots with -inf vals."""
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas

    cms = jnp.zeros((1, 16, 128, 1)).at[0, 4, 6, 0].set(1.0)
    flat = jnp.transpose(cms, (0, 3, 1, 2)).reshape(1, 16, 128)
    pk, v = find_local_peaks_fused_pallas(
        flat, max_peaks=4, threshold=0.2, refine=False, interpret=True
    )
    v = np.asarray(v)
    assert np.isfinite(v[0, 0]) and not np.isfinite(v[0, 1:]).any()
    np.testing.assert_allclose(np.asarray(pk)[0, 0], [6, 4], atol=1e-6)


def test_packed_kernel_matches_banded_bf16():
    """The packed-key kernel (bf16, H*W <= 2^16) matches the banded f32 path,
    including tie handling and empty-slot -inf padding."""
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas

    cms = _planted_maps()
    S, H, W, C = cms.shape
    flat = jnp.transpose(cms, (0, 3, 1, 2)).reshape(S * C, H, W)
    # bf16 input selects the packed kernel; f32 the banded one.
    pk_p, v_p = find_local_peaks_fused_pallas(
        flat.astype(jnp.bfloat16), max_peaks=8, threshold=0.2, interpret=True
    )
    pk_b, v_b = find_local_peaks_fused_pallas(
        flat.astype(jnp.bfloat16).astype(jnp.float32),
        max_peaks=8,
        threshold=0.2,
        interpret=True,
    )
    m_p, m_b = np.isfinite(np.asarray(v_p)), np.isfinite(np.asarray(v_b))
    assert (m_p == m_b).all()
    np.testing.assert_allclose(np.asarray(pk_p)[m_p], np.asarray(pk_b)[m_b], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_p)[m_p], np.asarray(v_b)[m_b], atol=1e-6)


def test_packed_kernel_value_ties_first_occurrence():
    """Equal-valued peaks resolve to the smallest linear index first — the
    jnp.argmax rule the packed key's inverted-index low half encodes."""
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas

    m = np.zeros((1, 16, 128), np.float32)
    m[0, 4, 10] = 0.5
    m[0, 4, 90] = 0.5
    m[0, 12, 50] = 0.5
    pk, v = find_local_peaks_fused_pallas(
        jnp.asarray(m, jnp.bfloat16), max_peaks=3, threshold=0.2,
        refine=False, interpret=True,
    )
    pk = np.asarray(pk)
    np.testing.assert_allclose(pk[0, 0], [10, 4], atol=1e-6)
    np.testing.assert_allclose(pk[0, 1], [90, 4], atol=1e-6)
    np.testing.assert_allclose(pk[0, 2], [50, 12], atol=1e-6)
    assert np.isfinite(np.asarray(v)[0]).all()


def test_packed_gate_falls_back_on_large_maps():
    """H*W > 2^16 exceeds the 16-bit index budget: must use the banded
    kernel and still produce correct peaks."""
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas

    m = np.zeros((1, 512, 256), np.float32)  # H*W = 2^17
    m[0, 100, 30] = 0.75
    m[0, 400, 200] = 0.5
    pk, v = find_local_peaks_fused_pallas(
        jnp.asarray(m, jnp.bfloat16), max_peaks=2, threshold=0.2,
        refine=False, interpret=True,
    )
    pk, v = np.asarray(pk), np.asarray(v)
    np.testing.assert_allclose(pk[0, 0], [30, 100], atol=1e-6)
    np.testing.assert_allclose(pk[0, 1], [200, 400], atol=1e-6)
    np.testing.assert_allclose(v[0], [0.75, 0.5], atol=1e-6)


# ---- (H, W, C, S) streaming kernel (the production bottom-up peaks path) ----


def _hwcs(cms_nhwc):
    """bf16 (S, H, W, C) -> the kernel's (H, W, C, S) input."""
    return jnp.transpose(cms_nhwc.astype(jnp.bfloat16), (1, 2, 3, 0))


def _xla_reference(cms_nhwc, max_peaks, refinement):
    """XLA path over the SAME bf16-rounded values the kernel sees."""
    from sleap_tpu.ops.peak_finding import find_local_peaks

    cms = cms_nhwc.astype(jnp.bfloat16).astype(jnp.float32)
    return find_local_peaks(
        cms, max_peaks=max_peaks, threshold=0.2, refinement=refinement,
        use_pallas=False,
    )


def _assert_hwcs_matches(cms_nhwc, max_peaks=8, refinement=None, atol=1e-5):
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas_hwcs

    pk, vals, mask = _xla_reference(cms_nhwc, max_peaks, refinement)
    pk2, v2 = find_local_peaks_fused_pallas_hwcs(
        _hwcs(cms_nhwc), max_peaks=max_peaks, threshold=0.2,
        refine=refinement == "integral", interpret=True,
    )
    pk2, v2 = np.asarray(pk2), np.asarray(v2)
    m2 = np.isfinite(v2)
    ma = np.asarray(mask)
    assert (ma == m2).all(), "peak sets differ"
    np.testing.assert_allclose(np.asarray(pk)[ma], pk2[ma], atol=atol)
    np.testing.assert_allclose(np.asarray(vals)[ma], v2[ma], atol=1e-6)


@pytest.mark.parametrize("refinement", [None, "integral"])
def test_hwcs_matches_xla(refinement):
    _assert_hwcs_matches(_planted_maps(), refinement=refinement)


@pytest.mark.parametrize("S", [1, 3, 6])
def test_hwcs_sample_counts_not_multiple_of_128(S):
    """S lands in lanes; any S with a divisor in the sb table must work."""
    _assert_hwcs_matches(_planted_maps(seed=S, S=S, H=32, W=64, C=2, n=3))


def test_hwcs_border_peaks():
    """Peaks on rows 0/H-1 and cols 0/W-1: out-of-range neighbors read as
    zero in both the kernel (ring/select) and the XLA path (zero pad)."""
    m = np.zeros((1, 16, 32, 1), np.float32)
    m[0, 0, 0, 0] = 0.9      # top-left corner
    m[0, 0, 17, 0] = 0.8     # top edge
    m[0, 15, 31, 0] = 0.7    # bottom-right corner
    m[0, 7, 0, 0] = 0.6      # left edge
    m[0, 9, 31, 0] = 0.5     # right edge
    for refinement in (None, "integral"):
        _assert_hwcs_matches(jnp.asarray(m), refinement=refinement)


def test_hwcs_value_ties_first_occurrence():
    """Equal values resolve to the smallest linear index (jnp.argmax rule),
    encoded by the packed key's inverted-index low half."""
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas_hwcs

    m = np.zeros((2, 16, 32, 1), np.float32)
    m[0, 4, 20, 0] = 0.5
    m[0, 4, 5, 0] = 0.5
    m[0, 12, 9, 0] = 0.5
    m[1, 3, 3, 0] = 0.25
    pk, v = find_local_peaks_fused_pallas_hwcs(
        _hwcs(jnp.asarray(m)), max_peaks=3, threshold=0.2,
        refine=False, interpret=True,
    )
    pk, v = np.asarray(pk), np.asarray(v)
    np.testing.assert_allclose(pk[0, 0, 0], [5, 4], atol=1e-6)
    np.testing.assert_allclose(pk[0, 0, 1], [20, 4], atol=1e-6)
    np.testing.assert_allclose(pk[0, 0, 2], [9, 12], atol=1e-6)
    assert np.isfinite(v[0, 0]).all()
    assert np.isfinite(v[1, 0, 0]) and not np.isfinite(v[1, 0, 1:]).any()


def test_hwcs_fewer_than_k_peaks():
    from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas_hwcs

    m = np.zeros((1, 16, 32, 2), np.float32)
    m[0, 6, 10, 0] = 1.0
    pk, v = find_local_peaks_fused_pallas_hwcs(
        _hwcs(jnp.asarray(m)), max_peaks=4, threshold=0.2,
        refine=False, interpret=True,
    )
    v = np.asarray(v)
    assert np.isfinite(v[0, 0, 0]) and not np.isfinite(v[0, 0, 1:]).any()
    assert not np.isfinite(v[0, 1]).any()  # empty channel
    np.testing.assert_allclose(np.asarray(pk)[0, 0, 0], [10, 6], atol=1e-6)


def test_hwcs_minimum_height():
    """H=4 is one 4-row block: the t=0 step completes only the first pair,
    the tail step the second — both lag paths exercised at their extremes."""
    rng = np.random.RandomState(7)
    m = rng.uniform(0, 0.05, (2, 4, 32, 2)).astype(np.float32)
    m[0, 1, 5, 0] = 0.9
    m[0, 2, 20, 1] = 0.7
    m[1, 0, 9, 0] = 0.6   # border row 0
    m[1, 3, 30, 1] = 0.8  # border row H-1
    _assert_hwcs_matches(jnp.asarray(m), refinement="integral")


def test_hwcs_nondefault_sw_segments():
    """W=96 is not a multiple of the default SW=32*3: exercises multiple
    W segments including the zero-padded halo at segment seams."""
    _assert_hwcs_matches(
        _planted_maps(seed=3, S=2, H=32, W=96, C=2, n=4), refinement="integral"
    )


def test_hwcs_gate():
    from sleap_tpu.ops import pallas_peaks as pp

    if not pp._HAS_PLTPU:
        pytest.skip("pltpu unavailable")
    ok = pp.local_peaks_hwcs_ok
    assert ok((64, 128, 3, 8), jnp.bfloat16, 0.2, 5)
    assert not ok((64, 128, 3, 8), jnp.float32, 0.2, 5)  # packing needs bf16
    assert not ok((512, 256, 3, 8), jnp.bfloat16, 0.2, 5)  # H*W > 2^16
    assert not ok((64, 128, 3, 8), jnp.bfloat16, 0.0, 5)  # threshold <= 0
    assert not ok((64, 128, 3, 8), jnp.bfloat16, 0.2, 7)  # 5-tap hard-wired
    assert not ok((66, 128, 3, 8), jnp.bfloat16, 0.2, 5)  # H % 4
    assert not ok((64, 120, 3, 8), jnp.bfloat16, 0.2, 5)  # W % 16


def test_peaks_sw_env_validation():
    from sleap_tpu.ops.pallas_peaks import _resolve_peaks_sw

    assert _resolve_peaks_sw() in (16, 32, 48, 64) or _resolve_peaks_sw() % 16 == 0
    import os as _os

    old = _os.environ.get("SLEAP_TPU_PEAKS_SW")
    try:
        for bad in ("8", "24", "-16", "zzz", "0"):
            _os.environ["SLEAP_TPU_PEAKS_SW"] = bad
            with pytest.warns(UserWarning):
                assert _resolve_peaks_sw() == 32
        _os.environ["SLEAP_TPU_PEAKS_SW"] = "48"
        assert _resolve_peaks_sw() == 48
    finally:
        if old is None:
            _os.environ.pop("SLEAP_TPU_PEAKS_SW", None)
        else:
            _os.environ["SLEAP_TPU_PEAKS_SW"] = old
