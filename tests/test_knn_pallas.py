"""Pallas kNN kernel correctness in interpreter mode (CPU).

The same kernel runs compiled on TPU (validated in perf benchmarks);
interpret mode checks the algorithm: exact nearest-first ids, padding
exclusion, block-boundary cases.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import ppsurf_tpu.ops.knn_pallas as kp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # knn_pallas_single is jitted with a cache keyed on the traced call;
    # clear so the interpret-mode trace is used
    kp.knn_pallas_single.clear_cache()
    yield
    kp.knn_pallas_single.clear_cache()


def brute_force(pts, qs, k):
    d = np.linalg.norm(qs[:, None, :] - pts[None], axis=-1)
    return np.sort(d, axis=1)[:, :k]


@pytest.mark.parametrize(
    "n,valid_n,q,k,tq",
    [
        (2000, 1948, 513, 50, 128),  # padding + non-tile-multiple queries
        (1024, 1024, 300, 64, 128),  # k > 50 config
        (300, 256, 40, 16, 128),     # fewer blocks than k after padding
        (128, 128, 8, 4, 8),         # single block
    ],
)
def test_exact_vs_brute_force(n, valid_n, q, k, tq):
    rng = np.random.RandomState(0)
    pts = rng.rand(n, 3).astype(np.float32)
    qs = rng.rand(q, 3).astype(np.float32)
    valid = np.arange(n) < valid_n
    ids = np.asarray(
        kp.knn_pallas_single(
            jnp.asarray(pts), jnp.asarray(qs), jnp.asarray(valid), k, tq=tq
        )
    )
    assert ids.shape == (q, k)
    assert ids.max() < valid_n
    got = np.sort(np.linalg.norm(qs[:, None, :] - pts[ids], axis=-1), axis=1)
    ref = brute_force(pts[:valid_n], qs, k)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_nearest_first_ordering():
    rng = np.random.RandomState(1)
    pts = rng.rand(512, 3).astype(np.float32)
    qs = rng.rand(64, 3).astype(np.float32)
    ids = np.asarray(
        kp.knn_pallas_single(
            jnp.asarray(pts), jnp.asarray(qs), jnp.ones(512, bool), 8, tq=64
        )
    )
    d = np.linalg.norm(qs[:, None, :] - pts[ids], axis=-1)
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_none_valid_mask():
    rng = np.random.RandomState(2)
    pts = rng.rand(256, 3).astype(np.float32)
    qs = rng.rand(16, 3).astype(np.float32)
    ids = np.asarray(
        kp.knn_pallas_single(jnp.asarray(pts), jnp.asarray(qs), None, 4, tq=16)
    )
    got = np.sort(np.linalg.norm(qs[:, None, :] - pts[ids], axis=-1), axis=1)
    np.testing.assert_allclose(got, brute_force(pts, qs, 4), atol=1e-5)


@pytest.mark.parametrize("kb", [1, 4, 16])
@pytest.mark.parametrize("morton", [True, False])
def test_banded_exact_vs_brute_force(kb, morton):
    """Banded stage-3 (kb > 0): the production default (KNN_BAND=16 in
    recon/field.py). Exactness must hold for ANY point order — on
    Morton-sorted data via the tau<=bound certificate, on shuffled data
    via the in-kernel full-band fallback (ADVICE r2 medium)."""
    rng = np.random.RandomState(3)
    n, q, k, tq = 2048, 384, 32, 128
    pts = rng.rand(n, 3).astype(np.float32)
    qs = rng.rand(q, 3).astype(np.float32)
    if morton:
        from ppsurf_tpu.ops.morton import morton_order

        pts = pts[morton_order(pts, pts.min(0), pts.max(0))]
        qs = qs[morton_order(qs, pts.min(0), pts.max(0))]
    ids, okf = kp.knn_pallas_single(
        jnp.asarray(pts), jnp.asarray(qs), None, k, tq=tq, kb=kb,
        return_stats=True,
    )
    ids = np.asarray(ids)
    got = np.sort(np.linalg.norm(qs[:, None, :] - pts[ids], axis=-1), axis=1)
    np.testing.assert_allclose(got, brute_force(pts, qs, k), atol=1e-5)
    okf = np.asarray(okf)
    # row 0: per-query certificate; row 1: tile took the fallback. A tile
    # with any failing certificate must have taken the fallback.
    cert = okf[0].reshape(-1, tq)[: (q + tq - 1) // tq]
    fb = okf[1].reshape(-1, tq)[: (q + tq - 1) // tq]
    tile_bad = (cert == 0).any(axis=1)
    assert np.all(fb[tile_bad] == 1), "failed certificate without fallback"


def test_banded_forced_fallback():
    """A shuffled cloud with tiny kb=1 must force the fallback on most
    tiles and still return exact results."""
    rng = np.random.RandomState(4)
    n, q, k = 4096, 256, 16
    pts = rng.rand(n, 3).astype(np.float32)
    qs = rng.rand(q, 3).astype(np.float32)
    ids, okf = kp.knn_pallas_single(
        jnp.asarray(pts), jnp.asarray(qs), None, k, tq=128, kb=1,
        return_stats=True,
    )
    got = np.sort(
        np.linalg.norm(qs[:, None, :] - pts[np.asarray(ids)], axis=-1), axis=1
    )
    np.testing.assert_allclose(got, brute_force(pts, qs, k), atol=1e-5)
    assert np.asarray(okf)[1].any(), "expected at least one fallback tile"


def test_k192_banded_exact():
    """The refinement candidate path queries k=192 (REFINE_CAND_K) with
    kb=2*KNN_BAND — above the k<=128 range every other test exercises
    (ADVICE r3 medium: the k>128 extraction loop had no coverage)."""
    rng = np.random.RandomState(5)
    n, q, k, tq, kb = 4096, 256, 192, 128, 24
    pts = rng.rand(n, 3).astype(np.float32)
    qs = rng.rand(q, 3).astype(np.float32)
    from ppsurf_tpu.ops.morton import morton_order

    pts = pts[morton_order(pts, pts.min(0), pts.max(0))]
    qs = qs[morton_order(qs, pts.min(0), pts.max(0))]
    ids = np.asarray(
        kp.knn_pallas_single(
            jnp.asarray(pts), jnp.asarray(qs), None, k, tq=tq, kb=kb
        )
    )
    assert ids.shape == (q, k)
    assert all(len(np.unique(r)) == k for r in ids[::16])
    d = np.linalg.norm(qs[:, None, :] - pts[ids], axis=-1)
    # nearest-first: required by the patch-prefix contract
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    np.testing.assert_allclose(np.sort(d, axis=1), brute_force(pts, qs, k),
                               atol=1e-5)


def test_topk_rows_matches_lax_top_k():
    """topk_rows_pallas == lax.top_k(-d2, k)[1].T including tie order
    (interpret mode; device A/B in tools/ablate_refine.py)."""
    rng = np.random.RandomState(7)
    for c, kc, k in ((700, 192, 64), (512, 100, 50), (64, 192, 192)):
        d2 = rng.rand(c, kc).astype(np.float32) * 4.0
        # force exact ties: top_k breaks them by lowest index
        d2[:, 1::7] = d2[:, 0::7][:, : d2[:, 1::7].shape[1]]
        got = np.asarray(
            kp.topk_rows_pallas(jnp.asarray(d2.T), k=k, tq=128,
                                interpret=True)
        ).T
        want = np.asarray(jax.lax.top_k(-jnp.asarray(d2), k)[1])
        np.testing.assert_array_equal(got, want)


def test_clamp_tile_budget():
    """clamp_tile must keep every shipped config inside the modeled VMEM
    budget and never go below 128 or above the requested tq. (The r4 OOM
    config k=192/tq=256 is covered by the shipped-defaults loop; the
    budget property, not a fixed clamp value, is the invariant.)"""
    n = 60031  # ABC production cloud -> nb=472
    npad = n + (-n) % (8 * kp.S)
    # the shipped configs must fit at their default tiles
    assert kp.clamp_tile(64, n, kp.default_tile(64)) == kp.default_tile(64)
    assert kp.clamp_tile(192, n, kp.default_tile(192)) == kp.default_tile(192)
    # modeled footprint of whatever clamp_tile returns must fit the cap
    for k in (50, 64, 192, 200, 256):
        for req in (kp.default_tile(k), 2048):
            tq = kp.clamp_tile(k, n, req)
            assert kp._vmem_bytes(k, npad // kp.S, npad, tq, False) <= int(
                kp.VMEM_CAP_BYTES * 0.92)
            assert tq >= 128 and tq <= req
    # tiny clouds stay at the request
    assert kp.clamp_tile(64, 2048, 512) == 512


def test_clamped_tile_still_exact():
    """knn_pallas_single internally clamps tq; results must be identical
    for any requested tq (the clamp only changes tiling)."""
    rng = np.random.RandomState(3)
    pts = rng.rand(700, 3).astype(np.float32)
    q = rng.rand(40, 3).astype(np.float32)
    a = np.asarray(kp.knn_pallas_single(jnp.asarray(pts), jnp.asarray(q),
                                        None, 8, tq=128))
    b = np.asarray(kp.knn_pallas_single(jnp.asarray(pts), jnp.asarray(q),
                                        None, 8, tq=4096))
    np.testing.assert_array_equal(a, b)
