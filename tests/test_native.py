"""Differential tests: native plankit kernels vs the Python planning code.

The reference's discipline (byte-for-byte record parity tests,
test_frisky_protocol.py): native and Python paths must agree exactly, and
version skew must fail loudly.
"""

import numpy as np
import pytest

from dask_array_tpu import native
from dask_array_tpu._chunks import common_blockdim
from dask_array_tpu._rechunk import old_to_new
from dask_array_tpu._slicing import sliced_blockdim

pytestmark = pytest.mark.skipif(not native.available(), reason="plankit not built")


def _py_sliced_counts(chunks, sl):
    total = sum(chunks)
    start, stop, step = sl.indices(total)
    counts = []
    lo = 0
    for c in chunks:
        hi = lo + c
        lo_eff = max(lo, start)
        hi_eff = min(hi, stop)
        cnt = 0
        if hi_eff > lo_eff:
            k0 = -(-(lo_eff - start) // step)
            first = start + k0 * step
            if first < hi_eff:
                cnt = (hi_eff - first - 1) // step + 1
        counts.append(cnt)
        lo = hi
    return counts


@pytest.mark.parametrize("seed", range(5))
def test_sliced_blockdim_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    chunks = tuple(int(c) for c in rng.integers(1, 40, size=300))
    total = sum(chunks)
    for _ in range(20):
        a, b = sorted(rng.integers(0, total, size=2).tolist())
        step = int(rng.integers(1, 7))
        sl = slice(a, b, step)
        start, stop, st = sl.indices(total)
        counts = native.sliced_blockdim_counts(chunks, start, stop, st)
        assert counts is not None
        assert counts.tolist() == _py_sliced_counts(chunks, sl)
        # and through the public function (threshold forces native for >256)
        nc, _ = sliced_blockdim(chunks, sl)
        assert nc == tuple(c for c in counts.tolist() if c) or nc == (0,)


@pytest.mark.parametrize("seed", range(4))
def test_old_to_new_native_matches_python(seed):
    rng = np.random.default_rng(100 + seed)
    old = tuple(int(c) for c in rng.integers(1, 30, size=400))
    total = sum(old)
    # random new partition of the same total
    cuts = np.sort(rng.choice(np.arange(1, total), size=350, replace=False))
    new = tuple(np.diff(np.concatenate([[0], cuts, [total]])).astype(int).tolist())

    got = old_to_new((old,), (new,))[0]  # native path (>512 threshold)
    # python reference computation
    o_bounds = np.cumsum([0] + list(old))
    expected = []
    pos = 0
    for size in new:
        lo, hi = pos, pos + size
        pieces = []
        for b in range(len(old)):
            if o_bounds[b + 1] <= lo or o_bounds[b] >= hi:
                continue
            s = max(lo, o_bounds[b]) - o_bounds[b]
            e = min(hi, o_bounds[b + 1]) - o_bounds[b]
            pieces.append((b, slice(int(s), int(e))))
        expected.append(pieces)
        pos = hi
    assert got == expected


def test_refine_axis_native_matches_python():
    rng = np.random.default_rng(7)
    total = 10000
    cuts_a = np.sort(rng.choice(np.arange(1, total), size=400, replace=False))
    cuts_b = np.sort(rng.choice(np.arange(1, total), size=300, replace=False))
    a = tuple(np.diff(np.concatenate([[0], cuts_a, [total]])).astype(int).tolist())
    b = tuple(np.diff(np.concatenate([[0], cuts_b, [total]])).astype(int).tolist())
    got = native.refine_axis(a, b)
    bounds = sorted(set(np.cumsum(a)) | set(np.cumsum(b)))
    expected = tuple(int(x - y) for x, y in zip(bounds, [0] + bounds[:-1]))
    assert got == expected
    # and through common_blockdim (threshold forces native)
    assert common_blockdim([a, b]) == expected


def test_generation_handshake():
    assert native._load() is not None
    assert native._lib.plankit_generation() == native.PLANKIT_GENERATION


def test_expand_grid():
    got = native.expand_grid((3, 4, 2))
    import itertools

    expected = np.array(list(itertools.product(range(3), range(4), range(2))))
    np.testing.assert_array_equal(got, expected)


def test_hash_bytes_stable():
    h1 = native.hash_bytes(b"hello world")
    h2 = native.hash_bytes(b"hello world")
    h3 = native.hash_bytes(b"hello worle")
    assert h1 == h2 != h3


def test_native_moved_fraction_matches_python(rng):
    from dask_array_tpu import native
    from dask_array_tpu._rechunk import _axis_moved_fraction

    if not native.available():
        pytest.skip("plankit not built")
    cases = [
        ((1, 719, 720), (720, 720)),
        ((10,) * 6, (30, 30)),
        ((30, 30), (10,) * 6),
        ((100,) * 4, (50, 100, 100, 100, 50)),
        ((5, 5), (5, 5)),
        ((3, 7, 5, 5), (10, 10)),
    ]
    for src, dst in cases:
        got = native.moved_fraction_axis(src, dst)
        want = _axis_moved_fraction(src, dst)
        assert got == pytest.approx(want), (src, dst)
    # randomized differential
    for seed in range(25):
        r = np.random.default_rng(seed)
        n = int(r.integers(20, 400))
        cuts_a = np.sort(r.choice(np.arange(1, n), size=min(n - 1, int(r.integers(1, 30))), replace=False))
        cuts_b = np.sort(r.choice(np.arange(1, n), size=min(n - 1, int(r.integers(1, 30))), replace=False))
        a = tuple(np.diff(np.concatenate([[0], cuts_a, [n]])).tolist())
        b = tuple(np.diff(np.concatenate([[0], cuts_b, [n]])).tolist())
        assert native.moved_fraction_axis(a, b) == pytest.approx(_axis_moved_fraction(a, b))


def test_native_coarse_axis_matches_python(rng):
    from dask_array_tpu import native
    from dask_array_tpu._chunks import _boundaries, _from_boundaries

    if not native.available():
        pytest.skip("plankit not built")
    for seed in range(25):
        r = np.random.default_rng(100 + seed)
        n = int(r.integers(20, 300))
        cuts_a = np.sort(r.choice(np.arange(1, n), size=min(n - 1, int(r.integers(1, 25))), replace=False))
        cuts_b = np.sort(r.choice(np.arange(1, n), size=min(n - 1, int(r.integers(1, 25))), replace=False))
        a = tuple(np.diff(np.concatenate([[0], cuts_a, [n]])).tolist())
        b = tuple(np.diff(np.concatenate([[0], cuts_b, [n]])).tolist())
        inter = set(_boundaries(a)) & set(_boundaries(b))
        want = _from_boundaries(sorted(inter))
        assert native.coarse_axis(a, b) == want, (a, b)


def test_native_stage_degree_matches_python(rng):
    from dask_array_tpu import native
    from dask_array_tpu._rechunk import old_to_new

    if not native.available():
        pytest.skip("plankit not built")
    for seed in range(25):
        r = np.random.default_rng(200 + seed)
        n = int(r.integers(20, 300))
        cuts_a = np.sort(r.choice(np.arange(1, n), size=min(n - 1, int(r.integers(1, 25))), replace=False))
        cuts_b = np.sort(r.choice(np.arange(1, n), size=min(n - 1, int(r.integers(1, 25))), replace=False))
        a = tuple(np.diff(np.concatenate([[0], cuts_a, [n]])).tolist())
        b = tuple(np.diff(np.concatenate([[0], cuts_b, [n]])).tolist())
        mapping = old_to_new((a,), (b,))[0]
        want = max((len(p) for p in mapping), default=1)
        assert native.stage_degree_axis(a, b) == want, (a, b)
