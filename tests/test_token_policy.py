"""Big-array token policies: sample (default) / content / identity.

VERDICT r3 #6 "content-stable leaf tokens by default": arrays above the
64 KiB content-hash limit now default to the process-stable SAMPLE digest
(head+tail+strided blake2b + a full-coverage u64 wrap-sum, ~98 ms/GB
measured), so plan/executable caches survive process boundaries for plain
``from_array`` leaves without opt-in.  ``tokenize.big-arrays`` selects
``content`` (full blake2b, exact, 0.45 GB/s) or ``identity`` (per-object
uuid, O(1), process-local — the pre-r4 default).
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu.utils._tokenize import tokenize


@pytest.fixture
def big(rng=None):
    return np.random.default_rng(0).standard_normal(100000)  # > 64 KiB


def test_sample_is_default(big):
    # copies tokenize equal WITHOUT opt-in (process-stable default)
    assert tokenize(big) == tokenize(big)
    assert tokenize(big) == tokenize(big.copy())
    with da.config.set({"tokenize.big-arrays": "identity"}):
        assert tokenize(big) != tokenize(big.copy())


def test_sample_policy(big):
    with da.config.set({"tokenize.big-arrays": "sample"}):
        t = tokenize(big)
        assert tokenize(big.copy()) == t
        head = big.copy()
        head[0] += 1
        assert tokenize(head) != t
        tail = big.copy()
        tail[-1] += 1
        assert tokenize(tail) != t
        # different dtype/shape always differ
        assert tokenize(big.astype("f4")) != t
        assert tokenize(big.reshape(200, 500)) != t


def test_sample_full_coverage_interior_edit(big):
    # the wrap-sum pass reads EVERY byte: a single un-sampled interior
    # edit still changes the token (pure subsampling would miss it)
    mid = big.copy()
    mid[50001] += 1
    assert tokenize(mid) != tokenize(big)


def test_sample_policy_noncontiguous():
    big = np.random.default_rng(1).standard_normal((400, 300))
    v1 = big[::2, ::3]
    v2 = big.copy()[::2, ::3]
    assert tokenize(v1) == tokenize(v2)
    mod = big.copy()
    mod[0, 0] += 1
    assert tokenize(mod[::2, ::3]) != tokenize(v1)


def test_object_dtype_identity_fallback():
    # unhashable source: identity fallback, never a raise out of tokenize
    objs = np.empty(100000, dtype=object)
    objs[:] = [object() for _ in range(100000)]
    t1 = tokenize(objs)
    assert t1 == tokenize(objs)  # stable per object
    objs2 = objs.copy()
    assert tokenize(objs2) != t1  # copies are different objects


def test_content_policy(big):
    with da.config.set({"tokenize.big-arrays": "content"}):
        t = tokenize(big)
        assert tokenize(big.copy()) == t
        mid = big.copy()
        mid[50001] += 1  # interior byte: full content catches it
        assert tokenize(mid) != t


def test_expression_names_stable_by_default(big):
    n1 = (da.from_array(big, chunks=25000) + 1).name
    n2 = (da.from_array(big.copy(), chunks=25000) + 1).name
    assert n1 == n2
