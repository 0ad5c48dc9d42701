"""Big-array token policies: identity (default) / sample / content.

Roadmap gap "process-stable tokens": arrays above the 64 KiB content-hash
limit default to per-object identity tokens (O(1), process-local).  The
``tokenize.big-arrays`` config key opts into process-stable digests for
cross-process plan caching.
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu.utils._tokenize import tokenize


@pytest.fixture
def big(rng=None):
    return np.random.default_rng(0).standard_normal(100000)  # > 64 KiB


def test_identity_default(big):
    # same object stable, copies differ (per-object identity)
    assert tokenize(big) == tokenize(big)
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


def test_sample_policy_noncontiguous():
    big = np.random.default_rng(1).standard_normal((400, 300))
    with da.config.set({"tokenize.big-arrays": "sample"}):
        v1 = big[::2, ::3]
        v2 = big.copy()[::2, ::3]
        assert tokenize(v1) == tokenize(v2)
        mod = big.copy()
        mod[0, 0] += 1
        assert tokenize(mod[::2, ::3]) != tokenize(v1)


def test_content_policy(big):
    with da.config.set({"tokenize.big-arrays": "content"}):
        t = tokenize(big)
        assert tokenize(big.copy()) == t
        mid = big.copy()
        mid[50001] += 1  # interior byte: only full content catches it
        assert tokenize(mid) != t


def test_expression_names_stable_under_sample(big):
    with da.config.set({"tokenize.big-arrays": "sample"}):
        n1 = (da.from_array(big, chunks=25000) + 1).name
        n2 = (da.from_array(big.copy(), chunks=25000) + 1).name
        assert n1 == n2
