"""Native C++ extension: builds with g++ and matches the Python fallbacks."""

import numpy as np
import pytest

from instantsfm_tpu import native


def test_native_builds():
    assert native.get_lib() is not None, "g++ build of native.cpp failed"


def test_union_find_matches_scipy(rng):
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    n = 500
    e1 = rng.integers(0, n, 800)
    e2 = rng.integers(0, n, 800)
    labels = native.connected_components(e1, e2, n)
    assert labels is not None
    adj = sp.coo_matrix((np.ones(len(e1)), (e1, e2)), shape=(n, n))
    _, ref = connected_components(adj, directed=False)
    # same partition (labels may differ, the grouping must not)
    import collections
    m1 = collections.defaultdict(set)
    m2 = collections.defaultdict(set)
    for i in range(n):
        m1[labels[i]].add(i)
        m2[ref[i]].add(i)
    assert sorted(map(frozenset, m1.values())) == \
        sorted(map(frozenset, m2.values()))


def test_bilinear_sample(rng):
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    xy = np.array([[10.0, 5.0], [10.5, 5.5], [-1.0, 3.0], [59.5, 39.5]])
    out = native.bilinear_sample(img, xy)
    assert out is not None
    np.testing.assert_allclose(out[0], img[5, 10], atol=1e-4)
    manual = 0.25 * (img[5, 10].astype(float) + img[5, 11] + img[6, 10]
                     + img[6, 11])
    np.testing.assert_allclose(out[1], manual, atol=1e-3)
    assert np.all(out[2] == -1)
    assert np.all(out[3] >= 0)
