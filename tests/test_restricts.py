"""Restrict filters, allow/deny lists, token maps, crowding
(reference test analog: src/restricts/ inline tests)."""

import numpy as np
import pytest

from scann_tpu import BruteForceSearcher, DenseDataset
from scann_tpu.restricts import (
    AllowlistFilter,
    AndFilter,
    CrowdingConfig,
    CrowdingConstraint,
    CrowdingMultidimensional,
    DenylistFilter,
    NoRestrict,
    NotFilter,
    OrFilter,
    PredicateFilter,
    RangeFilter,
    RestrictAllowlist,
    RestrictDenylist,
    RestrictTokenMap,
    SparseAllowlist,
)


def test_basic_filters():
    assert NoRestrict().is_allowed(123)
    even = PredicateFilter(lambda i: i % 2 == 0)
    assert even.is_allowed(4) and not even.is_allowed(5)
    r = RangeFilter(10, 20)
    assert r.is_allowed(10) and r.is_allowed(19) and not r.is_allowed(20)
    np.testing.assert_array_equal(r.to_mask(12), [False] * 10 + [True] * 2)


def test_compose_filters():
    even = PredicateFilter(lambda i: i % 2 == 0)
    low = RangeFilter(0, 10)
    a = AndFilter([even, low])
    assert a.is_allowed(8) and not a.is_allowed(9) and not a.is_allowed(12)
    o = OrFilter([even, low])
    assert o.is_allowed(9) and o.is_allowed(12) and not o.is_allowed(13)
    n = NotFilter(even)
    assert n.is_allowed(3) and not n.is_allowed(4)
    # mask composition matches scalar predicates
    m = AndFilter([even, low]).to_mask(20)
    assert m.tolist() == [(i % 2 == 0 and i < 10) for i in range(20)]
    assert AndFilter([]).is_allowed(0) and OrFilter([]).is_allowed(0)


def test_allowlist():
    a = RestrictAllowlist.from_indices([1, 3, 5], 8)
    assert a.is_allowed(3) and not a.is_allowed(2)
    assert not a.is_allowed(100)  # out of capacity
    a.add(2); a.remove(1)
    assert a.indices() == [2, 3, 5]
    assert a.count() == 3
    a.clear()
    assert a.count() == 0


def test_denylist():
    d = RestrictDenylist.from_indices([2], 5)
    assert d.is_allowed(0) and not d.is_allowed(2)
    d.deny(0); d.allow(2)
    np.testing.assert_array_equal(d.to_mask(5), [False, True, True, True, True])


def test_sparse_allowlist():
    s = SparseAllowlist.from_indices([100, 5])
    assert s.is_allowed(100) and not s.is_allowed(6)
    assert list(s.indices()) == [5, 100]
    np.testing.assert_array_equal(s.to_mask(7), [0, 0, 0, 0, 0, 1, 0])


def test_token_map():
    tm = RestrictTokenMap(10)
    tm.add_token(0, 7)
    tm.add_token(3, 7)
    tm.set_tokens(5, [7, 9])
    assert tm.get_indices(7) == [0, 3, 5]
    assert tm.num_tokens == 2
    allow = tm.create_allowlist([9])
    assert allow.indices() == [5]


def test_filtered_search_device_mask(rng):
    db = rng.normal(size=(300, 8)).astype(np.float32)
    s = BruteForceSearcher(DenseDataset(db))
    assert s.supports_allow_mask()
    f = RangeFilter(100, 200)
    res = s.search_with_filter(db[150], 5, f)
    assert res.neighbors[0].index == 150
    assert all(100 <= n.index < 200 for n in res.neighbors)
    # denylist the true neighbor
    d = RestrictDenylist(300)
    d.deny(150)
    res2 = s.search_with_filter(db[150], 1, DenylistFilter(d))
    assert res2.neighbors[0].index != 150


def test_filtered_search_empty_allowlist(rng):
    db = rng.normal(size=(64, 4)).astype(np.float32)
    s = BruteForceSearcher(DenseDataset(db))
    res = s.search_with_filter(db[0], 3, AllowlistFilter(RestrictAllowlist(64)))
    assert len(res) == 0


def test_crowding_constraint():
    attrs = [0, 0, 0, 1, 1, 2]
    c = CrowdingConstraint(attrs, CrowdingConfig(per_crowd_limit=2, enabled=True))
    results = [(0, 0.1), (1, 0.2), (2, 0.3), (3, 0.4), (4, 0.5), (5, 0.6)]
    out = c.apply(results, 10)
    # index 2 dropped (third member of group 0)
    assert [i for i, _ in out] == [0, 1, 3, 4, 5]
    assert c.would_violate(2, out)
    assert not c.would_violate(5, [])
    # disabled passes through
    c2 = CrowdingConstraint(attrs, CrowdingConfig(per_crowd_limit=1, enabled=False))
    assert len(c2.apply(results, 4)) == 4


def test_crowding_batch_and_search(rng):
    db = rng.normal(size=(100, 8)).astype(np.float32)
    s = BruteForceSearcher(DenseDataset(db))
    attrs = np.arange(100) // 10  # groups of 10 consecutive points
    c = CrowdingConstraint(attrs, CrowdingConfig(per_crowd_limit=1, enabled=True))
    results = s.search_with_crowding(db[:3], 5, c, over_fetch=8)
    for r in results:
        groups = [attrs[n.index] for n in r.neighbors]
        assert len(groups) == len(set(groups))  # one per group


def test_crowding_multidimensional():
    cm = CrowdingMultidimensional(2, 6)
    for i in range(6):
        cm.set_attribute(0, i, i // 3)   # groups {0,1,2} {3,4,5}
        cm.set_attribute(1, i, i % 2)    # even/odd
    cm.set_limit(0, 2)
    cm.set_limit(1, 2)
    results = [(i, float(i)) for i in range(6)]
    out = cm.apply(results, 6)
    ids = [i for i, _ in out]
    # dim0 allows at most 2 of {0,1,2}; dim1 at most 2 evens / 2 odds
    assert 2 not in ids or len([i for i in ids if i < 3]) <= 2
    for d, limit in ((0, 2), (1, 2)):
        from collections import Counter
        cnt = Counter(int(cm.attributes[d, i]) for i in ids)
        assert max(cnt.values()) <= limit


def test_denylist_allows_beyond_capacity():
    """Everything-allowed-unless-denied holds past the constructed
    capacity: points appended to the dataset after the denylist was built
    stay allowed, and deny() grows to cover them."""
    from scann_tpu.restricts.allowlist import RestrictDenylist

    d = RestrictDenylist(4)
    d.deny(1)
    assert d.is_allowed(100)  # beyond capacity: never denied
    m = d.to_mask(8)
    assert m.tolist() == [True, False, True, True, True, True, True, True]
    d.deny(6)  # grows
    assert not d.is_allowed(6)
    assert d.to_mask(8).tolist() == [
        True, False, True, True, True, True, False, True]


def test_denylist_from_indices_grows_past_capacity():
    from scann_tpu.restricts.allowlist import RestrictDenylist

    d = RestrictDenylist.from_indices([1, 10], capacity=4)
    assert not d.is_allowed(1)
    assert not d.is_allowed(10)  # grew past the constructed capacity
    assert d.is_allowed(5)
