"""Composable restrict filters (reference: src/restricts/mod.rs:17-167).

Every filter implements both the scalar predicate (``is_allowed``) and a
vectorized lowering (``to_mask(n) -> np.ndarray[bool]``) that the fused
search programs consume. Composition (and/or/not) composes the masks.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np


class RestrictFilter:
    """Base filter (reference: restricts/mod.rs:17-30)."""

    def is_allowed(self, index: int) -> bool:
        raise NotImplementedError

    def to_mask(self, n: int) -> np.ndarray:
        """[n] bool allowlist mask for device-side fusion."""
        return np.fromiter((self.is_allowed(i) for i in range(n)), dtype=bool, count=n)


class NoRestrict(RestrictFilter):
    """Allows everything (reference: mod.rs:33-44)."""

    def is_allowed(self, index: int) -> bool:
        return True

    def to_mask(self, n: int) -> np.ndarray:
        return np.ones(n, dtype=bool)


class PredicateFilter(RestrictFilter):
    """Arbitrary predicate (reference: mod.rs:47-70)."""

    def __init__(self, predicate: Callable[[int], bool]):
        self.predicate = predicate

    def is_allowed(self, index: int) -> bool:
        return bool(self.predicate(index))


class RangeFilter(RestrictFilter):
    """Allow [start, end) (reference: mod.rs:73-97)."""

    def __init__(self, start: int, end: int):
        self.start, self.end = int(start), int(end)

    def is_allowed(self, index: int) -> bool:
        return self.start <= index < self.end

    def to_mask(self, n: int) -> np.ndarray:
        m = np.zeros(n, dtype=bool)
        m[max(self.start, 0) : max(min(self.end, n), 0)] = True
        return m


class AndFilter(RestrictFilter):
    """(reference: mod.rs:100-124)."""

    def __init__(self, filters: Sequence[RestrictFilter] = ()):
        self.filters: List[RestrictFilter] = list(filters)

    def add(self, f: RestrictFilter) -> "AndFilter":
        self.filters.append(f)
        return self

    def is_allowed(self, index: int) -> bool:
        return all(f.is_allowed(index) for f in self.filters)

    def to_mask(self, n: int) -> np.ndarray:
        m = np.ones(n, dtype=bool)
        for f in self.filters:
            m &= f.to_mask(n)
        return m


class OrFilter(RestrictFilter):
    """(reference: mod.rs:127-151)."""

    def __init__(self, filters: Sequence[RestrictFilter] = ()):
        self.filters: List[RestrictFilter] = list(filters)

    def add(self, f: RestrictFilter) -> "OrFilter":
        self.filters.append(f)
        return self

    def is_allowed(self, index: int) -> bool:
        if not self.filters:
            return True
        return any(f.is_allowed(index) for f in self.filters)

    def to_mask(self, n: int) -> np.ndarray:
        if not self.filters:
            return np.ones(n, dtype=bool)
        m = np.zeros(n, dtype=bool)
        for f in self.filters:
            m |= f.to_mask(n)
        return m


class NotFilter(RestrictFilter):
    """(reference: mod.rs:154-167)."""

    def __init__(self, inner: RestrictFilter):
        self.inner = inner

    def is_allowed(self, index: int) -> bool:
        return not self.inner.is_allowed(index)

    def to_mask(self, n: int) -> np.ndarray:
        return ~self.inner.to_mask(n)


class AllowlistFilter(RestrictFilter):
    """Filter backed by a RestrictAllowlist bitset."""

    def __init__(self, allowlist):
        self.allowlist = allowlist

    def is_allowed(self, index: int) -> bool:
        return self.allowlist.is_allowed(index)

    def to_mask(self, n: int) -> np.ndarray:
        return self.allowlist.to_mask(n)


class DenylistFilter(RestrictFilter):
    """Filter backed by a RestrictDenylist bitset."""

    def __init__(self, denylist):
        self.denylist = denylist

    def is_allowed(self, index: int) -> bool:
        return self.denylist.is_allowed(index)

    def to_mask(self, n: int) -> np.ndarray:
        return self.denylist.to_mask(n)
