"""Faithful re-implementation of libstdc++'s std::sort (introsort).

Several reference comparators are not total orders (e.g. mate-adjacency
edges tie on matchCnt, assigned reads tie on id), so the *unstable* order
produced by libstdc++'s introsort is part of the reference's observable
output.  This mirrors bits/stl_algo.h: median-of-three quicksort to a depth
limit of 2*floor(log2(n)), heapsort fallback, and a final insertion sort,
with the exact 16-element threshold.

Use `cxx_sort(lst, comp)` wherever the reference calls std::sort with a
comparator whose ties matter.
"""

from __future__ import annotations

from typing import Callable, List, TypeVar

T = TypeVar("T")

_THRESHOLD = 16


def _lg(n: int) -> int:
    return n.bit_length() - 1


def _insertion_sort(a: List[T], first: int, last: int, comp) -> None:
    if first == last:
        return
    for i in range(first + 1, last):
        val = a[i]
        if comp(val, a[first]):
            # move_backward
            j = i
            while j > first:
                a[j] = a[j - 1]
                j -= 1
            a[first] = val
        else:
            j = i
            while comp(val, a[j - 1]):
                a[j] = a[j - 1]
                j -= 1
            a[j] = val


def _unguarded_insertion_sort(a: List[T], first: int, last: int, comp) -> None:
    for i in range(first, last):
        val = a[i]
        j = i
        while comp(val, a[j - 1]):
            a[j] = a[j - 1]
            j -= 1
        a[j] = val


def _move_median_to_first(a, result, x, y, z, comp) -> None:
    if comp(a[x], a[y]):
        if comp(a[y], a[z]):
            a[result], a[y] = a[y], a[result]
        elif comp(a[x], a[z]):
            a[result], a[z] = a[z], a[result]
        else:
            a[result], a[x] = a[x], a[result]
    elif comp(a[x], a[z]):
        a[result], a[x] = a[x], a[result]
    elif comp(a[y], a[z]):
        a[result], a[z] = a[z], a[result]
    else:
        a[result], a[y] = a[y], a[result]


def _unguarded_partition(a, first, last, pivot, comp) -> int:
    while True:
        while comp(a[first], a[pivot]):
            first += 1
        last -= 1
        while comp(a[pivot], a[last]):
            last -= 1
        if first >= last:
            return first
        a[first], a[last] = a[last], a[first]
        first += 1


def _unguarded_partition_pivot(a, first, last, comp) -> int:
    mid = first + (last - first) // 2
    _move_median_to_first(a, first, first + 1, mid, last - 1, comp)
    return _unguarded_partition(a, first + 1, last, first, comp)


def _push_heap(a, first, hole, top, value, comp) -> None:
    # bits/stl_heap.h __push_heap
    parent = (hole - 1) // 2
    while hole > top and comp(a[first + parent], value):
        a[first + hole] = a[first + parent]
        hole = parent
        parent = (hole - 1) // 2
    a[first + hole] = value


def _adjust_heap(a, first, hole, length, value, comp) -> None:
    # bits/stl_heap.h __adjust_heap
    top = hole
    second = hole
    while second < (length - 1) // 2:
        second = 2 * (second + 1)
        if comp(a[first + second], a[first + second - 1]):
            second -= 1
        a[first + hole] = a[first + second]
        hole = second
    if length % 2 == 0 and second == (length - 2) // 2:
        second = 2 * (second + 1)
        a[first + hole] = a[first + second - 1]
        hole = second - 1
    _push_heap(a, first, hole, top, value, comp)


def _heap_select_and_sort(a, first, last, comp) -> None:
    """__partial_sort(first, last, last): make_heap + sort_heap — the depth-
    limit fallback is effectively a full libstdc++ heapsort."""
    length = last - first
    if length >= 2:
        # __make_heap
        parent = (length - 2) // 2
        while True:
            value = a[first + parent]
            _adjust_heap(a, first, parent, length, value, comp)
            if parent == 0:
                break
            parent -= 1
    # __sort_heap
    while last - first > 1:
        last -= 1
        value = a[last]
        a[last] = a[first]
        _adjust_heap(a, first, 0, last - first, value, comp)


def _introsort_loop(a, first, last, depth_limit, comp) -> None:
    while last - first > _THRESHOLD:
        if depth_limit == 0:
            _heap_select_and_sort(a, first, last, comp)
            return
        depth_limit -= 1
        cut = _unguarded_partition_pivot(a, first, last, comp)
        _introsort_loop(a, cut, last, depth_limit, comp)
        last = cut


def cxx_sort(a: List[T], comp: Callable[[T, T], bool]) -> None:
    """In-place std::sort(a.begin(), a.end(), comp) with libstdc++ semantics."""
    n = len(a)
    if n <= 1:
        return
    _introsort_loop(a, 0, n, 2 * _lg(n), comp)
    if n > _THRESHOLD:
        _insertion_sort(a, 0, _THRESHOLD, comp)
        _unguarded_insertion_sort(a, _THRESHOLD, n, comp)
    else:
        _insertion_sort(a, 0, n, comp)


def cxx_sort_range(a: List[T], first: int, last: int, comp) -> None:
    """std::sort over the subrange [first, last)."""
    n = last - first
    if n <= 1:
        return
    _introsort_loop(a, first, last, 2 * _lg(n), comp)
    if n > _THRESHOLD:
        _insertion_sort(a, first, first + _THRESHOLD, comp)
        _unguarded_insertion_sort(a, first + _THRESHOLD, last, comp)
    else:
        _insertion_sort(a, first, last, comp)
