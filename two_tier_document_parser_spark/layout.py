"""Layout-box geometry and recursive XY-cut reading order.

The reference's deep tier delegates reading-order resolution to
MinerU's layout models (reference accurate/service.py:66-117, consumed
page-by-page at :160-167). Our from-scratch analogue resolves reading
order over explicit layout boxes with the classic recursive X-Y cut
(Nagy & Seth 1984): split the region set at full-height vertical gaps
first (left→right — this yields column-major reading order for
multi-column layouts; a full-width header blocks any full-height
vertical gap, so it is still peeled off first by the fallback
horizontal cut), else at full-width horizontal gaps (top→bottom),
recurse; leaves fall back to (y0, x0, stream order).

Pure integer geometry — results are exact, so the oracle and the
vectorized engine share this module (allowed: SURVEY §7.7.4, all
compared values are strings/ints).

Box encoding (FIXTURES.md §1): a `box` span's text is
``"x0,y0,x1,y1,region_kind"`` with int coordinates and region_kind in
{text, table, figure, formula}.
"""

from __future__ import annotations

import functools
from typing import Sequence

REGION_KINDS = ("text", "table", "figure", "formula")


def parse_box(text: str) -> tuple[int, int, int, int, str]:
    """Decode a box span's text. Raises ValueError on malformed input
    (callers route such docs to the error channel, never crash the job
    — reference accurate/service.py:240-246 returns an error dict)."""
    x0, y0, x1, y1, kind = text.split(",")
    return int(x0), int(y0), int(x1), int(y1), kind


def _split_by_gaps(
    order: list[int], boxes: Sequence[tuple[int, int, int, int]], axis: int
) -> list[list[int]]:
    """Partition region indices at strictly-positive gaps in the
    projection of their boxes onto `axis` (0=x, 1=y). Returns groups
    ordered by coordinate; a single group means no gap."""
    lo, hi = (0, 2) if axis == 0 else (1, 3)
    idx = sorted(order, key=lambda i: (boxes[i][lo], boxes[i][hi], i))
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_end = None
    for i in idx:
        s, e = boxes[i][lo], boxes[i][hi]
        if cur_end is None or s < cur_end:  # overlap or touch-with-overlap
            cur.append(i)
            cur_end = e if cur_end is None else max(cur_end, e)
        elif s == cur_end:  # touching intervals: no strictly-positive gap
            cur.append(i)
            cur_end = max(cur_end, e)
        else:
            groups.append(cur)
            cur = [i]
            cur_end = e
    if cur:
        groups.append(cur)
    return groups


def xycut(boxes: Sequence[tuple[int, int, int, int]]) -> list[int]:
    """Return indices of `boxes` in XY-cut reading order.

    Deterministic: ties and non-separable clusters order by
    (y0, x0, input index). Memoized per box configuration: page
    layouts repeat heavily in real corpora (most documents use a
    handful of layout templates), and the cut is a pure function of
    the geometry — profiling showed the recursive cut dominating the
    tier-2 kernel before the cache.
    """
    return list(_xycut_cached(tuple(map(tuple, boxes))))


@functools.lru_cache(maxsize=8192)
def _xycut_cached(boxes: tuple) -> tuple:
    def rec(order: list[int]) -> list[int]:
        if len(order) <= 1:
            return order
        # vertical cuts (x-gaps) first -> column-major reading order
        groups = _split_by_gaps(order, boxes, 0)
        if len(groups) > 1:
            out: list[int] = []
            for g in groups:
                out.extend(rec(g))
            return out
        # no full-height x-gap: peel only the TOPMOST y-gap and re-try
        # the x-cut on the remainder, so a full-width header does not
        # force row-major interleaving of the columns below it
        groups = _split_by_gaps(order, boxes, 1)
        if len(groups) > 1:
            rest = [i for g in groups[1:] for i in g]
            return rec(groups[0]) + rec(rest)
        return sorted(order, key=lambda i: (boxes[i][1], boxes[i][0], i))

    return tuple(rec(list(range(len(boxes)))))
