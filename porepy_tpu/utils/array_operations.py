"""Array set-operations (reference ``utils/array_operations.py``).

Host-side numpy kernels used by meshing/bookkeeping code.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ismember_columns",
    "expand_index_pointers",
    "expand_indices_nd",
]


def ismember_columns(
    a: np.ndarray, b: np.ndarray, sort: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Column-wise membership of ``a`` in ``b``.

    Treats each column as a tuple (1d arrays are treated element-wise).

    Parameters:
        a: ``(m, na)`` or ``(na,)`` query columns.
        b: ``(m, nb)`` or ``(nb,)`` reference columns.
        sort: Sort entries within columns before comparison (set False if
            already sorted / order significant).

    Returns:
        ``(is_mem, index)`` where ``is_mem[i]`` is True if column i of ``a``
        occurs in ``b``, and ``index`` holds, for each member column of
        ``a``, the index of the (first) matching column in ``b``.
    """
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    if sort and a.shape[0] > 1:
        a = np.sort(a, axis=0)
        b = np.sort(b, axis=0)

    def encode(x):
        return np.ascontiguousarray(x.T).view(
            np.dtype((np.void, x.dtype.itemsize * x.shape[0]))
        ).ravel()

    if a.dtype != b.dtype:
        common = np.promote_types(a.dtype, b.dtype)
        a = a.astype(common)
        b = b.astype(common)
    ea = encode(a)
    eb = encode(b)
    b_sorter = np.argsort(eb, kind="stable")
    pos = np.searchsorted(eb, ea, sorter=b_sorter)
    pos_clipped = np.clip(pos, 0, eb.size - 1)
    found = eb[b_sorter[pos_clipped]] == ea
    index = b_sorter[pos_clipped][found]
    return found, index


def expand_index_pointers(start: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Concatenate ``[arange(s, e) for s, e in zip(start, end)]`` without a
    Python loop (reference ``array_operations.expand_index_pointers``)."""
    start = np.asarray(start, dtype=int)
    end = np.asarray(end, dtype=int)
    counts = end - start
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=int)
    seg = np.repeat(np.arange(counts.size), counts)
    seg_begin = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offsets = np.arange(total) - seg_begin[seg]
    return start[seg] + offsets


def expand_indices_nd(ind: np.ndarray, nd: int, direction: str = "F") -> np.ndarray:
    """Expand entity indices to ``nd`` dofs per entity:
    ``[i*nd, ..., i*nd + nd - 1]`` per index (F-ordering per entity)."""
    ind = np.asarray(ind, dtype=int)
    if direction == "F":
        return (ind[:, None] * nd + np.arange(nd)).ravel()
    return (ind[None, :] * nd + np.arange(nd)[:, None]).ravel()
