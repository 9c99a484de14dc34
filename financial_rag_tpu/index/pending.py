"""Dispatch/materialize split for index searches.

Through a tunneled TPU every host materialization is a full RPC round trip
(~30ms measured), and materializations do NOT overlap: two sequential
``np.array`` pulls cost two round trips even when both computations were
dispatched back-to-back. A query that sweeps two per-model indexes
therefore pays 4 round trips with the naive ``search()`` (2 pulls x 2
indexes, the round-2 87.7 QPS regime) but exactly ONE with this split:

    p1 = index_a.search_begin(q, k)       # dispatch only (sub-ms)
    p2 = index_b.search_begin(q, k)
    (ids_a, sc_a), (ids_b, sc_b) = collect(p1, p2)   # ONE device_get

``SearchPending.get()`` materializes a single pending standalone (still one
fused device_get for its scores+slots). ``collect`` fuses any number of
pendings across indexes into one transfer.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import numpy as np


class SearchPending:
    """A dispatched index search: ``refs`` is a pytree of device arrays
    (or host arrays for trivial/empty cases), ``finish`` maps the fetched
    host pytree to the final ``(ids, scores)``."""

    __slots__ = ("refs", "finish")

    def __init__(self, refs, finish: Callable):
        self.refs = refs
        self.finish = finish

    def get(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.finish(jax.device_get(self.refs))


def ready(ids: np.ndarray, scores: np.ndarray) -> SearchPending:
    """A pending whose result is already on host (empty index, host-side
    fallback index, ...)."""
    return SearchPending(None, lambda _: (ids, scores))


def collect(pendings: Sequence[SearchPending], extra=None):
    """Materialize many pendings with ONE device transfer.

    ``extra``: optional pytree of device arrays fetched in the SAME
    transfer (e.g. the query embeddings a chained encode produced, pulled
    for the host-side cache without a second RPC). When given, returns
    ``(results, extra_host)`` instead of just ``results``."""
    if extra is None:
        host = jax.device_get([p.refs for p in pendings])
        return [p.finish(h) for p, h in zip(pendings, host)]
    host, extra_host = jax.device_get(([p.refs for p in pendings], extra))
    return [p.finish(h) for p, h in zip(pendings, host)], extra_host
