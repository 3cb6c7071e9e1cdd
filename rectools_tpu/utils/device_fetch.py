"""Grouped device→host materialization for batched serving loops.

The serving loops dispatch every batch before the first sync
(dispatch-all-then-materialize), but a per-batch ``np.asarray`` still pays
one device→host transfer PER BATCH. ``materialize_batches`` concatenates
the pending per-batch device arrays ON DEVICE (cheap) and fetches one
array per (field, shape-group): at most a handful of transfers regardless
of batch count, which bounds the latency floor on high-round-trip
transports (throughput-wise the transfers are bandwidth-bound either way —
see PERF_r02.md's serving attribution). Batches are grouped by shape
because the tail batch is usually padded to a smaller size than the full
ones.
"""

import typing as tp

import jax.numpy as jnp
import numpy as np


def materialize_batches(
    pending: tp.Sequence[tp.Sequence[tp.Any]],
) -> tp.List[tp.Tuple[np.ndarray, ...]]:
    """Fetch a list of per-batch device-array tuples with grouped transfers.

    ``pending[i]`` is a tuple of device arrays for batch ``i`` (same arity
    across batches; shapes may differ between batches but must agree within
    a tuple's leading dimension). Returns numpy tuples in the same order.
    """
    if not pending:
        return []
    arity = len(pending[0])
    # group batch indices by the leading-dim shape signature
    groups: tp.Dict[tp.Tuple, tp.List[int]] = {}
    for i, handles in enumerate(pending):
        key = tuple(h.shape for h in handles)
        groups.setdefault(key, []).append(i)

    out: tp.List[tp.Optional[tp.Tuple[np.ndarray, ...]]] = [None] * len(pending)
    for key, members in groups.items():
        fields: tp.List[np.ndarray] = []
        for f in range(arity):
            cat = jnp.concatenate([pending[i][f] for i in members], axis=0)
            fields.append(np.asarray(cat))  # ONE transfer for the whole group
        rows_per = [key[0][0]] * len(members)
        offsets = np.cumsum([0] + rows_per)
        for slot, i in enumerate(members):
            out[i] = tuple(
                fields[f][offsets[slot] : offsets[slot + 1]] for f in range(arity)
            )
    return tp.cast(tp.List[tp.Tuple[np.ndarray, ...]], out)
