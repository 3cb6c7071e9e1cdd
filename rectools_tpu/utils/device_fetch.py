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

The on-device concatenation is a COPY of the group's outputs, so each
group is additionally capped at ``max_group_bytes`` (the copy then peaks at
that cap instead of doubling the whole sweep's output footprint — a long
recommend run can hold GBs of pending top-k arrays).
"""

import typing as tp

import jax.numpy as jnp
import numpy as np

# Per-fetch-group ceiling for the device-side concatenation copy. 256 MB
# amortizes the link round trip (multi-second transfer at tunnel bandwidths)
# while keeping the transient copy far from HBM capacity.
DEFAULT_MAX_GROUP_BYTES = 256 * 1024 * 1024


def _tuple_nbytes(handles: tp.Sequence[tp.Any]) -> int:
    return sum(int(np.prod(h.shape)) * h.dtype.itemsize for h in handles)


def _chunk_by_bytes(members: tp.List[int], per_member_bytes: int, cap: int) -> tp.List[tp.List[int]]:
    per_chunk = max(1, cap // max(1, per_member_bytes))
    return [members[i : i + per_chunk] for i in range(0, len(members), per_chunk)]


def materialize_batches(
    pending: tp.Sequence[tp.Sequence[tp.Any]],
    max_group_bytes: int = DEFAULT_MAX_GROUP_BYTES,
) -> tp.List[tp.Tuple[np.ndarray, ...]]:
    """Fetch a list of per-batch device-array tuples with grouped transfers.

    ``pending[i]`` is a tuple of device arrays for batch ``i`` (same arity
    across batches; shapes may differ between batches but must agree within
    a tuple's leading dimension). Returns numpy tuples in the same order.
    Each grouped transfer stages at most ``max_group_bytes`` on device.
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
        batch_bytes = _tuple_nbytes(pending[members[0]])
        for chunk in _chunk_by_bytes(members, batch_bytes, max_group_bytes):
            if len(chunk) == 1:
                out[chunk[0]] = tuple(np.asarray(h) for h in pending[chunk[0]])
                continue
            fields: tp.List[np.ndarray] = []
            for f in range(arity):
                cat = jnp.concatenate([pending[i][f] for i in chunk], axis=0)
                fields.append(np.asarray(cat))  # ONE transfer for the whole chunk
            rows = key[0][0]
            for slot, i in enumerate(chunk):
                out[i] = tuple(fields[f][slot * rows : (slot + 1) * rows] for f in range(arity))
    return tp.cast(tp.List[tp.Tuple[np.ndarray, ...]], out)
