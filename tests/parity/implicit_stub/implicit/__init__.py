"""Minimal numpy stand-in for the `implicit` package, written from scratch
against the API surface the reference library touches (see its
rank/rank_implicit.py and implicit_* wrappers). It exists so the REFERENCE
RecTools code can run head-to-head against rectools_tpu in parity tests —
exact brute-force top-k replaces the Cython/OpenMP kernel; the model solver
classes are import-time placeholders that raise if actually trained.

This is NOT a copy of implicit — only its public call signatures are
honored.
"""

from . import als, bpr, cpu, gpu, nearest_neighbours, utils  # noqa: F401
