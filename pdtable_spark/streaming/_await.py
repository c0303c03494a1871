"""Shared termination guard for the ``availableNow`` runners.

Every runner in this package starts an ``availableNow`` pass and blocks on
``awaitTermination(timeout)``.  Falling through on timeout is the silent
failure mode: the caller reads a partially-written output directory,
``finally`` blocks unpersist broadcast frames batches are still probing,
and a follow-up run on the same checkpoint starts a concurrent query
against in-use state.  This guard STOPS the query and raises instead —
the stop leaves the checkpoint consistent, so a re-run resumes at the
unprocessed files.
"""

from __future__ import annotations

from typing import Optional


def await_or_raise(q, timeout: Optional[int], what: str):
    """Block until ``q`` terminates; on timeout stop it and raise."""
    if timeout is None:
        q.awaitTermination()
        return q
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"{what}: availableNow run did not finish within {timeout}s — "
            "query stopped (checkpoint consistent; re-run resumes at the "
            "unprocessed files).  Raise timeout= for slow waves."
        )
    return q
