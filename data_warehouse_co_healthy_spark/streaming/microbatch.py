"""Shared micro-batch assembly for stateful Arrow updaters.

``applyInPandasWithState`` hands each key's micro-batch to the update
function as an ITERATOR of Arrow record batches whose boundaries (and
shuffle-block arrival order) are nondeterministic under load. Any
updater whose recursion is order-sensitive must therefore concatenate
the whole batch and sort ONCE — sorting per chunk leaves the recursion
order at the mercy of chunk boundaries (the root cause of a
load-dependent round-5 flake). This helper is that invariant, made
reusable so the next stateful operator cannot reintroduce the bug.
"""

from __future__ import annotations


def whole_batch(pdfs, sort_by=None):
    """Concatenate every non-empty Arrow chunk of a key's micro-batch;
    optionally sort the WHOLE batch by ``sort_by``. Returns None when
    the batch is empty (state should still be written back)."""
    import pandas as pd  # noqa: PLC0415 - executor-side import

    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None
    pdf = pd.concat(chunks, ignore_index=True)
    return pdf.sort_values(sort_by) if sort_by else pdf
