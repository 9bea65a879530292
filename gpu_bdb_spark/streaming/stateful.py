"""Custom stateful streaming operators via applyInPandasWithState
(the arbitrary-state API the brief calls out for operators Spark's
built-ins can't express).

The closure is self-contained (ships by value; executors don't need this
package on PYTHONPATH — same rule as operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running totals maintained as explicit group state.

    Emits one row per user per micro-batch with cumulative event count and
    cumulative value sum — the minimal template for custom session/feature
    state at scale (state is per-key, partitioned by user, spilled by the
    state store; no global coordination).

    Works only on a streaming DataFrame (batch has no state store); batch
    equivalence is groupBy(user).agg(count, sum) over the full input,
    asserted in tests/test_streaming.py.
    """

    def update(key, pdfs, state):
        import pandas as _pd

        n, total = state.get() if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
