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


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The SAME running-totals contract as `running_user_stats`, on the
    Spark 4 transformWithStateInPandas API (the successor to
    applyInPandasWithState: typed state handles — ValueState here —
    plus timers and multiple state variables when an operator needs
    them). Output equality between the two stateful APIs on an
    identical stream is pinned in tests/test_streaming.py, so
    migrating an operator between the APIs is a proven no-op.

    The processor class is defined inside this function so cloudpickle
    ships it by value (executors don't have this package installed).
    RUNTIME GATE: the transformWithState state server speaks protobuf
    to the JVM; in containers without `google.protobuf` the query
    crashes at init — the parity test skips there (this container).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._state = handle.getValueState(
                "totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            got = self._state.get()
            n, total = got if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield _pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                 "total_value": [total]})

        def close(self):
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            RunningStats(),
            outputStructType="user_id long, n_events long, "
                             "total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )
