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


def streaming_gapfill_locf(events: DataFrame, step_s: int = 3600) -> DataFrame:
    """Streaming twin of `operators.temporal.gapfill_locf`: as events
    arrive, emit every `step_s` bucket between consecutive observations
    per user, carrying the last value forward — the state is just
    (last_bucket, last_value) per key, so the operator holds O(keys)
    state regardless of stream length (no buffered events, no
    watermark-bounded join).

    Events inside a micro-batch are processed in (ts, event_id) order;
    each bucket's representative is the max-(ts, event_id) event, so on
    a drained stream the emitted rows are EXACTLY the batch operator's
    output (pinned in tests/test_streaming.py — the strongest
    batch≡stream contract: equality, not approximation).
    """

    step_us = int(step_s) * 1_000_000

    def update(key, pdfs, state):
        import pandas as _pd

        rows = []
        last_bucket, last_value = (
            state.get() if state.exists else (None, None))
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, eid, v in zip(pdf["ts"], pdf["event_id"],
                                  pdf["value"]):
                us = int(_pd.Timestamp(ts).value // 1000)
                b = us // step_us
                v = None if _pd.isna(v) else float(v)
                if last_bucket is None:
                    rows.append((key[0], b, v, 0))
                elif b == last_bucket:
                    # same bucket: later (ts, event_id) wins. When the
                    # bucket started in a PRIOR micro-batch the old row
                    # is already emitted (append mode can't retract) —
                    # emit the update; downstream keeps the latest per
                    # (user, bucket). Within one batch it's a rewrite.
                    if rows:
                        rows[-1] = (key[0], b, v, 0)
                    else:
                        rows.append((key[0], b, v, 0))
                else:
                    for gap in range(last_bucket + 1, b):
                        rows.append((key[0], gap, last_value, 1))
                    rows.append((key[0], b, v, 0))
                last_bucket, last_value = b, v
        state.update((last_bucket, last_value))
        yield _pd.DataFrame(
            rows, columns=["user_id", "bucket", "value", "is_gap"])

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, bucket long, value double, "
                             "is_gap int",
            stateStructType="last_bucket long, last_value double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_transitions(events: DataFrame) -> DataFrame:
    """Streaming twin of operators/behavior.transition_matrix: per-user
    event-type transition counts maintained incrementally with O(1)
    state per key — only the (ts, event_id, type) of the LAST seen
    event survives between micro-batches, never a buffer of events.

    Each micro-batch sorts its rows per user by (ts, event_id), chains
    them onto the carried last event, and emits that batch's
    (user_id, from_type, to_type, n) increments in append mode.
    Summing the emitted increments over a drained stream equals the
    batch operator's per-user transition counts exactly (pinned in
    tests/test_streaming.py). Caveat (same contract as
    streaming_gapfill_locf): micro-batches must arrive in
    non-decreasing event-time order per user — true for replay/tailing
    sources; out-of-order arrival needs the watermarking twin.
    """

    def update(key, pdfs, state):
        import pandas as _pd

        frames = [p for p in pdfs if len(p)]
        last = state.get() if state.exists else None
        if not frames:
            if last is None:
                return
            state.update(last)
            return
        pdf = _pd.concat(frames).sort_values(["ts", "event_id"])
        types = list(pdf["event_type"])
        chain = ([last[2]] if last is not None else []) + types
        counts = {}
        for a, b in zip(chain, chain[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        tail = pdf.iloc[-1]
        state.update((int(tail["ts"].value), int(tail["event_id"]),
                      str(tail["event_type"])))
        if counts:
            ks = sorted(counts)
            yield _pd.DataFrame({
                "user_id": [key[0]] * len(ks),
                "from_type": [a for a, _ in ks],
                "to_type": [b for _, b in ks],
                "n": [counts[k] for k in ks],
            })

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, from_type string, to_type string, n long"),
            stateStructType="ts long, event_id long, t string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
