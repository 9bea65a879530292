"""Custom stateful streaming operators via applyInPandasWithState
(the arbitrary-state API the brief calls out for operators Spark's
built-ins can't express).

The closure is self-contained (ships by value; executors don't need this
package on PYTHONPATH — same rule as operators/multimodal.py).

DEPLOYMENT NOTES (measured at 100k keys × 50 micro-batches,
probe_streaming_state.py):

* The state-store partition count is `spark.sql.shuffle.partitions`
  at the FIRST micro-batch and is frozen into the checkpoint —
  stateful stages are AQE-exempt, so a default-200 session pays 200
  python-worker roundtrips per micro-batch forever (measured
  ~35 s/batch at 200 partitions vs ~25 s at 32 for the same 60k-row
  batches). Size it to the cluster BEFORE the first run.
* Per-batch wall is dominated by PER-KEY pandas cost — update() runs
  once per key PRESENT in the batch (~45k keys → ~25 s/batch), and is
  FLAT over the stream (early/late ratio 0.99): total state size does
  not leak into batch latency, so long-running streams are safe. The
  keys-present-per-batch count, not events/batch, is the capacity
  number to size against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def _sized_group(df: DataFrame, *keys):
    """groupBy for a stateful stage, sizing the state-store partition
    count BEFORE the plan is built (r10 verdict item 5).

    The stateful stage freezes its partition count from
    spark.sql.shuffle.partitions at the FIRST micro-batch (AQE-exempt,
    baked into the checkpoint); a session left at Spark's untouched 200
    default pays ~200 python-worker roundtrips per micro-batch forever
    (~35 s/batch vs ~25 s at 32 partitions for identical 60k-row
    batches — the r15 probe). When the session still carries the "200"
    default, derive the count from the machine: max(8, 2 × cores),
    cores from $SPARK_GRAFT_CPUS (the driver contract's core knob) or
    the context's defaultParallelism — scale-adaptive, not a constant.
    ANY other configured value is respected (production sizes the state
    store explicitly; an explicit 200 is indistinguishable from the
    default — set 201 if ~200 state partitions is truly intended).
    """
    import os

    try:
        spark = df.sparkSession
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
            if cores <= 0:
                cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(max(8, 2 * cores)))
    except Exception:
        pass  # sizing must never break an op build
    return df.groupBy(*keys)


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

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        _sized_group(events, "user_id")
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
        _sized_group(events, "user_id")
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
            state.get if state.exists else (None, None))
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
        _sized_group(events, "user_id")
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
        last = state.get if state.exists else None
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
        _sized_group(events, "user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, from_type string, to_type string, n long"),
            stateStructType="ts long, event_id long, t string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_time_weighted(events: DataFrame) -> DataFrame:
    """Streaming twin of `operators.temporal.time_weighted_avg`: per-user
    LOCF time-weight SUFFICIENT STATISTICS maintained with O(1) state
    per key — only (last ts, last id, last value) plus three running
    counters survive between micro-batches, never an event buffer.

    Exactness across the Python/JVM boundary: the value is quantized to
    6 decimals exactly as Spark's double→decimal(18,6) cast does
    (shortest-repr string → HALF_UP, the Cast semantics), and the
    weighted numerator accumulates as an arbitrary-precision integer in
    1e-6 units (Python int — never a float), carried in state as a
    string because int64 would overflow at wide spans. A drained stream
    therefore reproduces the batch operator's decimal numerator EXACTLY;
    applying the batch finishing expression (decimal ÷ 1e6 → double
    division → round 6) to the final emitted row per key equals
    `time_weighted_avg` output bit-for-bit (pinned in
    tests/test_streaming.py).

    Emits the RUNNING (n_intervals, span_us, wsum_e6) per key per
    micro-batch in update mode; downstream keeps the latest per key.
    Same ordering contract as the other stateful twins: micro-batches
    arrive in non-decreasing event-time order per key.
    """

    def update(key, pdfs, state):
        import decimal as _dec

        import pandas as _pd

        if state.exists:
            last_ts, last_eid, last_v6, n, den, num_s = state.get
            num = int(num_s)
        else:
            last_ts = last_eid = last_v6 = None
            n = den = num = 0
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = _pd.concat(frames).sort_values(["ts", "event_id"])
            for ts, eid, v in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
                us = int(_pd.Timestamp(ts).value // 1000)
                if _pd.isna(v):
                    v6 = None
                else:
                    # Spark Cast(double→decimal(18,6)): shortest repr,
                    # then HALF_UP at scale 6
                    v6 = int(_dec.Decimal(repr(float(v))).quantize(
                        _dec.Decimal("1e-6"),
                        rounding=_dec.ROUND_HALF_UP).scaleb(6))
                if last_ts is not None:
                    dt = us - last_ts
                    n += 1
                    den += dt
                    if last_v6 is not None:
                        num += last_v6 * dt
                last_ts, last_eid, last_v6 = us, int(eid), v6
        state.update((last_ts, last_eid, last_v6, n, den, str(num)))
        yield _pd.DataFrame({
            "key": [key[0]], "n_intervals": [n], "span_us": [den],
            "wsum_e6": [str(num)],
        })

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        _sized_group(events, "user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "key long, n_intervals long, span_us long, wsum_e6 string"),
            stateStructType=("last_ts long, last_eid long, last_v6 long, "
                             "n long, den long, num string"),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_session_paths(
    events: DataFrame,
    timeout_s: int = 3600,
    depth: int = 3,
) -> DataFrame:
    """Streaming twin of `operators.sessionize.session_paths`: per-user
    O(1) state — the OPEN session's (last event time, first ≤ depth
    event types) — emitting a (path, depth, n=1-aggregated) increment
    whenever a timeout gap CLOSES a session.

    Contract (append mode cannot retract): only COMPLETED sessions are
    emitted; each user's still-open tail session stays in state. On a
    drained stream the summed increments equal the batch operator run
    over the input MINUS each user's final session (pinned in
    tests/test_streaming.py). Same ordering contract as the other
    stateful twins: micro-batches arrive in non-decreasing event-time
    order per user.
    """

    timeout_us = int(timeout_s) * 1_000_000

    def update(key, pdfs, state):
        import pandas as _pd

        if state.exists:
            last_ts, d, path = state.get
        else:
            last_ts, d, path = None, 0, ""
        counts = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, t in zip(pdf["ts"], pdf["event_type"]):
                us = int(_pd.Timestamp(ts).value // 1000)
                if last_ts is None:
                    d, path = 1, ("" if t is None else str(t))
                elif us - last_ts > timeout_us:
                    k = (path, d)
                    counts[k] = counts.get(k, 0) + 1
                    d, path = 1, ("" if t is None else str(t))
                elif d < depth:
                    # array_join semantics: null types contribute no
                    # segment (and no separator) in the batch operator
                    if t is not None:
                        path = f"{path}>{t}" if path else str(t)
                    d += 1
                else:
                    pass  # session continues past the recorded prefix
                last_ts = us
        state.update((last_ts, d, path))
        if counts:
            ks = sorted(counts)
            yield _pd.DataFrame({
                "path": [p for p, _ in ks],
                "depth": [dd for _, dd in ks],
                "n_sessions": [counts[k] for k in ks],
            })

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        _sized_group(events, "user_id")
        .applyInPandasWithState(
            update,
            outputStructType="path string, depth int, n_sessions long",
            stateStructType="last_ts long, d int, path string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_expanding_zscore(events: DataFrame) -> DataFrame:
    """Streaming twin of the `expanding_zscore` entry: per-event
    anomaly score against the user's ENTIRE prior stream, with O(1)
    state — (n, Σx, Σx²) as exact integers in 1e-6 / 1e-12 units,
    carried as strings (Σx² overflows int64 fast). Each incoming event
    is scored from the state BEFORE it, then folded in; values are
    quantized with Spark's double→decimal(18,6) cast semantics
    (shortest repr, HALF_UP), and the finishing mean/var/z runs the
    SAME fixed IEEE-double expression order as the batch operator —
    Python and JVM doubles are both correctly-rounded IEEE 754, so a
    drained stream equals the batch entry bit-for-bit after the shared
    ROUND(z, 6) (pinned in tests/test_streaming.py; rounding itself is
    applied Spark-side in both pipelines because Python's round is
    HALF_EVEN while Spark's is HALF_UP).
    """

    def update(key, pdfs, state):
        import decimal as _dec
        import math as _math

        import pandas as _pd

        if state.exists:
            n, sx_s, sxx_s = state.get
            sx_i, sxx_i = int(sx_s), int(sxx_s)
        else:
            n, sx_i, sxx_i = 0, 0, 0
        out_eid, out_n, out_z = [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                z = None
                if not _pd.isna(v) and n >= 2:
                    sx = float(_dec.Decimal(sx_i).scaleb(-6))
                    sxx = float(_dec.Decimal(sxx_i).scaleb(-12))
                    nd = float(n)
                    var = (sxx - sx * sx / nd) / float(n - 1)
                    if var > 0:
                        z = (float(v) - sx / nd) / _math.sqrt(var)
                out_eid.append(int(eid))
                out_n.append(n)
                out_z.append(z)
                if not _pd.isna(v):
                    v6 = int(_dec.Decimal(repr(float(v))).quantize(
                        _dec.Decimal("1e-6"),
                        rounding=_dec.ROUND_HALF_UP).scaleb(6))
                    n += 1
                    sx_i += v6
                    sxx_i += v6 * v6
        state.update((n, str(sx_i), str(sxx_i)))
        if out_eid:
            yield _pd.DataFrame({
                "event_id": out_eid,
                "key": [key[0]] * len(out_eid),
                "n_prev": out_n,
                "zraw": _pd.array(out_z, dtype="float64"),
            })

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        _sized_group(events, "user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "event_id long, key long, n_prev long, zraw double"),
            stateStructType="n long, sx string, sxx string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_conversion_lag(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
) -> DataFrame:
    """Streaming twin of `operators.behavior.conversion_lag`'s per-user
    stage: first-`from_type` timestamp and first `to_type` strictly
    after it, maintained as TWO LONGS of state per user (-1 = unseen) —
    O(keys) state regardless of stream length.

    Emits the running (u, f_us, lag_us) per user per micro-batch in
    update mode; downstream keeps the latest row per user and applies
    `conversion_lag_rollup` — on a drained stream that equals the batch
    operator bit-for-bit (pinned in tests/test_streaming.py; lag stays
    an INTEGER micros difference end-to-end — the rollup owns all
    floating-point). Same ordering contract as the other stateful twins:
    micro-batches arrive in non-decreasing event-time order per user (a
    `to_type` event never precedes the `from_type` that converts it
    across batch boundaries; within a batch order is irrelevant).
    """

    def update(key, pdfs, state):
        import pandas as _pd

        f_us, conv_us = state.get if state.exists else (-1, -1)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.dropna(subset=["ts"])
            us = (_pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
                  .astype("int64") // 1000)
            types = pdf["event_type"]
            vmask = types == from_type
            if vmask.any():
                mv = int(us[vmask].min())
                f_us = mv if f_us < 0 else min(f_us, mv)
            if f_us >= 0:
                pmask = (types == to_type) & (us > f_us)
                if pmask.any():
                    mp = int(us[pmask].min())
                    conv_us = mp if conv_us < 0 else min(conv_us, mp)
        state.update((f_us, conv_us))
        if f_us >= 0:
            lag = (conv_us - f_us) if conv_us >= 0 else None
            yield _pd.DataFrame(
                {"u": [key[0]], "f_us": [f_us],
                 "lag_us": _pd.array([lag], dtype="Int64")})

    return (
        _sized_group(events, "user_id")
        .applyInPandasWithState(
            update,
            outputStructType="u long, f_us long, lag_us long",
            stateStructType="f_us long, conv long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_new_vs_returning(
    events: DataFrame,
    period_us: int = 86_400 * 1_000_000,
) -> DataFrame:
    """Streaming twin of `operators.behavior.new_vs_returning`'s flagged
    stage: per user, emit each active period EXACTLY ONCE with its
    new/returning flag. State is two longs per user (first and last
    emitted period); a period is emitted iff greater than the last —
    exactly-once increments under the non-decreasing event-time
    contract, so APPEND mode composes (nothing is ever retracted).

    Drained increments → `new_vs_returning_rollup` equals the batch
    operator bit-for-bit (pinned in tests/test_streaming.py).
    """
    step = int(period_us)

    def update(key, pdfs, state):
        import pandas as _pd

        first_p, last_p = state.get if state.exists else (-1, -1)
        fresh = set()
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.dropna(subset=["ts"])
            us = (_pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
                  .astype("int64") // 1000)
            for p in (us // step).unique():
                p = int(p)
                if last_p < 0 or p > last_p:
                    fresh.add(p)
        if fresh:
            ps = sorted(fresh)
            if first_p < 0:
                first_p = ps[0]
            last_p = max(last_p, ps[-1])
            state.update((first_p, last_p))
            yield _pd.DataFrame({
                "user_id": [key[0]] * len(ps),
                "period": ps,
                "is_new": [p == first_p for p in ps],
            })
        else:
            state.update((first_p, last_p))

    return (
        _sized_group(events, "user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, period long, is_new boolean",
            stateStructType="first_p long, last_p long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_rfm_state(orders: DataFrame) -> DataFrame:
    """Streaming twin of `operators.behavior.rfm_segments`' per-customer
    aggregate: (last_order_us, frequency, exact decimal monetary)
    maintained incrementally. Monetary accumulates as a Python Decimal
    quantized per value exactly as Spark's double→decimal(12,4) cast
    (shortest repr, HALF_UP — `gpu_bdb_spark.functions.dec`) and is
    carried/emitted as a STRING so no float ever enters the sum; the
    scoring tail (`rfm_score`: the three ntile windows) runs as a batch
    finishing step over the drained frame — ntile is a global total
    order, inherently not incremental, and the per-customer frame it
    needs is exactly what this operator maintains.

    Emits the running (cust, last_order_us, frequency, mon) per
    customer per micro-batch in update mode; downstream keeps the
    latest row per customer. Drained + rfm_score ≡ batch bit-for-bit
    (pinned in tests/test_streaming.py).
    """

    def update(key, pdfs, state):
        import decimal as _dec

        import pandas as _pd

        last_us, freq, mon = (state.get if state.exists
                              else (-1, 0, "0.0000"))
        total = _dec.Decimal(mon)
        q4 = _dec.Decimal("1e-4")
        for pdf in pdfs:
            if not len(pdf):
                continue
            for d, v in zip(pdf["o_orderdate"], pdf["o_totalprice"]):
                # DATE arrives as date or Timestamp depending on the
                # Arrow conversion; Timestamp() normalizes both to
                # midnight (the forced-UTC batch cast semantics)
                us = int(_pd.Timestamp(d).value // 1000)
                last_us = max(last_us, us)
                freq += 1
                # Spark Cast(double→decimal(12,4)): shortest repr,
                # then HALF_UP at scale 4 (functions.dec)
                total += _dec.Decimal(repr(float(v))).quantize(
                    q4, rounding=_dec.ROUND_HALF_UP)
        state.update((last_us, freq, str(total)))
        yield _pd.DataFrame({
            "cust": [key[0]], "last_order_us": [last_us],
            "frequency": [freq], "mon": [str(total)],
        })

    return (
        _sized_group(orders, "o_custkey")
        .applyInPandasWithState(
            update,
            outputStructType="cust long, last_order_us long, "
                             "frequency long, mon string",
            stateStructType="last_us long, freq long, mon string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_m4(events: DataFrame, bucket_us: int = 3_600_000_000
                 ) -> DataFrame:
    """Streaming twin of `temporal_ops.m4_downsample`: per
    (user, bucket) first/last/min/max maintained as MERGEABLE state —
    M4's four statistics merge associatively (min of mins, max of
    maxes, first/last by the shared zero-padded order key), so
    arbitrary micro-batch slicing reproduces the batch aggregate
    EXACTLY, with no ordering contract needed at all (unlike the
    sequence-dependent twins). State per key: the four values + two
    order keys; emitted per touched bucket per micro-batch in update
    mode — downstream keeps the latest row per (user, bucket).

    Drained ≡ batch bit-for-bit is pinned in tests/test_streaming.py
    (values are picked, never computed, so equality is structural).
    """

    def update(key, pdfs, state):
        import pandas as _pd

        st = state.get if state.exists else (0, None, None, "", "",
                                             None, None)
        n, v_first, v_last, k_first, k_last, v_min, v_max = st
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.dropna(subset=["ts", "value"])
            if not len(pdf):
                continue
            us = (_pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
                  .astype("int64") // 1000)
            for u, eid, v in zip(us, pdf["event_id"], pdf["value"]):
                ordk = f"{u:020d}:{int(eid):012d}"
                v = float(v)
                n += 1
                if not k_first or ordk < k_first:
                    k_first, v_first = ordk, v
                if not k_last or ordk > k_last:
                    k_last, v_last = ordk, v
                v_min = v if v_min is None else min(v_min, v)
                v_max = v if v_max is None else max(v_max, v)
        state.update((n, v_first, v_last, k_first, k_last, v_min, v_max))
        if n:
            yield _pd.DataFrame({
                "user_id": [key[0]], "bucket": [key[1]], "n": [n],
                "v_first": [v_first], "v_last": [v_last],
                "v_min": [v_min], "v_max": [v_max],
            })

    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "bucket",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(int(bucket_us))).cast("long"))
    return (
        _sized_group(keyed, "user_id", "bucket")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, bucket long, n long, "
                             "v_first double, v_last double, "
                             "v_min double, v_max double",
            stateStructType="n long, v_first double, v_last double, "
                            "k_first string, k_last string, "
                            "v_min double, v_max double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ewma(
    rows: DataFrame,
    key_col: str = "y",
    seq_col: str = "day",
    val_col: str = "rev",
    alpha: str = "0.2",
) -> DataFrame:
    """Streaming twin of `temporal_ops.ewma_daily_revenue`: one EWMA
    chain per key with the running value carried as an EXACT DECIMAL
    STRING in state (the streaming_time_weighted discipline — no float
    ever enters the recursion, so drained ≡ batch bit-for-bit). State
    per key is (last_seq, e); within a micro-batch rows process in
    seq order; the usual non-decreasing cross-batch contract applies.
    Emits every (key, seq, val, ewma) row in append mode."""

    a_str = alpha

    def update(key, pdfs, state):
        import decimal as _dec

        import pandas as _pd

        _dec.getcontext().prec = 50  # chain values never context-round
        q9 = _dec.Decimal("1e-9")
        q6 = _dec.Decimal("1e-6")  # output scale; chain carries 9
        a = _dec.Decimal(a_str)
        b = _dec.Decimal(1) - a
        last_seq, e_s = state.get if state.exists else (-1 << 62, "")
        e = _dec.Decimal(e_s) if e_s else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(seq_col)
            out_seq, out_val, out_e = [], [], []
            for s_, v in zip(pdf[seq_col], pdf[val_col]):
                x = _dec.Decimal(v)
                e = x if e is None else (a * x + b * e).quantize(
                    q9, rounding=_dec.ROUND_HALF_UP)
                last_seq = int(s_)
                out_seq.append(int(s_))
                out_val.append(float(x))
                out_e.append(float(e.quantize(
                    q6, rounding=_dec.ROUND_HALF_UP)))
            yield _pd.DataFrame({
                "y": [key[0]] * len(out_seq), "day": out_seq,
                "rev": out_val, "ewma": out_e,
            })
        state.update((last_seq, str(e) if e is not None else ""))

    return (
        _sized_group(rows, key_col)
        .applyInPandasWithState(
            update,
            outputStructType="y long, day long, rev double, ewma double",
            stateStructType="last_seq long, e string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_cusum(
    rows: DataFrame,
    mu: float,
    seq_col: str = "day",
    val_col: str = "rev",
    k_frac: float = 0.1,
    h_mult: float = 3.0,
) -> DataFrame:
    """Streaming twin of `temporal_ops.cusum_changepoint`: the one-sided
    CUSUM chart S_t = max(0, r2(S_{t-1} + x_t − μ − k·μ)) run as a
    single stateful chain over the (already collapsed) daily frame. μ is
    a PARAMETER here — the monitored target mean, known upfront in a
    production chart — where the batch entry derives it from the full
    frame; the twin test feeds the batch-derived μ so drained ≡ batch is
    bit-for-bit. State is (last_seq, repr(S)): S is always the output of
    an r2 quantization (2-decimal float), so the repr string round-trips
    losslessly — the streaming_time_weighted exact-string-state
    discipline. Each step is the IDENTICAL fixed-order float expression
    as the batch chain (same r2 = shortest-repr decimal HALF_UP), so no
    quantization drift can accumulate across micro-batches. O(1) state;
    rows within a micro-batch process in seq order; the usual
    non-decreasing cross-batch contract applies. Append mode, one
    output row per input day: (day, rev, cusum, flag)."""
    from pyspark.sql import functions as F

    mu_f = float(mu)
    k_f = float(k_frac)
    h_f = float(h_mult)

    def update(key, pdfs, state):
        import decimal as _dec

        import pandas as _pd

        q2 = _dec.Decimal("1e-2")

        def r2(x):
            return float(_dec.Decimal(repr(float(x))).quantize(
                q2, rounding=_dec.ROUND_HALF_UP))

        last_seq, s_str = state.get if state.exists else (-1 << 62, "")
        s = float(s_str) if s_str else 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(seq_col)
            days, revs, sums, flags = [], [], [], []
            for d_, v in zip(pdf[seq_col], pdf[val_col]):
                s = max(0.0, r2(s + float(v) - mu_f - k_f * mu_f))
                last_seq = int(d_)
                days.append(int(d_))
                revs.append(r2(v))
                sums.append(s)
                flags.append(int(s > h_f * mu_f))
            yield _pd.DataFrame({
                "day": days, "rev": revs, "cusum": sums, "flag": flags,
            })
        state.update((last_seq, repr(s)))

    return (
        _sized_group(rows.withColumn("_k", F.lit(0)), "_k")
        .applyInPandasWithState(
            update,
            outputStructType="day long, rev double, cusum double, flag int",
            stateStructType="last_seq long, s string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_holt(
    rows: DataFrame,
    key_col: str = "y",
    seq_col: str = "day",
    val_col: str = "rev",
    alpha: str = "0.2",
    beta: str = "0.1",
) -> DataFrame:
    """Streaming twin of `temporal_ops.holt_trend_daily`: one Holt
    level+trend chain per key with BOTH running values carried as exact
    decimal strings in state (the streaming_ewma discipline, extended
    to a two-variable recursion). Each step quantizes level and trend
    round-9 HALF_UP with the QUANTIZED level feeding the trend update —
    identical order to the batch chain, so drained ≡ batch bit-for-bit.
    State per key is (last_seq, l, b); rows within a micro-batch
    process in seq order; non-decreasing cross-batch contract. Emits
    (key, seq, val, level, trend, forecast) in append mode."""
    a_str, b_str = alpha, beta

    def update(key, pdfs, state):
        import decimal as _dec

        import pandas as _pd

        _dec.getcontext().prec = 50
        q9 = _dec.Decimal("1e-9")
        q6 = _dec.Decimal("1e-6")
        a = _dec.Decimal(a_str)
        ac = _dec.Decimal(1) - a
        bt = _dec.Decimal(b_str)
        bc = _dec.Decimal(1) - bt
        last_seq, l_s, b_s = state.get if state.exists else (-1 << 62, "", "")
        lv = _dec.Decimal(l_s) if l_s else None
        tr = _dec.Decimal(b_s) if b_s else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(seq_col)
            out = {k: [] for k in
                   ("seq", "val", "level", "trend", "forecast")}
            for s_, v in zip(pdf[seq_col], pdf[val_col]):
                x = _dec.Decimal(v)
                if lv is None:
                    lv = x.quantize(q9)
                    tr = _dec.Decimal(0).quantize(q9)
                else:
                    prev = lv
                    lv = (a * x + ac * (prev + tr)).quantize(
                        q9, rounding=_dec.ROUND_HALF_UP)
                    tr = (bt * (lv - prev) + bc * tr).quantize(
                        q9, rounding=_dec.ROUND_HALF_UP)
                last_seq = int(s_)
                out["seq"].append(int(s_))
                out["val"].append(float(x))
                out["level"].append(float(lv.quantize(
                    q6, rounding=_dec.ROUND_HALF_UP)))
                out["trend"].append(float(tr.quantize(
                    q6, rounding=_dec.ROUND_HALF_UP)))
                out["forecast"].append(float((lv + tr).quantize(
                    q6, rounding=_dec.ROUND_HALF_UP)))
            yield _pd.DataFrame({
                "y": [key[0]] * len(out["seq"]), "day": out["seq"],
                "rev": out["val"], "level": out["level"],
                "trend": out["trend"], "forecast": out["forecast"],
            })
        state.update((last_seq,
                      str(lv) if lv is not None else "",
                      str(tr) if tr is not None else ""))

    return (
        _sized_group(rows, key_col)
        .applyInPandasWithState(
            update,
            outputStructType=("y long, day long, rev double, level double,"
                              " trend double, forecast double"),
            stateStructType="last_seq long, l string, b string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sprt(
    rows: DataFrame,
    c1: str,
    c0: str,
    a: str,
    b: str,
    seq_col: str = "day",
) -> DataFrame:
    """Streaming twin of `behavior_ops.sprt_conversion`: Wald's SPRT run
    as a standing monitor over the (already collapsed) daily
    (n_users, n_converted) frame. The per-conversion / per-non-
    conversion log-likelihood increments and the Wald boundaries arrive
    as DECIMAL STRINGS (the same driver-side inlined constants the
    batch entry and its oracle share — no libm anywhere), the running
    LLR is carried as an exact decimal string in state, and the
    boundary compares are decimal-vs-decimal — drained ≡ batch is
    bit-for-bit by construction. O(1) state; non-decreasing cross-batch
    seq contract. Emits (day, n_users, n_converted, llr, decision) in
    append mode."""
    from pyspark.sql import functions as F

    c1_s, c0_s, a_s, b_s = c1, c0, a, b

    def update(key, pdfs, state):
        import decimal as _dec

        import pandas as _pd

        _dec.getcontext().prec = 50
        c1d, c0d = _dec.Decimal(c1_s), _dec.Decimal(c0_s)
        ad, bd = _dec.Decimal(a_s), _dec.Decimal(b_s)
        last_seq, llr_s = state.get if state.exists else (-1 << 62, "0")
        llr = _dec.Decimal(llr_s)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(seq_col)
            out = {k: [] for k in
                   ("day", "n_users", "n_converted", "llr", "decision")}
            for d_, n, k_ in zip(pdf[seq_col], pdf["n_users"],
                                 pdf["n_converted"]):
                llr += int(k_) * c1d + (int(n) - int(k_)) * c0d
                last_seq = int(d_)
                out["day"].append(int(d_))
                out["n_users"].append(int(n))
                out["n_converted"].append(int(k_))
                out["llr"].append(float(llr))
                out["decision"].append(
                    "accept_h1" if llr >= ad
                    else ("accept_h0" if llr <= bd else "continue"))
            yield _pd.DataFrame(out)
        state.update((last_seq, str(llr)))

    return (
        _sized_group(rows.withColumn("_k", F.lit(0)), "_k")
        .applyInPandasWithState(
            update,
            outputStructType=("day long, n_users long, n_converted long, "
                              "llr double, decision string"),
            stateStructType="last_seq long, llr string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
