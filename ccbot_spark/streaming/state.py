"""Stateful streaming politeness (SURVEY.md §2.8 st_state): per-host
state maintained across micro-batches with ``applyInPandasWithState``
— the Structured-Streaming alternative to the cycle loop's
batch-computed schedule.

Semantics: each host carries (total_fetched, last_ts_us) state. Every
incoming fetch event is annotated with the host's running total and
whether it exceeded the per-host budget or violated the min-delay
since the previous fetch. The cycle engine remains the primary path
(exact trace reproducibility); this operator exists for deployments
that want continuous enforcement with bounded state.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_fetched", T.LongType(), False),
        T.StructField("last_ts_us", T.LongType(), False),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("seq_in_host", T.LongType(), False),
        T.StructField("over_budget", T.BooleanType(), False),
        T.StructField("delay_violation", T.BooleanType(), False),
    ]
)


def _annotate_batch(
    host: str, pdf: pd.DataFrame, total: int, last_us: int, budget: int,
    min_delay_ms: int,
) -> tuple[pd.DataFrame, int, int]:
    """Shared per-batch politeness annotation (deterministic order by
    (ts, url_norm)); returns (out_rows, total, last_us)."""
    pdf = pdf.sort_values(["ts", "url_norm"], kind="mergesort")
    rows = []
    for ts, url in zip(pdf["ts"], pdf["url_norm"]):
        t_us = int(
            (ts if isinstance(ts, dt.datetime) else ts.to_pydatetime())
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
            * 1_000_000
        )
        total += 1
        violation = last_us >= 0 and (t_us - last_us) < min_delay_ms * 1000
        rows.append((host, url, total, total > budget, bool(violation)))
        last_us = t_us
    return (
        pd.DataFrame(rows, columns=[f.name for f in OUT_SCHEMA.fields]),
        total,
        last_us,
    )


def st_host_politeness_state(
    events: DataFrame, budget: int = 50, min_delay_ms: int = 0
) -> DataFrame:
    """events: FETCH_EVENTS stream → per-event politeness annotations
    with per-host state carried across micro-batches.

    State is O(1) per host (two longs) — at 10^8 hosts that is a few
    GB across the cluster's state stores, rebuilt from the checkpoint
    on restart.

    Per-host budgets (r5, the streaming crawl-cycle composition): when
    the events frame carries a ``budget`` column (constant within a
    host — e.g. the robots table's budget_per_cycle joined in the
    stateless projection), that value wins over the ``budget`` default;
    the column never enters the state, so state stays two longs.
    """
    has_budget_col = "budget" in events.columns

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        host_budget = budget
        if state.exists:
            total, last_us = state.get
        else:
            total, last_us = 0, -1
        for pdf in pdfs:
            if has_budget_col and len(pdf):
                host_budget = int(pdf["budget"].iloc[0])
            out, total, last_us = _annotate_batch(
                host, pdf, total, last_us, host_budget, min_delay_ms
            )
            yield out
        state.update((total, last_us))

    return events.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """True iff transformWithStateInPandas can actually run: the API
    (Spark ≥ 4.0) plus ``google.protobuf`` (its state-serialization
    protocol — pyspark declares it an optional dependency; this sandbox
    lacks it, so the test suite skips the runtime check and the
    applyInPandasWithState path remains the tested one here)."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def st_host_politeness_tws(
    events: DataFrame, budget: int = 50, min_delay_ms: int = 0
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` variant of
    st_host_politeness_state — identical semantics, expressed with the
    StatefulProcessor API (typed ValueState, timer/TTL-capable). The
    state store must be RocksDB
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState
    requires it; the default HDFS-backed provider raises."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    min_delay = min_delay_ms

    class _PolitenessProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("host_state", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (host,) = key
            if self._st.exists():
                total, last_us = self._st.get()
            else:
                total, last_us = 0, -1
            for pdf in rows:
                out, total, last_us = _annotate_batch(
                    host, pdf, total, last_us, budget, min_delay
                )
                yield out
            self._st.update((total, last_us))

        def close(self) -> None:
            pass

    return events.groupBy("host").transformWithStateInPandas(
        statefulProcessor=_PolitenessProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1_us", T.LongType(), False),
        T.StructField("t2_us", T.LongType(), False),
        T.StructField("t3_us", T.LongType(), False),
    ]
)

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("t1_us", T.LongType(), False),
        T.StructField("t2_us", T.LongType(), False),
        T.StructField("t3_us", T.LongType(), False),
        T.StructField("stage", T.LongType(), False),
    ]
)


def st_funnel_state(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming ordered-funnel (the stateful twin of
    eventops.funnel): per-user state is just the chained-minima tuple
    (t1, t2, t3) — three longs per user, bounded forever — updated by
    applying each micro-batch's rows in (ts, event_type) order with
    the same strictly-after first-match rule:

        tᵢ := ts   when event_type == steps[i], tᵢ unset,
                   and (i == 0 or ts > tᵢ₋₁)

    On an IN-ORDER stream (watermarked upstream, like every other
    st_* twin here) the final emitted row per user equals the batch
    funnel exactly — that's the parity gate in tests/test_streaming.py;
    a late event older than an already-set stage is dropped by the
    first-match rule, the standard stateful-funnel degradation. Each
    micro-batch emits the user's CURRENT funnel row."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t = list(state.get) if state.exists else [-1, -1, -1]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_type"], kind="mergesort")
        for typ, ts in zip(pdf["event_type"], pdf["ts"]):
            if typ not in steps:
                continue
            i = steps.index(typ)
            us = int(
                (ts if isinstance(ts, dt.datetime) else ts.to_pydatetime())
                .replace(tzinfo=dt.timezone.utc)
                .timestamp()
                * 1_000_000
            )
            if t[i] < 0 and (i == 0 or (t[i - 1] >= 0 and us > t[i - 1])):
                t[i] = us
        state.update(tuple(t))
        stage = sum(1 for x in t if x >= 0)
        yield pd.DataFrame(
            [(key[0], t[0], t[1], t[2], stage)],
            columns=[f.name for f in FUNNEL_OUT_SCHEMA.fields],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
