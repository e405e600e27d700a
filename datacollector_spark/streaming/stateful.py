"""Custom stateful streaming operators (applyInPandasWithState).

The reference's stateful-stage extension point is a scripting stage holding
state across batches (commonlib/.../scripting/AbstractScriptingProcessor
.java `state` binding, per-pipeline lifetime); Spark's native form is
``applyInPandasWithState`` — per-key state in the checkpoint, Arrow-batched
user code, watermark/timeout-driven emission. The operator here is the
transcripts-domain flagship: assemble multi-turn conversations from the
turn-event stream, emitting a conversation only after it goes quiet.

Scale shape: state is per conv_id (the stream's natural key), partitioned
by the groupBy shuffle, checkpointed by Spark, and bounded by the
inactivity timeout — quiet conversations are emitted and their state
removed, so state size tracks ACTIVE conversations, not history.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ASSEMBLED_SCHEMA = (
    "conv_id string, n_turns int, first_turn int, last_turn int, "
    "transcript string, reason string"
)
_STATE_SCHEMA = "turn_idxs array<int>, roles array<string>, texts array<string>"


def assemble_conversations(
    turns: DataFrame,
    inactivity_ms: int = 60_000,
) -> DataFrame:
    """Conversation session assembler: per ``conv_id``, accumulate turns
    across micro-batches in keyed state; when the conversation has seen no
    new turns for ``inactivity_ms`` (processing-time timeout), emit ONE row
    with the full transcript in turn order and drop the state.

    ``turns`` is a STREAMING DataFrame with at least
    (conv_id, turn_idx, role, text). Duplicate deliveries of a turn_idx
    keep the LAST text seen (the stream is ordered per key by the upstream
    collapse; a replayed turn overwrites identically).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            turn_idxs, roles, texts = state.get
            state.remove()
            yield _emit(conv_id, turn_idxs, roles, texts, "inactivity")
            return
        turn_idxs, roles, texts = (
            state.get if state.exists else ([], [], [])
        )
        turn_idxs, roles, texts = list(turn_idxs), list(roles), list(texts)
        pos = {t: i for i, t in enumerate(turn_idxs)}
        for pdf in pdfs:
            for t, r, x in zip(
                pdf["turn_idx"].tolist(), pdf["role"].tolist(), pdf["text"].tolist()
            ):
                t = int(t)
                if t in pos:  # replay/update of a turn: last write wins
                    roles[pos[t]], texts[pos[t]] = r, x
                else:
                    pos[t] = len(turn_idxs)
                    turn_idxs.append(t)
                    roles.append(r)
                    texts.append(x)
        state.update((turn_idxs, roles, texts))
        state.setTimeoutDuration(inactivity_ms)
        return
        yield  # pragma: no cover — make fn a generator on the no-emit path

    return turns.groupBy("conv_id").applyInPandasWithState(
        fn,
        ASSEMBLED_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def assemble_conversations_event_time(
    turns: DataFrame,
    gap_ms: int = 60_000,
    time_col: str = "event_time",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """EVENT-TIME conversation assembler: a conversation is emitted when
    the stream's WATERMARK passes ``max(event_time seen) + gap_ms`` — the
    sessionization clock is the data's own timestamps, not the wall clock.

    This is the scale-correct form for backfill: replaying months of
    historical turns at 100x real-time through
    :func:`assemble_conversations` (ProcessingTimeTimeout) would
    sessionize by arrival rate — every conversation in the replay window
    looks "active" until the drain ends. Here the same replay reproduces
    the original session boundaries exactly, because timeouts fire on
    watermark progress (Spark EventTimeTimeout + ``withWatermark``). The
    reference's emission clock is likewise event-time-driven
    (hdfs-protolib/.../HdfsTargetConfigBean.java:213 timeDriver, default
    ``time:now()`` but configurable to a record field).

    ``turns`` needs (conv_id, turn_idx, role, text, ``time_col``
    timestamp). Out-of-order turns within the watermark are absorbed into
    state (last-write-wins per turn_idx, emission in turn order);
    conversations still inside their gap when the stream drains stay in
    state for the next run (exactly what a checkpoint-resumed backfill
    wants — no spurious end-of-drain flush).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    with_wm = turns.withWatermark(time_col, watermark_delay)
    src = with_wm.select(
        "conv_id", "turn_idx", "role", "text", F.col(time_col).alias("_ts")
    )

    state_schema = (
        "turn_idxs array<int>, roles array<string>, texts array<string>, "
        "max_ts long"
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            turn_idxs, roles, texts, _ = state.get
            state.remove()
            yield _emit(conv_id, turn_idxs, roles, texts, "event_time_gap")
            return
        turn_idxs, roles, texts, max_ts = (
            state.get if state.exists else ([], [], [], 0)
        )
        turn_idxs, roles, texts = list(turn_idxs), list(roles), list(texts)
        pos = {t: i for i, t in enumerate(turn_idxs)}
        for pdf in pdfs:
            ts_ms = (pdf["_ts"].astype("int64") // 1_000_000).tolist()
            for t, r, x, ms in zip(
                pdf["turn_idx"].tolist(), pdf["role"].tolist(),
                pdf["text"].tolist(), ts_ms,
            ):
                t = int(t)
                if t in pos:  # replay/update of a turn: last write wins
                    roles[pos[t]], texts[pos[t]] = r, x
                else:
                    pos[t] = len(turn_idxs)
                    turn_idxs.append(t)
                    roles.append(r)
                    texts.append(x)
                max_ts = max(max_ts, int(ms))
        state.update((turn_idxs, roles, texts, max_ts))
        # fire once the watermark passes the conversation's quiet horizon;
        # the timestamp must sit strictly beyond the current watermark
        # (Spark rejects timeouts at-or-before it)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts + gap_ms, wm + 1))
        return
        yield  # pragma: no cover — make fn a generator on the no-emit path

    return src.groupBy("conv_id").applyInPandasWithState(
        fn,
        ASSEMBLED_SCHEMA,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _emit(conv_id, turn_idxs, roles, texts, reason) -> pd.DataFrame:
    order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
    transcript = "\n".join(f"{roles[i]}: {texts[i]}" for i in order)
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [len(turn_idxs)],
            "first_turn": [min(turn_idxs)],
            "last_turn": [max(turn_idxs)],
            "transcript": [transcript],
            "reason": [reason],
        }
    )
