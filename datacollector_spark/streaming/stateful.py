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
