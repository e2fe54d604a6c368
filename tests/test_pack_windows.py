"""conversation_windows + assistant_char_spans: semantic consistency
with assemble_conversations on hand-built fixtures."""

from __future__ import annotations

import pyarrow as pa


TURNS = [
    # conv, idx, role, text
    ("a", 0, "user", "hi"),
    ("a", 1, "assistant", "hello there"),
    ("a", 2, "user", "thanks"),
    ("a", 3, "assistant", "yw"),
    ("b", 0, "system", "rules"),
    ("b", 1, "user", "q"),
    ("b", 2, "assistant", "answer!"),
]


def _ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([t[0] for t in TURNS], pa.string()),
                "turn_idx": pa.array([t[1] for t in TURNS], pa.int64()),
                "role": pa.array([t[2] for t in TURNS], pa.string()),
                "text": pa.array([t[3] for t in TURNS], pa.string()),
            }
        )
    ).repartition(3)


def test_assistant_spans_slice_assembled_docs(ray_session):
    from rayslog.stages.pack import (
        assemble_conversations,
        assistant_char_spans,
    )

    docs = {
        r["conv_id"]: r["doc"]
        for r in assemble_conversations(_ds(), parts=4).to_pandas().to_dict(
            "records"
        )
    }
    spans = assistant_char_spans(_ds(), parts=4).to_pandas()
    assert len(spans) == 3
    originals = {(t[0], t[1]): t[3] for t in TURNS if t[2] == "assistant"}
    for r in spans.to_dict("records"):
        doc = docs[r["conv_id"]]
        assert (
            doc[r["start_char"] : r["end_char"]]
            == originals[(r["conv_id"], r["turn_idx"])]
        )


def test_conversation_windows_content_and_counts(ray_session):
    from rayslog.stages.pack import conversation_windows

    out = (
        conversation_windows(_ds(), k=2, stride=1, parts=4)
        .to_pandas()
        .sort_values(["conv_id", "window_idx"])
        .reset_index(drop=True)
    )
    # conv a: 4 turns -> 3 windows of 2; conv b: 3 turns -> 2 windows
    assert list(out["conv_id"]) == ["a", "a", "a", "b", "b"]
    assert list(out["window_idx"]) == [0, 1, 2, 0, 1]
    assert out["text"][0] == "hi\nhello there"
    assert out["text"][2] == "thanks\nyw"
    assert out["text"][4] == "q\nanswer!"
    # conversations shorter than k emit nothing (count, not to_pandas:
    # Ray drops columns of all-empty datasets)
    assert conversation_windows(_ds(), k=5, stride=1, parts=4).count() == 0
