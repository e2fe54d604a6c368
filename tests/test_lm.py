"""stages/lm.py — hand-computed Laplace bigram LM vectors + unicode
handling (the sf-corpus oracle covers the full pipeline)."""

from __future__ import annotations

import math

import pyarrow as pa

from rayslog.stages.lm import score_bigram_lm, train_bigram_lm


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def test_hand_computed_model_and_score(ray_session):
    # corpus: "abab" (bigrams ab,ba,ab) + "b" (no bigrams, vocab only)
    ds = _docs(["abab", "b"])
    model = train_bigram_lm(ds)
    bi_keys, bi_ns, pre_keys, pre_ns, vocab = model
    assert vocab == 2  # {a, b}
    a, b = ord("a"), ord("b")
    key = {(x, y): (x << 21) | y for x in (a, b) for y in (a, b)}
    got = dict(zip(bi_keys.tolist(), bi_ns.tolist()))
    assert got == {key[(a, b)]: 2, key[(b, a)]: 1}
    pre = dict(zip(pre_keys.tolist(), pre_ns.tolist()))
    assert pre == {a: 2, b: 1}

    df = score_bigram_lm(ds, model).to_pandas().sort_values("doc_id")
    # p(b|a) = (2+1)/(2+2), p(a|b) = (1+1)/(1+2)
    expect = -(
        math.log2(3 / 4) + math.log2(2 / 3) + math.log2(3 / 4)
    ) / 3
    assert df.iloc[0]["lm_bits"] == round(expect, 6)
    assert df.iloc[1]["lm_bits"] == 0.0  # <2 chars


def test_unseen_bigram_and_prefix(ray_session):
    ds = _docs(["ab"])
    model = train_bigram_lm(ds)
    # score a doc with an unseen bigram ("ba": c=0, prefix b unseen as
    # prefix -> c(b.)=0) against the trained model
    out = score_bigram_lm(_docs(["ba"]), model).to_pandas()
    # p = (0+1)/(0+2)
    assert out.iloc[0]["lm_bits"] == round(-math.log2(1 / 2), 6)


def test_unicode_codepoints(ray_session):
    # non-ASCII codepoints must pack/score identically to their
    # codepoint values (utf-32 path, no surrogate splitting)
    ds = _docs(["日本語", "日本"])
    model = train_bigram_lm(ds)
    _, _, _, _, vocab = model
    assert vocab == 3
    df = score_bigram_lm(ds, model).to_pandas().sort_values("doc_id")
    # "日本" bigram count 2, prefix 日 count 2 -> p = 3/5
    assert df.iloc[1]["lm_bits"] == round(-math.log2(3 / 5), 6)


def test_null_and_empty_texts(ray_session):
    ds = _docs(["ab", None, ""])
    model = train_bigram_lm(ds)
    df = score_bigram_lm(ds, model).to_pandas().sort_values("doc_id")
    assert df.iloc[1]["lm_bits"] == 0.0
    assert df.iloc[2]["lm_bits"] == 0.0
