"""Decontamination stage: strict-window gram semantics and the
broadcast-membership plan (stages/decontam.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayslog.stages.decontam import _gram_keys, decontaminate, eval_gram_keys


def test_gram_keys_strict_windows():
    txt = pa.array(
        [
            "a b c d e",      # 2 grams of 4
            "a b c",          # < 4 tokens -> NO grams (no join-all fallback)
            "",               # empty -> none
            "a b c d",        # exactly 4 -> 1 gram
        ]
    )
    keys, rows = _gram_keys(txt, 4)
    assert rows.tolist() == [0, 0, 3]
    # identical windows hash identically across rows
    assert keys[0] == keys[2]  # "a b c d" in row 0 and row 3
    assert keys[0] != keys[1]


def test_gram_keys_order_sensitive():
    k1, _ = _gram_keys(pa.array(["a b c d"]), 4)
    k2, _ = _gram_keys(pa.array(["d c b a"]), 4)
    assert k1[0] != k2[0]


@pytest.fixture()
def toy_docs(ray_session):
    import ray.data as rd

    # doc 0 is the eval doc (0 % 2 == 0 with eval_mod=2 ... we use
    # eval_mod=5 => docs 0 and 5 are eval); doc 1 copies an eval
    # 4-gram twice (counts once), doc 2 shares nothing, doc 3 shares
    # two distinct grams, doc 4 is too short.
    rows = [
        {"doc_id": 0, "text": "w x y z p q r s"},
        {"doc_id": 1, "text": "w x y z k w x y z"},
        {"doc_id": 2, "text": "m n o p m n o p"},
        {"doc_id": 3, "text": "w x y z p q r s extra"},
        {"doc_id": 4, "text": "w x y"},
        {"doc_id": 5, "text": "unused eval doc two alpha"},
    ]
    return rd.from_items(rows)


def test_decontaminate_counts(toy_docs):
    import ray

    keys = eval_gram_keys(toy_docs, n=4, eval_mod=5)
    out = (
        decontaminate(toy_docs, ray.put(keys), n=4, eval_mod=5)
        .sort("doc_id")
        .to_pandas()
    )
    got = dict(zip(out["doc_id"], out["n_shared"]))
    # doc 1: "w x y z" appears twice but is ONE distinct shared gram
    # doc 3: shares all 5 of doc 0's grams
    assert got == {1: 1, 3: 5}


def test_decontaminate_empty_eval(toy_docs):
    import ray

    empty = np.empty(0, dtype="S16")
    ds = decontaminate(toy_docs, ray.put(empty), n=4, eval_mod=5)
    # block schema stays stable even when every batch is empty
    assert sorted(ds.schema().names) == ["doc_id", "n_shared"]
    assert ds.count() == 0


def test_decontaminate_deterministic(ray_session):
    from rayslog import pipeline as p

    a = p.q_decontaminate("/root/testdata/sf0.001").to_pandas()
    b = p.q_decontaminate("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b)
    assert len(a) > 0
    # eval docs never flag themselves
    assert (a["doc_id"] % p.DECON_EVAL_MOD != 0).all()
