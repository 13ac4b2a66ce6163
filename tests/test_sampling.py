"""stratified_sample / decontaminate (sampling.py)."""
from __future__ import annotations

import hashlib

import pytest

from opentelemetry_log_collection_spark.sampling import (
    _threshold_hex,
    decontaminate,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")


def test_threshold_hex_edges():
    assert _threshold_hex(0.0) == "00000000"
    assert _threshold_hex(0.5) == "80000000"
    # 'g' > any hex digit: rate 1.0 keeps even prefix 'ffffffff' rows
    assert _threshold_hex(1.0) == "g"
    assert "ffffffff" < _threshold_hex(1.0)
    with pytest.raises(ValueError):
        _threshold_hex(1.5)


def test_stratified_sample_deterministic_and_exact(spark):
    df = _docs(
        spark,
        [(i, "en" if i % 2 == 0 else "xx", f"t{i}") for i in range(200)],
    )
    out1 = stratified_sample(df, "lang", {"en": 0.5}, seed=3)
    out2 = stratified_sample(df, "lang", {"en": 0.5}, seed=3)
    ids1 = {r.doc_id for r in out1.collect()}
    assert ids1 == {r.doc_id for r in out2.collect()}  # reproducible
    # matches the closed-form membership rule row for row
    expect = {
        i
        for i in range(0, 200, 2)
        if hashlib.md5(f"3|{i}".encode()).hexdigest()[:8] < "80000000"
    }
    assert ids1 == expect
    # unknown strata drop at the 0.0 default
    assert all(i % 2 == 0 for i in ids1)
    # ...and survive with an explicit default_rate
    out3 = stratified_sample(df, "lang", {"en": 0.5}, seed=3, default_rate=1.0)
    assert {r.doc_id for r in out3.collect()} >= {1, 3, 5}


def test_stratified_sample_rate_monotone(spark):
    df = _docs(spark, [(i, "en", f"t{i}") for i in range(500)])
    small = stratified_sample(df, "lang", {"en": 0.1}, seed=1).count()
    big = stratified_sample(df, "lang", {"en": 0.9}, seed=1).count()
    assert small < big
    # nested property: the 10% sample is a subset of the 90% sample
    s_ids = {r.doc_id for r in
             stratified_sample(df, "lang", {"en": 0.1}, seed=1).collect()}
    b_ids = {r.doc_id for r in
             stratified_sample(df, "lang", {"en": 0.9}, seed=1).collect()}
    assert s_ids <= b_ids


def test_decontaminate_flags_overlap(spark):
    bench = _docs(spark, [(100, "en", "the quick brown fox jumps high")])
    corpus = _docs(
        spark,
        [
            # shares "the quick brown fox" and "quick brown fox jumps"
            (1, "en", "said the quick brown fox jumps"),
            # no 4-gram overlap
            (2, "en", "a completely different sentence entirely here"),
            # shares one 4-gram, repeated — counted DISTINCT once
            (3, "en", "quick brown fox jumps and quick brown fox jumps"),
        ],
    )
    rows = {r.doc_id: r.n_shared for r in
            decontaminate(corpus, bench, n=4).collect()}
    assert rows == {1: 2, 3: 1}


def test_decontaminate_shuffle_join_parity(spark):
    bench = _docs(spark, [(9, "en", "alpha beta gamma delta epsilon")])
    corpus = _docs(
        spark,
        [(1, "en", "x alpha beta gamma delta y"), (2, "en", "zeta eta")],
    )
    a = decontaminate(corpus, bench, n=4, broadcast_bench=True).collect()
    b = decontaminate(corpus, bench, n=4, broadcast_bench=False).collect()
    # one shared gram: "alpha beta gamma delta"
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) == [(1, 1)]
