"""Field path semantics vs entry/field.go + entry/body_field.go."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_log_collection_spark.fields import (
    Field,
    FieldParseError,
    apply_updates,
)
from conftest import make_entries, collected


def test_parse_paths():
    assert Field.parse("body").root == "body"
    assert Field.parse("body.a.b").keys == ("a", "b")
    # bare path defaults to body (docs/types/field.md)
    f = Field.parse("foo.bar")
    assert f.root == "body" and f.keys == ("foo", "bar")
    f = Field.parse('attributes["k8s.cluster.name"]')
    assert f.root == "attributes" and f.keys == ("k8s.cluster.name",)
    f = Field.parse('body["dotted.key"].x')
    assert f.keys == ("dotted.key", "x")
    assert Field.parse("timestamp").root == "timestamp"
    with pytest.raises(FieldParseError):
        Field.parse("")


def test_get_body_string_vs_map(spark):
    df = make_entries(spark, ["hello"])
    # body root reads raw text while unstructured
    assert collected(df.select(Field.parse("body").get().alias("v")), order=None) == [
        {"v": "hello"}
    ]
    # after a map set, body root reads the JSON projection
    df2 = apply_updates(
        df, Field.parse("body").set_map(F.create_map(F.lit("k"), F.lit("v")))
    )
    assert collected(df2.select(Field.parse("body.k").get().alias("v")), order=None) == [
        {"v": "v"}
    ]


def test_set_merge_overwrite(spark):
    """Set of a map value merges, later keys win (body_field.go:88-132)."""
    df = make_entries(spark, ["x"])
    f = Field.parse("attributes")
    df = apply_updates(df, f.set_map(F.create_map(F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2"))))
    df = apply_updates(df, f.set_map(F.create_map(F.lit("b"), F.lit("99"), F.lit("c"), F.lit("3"))))
    [row] = collected(df, "attributes", order=None)
    attrs = row["attributes"]
    assert attrs["a"] == "1" and attrs["b"] == "99" and attrs["c"] == "3"


def test_nested_set_merges_jsonwise(spark):
    """F5 map-merge: parse_to body.parsed twice merges keys."""
    df = make_entries(spark, ["x"])
    f = Field.parse("body.parsed")
    df = apply_updates(df, f.set_map(F.create_map(F.lit("k1"), F.lit("v1"))))
    df = apply_updates(df, f.set_map(F.create_map(F.lit("k2"), F.lit("v2"))))
    assert collected(df.select(Field.parse("body.parsed.k1").get().alias("v")), order=None) == [{"v": "v1"}]
    assert collected(df.select(Field.parse("body.parsed.k2").get().alias("v")), order=None) == [{"v": "v2"}]


def test_scalar_root_set_rejected():
    with pytest.raises(FieldParseError):
        Field.parse("attributes").set_scalar(F.lit("x"))


def test_delete_key_and_root(spark):
    df = make_entries(spark, ["x"])
    df = apply_updates(
        df,
        Field.parse("attributes").set_map(
            F.create_map(F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2"))
        ),
    )
    df1 = apply_updates(df, Field.parse("attributes.a").delete())
    [row] = collected(df1, "attributes", order=None)
    assert row["attributes"] == {"b": "2", "role": "user", "tool": ""}
    # whole-root deletion (rootable_field.go:29-72)
    df2 = apply_updates(df, Field.parse("attributes").delete())
    [row2] = collected(df2, "attributes", order=None)
    assert row2["attributes"] is None


def test_null_value_set_is_noop(spark):
    df = make_entries(spark, ["x"])
    before = collected(df, "attributes", order=None)
    df2 = apply_updates(
        df, Field.parse("attributes").set_map(F.lit(None).cast("map<string,string>"))
    )
    assert collected(df2, "attributes", order=None) == before
