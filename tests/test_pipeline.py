"""Pipeline compile-path tests (pipeline/config.go + directed.go)."""

from __future__ import annotations

import pytest

from opentelemetry_log_collection_spark.pipeline import Pipeline, build_stage
from tests.conftest import collected, make_entries


def test_unknown_operator_type_rejected():
    with pytest.raises(ValueError, match="unknown operator type"):
        build_stage({"type": "no_such_op"})


def test_implicit_linear_wiring_and_run(spark):
    p = Pipeline.from_configs(
        [
            {"type": "add", "field": "attributes.a", "value": "1"},
            {"type": "add", "field": "attributes.b", "value": "2"},
            {"type": "noop"},
        ]
    )
    # implicit wiring: add -> add2 -> noop
    assert p.stages[0].outputs == [p.stages[1].id]
    df = make_entries(spark, ["x"])
    results = p.run(df)
    (out,) = results.values()
    attrs = collected(out, "attributes")[0]["attributes"]
    assert attrs["a"] == "1" and attrs["b"] == "2"


def test_duplicate_ids_deduped_with_type_counts():
    p = Pipeline.from_configs(
        [
            {"type": "add", "field": "attributes.a", "value": "1"},
            {"type": "add", "field": "attributes.b", "value": "2"},
        ]
    )
    assert [s.id for s in p.stages] == ["add", "add2"]


def test_unknown_output_rejected():
    with pytest.raises(ValueError, match="unknown"):
        Pipeline.from_configs(
            [{"type": "noop", "output": "ghost"}, {"type": "drop", "id": "sink"}]
        )


def test_cycle_rejected():
    with pytest.raises(ValueError, match="cycle"):
        Pipeline.from_configs(
            [
                {"type": "noop", "id": "a", "output": "b"},
                {"type": "noop", "id": "b", "output": "a"},
            ]
        )


def test_fan_out_and_fan_in_union(spark):
    p = Pipeline.from_configs(
        [
            # fan-out: one producer feeds two branches
            {"type": "add", "field": "attributes.src", "value": "root",
             "output": ["left", "right"]},
            {"type": "add", "id": "left", "field": "attributes.b", "value": "L",
             "output": "sink"},
            {"type": "add", "id": "right", "field": "attributes.b", "value": "R",
             "output": "sink"},
            {"type": "noop", "id": "sink"},
        ]
    )
    df = make_entries(spark, ["x"])
    (out,) = p.run(df).values()
    # fan-in unions both branches: 1 input row -> 2 rows at the sink
    rows = collected(out, "attributes")
    assert sorted(r["attributes"]["b"] for r in rows) == ["L", "R"]
    assert all(r["attributes"]["src"] == "root" for r in rows)


def test_yaml_pipeline_with_router(spark):
    yaml_text = """
pipeline:
  - type: key_value_parser
  - type: router
    routes:
      - expr: 'attributes.kind == "x"'
        output: xs
      - expr: 'attributes.kind == "y"'
        output: ys
    default: rest
  - type: drop
    id: xs
  - type: drop
    id: ys
  - type: drop
    id: rest
"""
    p = Pipeline.from_yaml(yaml_text)
    df = make_entries(spark, ["kind=x v=1", "kind=y v=2", "kind=z v=3"])
    results = p.run(df)
    assert results["xs"].count() == 1
    assert results["ys"].count() == 1
    assert results["rest"].count() == 1
