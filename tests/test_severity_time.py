"""severity_parser + time_parser unit tests mirroring the reference's
golden fixtures (operator/helper/testdata/{severity,time})."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_log_collection_spark.operators.severity import (
    SEVERITY_VALUES,
    build_mapping,
)
from opentelemetry_log_collection_spark.operators.time_parser import (
    _gotime_to_java,
    strptime_to_java,
)
from opentelemetry_log_collection_spark.pipeline import build_stage
from tests.conftest import collected, make_entries


def sev_of(spark, value, **cfg):
    df = make_entries(spark, [str(value)])
    stage = build_stage({"type": "severity_parser", "parse_from": "body", **cfg})
    out = stage.apply(df)
    row = collected(out, "severity", "severity_text")[0]
    return row["severity"], row["severity_text"]


def test_default_preset_aliases(spark):
    assert sev_of(spark, "error") == (17, "error")
    assert sev_of(spark, "WARNING") == (13, "WARNING")   # lowercased probe
    assert sev_of(spark, "err") == (17, "err")           # default extras
    assert sev_of(spark, "trace4") == (4, "trace4")


def test_unmapped_is_default_zero_with_text_kept(spark):
    assert sev_of(spark, "nonesuch") == (0, "nonesuch")


def test_otel_preset_numeric(spark):
    assert sev_of(spark, 13, preset="otel") == (13, "13")
    assert sev_of(spark, "9", preset="otel") == (9, "9")


def test_none_preset_requires_mapping(spark):
    assert sev_of(spark, "error", preset="none") == (0, "error")


def test_http_range_expansion_and_minmax(spark):
    cfg = {
        "preset": "none",
        "mapping": {"error": "5xx", "warn": "4xx", "info": {"min": 200, "max": 299}},
    }
    assert sev_of(spark, 503, **cfg) == (17, "503")
    assert sev_of(spark, 404, **cfg) == (13, "404")
    assert sev_of(spark, 201, **cfg) == (9, "201")
    assert sev_of(spark, 302, **cfg) == (0, "302")


def test_float_probe_parses_as_int(spark):
    # severity.go:66-75: float inputs like 404.0 probe as "404"
    cfg = {"preset": "none", "mapping": {"warn": "4xx"}}
    assert sev_of(spark, "404.0", **cfg) == (13, "404.0")


def test_build_mapping_validation():
    with pytest.raises(ValueError):
        build_mapping(mapping={"nonlevel": "x"})
    m, ranges = build_mapping(preset="none", mapping={"error": {"min": 500, "max": 400}})
    assert ranges == [(400, 500, SEVERITY_VALUES["error"])]  # min/max swap


# ---- time ------------------------------------------------------------


def ts_of(spark, value, **cfg):
    df = make_entries(spark, [str(value)])
    stage = build_stage({"type": "time_parser", "parse_from": "body", **cfg})
    out = stage.apply(df)
    return collected(out, "ts")[0]["ts"]


def test_strptime_layout_translation():
    assert strptime_to_java("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strptime_to_java("%d/%b/%Y:%H:%M:%S %z") == "dd/MMM/yyyy:HH:mm:ss Z"
    with pytest.raises(ValueError):
        strptime_to_java("%Q")


def test_strptime_parse(spark):
    got = ts_of(spark, "2020-03-04 11:22:33",
                layout="%Y-%m-%d %H:%M:%S", layout_type="strptime")
    assert got == dt.datetime(2020, 3, 4, 11, 22, 33)


def test_epoch_layouts(spark):
    base = dt.datetime(2020, 1, 2, 3, 4, 5)
    epoch_s = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert ts_of(spark, epoch_s, layout="s", layout_type="epoch") == base
    assert ts_of(spark, epoch_s * 1000, layout="ms", layout_type="epoch") == base
    assert ts_of(spark, epoch_s * 1_000_000, layout="us", layout_type="epoch") == base
    assert ts_of(spark, epoch_s * 1_000_000_000, layout="ns", layout_type="epoch") == base
    # s.* family: the subsecond part is a RAW INTEGER in the layout's
    # unit, not a decimal fraction — strings.Split + ParseInt, so
    # "X.25" with s.ms is 25 milliseconds (time.go:219-229:
    # time.Unix(sec, subsec*subsecToNs))
    got = ts_of(spark, f"{epoch_s}.25", layout="s.ms", layout_type="epoch")
    assert got == base + dt.timedelta(milliseconds=25)
    got = ts_of(spark, f"{epoch_s}.250307", layout="s.us", layout_type="epoch")
    assert got == base + dt.timedelta(microseconds=250307)
    got = ts_of(spark, f"{epoch_s}.250307999", layout="s.ns", layout_type="epoch")
    assert got == base + dt.timedelta(microseconds=250307)  # ns truncate
    # a fraction is invalid for the integer layouts (ParseInt fails)
    df = make_entries(spark, [f"{epoch_s}.5"])
    out = build_stage({"type": "time_parser", "parse_from": "body",
                       "layout": "s", "layout_type": "epoch",
                       "on_error": "drop"}).apply(df)
    assert out.count() == 0


def test_k8s_nanosecond_layouts(spark):
    """The reference's k8s fixture (operator/helper/time_test.go:273-287):
    %s = zero-padded 9-digit nanoseconds (ctimefmt), gotime
    .999999999 = optional fraction. Spark timestamps truncate to
    microseconds."""
    sample = "2019-03-08T18:41:12.152531115Z"
    expect = dt.datetime(2019, 3, 8, 18, 41, 12, 152531)
    got = ts_of(spark, sample, layout="%Y-%m-%dT%H:%M:%S.%sZ",
                layout_type="strptime")
    assert got == expect
    got = ts_of(spark, sample, layout="2006-01-02T15:04:05.999999999Z",
                layout_type="gotime")
    assert got == expect
    # optional fraction: the same gotime layout parses a fractionless ts
    got = ts_of(spark, "2019-03-08T18:41:12Z",
                layout="2006-01-02T15:04:05.999999999Z", layout_type="gotime")
    assert got == dt.datetime(2019, 3, 8, 18, 41, 12)


def test_location_parse_in_zone(spark):
    """time.go:56-66,180 (ParseInLocation): a zone-less layout is
    interpreted in the configured location; layouts carrying an offset
    ignore it."""
    got = ts_of(spark, "2020-06-04 12:00:00",
                layout="%Y-%m-%d %H:%M:%S", layout_type="strptime",
                location="America/New_York")
    # noon EDT (-4) == 16:00 UTC
    assert got == dt.datetime(2020, 6, 4, 16, 0, 0)
    # winter: EST (-5)
    got = ts_of(spark, "2020-01-04 12:00:00",
                layout="%Y-%m-%d %H:%M:%S", layout_type="strptime",
                location="America/New_York")
    assert got == dt.datetime(2020, 1, 4, 17, 0, 0)
    # layout with an explicit offset: location must NOT double-shift
    got = ts_of(spark, "2020-01-04 12:00:00 +0200",
                layout="%Y-%m-%d %H:%M:%S %z", layout_type="strptime",
                location="America/New_York")
    assert got == dt.datetime(2020, 1, 4, 10, 0, 0)


def test_missing_year_inference(spark):
    # reference clock injected as 2024-06-01 (time.go:280-292)
    got = ts_of(spark, "03/15 10:00:00", layout="%m/%d %H:%M:%S",
                now="2024-06-01T00:00:00+00:00")
    assert got == dt.datetime(2024, 3, 15, 10, 0, 0)
    # >7 days in the future -> last year
    got2 = ts_of(spark, "09/15 10:00:00", layout="%m/%d %H:%M:%S",
                 now="2024-06-01T00:00:00+00:00")
    assert got2 == dt.datetime(2023, 9, 15, 10, 0, 0)


def test_native_and_invalid(spark):
    assert ts_of(spark, "2021-07-08 09:10:11", layout_type="native") == dt.datetime(
        2021, 7, 8, 9, 10, 11
    )
    df = make_entries(spark, ["not a time"])
    out = build_stage(
        {"type": "time_parser", "parse_from": "body",
         "layout": "%Y-%m-%d", "on_error": "drop"}
    ).apply(df)
    assert out.count() == 0


def test_adjacent_literal_letters_quote_as_one_run():
    """Layouts with >=2 consecutive literal letters must quote the RUN
    ('UTC'), not each char ('U''T''C' — Java reads the inner '' as an
    escaped quote and the pattern never matches)."""
    assert strptime_to_java("%H:%M:%S UTC") == "HH:mm:ss 'UTC'"
    assert _gotime_to_java("2006-01-02 15:04:05 UTC") == (
        "yyyy-MM-dd HH:mm:ss 'UTC'"
    )


def test_strptime_literal_utc_parses(spark):
    got = ts_of(spark, "2020-03-04 11:22:33 UTC",
                layout="%Y-%m-%d %H:%M:%S UTC", layout_type="strptime")
    assert got == dt.datetime(2020, 3, 4, 11, 22, 33)


def test_gotime_literal_utc_parses(spark):
    got = ts_of(spark, "2020-03-04 11:22:33 UTC",
                layout="2006-01-02 15:04:05 UTC", layout_type="gotime")
    assert got == dt.datetime(2020, 3, 4, 11, 22, 33)
