"""journald_input / k8s_event_input / windows_eventlog_input decode
semantics, mirrored from the reference's unit fixtures:
journald.go:188-231, k8s_event.go:259-332, xml.go + security.go tests.
"""
from __future__ import annotations

import json

import pytest

from opentelemetry_log_collection_spark.operators.journald import (
    JournaldBridge,
    JournaldInputStage,
)
from opentelemetry_log_collection_spark.operators.k8s_event import (
    K8sEventInputStage,
)
from opentelemetry_log_collection_spark.operators.windows_eventlog import (
    WindowsEventLogInputStage,
    _parse_security_message,
)
from tests.conftest import collected


# ---- journald --------------------------------------------------------


def _journal_line(msg, ts_us, cursor, **extra):
    obj = {"MESSAGE": msg, "__REALTIME_TIMESTAMP": str(ts_us),
           "__CURSOR": cursor, **extra}
    return json.dumps(obj)


def test_journald_decode_and_filters(spark, tmp_path):
    p = tmp_path / "journal.json"
    p.write_text(
        "\n".join(
            [
                _journal_line("boot ok", 1_700_000_000_000_000, "c1",
                              PRIORITY="6", _SYSTEMD_UNIT="sshd.service"),
                # priority 7 (debug) is filtered at the default info level
                _journal_line("noisy", 1_700_000_000_000_001, "c2",
                              PRIORITY="7", _SYSTEMD_UNIT="sshd.service"),
                # missing cursor -> warn-and-skip
                json.dumps({"MESSAGE": "x",
                            "__REALTIME_TIMESTAMP": "1700000000000002"}),
                # not JSON at all -> skip
                "garbage line",
                _journal_line("other unit", 1_700_000_000_000_003, "c4",
                              PRIORITY="3", _SYSTEMD_UNIT="cron.service"),
            ]
        )
        + "\n"
    )
    stage = JournaldInputStage(files=str(p), units=["sshd.service"])
    rows = collected(stage.generate(spark), "text", "body", "ts",
                     order=("turn_idx",))
    assert [r["text"] for r in rows] == ["boot ok"]
    b = rows[0]["body"]
    assert b["__CURSOR"] == "c1"          # cursor stays in the body
    assert "__REALTIME_TIMESTAMP" not in b  # timestamp is consumed
    assert rows[0]["ts"].isoformat().startswith("2023-11-14T22:13:20")


def test_journald_priority_numeric_and_no_units(spark, tmp_path):
    p = tmp_path / "j.json"
    p.write_text(
        "\n".join(
            [
                _journal_line("sev3", 1000, "a", PRIORITY="3"),
                _journal_line("sev5", 2000, "b", PRIORITY="5"),
            ]
        )
        + "\n"
    )
    stage = JournaldInputStage(files=str(p), priority="err")
    rows = collected(stage.generate(spark), "text", order=("turn_idx",))
    assert [r["text"] for r in rows] == ["sev3"]


def test_journald_priority_range(spark, tmp_path):
    """priority: crit..warning keeps only [2, 4]
    (docs/operators/journald_input.md range syntax)."""
    p = tmp_path / "j.json"
    p.write_text(
        "\n".join(
            _journal_line(f"sev{i}", 1000 + i, f"c{i}", PRIORITY=str(i))
            for i in range(8)
        )
        + "\n"
    )
    stage = JournaldInputStage(files=str(p), priority="crit..warning")
    rows = collected(stage.generate(spark), "text", order=("turn_idx",))
    assert [r["text"] for r in rows] == ["sev2", "sev3", "sev4"]


def test_journald_bridge_pump_and_cursor(tmp_path):
    br = JournaldBridge(str(tmp_path / "spool"))
    n = br.pump(
        [
            _journal_line("a", 1, "cur1"),
            "not json",
            _journal_line("b", 2, "cur2"),
        ]
    )
    assert n == 2
    assert br.last_cursor() == "cur2"
    # a fresh bridge over the same spool resumes from the cursor file
    assert JournaldBridge(str(tmp_path / "spool")).last_cursor() == "cur2"


def test_journald_requires_source_config():
    with pytest.raises(ValueError, match="directory / files"):
        JournaldInputStage()
    with pytest.raises(ValueError, match="start_at"):
        JournaldInputStage(files="/x", start_at="middle")


# ---- k8s_event -------------------------------------------------------


def _watch_event(type_, kind, name, uid, ns, **ts):
    obj = {
        "involvedObject": {"kind": kind, "name": name, "uid": uid,
                           "namespace": ns},
        "metadata": {"name": f"{name}.ev"},
        "message": f"event about {name}",
        **ts,
    }
    return json.dumps({"type": type_, "object": obj})


def test_k8s_event_decode(spark, tmp_path):
    p = tmp_path / "watch.json"
    p.write_text(
        "\n".join(
            [
                _watch_event("ADDED", "Pod", "web-1", "u1", "prod",
                             eventTime="2024-03-01T10:00:00.123456Z",
                             lastTimestamp="2024-03-01T11:00:00Z"),
                _watch_event("MODIFIED", "Deployment", "web", "u2", "prod",
                             lastTimestamp="2024-03-02T10:00:00Z"),
                _watch_event("DELETED", "Container", "sidecar", "u3", "dev",
                             firstTimestamp="2024-03-03T10:00:00Z"),
                "not json at all",
            ]
        )
        + "\n"
    )
    stage = K8sEventInputStage(files=str(p))
    rows = collected(
        stage.generate(spark), "attributes", "resource", "body", "ts",
        order=("turn_idx",),
    )
    assert len(rows) == 3
    # EventTime beats LastTimestamp (k8s_event.go:276-284)
    assert rows[0]["ts"].isoformat().startswith("2024-03-01T10:00:00.123456")
    assert rows[1]["ts"].isoformat().startswith("2024-03-02T10:00:00")
    assert rows[2]["ts"].isoformat().startswith("2024-03-03T10:00:00")
    assert [r["attributes"]["event_type"] for r in rows] == [
        "ADDED", "MODIFIED", "DELETED",
    ]
    r0, r1, r2 = (r["resource"] for r in rows)
    assert r0["k8s.pod.uid"] == "u1" and r0["k8s.pod.name"] == "web-1"
    assert r0["k8s.namespace.name"] == "prod"
    assert r1["k8s.deployment.uid"] == "u2"
    # Container gets name only (k8s_event.go:312-313)
    assert r2["k8s.container.name"] == "sidecar"
    assert "k8s.container.uid" not in r2
    # the unstructured object IS the body; nested values JSON-encoded
    assert json.loads(rows[0]["body"]["involvedObject"])["kind"] == "Pod"


def test_k8s_event_namespace_filter(spark, tmp_path):
    p = tmp_path / "watch.json"
    p.write_text(
        _watch_event("ADDED", "Pod", "a", "u", "prod",
                     lastTimestamp="2024-01-01T00:00:00Z")
        + "\n"
        + _watch_event("ADDED", "Pod", "b", "u", "dev",
                       lastTimestamp="2024-01-01T00:00:00Z")
        + "\n"
    )
    stage = K8sEventInputStage(files=str(p), namespaces=["dev"])
    rows = collected(stage.generate(spark), "resource", order=("turn_idx",))
    assert len(rows) == 1
    assert rows[0]["resource"]["k8s.pod.name"] == "b"


# ---- windows_eventlog ------------------------------------------------


def _event_xml(channel="Application", level="2", rendered_level=None,
               message=None, record_id=1, system_time="2022-04-22T10:20:52.3778625Z"):
    ri = ""
    if rendered_level is not None or message is not None:
        ri = "<RenderingInfo Culture='en-US'>"
        if message is not None:
            ri += f"<Message>{message}</Message>"
        if rendered_level is not None:
            ri += f"<Level>{rendered_level}</Level>"
        ri += "<Keywords><Keyword>Classic</Keyword></Keywords></RenderingInfo>"
    return (
        "<Event><System>"
        "<Provider Name='MSSQLSERVER' EventSourceName='MSSQLSERVER'/>"
        f"<EventID Qualifiers='16384'>1000</EventID>"
        f"<Level>{level}</Level><Task>3</Task><Opcode>0</Opcode>"
        f"<TimeCreated SystemTime='{system_time}'/>"
        f"<EventRecordID>{record_id}</EventRecordID>"
        f"<Channel>{channel}</Channel><Computer>c0</Computer>"
        "</System><EventData><Data>v1</Data><Data>v2</Data></EventData>"
        + ri + "</Event>"
    )


def test_windows_event_decode(spark, tmp_path):
    p = tmp_path / "events.xml"
    p.write_text(
        _event_xml(level="2", record_id=10)
        + "\n"
        + _event_xml(level="4", rendered_level="Warning",
                     message="rendered msg", record_id=11)
        + "\n"
    )
    stage = WindowsEventLogInputStage(files=str(p))
    rows = collected(stage.generate(spark), "body", "severity",
                     "severity_text", "ts", "text", order=("turn_idx",))
    b0, b1 = rows[0]["body"], rows[1]["body"]
    assert json.loads(b0["event_id"]) == {"qualifiers": 16384, "id": 1000}
    assert json.loads(b0["provider"])["name"] == "MSSQLSERVER"
    assert b0["channel"] == "Application" and b0["record_id"] == "10"
    assert b0["level"] == "2"  # numeric fallback when not rendered
    assert rows[0]["severity"] == 17  # Level 2 -> Error
    assert json.loads(b0["event_data"]) == ["v1", "v2"]
    # microsecond-truncated RFC3339Nano
    assert rows[0]["ts"].isoformat().startswith("2022-04-22T10:20:52.377862")
    # rendered values win when present (xml.go:94-112)
    assert b1["level"] == "Warning" and rows[1]["severity"] == 13
    assert b1["message"] == "rendered msg" and rows[1]["text"] == "rendered msg"
    assert json.loads(b1["keywords"]) == ["Classic"]


def test_windows_security_message_parse():
    msg = (
        "A user account was enabled.\n"
        "\n"
        "Subject:\n"
        "\tSecurity ID:\tWIN\\user\n"
        "\tAccount Name:\tuser\n"
        "\n"
        "Target Account:\n"
        "\tSecurity ID:\tWIN\\target\n"
        "\tAccount Name:\ttarget\n"
    )
    subject, details = _parse_security_message(msg)
    assert subject == "A user account was enabled."
    d = json.loads(details)
    assert d["Subject"]["Security ID"] == "WIN\\user"
    assert d["Target Account"]["Account Name"] == "target"


def test_windows_security_channel_splits_details(spark, tmp_path):
    msg = "Logon ok.\n\nSubject:\n\tAccount Name:\tsvc\n"
    # XML-escape is not needed: no special chars in the fixture
    p = tmp_path / "sec.xml"
    p.write_text(
        _event_xml(channel="Security",
                   message=msg.replace("\n", "&#10;").replace("\t", "&#9;"),
                   record_id=5)
        + "\n"
    )
    stage = WindowsEventLogInputStage(files=str(p))
    rows = collected(stage.generate(spark), "body", "text",
                     order=("turn_idx",))
    b = rows[0]["body"]
    assert rows[0]["text"] == "Logon ok."
    assert json.loads(b["details"])["Subject"]["Account Name"] == "svc"


def test_windows_bookmark_resume(spark, tmp_path):
    p = tmp_path / "events.xml"
    p.write_text(
        "\n".join(_event_xml(record_id=i) for i in (1, 2, 3)) + "\n"
    )
    bm = str(tmp_path / "bookmark.json")
    stage = WindowsEventLogInputStage(files=str(p), bookmark_path=bm)
    df = stage.generate(spark)
    assert df.count() == 3
    stage.record_marks(df)
    stage.commit()
    # next run skips records at or below the bookmark
    stage2 = WindowsEventLogInputStage(files=str(p), bookmark_path=bm)
    assert stage2.generate(spark).count() == 0
    # a grown log yields only the new record
    p.write_text(
        "\n".join(_event_xml(record_id=i) for i in (1, 2, 3, 4)) + "\n"
    )
    rows = collected(stage2.generate(spark), "body", order=("turn_idx",))
    assert [r["body"]["record_id"] for r in rows] == ["4"]
