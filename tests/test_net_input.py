"""tcp_input / udp_input: listener bridge + distributed spool scan.

Reference semantics under test: tcp.go (accept loop, shared splitter,
net.* attributes tcp.go:263-276), udp.go (per-datagram splitter,
udp.go:167,183-189), helper/multiline.go boundary modes.
"""
from __future__ import annotations

import pathlib
import socket
import time

import pytest

from opentelemetry_log_collection_spark.operators.net_input import (
    TcpInputStage,
    UdpInputStage,
    _Splitter,
)
from tests.conftest import collected


def _send_tcp(port: int, payloads: list[bytes], pause: float = 0.02):
    c = socket.create_connection(("127.0.0.1", port), timeout=5)
    for p in payloads:
        c.sendall(p)
        time.sleep(pause)
    c.close()


def _wait_spool(stage, n_min: int, timeout: float = 5.0):
    """Wait until the bridge has flushed at least n_min spool files."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if stage.bridge._n_flush >= n_min:
            return
        time.sleep(0.05)
    raise TimeoutError(f"spool never reached {n_min} flushes")


def _wait_records(stage, n_min: int, timeout: float = 5.0):
    """Wait until >= n_min records are visible in the spool (flushes
    may batch many records into one file, so file count != records)."""
    import glob

    deadline = time.time() + timeout
    while time.time() < deadline:
        n = 0
        for p in glob.glob(f"{stage.spool_dir}/spool-*.json"):
            with open(p) as f:
                n += sum(1 for ln in f if ln.strip())
        if n >= n_min:
            return
        time.sleep(0.05)
    raise TimeoutError(f"spool never reached {n_min} records")


# ---- splitter unit semantics -----------------------------------------


def test_splitter_newline_and_partial():
    sp = _Splitter(None, None, 1 << 20)
    assert sp.feed("a\nb\nc") == ["a", "b"]
    assert sp.feed("1\r\nd\n") == ["c1", "d"]
    assert sp.flush() == []


def test_splitter_line_start_groups():
    sp = _Splitter(r"^START", None, 1 << 20)
    got = sp.feed("pre1\npre2\nSTART x\ncont\nSTART y\n")
    # leading non-matching lines form their own entry (stanza
    # LineStartSplitFunc emits pre-match bytes as a token)
    assert got == ["pre1\npre2", "START x\ncont"]
    assert sp.flush() == ["START y"]


def test_splitter_line_end_groups():
    sp = _Splitter(None, r"END$", 1 << 20)
    got = sp.feed("a\nb END\nc\n")
    assert got == ["a\nb END"]
    assert sp.flush() == ["c"]


def test_splitter_max_log_size_force_flush():
    sp = _Splitter(r"^S", None, 8)
    got = sp.feed("S aaaaaaaaaa\nS b\n")
    # the oversized pending group flushes without waiting for the next S
    assert got == ["S aaaaaaaaaa"]
    assert sp.flush() == ["S b"]


# ---- tcp -------------------------------------------------------------


def test_tcp_input_end_to_end(spark, tmp_path):
    stage = TcpInputStage(
        listen_address="127.0.0.1:0",
        spool_dir=str(tmp_path / "spool"),
        add_attributes=True,
    )
    stage.bridge.start()
    try:
        # one line split across sends + a multibyte char split across
        # recv boundaries ("é" = 0xC3 0xA9) + an unterminated final
        _send_tcp(
            stage.bridge.port,
            [b"hello ", b"world\ncaf", b"\xc3", b"\xa9\ntail"],
        )
        _wait_spool(stage, 1)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "turn_idx", "text", "attributes",
                     order=("turn_idx",))
    assert [r["text"] for r in rows] == ["hello world", "café", "tail"]
    assert [r["turn_idx"] for r in rows] == [0, 1, 2]
    a = rows[0]["attributes"]
    assert a["net.transport"] == "IP.TCP"
    assert a["net.peer.ip"] == "127.0.0.1"
    assert a["net.host.port"] == str(stage.bridge.port)


def test_tcp_input_multiline_and_no_attrs(spark, tmp_path):
    stage = TcpInputStage(
        listen_address="127.0.0.1:0",
        spool_dir=str(tmp_path / "spool"),
        multiline={"line_start_pattern": r"^\d{4}-"},
    )
    stage.bridge.start()
    try:
        _send_tcp(
            stage.bridge.port,
            [b"2024-01-01 boom\n  at frame1\n  at frame2\n2024-01-02 ok\n"],
        )
        _wait_spool(stage, 1)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "text", "attributes",
                     order=("turn_idx",))
    assert [r["text"] for r in rows] == [
        "2024-01-01 boom\n  at frame1\n  at frame2",
        "2024-01-02 ok",
    ]
    assert all("net.transport" not in r["attributes"] for r in rows)


def test_tcp_two_connections_independent_sequences(spark, tmp_path):
    stage = TcpInputStage(
        listen_address="127.0.0.1:0", spool_dir=str(tmp_path / "spool")
    )
    stage.bridge.start()
    try:
        _send_tcp(stage.bridge.port, [b"a1\na2\n"])
        _send_tcp(stage.bridge.port, [b"b1\n"])
        _wait_spool(stage, 2)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "conv_id", "turn_idx", "text",
                     order=("conv_id", "turn_idx"))
    bodies = sorted(
        tuple(r["text"] for r in rows if r["conv_id"] == cid)
        for cid in {r["conv_id"] for r in rows}
    )
    assert bodies == [("a1", "a2"), ("b1",)]
    # per-connection sequence restarts at 0
    assert {r["turn_idx"] for r in rows if r["text"] == "a1"} == {0}
    assert {r["turn_idx"] for r in rows if r["text"] == "b1"} == {0}


def test_tcp_invalid_byte_does_not_wedge_decode(spark, tmp_path):
    """A stray non-UTF-8 byte must not stall the incremental decoder
    forever: past max_log_size the buffer force-decodes with U+FFFD
    and the stream keeps flowing."""
    stage = TcpInputStage(
        listen_address="127.0.0.1:0",
        spool_dir=str(tmp_path / "spool"),
        max_log_size=16,
    )
    stage.bridge.start()
    try:
        _send_tcp(
            stage.bridge.port,
            [b"\xffgarbage prefix then lines\n", b"clean line\n"],
        )
        _wait_spool(stage, 1)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "text", order=("turn_idx",))
    texts = [r["text"] for r in rows]
    assert "clean line" in texts
    assert any("�" in t for t in texts)


def test_spool_temp_files_hidden_from_spark(tmp_path):
    """In-flight spool writes use a '_' prefix, which Spark's file
    listing ignores — a reader never sees a half-written file."""
    import os

    from opentelemetry_log_collection_spark.operators.net_input import (
        NetListenerBridge,
    )

    br = NetListenerBridge(str(tmp_path / "spool"))
    br._write_records([{"conn_id": "c", "seq": 0, "text": "x", "net": {}}])
    names = os.listdir(br.spool_dir)
    assert all(n.startswith(("spool-", "_")) for n in names)


def test_syslog_input_empty_tcp_mapping(tmp_path):
    """tcp: {} (all defaults) must build — `tcp or udp` truthiness
    would have turned it into None."""
    from opentelemetry_log_collection_spark.operators.net_input import (
        SyslogInputStage,
    )

    stage = SyslogInputStage(tcp={})
    assert stage.source.protocol == "tcp"


FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def test_tls_tcp_round_trip(spark, tmp_path):
    """tcp_input terminates TLS itself (tcp.go:124-143): a client that
    VERIFIES the server cert (fixture self-signed cert as its own CA)
    handshakes, pushes lines, and the decoded entries come out of the
    distributed spool scan like any plaintext connection."""
    import ssl

    stage = TcpInputStage(
        listen_address="127.0.0.1:0",
        spool_dir=str(tmp_path / "spool"),
        add_attributes=True,
        tls={
            "cert_file": str(FIXTURES / "tls_cert.pem"),
            "key_file": str(FIXTURES / "tls_key.pem"),
        },
    )
    stage.bridge.start()
    try:
        ctx = ssl.create_default_context(
            cafile=str(FIXTURES / "tls_cert.pem")
        )
        ctx.check_hostname = False  # cert CN=localhost, we dial the IP
        ctx.verify_mode = ssl.CERT_REQUIRED
        raw = socket.create_connection(
            ("127.0.0.1", stage.bridge.port), timeout=5
        )
        c = ctx.wrap_socket(raw)
        assert c.version() is not None  # TLS actually negotiated
        c.sendall(b"secure one\nsecure two\n")
        c.close()
        _wait_records(stage, 2)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "turn_idx", "text", "attributes",
                     order=("turn_idx",))
    assert [r["text"] for r in rows] == ["secure one", "secure two"]
    assert rows[0]["attributes"]["net.transport"] == "IP.TCP"


def test_tls_plaintext_client_dropped_not_fatal(spark, tmp_path):
    """A non-TLS client against a TLS listener fails its handshake and
    is dropped error-and-continue: the listener survives and a proper
    TLS client still gets through afterwards."""
    import ssl

    stage = TcpInputStage(
        listen_address="127.0.0.1:0",
        spool_dir=str(tmp_path / "spool"),
        tls={
            "cert_file": str(FIXTURES / "tls_cert.pem"),
            "key_file": str(FIXTURES / "tls_key.pem"),
        },
    )
    stage.bridge.start()
    try:
        bad = socket.create_connection(("127.0.0.1", stage.bridge.port),
                                       timeout=5)
        bad.sendall(b"not a tls hello\n")
        bad.close()
        time.sleep(0.3)
        ctx = ssl._create_unverified_context()
        c = ctx.wrap_socket(
            socket.create_connection(("127.0.0.1", stage.bridge.port),
                                     timeout=5)
        )
        c.sendall(b"after-garbage\n")
        c.close()
        _wait_records(stage, 1)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "text")
    assert [r["text"] for r in rows] == ["after-garbage"]


def test_tls_config_validation(tmp_path):
    with pytest.raises(ValueError, match="cert_file and key_file"):
        TcpInputStage(
            listen_address="127.0.0.1:0",
            spool_dir=str(tmp_path / "s"),
            tls={"cert_file": "/nope"},  # key_file missing
        )
    with pytest.raises(ValueError, match="tcp-only"):
        UdpInputStage(
            listen_address="127.0.0.1:0",
            spool_dir=str(tmp_path / "s2"),
            tls={"cert_file": "/c", "key_file": "/k"},
        )


# ---- udp -------------------------------------------------------------


def test_udp_datagrams_split_independently(spark, tmp_path):
    stage = UdpInputStage(
        listen_address="127.0.0.1:0",
        spool_dir=str(tmp_path / "spool"),
        add_attributes=True,
    )
    stage.bridge.start()
    try:
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        addr = ("127.0.0.1", stage.bridge.port)
        # udp.go:167 — fresh scanner per datagram: the unterminated
        # tail of datagram 1 must NOT join datagram 2
        c.sendto(b"one\ntwo", addr)
        c.sendto(b"three\n", addr)
        c.close()
        _wait_records(stage, 3)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "turn_idx", "text", "attributes",
                     order=("turn_idx",))
    assert [r["text"] for r in rows] == ["one", "two", "three"]
    assert [r["turn_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["attributes"]["net.transport"] == "IP.UDP"


def test_udp_spool_batches_datagrams(spark, tmp_path):
    """A burst of N datagrams lands in far fewer than N spool files
    (count/age-batched flush, like the journald pump) with per-peer
    receive order preserved — one file per datagram would make every
    distributed listing pay for thousands of tiny files."""
    stage = UdpInputStage(
        listen_address="127.0.0.1:0", spool_dir=str(tmp_path / "spool")
    )
    stage.bridge.start()
    n = 200
    try:
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        addr = ("127.0.0.1", stage.bridge.port)
        for i in range(n):
            c.sendto(f"msg-{i:04d}\n".encode(), addr)
        c.close()
        _wait_records(stage, n)
    finally:
        stage.bridge.stop()
    assert stage.bridge._n_flush <= n // 10  # batched, not per-datagram
    rows = collected(stage.generate(spark), "conv_id", "turn_idx", "text",
                     order=("conv_id", "turn_idx"))
    assert len(rows) == n
    for r in rows:  # seq order == send order within the (single) peer
        assert r["text"] == f"msg-{r['turn_idx']:04d}"


def test_syslog_input_composite(spark, tmp_path):
    """syslog_input = internal tcp_input -> internal syslog_parser
    (syslog.go:45-133): RFC3164 lines pushed over a real socket come
    out parsed, with the priority split into facility/severity."""
    from opentelemetry_log_collection_spark.operators.net_input import (
        SyslogInputStage,
    )

    stage = SyslogInputStage(
        tcp={"listen_address": "127.0.0.1:0",
             "spool_dir": str(tmp_path / "spool")},
        protocol="rfc3164",
    )
    stage.bridge.start()
    try:
        _send_tcp(
            stage.bridge.port,
            [b"<34>Jan 12 06:30:00 host1 app[42]: something failed\n"],
        )
        _wait_spool(stage.source, 1)
    finally:
        stage.bridge.stop()
    rows = collected(stage.generate(spark), "attributes", "severity",
                     order=("turn_idx",))
    a = rows[0]["attributes"]
    assert a["hostname"] == "host1"
    assert a["appname"] == "app"
    assert a["message"] == "something failed"
    assert rows[0]["severity"] is not None


def test_syslog_input_requires_exactly_one_transport(tmp_path):
    from opentelemetry_log_collection_spark.operators.net_input import (
        SyslogInputStage,
    )

    with pytest.raises(ValueError, match="tcp config or udp config"):
        SyslogInputStage()
    with pytest.raises(ValueError, match="tcp config or udp config"):
        SyslogInputStage(tcp={}, udp={})


def test_net_stream_builds(spark, tmp_path):
    """stream() must construct a valid streaming plan over the spool."""
    stage = TcpInputStage(
        listen_address="127.0.0.1:0", spool_dir=str(tmp_path / "spool")
    )
    sdf = stage.stream(spark)
    assert sdf.isStreaming
    assert "text" in sdf.columns and "attributes" in sdf.columns


def test_tcp_stream_available_now_equals_batch(spark, tmp_path):
    """Driving the same spool through stream() (availableNow micro-
    batches into a memory sink) yields exactly the rows generate()
    scans — the production shape: the listener lands files, the
    cluster tails them as a file stream."""
    stage = TcpInputStage(
        listen_address="127.0.0.1:0",
        spool_dir=str(tmp_path / "spool"),
        add_attributes=True,
    )
    stage.bridge.start()
    try:
        _send_tcp(stage.bridge.port, [b"alpha\nbeta\n", b"gamma\n"])
        _wait_records(stage, 3)
    finally:
        stage.bridge.stop()
    q = (
        stage.stream(spark)
        .writeStream.format("memory")
        .queryName("tcp_stream_avnow")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = [
        (r["turn_idx"], r["text"])
        for r in spark.sql(
            "select * from tcp_stream_avnow order by turn_idx"
        ).collect()
    ]
    want = [
        (r["turn_idx"], r["text"])
        for r in collected(stage.generate(spark), "turn_idx", "text",
                           order=("turn_idx",))
    ]
    assert got == want == [(0, "alpha"), (1, "beta"), (2, "gamma")]
