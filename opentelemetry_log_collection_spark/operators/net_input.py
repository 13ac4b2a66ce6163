"""tcp_input / udp_input — the reference's network listeners
(operator/input/tcp/tcp.go, operator/input/udp/udp.go), re-expressed
for a distributed batch/streaming engine.

The reference BINDS a listen address, accepts pushed log streams,
splits them with the shared multiline splitter, and emits entries
with optional ``net.*`` attributes (tcp.go:263-276, udp.go:183-189).
A socket accept loop is inherently a single-process ingest point — in
the reference too (one goroutine pool per listener) — so the Spark
design splits the operator in two:

  1. ``NetListenerBridge`` — a driver-side listener (TCP accept loop /
     UDP datagram receiver) that performs the PROTOCOL work the
     cluster cannot: accept, charset decode, incremental multiline
     split (same semantics as file_input's byte-stream splitter),
     ``net.*`` attribute capture. Completed entries append to a spool
     directory as JSON lines via atomic rename, so readers never see
     half a file.
  2. The ``tcp_input``/``udp_input`` stages — scan the spool with the
     ordinary distributed reader (``spark.read.json`` with an explicit
     schema; ``stream()`` gives the ``readStream`` equivalent), then
     map to entries exactly like every other source. Everything after
     the socket is cluster-parallel: at 100 TB the spool is the
     landing zone (in production: object storage written by N
     independent listener processes), and Spark scans it with full
     partition parallelism — the listener is never a shuffle
     participant.

TLS (tcp.go:124-143): the bridge terminates TLS itself via stdlib
``ssl`` — ``tls: {cert_file, key_file}`` loads a server cert chain
and every accepted connection handshakes before the splitter sees a
byte. Handshake failures drop that connection (error-and-continue,
like the reference's per-connection goroutine) without touching the
listener. UDP has no TLS in the reference either (udp.go); the key is
rejected there.
"""

from __future__ import annotations

import json
import os
import re
import socket
import ssl
import tempfile
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..entry import to_entries
from ..pipeline import Stage, register
from .io import _ENCODINGS, stamp

DEFAULT_MAX_LOG_SIZE = 1024 * 1024  # tcp.go:40-42

#: spool record schema — what the bridge writes and the scan reads
SPOOL_SCHEMA = T.StructType(
    [
        T.StructField("conn_id", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("net", T.MapType(T.StringType(), T.StringType())),
    ]
)


class _Splitter:
    """Incremental byte-stream splitter with the reference's multiline
    semantics (helper/multiline.go): newline split by default; with
    ``line_start_pattern`` a matching line STARTS a new entry (leading
    non-matching lines form one entry); with ``line_end_pattern`` a
    matching line ENDS the entry. ``max_log_size`` force-flushes an
    oversized pending buffer (tcp.go buffers at most MaxLogSize)."""

    def __init__(self, line_start: str | None, line_end: str | None,
                 max_log_size: int):
        if line_start and line_end:
            raise ValueError(
                "at most one of line_start_pattern / line_end_pattern"
            )
        self.start = re.compile(line_start) if line_start else None
        self.end = re.compile(line_end) if line_end else None
        self.max = max_log_size
        self._buf = ""          # undelivered partial line
        self._group: list[str] = []  # completed lines awaiting a boundary

    def feed(self, text: str) -> list[str]:
        """Consume decoded text, return completed entries."""
        out: list[str] = []
        self._buf += text
        *lines, self._buf = self._buf.split("\n")
        for ln in lines:
            ln = ln.rstrip("\r")
            if self.start is not None:
                if self.start.search(ln) and self._group:
                    out.append("\n".join(self._group))
                    self._group = []
                self._group.append(ln)
            elif self.end is not None:
                self._group.append(ln)
                if self.end.search(ln):
                    out.append("\n".join(self._group))
                    self._group = []
            else:
                out.append(ln)
            if sum(len(g) for g in self._group) > self.max:
                out.append("\n".join(self._group))
                self._group = []
        if len(self._buf) > self.max:
            out.append(self._buf)
            self._buf = ""
        return out

    def flush(self) -> list[str]:
        """Connection closed: emit whatever is pending (a bufio
        scanner emits the final unterminated token at EOF)."""
        out: list[str] = []
        if self._buf:
            self._group.append(self._buf.rstrip("\r"))
            self._buf = ""
        if self._group:
            out.append("\n".join(self._group))
            self._group = []
        return out


class NetListenerBridge:
    """Bind a TCP or UDP listen address and spool completed entries as
    JSON-line files (atomic rename per flush). One bridge per listen
    address, driver-side — the distributed part is the spool SCAN."""

    def __init__(
        self,
        spool_dir: str,
        protocol: str = "tcp",
        host: str = "127.0.0.1",
        port: int = 0,
        encoding: str = "utf8",
        line_start: str | None = None,
        line_end: str | None = None,
        max_log_size: int = DEFAULT_MAX_LOG_SIZE,
        add_attributes: bool = False,
        tls_cert: str | None = None,
        tls_key: str | None = None,
    ):
        if protocol not in ("tcp", "udp"):
            raise ValueError(f"unsupported protocol {protocol!r}")
        if tls_cert and protocol != "tcp":
            raise ValueError("tls is tcp-only (the reference has no UDP TLS)")
        self._ssl_ctx: ssl.SSLContext | None = None
        if tls_cert:
            # server-side TLS termination (tcp.go:124-143 ServerConfig):
            # load_cert_chain fails fast here on a bad cert/key pair
            self._ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            self._ssl_ctx.load_cert_chain(tls_cert, tls_key)
        if encoding.lower() not in _ENCODINGS:
            raise ValueError(f"unsupported encoding {encoding!r}")
        # python codec names: the JVM charset table maps 1:1 here;
        # 'nop' = latin-1 identity, same as the file_input path
        self.codec = {
            "UTF-8": "utf-8", "US-ASCII": "ascii", "UTF-16": "utf-16",
            "UTF-16LE": "utf-16-le", "UTF-16BE": "utf-16-be",
            "ISO-8859-1": "latin-1",
        }[_ENCODINGS[encoding.lower()]]
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.protocol = protocol
        self.host, self.port = host, port
        self.line_start, self.line_end = line_start, line_end
        self.max_log_size = max_log_size
        self.add_attributes = add_attributes
        self._n_flush = 0
        self._lock = threading.Lock()
        self._threads: list[threading.Thread] = []
        self._stopping = threading.Event()
        self._sock: socket.socket | None = None

    # ---- spool writing ----------------------------------------------

    def _write_records(self, records: list[dict]) -> None:
        if not records:
            return
        with self._lock:
            n = self._n_flush
            self._n_flush += 1
        final = os.path.join(self.spool_dir, f"spool-{n:08d}.json")
        # "_"-prefixed temp name: Spark's file listing hides _/. files,
        # so an in-flight write is invisible to generate()/stream() and
        # only the atomic rename publishes it
        fd, tmp = tempfile.mkstemp(
            dir=self.spool_dir, prefix="_tmp-", suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, final)  # readers never see a partial file

    def _net_attrs(self, peer, transport: str) -> dict:
        # tcp.go:263-276 / udp.go:183-189 semconv attributes
        if not self.add_attributes:
            return {}
        attrs = {"net.transport": transport}
        if peer is not None:
            attrs["net.peer.ip"] = str(peer[0])
            attrs["net.peer.port"] = str(peer[1])
        attrs["net.host.ip"] = str(self.host)
        attrs["net.host.port"] = str(self.port)
        return attrs

    # ---- tcp ---------------------------------------------------------

    def _serve_tcp_conn(self, conn: socket.socket, peer) -> None:
        if self._ssl_ctx is not None:
            # handshake in the per-connection thread so a slow/garbage
            # client can't stall the accept loop; a failed handshake
            # drops only this connection (error-and-continue)
            conn.settimeout(5.0)
            try:
                conn = self._ssl_ctx.wrap_socket(conn, server_side=True)
            except (ssl.SSLError, OSError, socket.timeout):
                conn.close()
                return
        conn_id = f"tcp://{peer[0]}:{peer[1]}"
        attrs = self._net_attrs(peer, "IP.TCP")
        splitter = _Splitter(self.line_start, self.line_end, self.max_log_size)
        seq = 0
        raw = b""

        def emit(entries: list[str]) -> None:
            nonlocal seq
            recs = []
            for e in entries:
                recs.append(
                    {"conn_id": conn_id, "seq": seq, "text": e, "net": attrs}
                )
                seq += 1
            self._write_records(recs)

        try:
            # accepted sockets also time out so the loop re-checks
            # _stopping — otherwise stop() can never end an idle
            # connection and its pending group would be lost unflushed
            conn.settimeout(0.2)
            while not self._stopping.is_set():
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue
                if not chunk:
                    break
                raw += chunk
                # decode what is decodable; keep an undecodable tail
                # (a multibyte char split across recv boundaries)
                for cut in range(len(raw), max(len(raw) - 4, -1), -1):
                    try:
                        text = raw[:cut].decode(self.codec)
                        raw = raw[cut:]
                        break
                    except UnicodeDecodeError:
                        continue
                else:
                    # a genuinely invalid byte (not a split multibyte
                    # char) would otherwise wedge the decode forever
                    # and buffer unboundedly: past max_log_size, force
                    # the U+FFFD path and move on
                    if len(raw) > self.max_log_size:
                        text = raw.decode(self.codec, errors="replace")
                        raw = b""
                        emit(splitter.feed(text))
                    continue
                emit(splitter.feed(text))
        finally:
            if raw:
                emit(splitter.feed(raw.decode(self.codec, errors="replace")))
            emit(splitter.flush())
            conn.close()

    def _tcp_accept_loop(self) -> None:
        self._sock.settimeout(0.2)
        while not self._stopping.is_set():
            try:
                conn, peer = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(
                target=self._serve_tcp_conn, args=(conn, peer), daemon=True
            )
            t.start()
            self._threads.append(t)

    # ---- udp ---------------------------------------------------------

    #: UDP spool batching (same shape as the journald pump's 1000-line
    #: flush): a high-rate sender would otherwise land one tiny spool
    #: file PER DATAGRAM, and every distributed listing pays for each
    UDP_FLUSH_COUNT = 1000
    UDP_FLUSH_AGE_S = 0.5

    def _udp_loop(self) -> None:
        self._sock.settimeout(0.2)
        per_peer_seq: dict[str, int] = {}
        pending: list[dict] = []
        pending_since = 0.0

        def flush() -> None:
            nonlocal pending
            if pending:
                self._write_records(pending)
                pending = []

        while not self._stopping.is_set():
            try:
                data, peer = self._sock.recvfrom(65536)
            except socket.timeout:
                # idle tick: age out whatever accumulated
                if pending and time.monotonic() - pending_since >= self.UDP_FLUSH_AGE_S:
                    flush()
                continue
            except OSError:
                break
            conn_id = f"udp://{peer[0]}:{peer[1]}"
            # bound the per-peer sequence table: ephemeral-port senders
            # (one socket per message) would otherwise grow it forever
            if conn_id not in per_peer_seq and len(per_peer_seq) >= 65536:
                per_peer_seq.pop(next(iter(per_peer_seq)))
            attrs = self._net_attrs(peer, "IP.UDP")
            # each datagram is split independently (udp.go:167: a fresh
            # scanner per datagram); the final unterminated token flushes
            sp = _Splitter(self.line_start, self.line_end, self.max_log_size)
            entries = sp.feed(data.decode(self.codec, errors="replace"))
            entries += sp.flush()
            seq = per_peer_seq.get(conn_id, 0)
            if not pending:
                pending_since = time.monotonic()
            for e in entries:
                pending.append(
                    {"conn_id": conn_id, "seq": seq, "text": e, "net": attrs}
                )
                seq += 1
            per_peer_seq[conn_id] = seq
            # count- or age-triggered flush; a single spool file keeps
            # per-peer ordering because records append in receive order
            if (
                len(pending) >= self.UDP_FLUSH_COUNT
                or time.monotonic() - pending_since >= self.UDP_FLUSH_AGE_S
            ):
                flush()
        flush()  # loop exit (stop() or socket close): nothing is lost

    # ---- lifecycle ---------------------------------------------------

    def start(self) -> "NetListenerBridge":
        if self.protocol == "tcp":
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._sock.bind((self.host, self.port))
            self.port = self._sock.getsockname()[1]
            self._sock.listen(32)
            t = threading.Thread(target=self._tcp_accept_loop, daemon=True)
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._sock.bind((self.host, self.port))
            self.port = self._sock.getsockname()[1]
            t = threading.Thread(target=self._udp_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def stop(self, drain_s: float = 0.5) -> None:
        time.sleep(drain_s)  # let in-flight handlers finish their reads
        self._stopping.set()
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
        for t in self._threads:
            t.join(timeout=2.0)


class _NetInputStage(Stage):
    """Shared scan half of tcp_input/udp_input: distributed read of
    the bridge's spool -> entry frame (+ net.* attrs merge)."""

    protocol = "tcp"

    def __init__(
        self,
        listen_address: str = "127.0.0.1:0",
        spool_dir: str | None = None,
        encoding: str = "utf8",
        multiline: dict | None = None,
        max_log_size: int = DEFAULT_MAX_LOG_SIZE,
        add_attributes: bool = False,
        tls: dict | None = None,
        attributes: dict | None = None,
        resource: dict | None = None,
        **kw,
    ):
        super().__init__(**kw)
        tls = tls or {}
        if tls and self.protocol != "tcp":
            raise ValueError("tls is tcp-only (the reference has no UDP TLS)")
        if tls and not (tls.get("cert_file") and tls.get("key_file")):
            raise ValueError("tls requires cert_file and key_file")
        host, _, port = listen_address.rpartition(":")
        multiline = multiline or {}
        self.spool_dir = spool_dir or tempfile.mkdtemp(
            prefix=f"{self.protocol}_spool_"
        )
        self.bridge = NetListenerBridge(
            self.spool_dir,
            protocol=self.protocol,
            host=host or "127.0.0.1",
            port=int(port or 0),
            encoding=encoding,
            line_start=multiline.get("line_start_pattern"),
            line_end=multiline.get("line_end_pattern"),
            max_log_size=int(max_log_size),
            add_attributes=add_attributes,
            tls_cert=tls.get("cert_file"),
            tls_key=tls.get("key_file"),
        )
        self.attributes = attributes
        self.resource = resource

    # the listener must be started explicitly (it owns a port):
    #   stage.bridge.start(); ...clients push...; stage.bridge.stop()
    # then generate()/stream() scan what landed.

    def generate(self, spark: SparkSession) -> DataFrame:
        spooled = spark.read.schema(SPOOL_SCHEMA).json(self.spool_dir)
        return self._spool_to_entries(spooled)

    def stream(self, spark: SparkSession) -> DataFrame:
        """Structured-Streaming variant: the spool is a file stream —
        new spool files become micro-batches (the production shape:
        listener processes land files, the cluster tails them)."""
        spooled = spark.readStream.schema(SPOOL_SCHEMA).json(self.spool_dir)
        return self._spool_to_entries(spooled)

    def _spool_to_entries(self, spooled: DataFrame) -> DataFrame:
        df = to_entries(
            spooled.select(
                F.col("conn_id").alias("conv_id"),
                F.col("seq").alias("turn_idx"),
                F.lit("").alias("role"),
                F.col("text").alias("text"),
                F.lit("").alias("tool"),
                F.lit(None).cast(T.TimestampType()).alias("ts"),
                F.col("net").alias("_net"),
            )
        )
        df = df.withColumn(
            "attributes",
            F.map_concat(
                F.col("attributes"),
                F.coalesce(
                    F.col("_net"),
                    F.map_from_arrays(F.array(), F.array()).cast(
                        "map<string,string>"
                    ),
                ),
            ),
        ).drop("_net")
        return stamp(df, self.attributes, self.resource)

    def apply(self, df: DataFrame) -> DataFrame:  # source: passthrough
        return df


@register("tcp_input")
class TcpInputStage(_NetInputStage):
    """TCP listener source (tcp.go). ``listen_address: host:port``
    (port 0 = ephemeral, read back from ``stage.bridge.port``)."""

    type_name = "tcp_input"
    protocol = "tcp"


@register("udp_input")
class UdpInputStage(_NetInputStage):
    """UDP datagram source (udp.go): each datagram splits with a fresh
    splitter, unterminated finals flush per datagram."""

    type_name = "udp_input"
    protocol = "udp"


@register("syslog_input")
class SyslogInputStage(Stage):
    """Composite source (operator/input/syslog/syslog.go:45-133): an
    internal tcp_input or udp_input wired straight into an internal
    syslog_parser — exactly the reference's build, which instantiates
    the two operators and points the listener's output at the parser.
    Exactly one of ``tcp:``/``udp:`` must be configured
    (syslog.go:103)."""

    type_name = "syslog_input"

    def __init__(
        self,
        tcp: dict | None = None,
        udp: dict | None = None,
        protocol: str = "rfc3164",
        location: str = "UTC",
        now: str | None = None,
        **kw,
    ):
        super().__init__(**kw)
        if (tcp is None) == (udp is None):
            raise ValueError("need tcp config or udp config")
        from .parsers import SyslogParserStage

        cls = TcpInputStage if tcp is not None else UdpInputStage
        # `tcp or udp` would turn an empty (all-default) tcp mapping
        # into None; pick by identity, not truthiness
        self.source = cls(**(tcp if tcp is not None else udp))
        self.bridge = self.source.bridge  # start()/stop() pass-through
        parser_kw = {"protocol": protocol, "location": location}
        if now is not None:
            parser_kw["now"] = now
        self.parser = SyslogParserStage(**parser_kw)

    def generate(self, spark: SparkSession) -> DataFrame:
        return self.parser.apply(self.source.generate(spark))

    def stream(self, spark: SparkSession) -> DataFrame:
        return self.parser.apply(self.source.stream(spark))

    def apply(self, df: DataFrame) -> DataFrame:  # source: passthrough
        return df
