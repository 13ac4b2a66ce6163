"""journald_input — systemd journal source
(operator/input/journald/journald.go:43-238), split Spark-first.

The reference spawns ``journalctl --utc --output=json --follow`` and
consumes one JSON object per line (journald.go:70-113,160-186). That
export format IS a dataset: the decode half here is a fully
distributed scan+parse of exported journal JSON lines (what
``journalctl -o json`` prints, what ``systemd-journal-remote`` lands
on disk), reusing ``file_input`` for the file/line plumbing. The
follow half — the part that genuinely needs a local journal socket —
is ``JournaldBridge``: a driver-side pump that spawns journalctl when
the binary exists (gated, absent in this sandbox), appends its stdout
to a spool directory, and persists the last-read cursor exactly like
the reference's ``lastReadCursor`` persister key
(journald.go:133-143,175-178). At 100 TB the spool is the
object-store landing zone of N independent collectors and the scan
side never serializes through the pump.

Per-entry semantics mirrored from journald.go:188-231:
  - the JSON object becomes the body map (nested values stay
    JSON-encoded — the engine's MAP_SS convention);
  - ``__REALTIME_TIMESTAMP`` (µs) becomes the entry timestamp and is
    DELETED from the body; ``__CURSOR`` is required but stays in it;
  - a line missing either field is a parse failure: warn-and-skip in
    the reference (journald.go:170-173) -> dropped here;
  - ``units``/``priority`` configs filter like the journalctl flags
    the reference passes (--unit / --priority, journald.go:88-93):
    priority P keeps entries with PRIORITY <= P (numerically lower is
    more severe in syslog).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fields import MAP_SS
from ..pipeline import Stage, register
from .io import FileInputStage, stamp

#: syslog priority names accepted by ``journalctl --priority``
PRIORITIES = {
    "emerg": 0, "alert": 1, "crit": 2, "err": 3,
    "warning": 4, "notice": 5, "info": 6, "debug": 7,
}

TS_FIELD = "__REALTIME_TIMESTAMP"
CURSOR_FIELD = "__CURSOR"


class JournaldBridge:
    """Driver-side follow pump (the reference's reader goroutine,
    journald.go:160-186): consume journalctl's stdout line stream,
    append complete lines to spool files, persist the last cursor so
    a restart resumes with ``--after-cursor`` (journald.go:104-107).

    ``pump(lines)`` is the testable core; ``start()`` wires it to a
    real ``journalctl`` process when the binary exists."""

    def __init__(self, spool_dir: str, cursor_path: str | None = None):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.cursor_path = cursor_path or os.path.join(
            spool_dir, "_lastReadCursor"
        )
        self._n_flush = 0
        self._proc: subprocess.Popen | None = None

    # -- cursor persistence (atomic, like checkpoint.py's ledger) ----

    def last_cursor(self) -> str | None:
        try:
            with open(self.cursor_path) as f:
                return f.read() or None
        except FileNotFoundError:
            return None

    def _set_cursor(self, cursor: str) -> None:
        # "_" prefix: the cursor temp lives in the scanned spool dir
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.cursor_path), prefix="_cur-"
        )
        with os.fdopen(fd, "w") as f:
            f.write(cursor)
        os.rename(tmp, self.cursor_path)

    # -- pumping ------------------------------------------------------

    def pump(self, lines: list[str]) -> int:
        """Spool a batch of journal-export JSON lines; returns how
        many were accepted. Malformed lines and lines without a
        cursor are skipped with the reference's warn-and-continue
        semantics (journald.go:170-173)."""
        kept: list[str] = []
        last_cursor = None
        for ln in lines:
            ln = ln.strip()
            if not ln:
                continue
            try:
                obj = json.loads(ln)
                cursor = obj[CURSOR_FIELD]
                int(obj[TS_FIELD])
            except (ValueError, KeyError, TypeError):
                continue
            kept.append(ln)
            last_cursor = cursor
        if kept:
            n = self._n_flush
            self._n_flush += 1
            final = os.path.join(self.spool_dir, f"journal-{n:08d}.json")
            # "_" prefix keeps the in-flight file invisible to Spark's
            # listing; the atomic rename publishes it
            fd, tmp = tempfile.mkstemp(
                dir=self.spool_dir, prefix="_tmp-", suffix=".tmp"
            )
            with os.fdopen(fd, "w") as f:
                f.write("\n".join(kept) + "\n")
            os.rename(tmp, final)
            self._set_cursor(last_cursor)
        return len(kept)

    def start(self, extra_args: list[str] | None = None) -> subprocess.Popen:
        """Spawn ``journalctl --utc --output=json --follow`` (plus
        ``--after-cursor`` when a cursor is persisted) and pump its
        stdout until EOF. Requires the binary; this sandbox has none,
        so the path is gated, not stubbed silently."""
        if shutil.which("journalctl") is None:
            raise RuntimeError(
                "journalctl not found on PATH; feed exported JSON via "
                "files=/directory= or JournaldBridge.pump() instead"
            )
        args = ["journalctl", "--utc", "--output=json", "--follow"]
        cursor = self.last_cursor()
        if cursor:
            args += ["--after-cursor", cursor]
        args += extra_args or []
        self._proc = subprocess.Popen(
            args, stdout=subprocess.PIPE, text=True
        )
        # batch the pump: one spool file + cursor write per BATCH, not
        # per journal line — a busy host emits thousands of lines/sec
        # and per-line flushing would litter the spool with one-line
        # files that every distributed listing must then pay for
        batch: list[str] = []
        for line in self._proc.stdout:
            batch.append(line)
            if len(batch) >= 1000:
                self.pump(batch)
                batch = []
        if batch:
            self.pump(batch)
        return self._proc


@register("journald_input")
class JournaldInputStage(Stage):
    """Distributed decode of journald JSON-line exports."""

    type_name = "journald_input"

    def __init__(
        self,
        directory: str | None = None,
        files: str | list[str] | None = None,
        units: list[str] | None = None,
        priority: str | int = "info",
        start_at: str = "end",  # accepted for config parity; the
        # batch scan always reads what exists (≙ beginning); the knob
        # only matters for the follow bridge
        attributes: dict | None = None,
        resource: dict | None = None,
        **kw,
    ):
        super().__init__(**kw)
        if start_at not in ("beginning", "end"):
            raise ValueError(
                f"invalid value '{start_at}' for parameter 'start_at'"
            )
        if directory is not None:
            include: list[str] = [os.path.join(directory, "*")]
        elif files:
            include = [files] if isinstance(files, str) else list(files)
        else:
            raise ValueError("one of directory / files is required")
        # journalctl --priority accepts a single level (keeps <= P,
        # i.e. at least that severe) or a FROM..TO range
        # (docs/operators/journald_input.md "priority: emerg..err")
        if isinstance(priority, str) and ".." in priority:
            lo_s, _, hi_s = priority.partition("..")
            try:
                lo = PRIORITIES.get(lo_s) if lo_s in PRIORITIES else int(lo_s)
                hi = PRIORITIES.get(hi_s) if hi_s in PRIORITIES else int(hi_s)
            except ValueError:
                raise ValueError(f"invalid priority range {priority!r}")
            self.prio_lo, self.prio_hi = int(lo), int(hi)
        else:
            if isinstance(priority, str):
                if priority not in PRIORITIES:
                    raise ValueError(f"invalid priority {priority!r}")
                priority = PRIORITIES[priority]
            self.prio_lo, self.prio_hi = 0, int(priority)
        if self.prio_lo > self.prio_hi:
            raise ValueError(
                f"priority range is inverted: {self.prio_lo}..{self.prio_hi}"
            )
        self.units = list(units or [])
        self.reader = FileInputStage(
            include=include, include_file_name=False
        )
        self.attributes = attributes
        self.resource = resource

    def generate(self, spark: SparkSession) -> DataFrame:
        lines = self.reader.generate(spark)
        obj = F.from_json(F.col("text"), MAP_SS)
        ts_us = F.try_element_at(obj, F.lit(TS_FIELD)).try_cast("bigint")
        df = (
            lines.withColumn("_obj", obj)
            .withColumn("_ts_us", ts_us)
            # parse failures: not JSON / no cursor / bad timestamp ->
            # warn-and-skip (journald.go:170-173)
            .filter(
                F.col("_obj").isNotNull()
                & F.col("_ts_us").isNotNull()
                & F.try_element_at(F.col("_obj"), F.lit(CURSOR_FIELD)).isNotNull()
            )
        )
        # journalctl-flag filters (journald.go:88-93)
        if self.units:
            df = df.filter(
                F.try_element_at(
                    F.col("_obj"), F.lit("_SYSTEMD_UNIT")
                ).isin(self.units)
            )
        prio = F.coalesce(
            F.try_element_at(
                F.col("_obj"), F.lit("PRIORITY")
            ).try_cast("int"),
            F.lit(PRIORITIES["info"]),
        )
        df = df.filter(prio.between(self.prio_lo, self.prio_hi))
        df = (
            df.withColumn(
                "body",
                # the timestamp is consumed into ts and deleted; the
                # cursor stays (journald.go:206-216 deletes only TS)
                F.map_filter(F.col("_obj"), lambda k, _: k != TS_FIELD),
            )
            .withColumn(
                "ts",
                F.timestamp_micros(F.col("_ts_us")),
            )
            .withColumn(
                "text",
                F.try_element_at(F.col("_obj"), F.lit("MESSAGE")),
            )
            .drop("_obj", "_ts_us")
        )
        return stamp(df, self.attributes, self.resource)

    def apply(self, df: DataFrame) -> DataFrame:  # source: passthrough
        return df
