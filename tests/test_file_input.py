"""file_input source: charset decode + multiline splitter semantics
(operator/input/file + helper/multiline.go + encoding.go fixtures,
written by the tests themselves — real files, real bytes)."""

from __future__ import annotations

import pytest

from opentelemetry_log_collection_spark.operators.io import FileInputStage


def rows(spark, stage):
    out = stage.generate(spark).orderBy("conv_id", "turn_idx").collect()
    return [(r["turn_idx"], r["text"], dict(r["attributes"] or {})) for r in out]


def test_utf8_lines_and_file_attrs(spark, tmp_path):
    (tmp_path / "a.log").write_text("one\ntwo\nthree\n", encoding="utf-8")
    got = rows(spark, FileInputStage(include=str(tmp_path / "a.log")))
    assert [(i, t) for i, t, _ in got] == [(0, "one"), (1, "two"), (2, "three")]
    assert got[0][2]["log.file.name"] == "a.log"


def test_utf16le_decode(spark, tmp_path):
    (tmp_path / "u16.log").write_bytes("héllo\nwörld\n".encode("utf-16-le"))
    got = rows(spark, FileInputStage(include=str(tmp_path / "u16.log"),
                                     encoding="utf16le"))
    assert [t for _, t, _ in got] == ["héllo", "wörld"]


def test_nop_encoding_preserves_bytes(spark, tmp_path):
    # 0xFF is invalid UTF-8; nop (latin-1) must pass it through 1:1
    (tmp_path / "raw.log").write_bytes(b"a\xffb\nplain\n")
    got = rows(spark, FileInputStage(include=str(tmp_path / "raw.log"),
                                     encoding="nop"))
    assert got[0][1] == "a\xffb"
    assert got[1][1] == "plain"


def test_crlf_and_no_trailing_newline(spark, tmp_path):
    (tmp_path / "c.log").write_bytes(b"x\r\ny\r\nz")  # CRLF, no final \n
    got = rows(spark, FileInputStage(include=str(tmp_path / "c.log")))
    assert [t for _, t, _ in got] == ["x", "y", "z"]


def test_multiline_line_start_groups_leading_chunk(spark, tmp_path):
    """SPLITTER semantics: lines before the first start-pattern match
    form ONE leading entry (unlike the recombine OPERATOR, which
    flushes pre-boundary entries alone — multiline.go vs
    recombine.go:236-242)."""
    (tmp_path / "ml.log").write_text(
        "junk1\njunk2\n"
        "2024-01-01 ERROR boom\n  at Foo.java:1\n  at Bar.java:2\n"
        "2024-01-01 INFO ok\n",
        encoding="utf-8",
    )
    got = rows(spark, FileInputStage(
        include=str(tmp_path / "ml.log"),
        multiline={"line_start_pattern": r"^\d{4}-\d{2}-\d{2} "},
    ))
    assert [t for _, t, _ in got] == [
        "junk1\njunk2",
        "2024-01-01 ERROR boom\n  at Foo.java:1\n  at Bar.java:2",
        "2024-01-01 INFO ok",
    ]
    assert [i for i, _, _ in got] == [0, 2, 5]  # first line_no per entry


def test_multiline_line_end_closes_entry(spark, tmp_path):
    (tmp_path / "me.log").write_text(
        "part a\npart b END\nsolo END\ntrailing\n", encoding="utf-8"
    )
    got = rows(spark, FileInputStage(
        include=str(tmp_path / "me.log"),
        multiline={"line_end_pattern": r"END$"},
    ))
    assert [t for _, t, _ in got] == [
        "part a\npart b END", "solo END", "trailing",
    ]


def test_glob_many_files_parallel_units(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.log").write_text(f"l{i}a\nl{i}b\n", encoding="utf-8")
    got = rows(spark, FileInputStage(include=str(tmp_path / "*.log")))
    assert len(got) == 6
    names = {a["log.file.name"] for _, _, a in got}
    assert names == {"f0.log", "f1.log", "f2.log"}


def test_unknown_encoding_rejected():
    with pytest.raises(ValueError):
        FileInputStage(include="/tmp/x", encoding="big99")
    with pytest.raises(ValueError):
        FileInputStage(include="/tmp/x", multiline={
            "line_start_pattern": "a", "line_end_pattern": "b"})


def test_include_list_of_globs(spark, tmp_path):
    (tmp_path / "x.log").write_text("from-x\n", encoding="utf-8")
    (tmp_path / "y.txt").write_text("from-y\n", encoding="utf-8")
    got = rows(spark, FileInputStage(
        include=[str(tmp_path / "*.log"), str(tmp_path / "*.txt")]))
    assert sorted(t for _, t, _ in got) == ["from-x", "from-y"]


# ---- chunked reading + offset resume (operators/file_chunks.py) ------


def _texts(got):
    return [(i, t) for i, t, _ in got]


def test_chunked_identical_to_whole_file(spark, tmp_path):
    """One file >> one chunk: the byte-range path must produce the
    SAME (line_no, text) rows as the whole-file path, with >1
    parallel range in the scan."""
    from opentelemetry_log_collection_spark.operators import file_chunks as fc

    body = "".join(f"line-{i:05d} payload {'x' * (i % 37)}\n" for i in range(2000))
    p = tmp_path / "big.log"
    p.write_text(body, encoding="utf-8")

    whole = rows(spark, FileInputStage(include=str(p)))
    chunked = rows(spark, FileInputStage(include=str(p), chunk_bytes=4096))
    assert _texts(chunked) == _texts(whole)

    # the scan genuinely fans out: many ranges for the one file
    n_chunks = len(fc.plan_chunks(fc.plan_files([str(p)], None), 4096))
    assert n_chunks > 4


def test_chunked_multiline_stitches_across_ranges(spark, tmp_path):
    """Groups spanning chunk boundaries stitch via the prefix sum —
    byte-identical to the per-file window path."""
    lines = []
    for i in range(400):
        lines.append(f"2024-01-01 entry {i}")
        for j in range(i % 4):
            lines.append(f"  cont {i}.{j}")
    p = tmp_path / "ml_big.log"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    ml = {"line_start_pattern": r"^\d{4}-\d{2}-\d{2} "}

    whole = rows(spark, FileInputStage(include=str(p), multiline=ml))
    chunked = rows(
        spark, FileInputStage(include=str(p), multiline=ml, chunk_bytes=1024)
    )
    assert _texts(chunked) == _texts(whole)


def test_chunked_crlf_and_unterminated_tail(spark, tmp_path):
    p = tmp_path / "c.log"
    p.write_bytes(b"x\r\ny\r\nz")  # CRLF, no final newline
    got = rows(spark, FileInputStage(include=str(p), chunk_bytes=4))
    assert [t for _, t, _ in got] == ["x", "y", "z"]


def test_resume_skips_tails_and_rotates(spark, tmp_path):
    """Ledger semantics (fingerprint.go:24-75, file.go:298-361):
    unchanged file skipped; grown file tailed from the stored offset
    with line numbers continuing; rotated (new head) file re-read."""
    ck = str(tmp_path / "ckpt")
    f1 = tmp_path / "one.log"
    f2 = tmp_path / "two.log"
    f1.write_text("a0\na1\n", encoding="utf-8")
    f2.write_text("b0\n", encoding="utf-8")
    stage = FileInputStage(include=str(tmp_path / "*.log"), checkpoint_dir=ck)
    first = rows(spark, stage)
    assert len(first) == 3
    stage.commit(spark)

    # append to f1, add f3, leave f2 untouched
    with open(f1, "a", encoding="utf-8") as fh:
        fh.write("a2\na3\n")
    (tmp_path / "three.log").write_text("c0\n", encoding="utf-8")
    stage2 = FileInputStage(include=str(tmp_path / "*.log"), checkpoint_dir=ck)
    second = rows(spark, stage2)
    by_file = {}
    for i, t, a in second:
        by_file.setdefault(a["log.file.name"], []).append((i, t))
    assert "two.log" not in by_file  # consumed, skipped
    assert by_file["one.log"] == [(2, "a2"), (3, "a3")]  # tail, nos continue
    assert by_file["three.log"] == [(0, "c0")]
    stage2.commit(spark)

    # rotation: same path, new head -> new fingerprint -> full re-read
    f2.write_text("rotated head that differs\nnext\n", encoding="utf-8")
    stage3 = FileInputStage(include=str(f2), checkpoint_dir=ck)
    third = rows(spark, stage3)
    assert [t for _, t, _ in third] == ["rotated head that differs", "next"]


def test_chunking_rejects_multibyte_charsets():
    with pytest.raises(ValueError, match="unambiguous"):
        FileInputStage(include="/tmp/x", encoding="utf16", chunk_bytes=1024)


# ---- compressed log files (engine addition: file.go has no codec) ----


def test_gzip_auto_by_extension(spark, tmp_path):
    import gzip

    (tmp_path / "a.log.gz").write_bytes(gzip.compress(b"one\ntwo\n"))
    got = rows(spark, FileInputStage(include=str(tmp_path / "*.gz")))
    assert [(i, t) for i, t, _ in got] == [(0, "one"), (1, "two")]
    assert got[0][2]["log.file.name"] == "a.log.gz"


def test_mixed_plain_and_compressed_glob(spark, tmp_path):
    """compression: auto dispatches per file — one glob over a landing
    zone holding live plaintext logs next to rotated .gz/.bz2/.xz ones
    decodes each by its own codec; plain files never touch Python."""
    import bz2
    import gzip
    import lzma

    (tmp_path / "live.log").write_text("p1\np2\n")
    (tmp_path / "rot1.log.gz").write_bytes(gzip.compress(b"g1\ng2\n"))
    (tmp_path / "rot2.log.bz2").write_bytes(bz2.compress(b"b1\n"))
    (tmp_path / "rot3.log.xz").write_bytes(lzma.compress(b"x1\nx2\nx3\n"))
    out = FileInputStage(include=str(tmp_path / "*")).generate(spark)
    by_file = {}
    for r in out.orderBy("conv_id", "turn_idx").collect():
        by_file.setdefault(
            r["attributes"]["log.file.name"], []
        ).append(r["text"])
    assert by_file == {
        "live.log": ["p1", "p2"],
        "rot1.log.gz": ["g1", "g2"],
        "rot2.log.bz2": ["b1"],
        "rot3.log.xz": ["x1", "x2", "x3"],
    }


def test_gzip_multimember_concat(spark, tmp_path):
    """`cat a.gz b.gz > c.gz` rotation idiom: both members decode."""
    import gzip

    blob = gzip.compress(b"first\n") + gzip.compress(b"second\n")
    (tmp_path / "m.log.gz").write_bytes(blob)
    got = rows(spark, FileInputStage(include=str(tmp_path / "m.log.gz")))
    assert [t for _, t, _ in got] == ["first", "second"]


def test_forced_codec_ignores_extension(spark, tmp_path):
    import gzip

    (tmp_path / "nosuffix.dat").write_bytes(gzip.compress(b"hidden\n"))
    got = rows(spark, FileInputStage(
        include=str(tmp_path / "nosuffix.dat"), compression="gzip"))
    assert [t for _, t, _ in got] == ["hidden"]


def test_multiline_over_gzip(spark, tmp_path):
    import gzip

    (tmp_path / "ml.log.gz").write_bytes(gzip.compress(
        b"2024-01-01 ERROR boom\n  at Foo\n2024-01-01 INFO ok\n"))
    got = rows(spark, FileInputStage(
        include=str(tmp_path / "ml.log.gz"),
        multiline={"line_start_pattern": r"^\d{4}-\d{2}-\d{2} "},
    ))
    assert [t for _, t, _ in got] == [
        "2024-01-01 ERROR boom\n  at Foo", "2024-01-01 INFO ok"]


def test_compressed_rejected_in_chunked_mode(spark, tmp_path):
    import gzip

    (tmp_path / "c.log.gz").write_bytes(gzip.compress(b"x\n"))
    with pytest.raises(ValueError, match="not splittable"):
        FileInputStage(
            include=str(tmp_path / "c.log.gz"), compression="gzip",
            chunk_bytes=1 << 20)
    stage = FileInputStage(include=str(tmp_path / "*.gz"),
                           chunk_bytes=1 << 20)
    with pytest.raises(ValueError, match="not splittable"):
        stage.generate(spark)


def test_compression_config_validation(tmp_path):
    with pytest.raises(ValueError, match="unsupported compression"):
        FileInputStage(include=str(tmp_path / "x"), compression="brotli")


def test_zstd_unavailable_is_loud(spark, tmp_path):
    """No zstandard library in this sandbox: a .zst payload must fail
    with the actionable message, not a silent mis-decode."""
    pytest.importorskip  # (not skipped: asserting the ABSENT path)
    try:
        import zstandard  # noqa: F401
        pytest.skip("zstandard present; absent-path not testable")
    except ImportError:
        pass
    (tmp_path / "z.log.zst").write_bytes(b"\x28\xb5\x2f\xfd" + b"\x00" * 8)
    stage = FileInputStage(include=str(tmp_path / "z.log.zst"))
    with pytest.raises(Exception, match="zstandard"):
        stage.generate(spark).collect()


# ---- streaming tail of the landing zone ------------------------------


def test_stream_equals_batch(spark, tmp_path):
    """stream() over the same landing zone yields exactly the rows
    generate() scans — multiline grouping and gzip decode included,
    since the whole pipeline is map-only and shared."""
    import gzip

    (tmp_path / "a.log").write_text(
        "2024-01-01 one\n  cont\n2024-01-02 two\n")
    (tmp_path / "b.log.gz").write_bytes(
        gzip.compress(b"2024-01-03 three\n"))
    stage = FileInputStage(
        include=str(tmp_path / "*"),
        multiline={"line_start_pattern": r"^\d{4}-\d{2}-\d{2} "},
    )
    q = (
        stage.stream(spark)
        .writeStream.format("memory")
        .queryName("file_stream_avnow")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["conv_id"].rsplit("/", 1)[-1], r["turn_idx"], r["text"])
        for r in spark.sql("select * from file_stream_avnow").collect()
    )
    want = sorted(
        (r["conv_id"].rsplit("/", 1)[-1], r["turn_idx"], r["text"])
        for r in stage.generate(spark).collect()
    )
    assert got == want
    assert ("a.log", 0, "2024-01-01 one\n  cont") in got


def test_stream_picks_up_new_files(spark, tmp_path):
    """A file that appears after the first micro-batch arrives in a
    later one — the readStream analogue of the reference's glob poll
    (file.go's 200ms poller)."""
    (tmp_path / "one.log").write_text("first\n")
    stage = FileInputStage(include=str(tmp_path / "*.log"))
    q = (
        stage.stream(spark)
        .writeStream.format("memory")
        .queryName("file_stream_live")
        .start()
    )
    try:
        q.processAllAvailable()
        assert [r["text"] for r in
                spark.sql("select text from file_stream_live").collect()
                ] == ["first"]
        (tmp_path / "two.log").write_text("second\n")
        q.processAllAvailable()
        got = {r["text"] for r in
               spark.sql("select text from file_stream_live").collect()}
        assert got == {"first", "second"}
    finally:
        q.stop()


def test_stream_rejects_chunked_mode(tmp_path, spark):
    stage = FileInputStage(include=str(tmp_path / "*.log"),
                           chunk_bytes=1 << 20)
    with pytest.raises(ValueError, match="whole-file"):
        stage.stream(spark)


def test_file_output_gzip_round_trip(spark, tmp_path):
    """file_output writes gzip NDJSON (Spark-native codec, JVM-side);
    file_input reads the .json.gz parts back by extension — the full
    compressed round trip within the engine."""
    from opentelemetry_log_collection_spark.operators.io import FileSink

    df = spark.createDataFrame(
        [("c1", 0, "alpha"), ("c1", 1, "beta")],
        ["conv_id", "turn_idx", "text"],
    )
    sink = FileSink(path=str(tmp_path / "out"), format="json",
                    compression="gzip", id="s")
    sink.write(df, str(tmp_path))
    import glob

    parts = glob.glob(str(tmp_path / "out" / "*.json.gz"))
    assert parts  # codec actually applied (extension is the contract)
    back = rows(spark, FileInputStage(include=str(tmp_path / "out/*.json.gz")))
    texts = sorted(t for _, t, _ in back)
    assert len(texts) == 2 and all(t.startswith("{") for t in texts)
    assert any('"alpha"' in t for t in texts)

    with pytest.raises(ValueError, match="unsupported compression"):
        FileSink(format="json", compression="snappy", id="x")
    with pytest.raises(ValueError, match="unsupported compression"):
        FileSink(format="parquet", compression="bzip2", id="y")
