"""Parser operators (SURVEY.md section 2.4).

Shared contract, mirroring ParserOperator (operator/helper/parser.go:
90-189): read ``parse_from`` (default ``body``), produce a
``map<string,string>``, merge it into ``parse_to`` (default
``attributes``) with the reference's merge-overwrite semantics, then
run the embedded ``timestamp:``/``severity:``/``trace:``/
``scope_name:`` sub-parsers. A failed main parse leaves the row intact
(on_error=send forwards the *original* entry because the merge is
null-guarded); a failed sub-parse forwards the partially-parsed entry,
exactly like the reference checks errors only after all sub-parsers
ran (parser.go:171-184).

Execution strategy per parser (the Spark-first part):
  - regex:     JVM-side ``rlike`` + ``regexp_extract`` per named group
               (whole-stage codegen) — or one-pass Arrow-vectorized
               ``Series.str.extract`` via ``impl='pandas'``.
  - json:      Arrow-batched pandas UDF (the body is schemaless, like
               the reference's map[string]interface{}); nested values
               re-encoded as JSON strings per the canonical
               map<string,string> representation.
  - csv:       builtin ``from_csv`` for a static header (codegen);
               pandas UDF when the header comes from an attribute
               per row (csv.go:106-121) or strict field-count checking
               is requested.
  - key_value: builtin expression pipeline for an explicit
               pair_delimiter; pandas UDF for the default quote-aware
               whitespace splitting (keyvalue.go:130-139).
  - uri:       pandas UDF over urllib (multi-valued query params need
               map<string,list> which we JSON-encode, uri.go:129-163).
  - syslog:    pandas UDF, RFC3164/RFC5424 regex state machine +
               the fixed priority->severity table (syslog.go:225-272).

The reference's per-input-string regex match cache
(operator/parser/regex/cache.go:25-209) is deliberately absent:
vectorized execution amortizes compilation, and a FIFO cache would be
a serialization point across executor threads.
"""

from __future__ import annotations

import json as _json
import re as _re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fields import MAP_SS, Field, apply_updates
from ..pipeline import ColumnStage, register
from .severity import SeverityParser
from .time_parser import TimeParser
from .trace_scope import ScopeNameParser, TraceParser


# --------------------------------------------------------------------
# shared one-pass JVM extraction machinery
# --------------------------------------------------------------------

_SEP = "\x01"


def fully_anchored(regex: str) -> bool:
    """^-anchored with no top-level alternation (in '^a|b' the anchor
    binds only the first branch) — the eligibility test for the
    one-pass regexp_replace extraction trick."""
    if not regex.startswith("^"):
        return False
    depth = 0
    in_class = False
    i = 0
    while i < len(regex):
        c = regex[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            return False
        i += 1
    return True


#: match marker prepended to the rewritten line: a non-matching
#: regexp_replace returns its input UNCHANGED, so "starts with the
#: marker" detects the match without a second regex execution (rlike
#: costs as much as the replace itself — measured 1.45s each at 5M
#: rows / 32 cores). A pathological input that (a) starts with these
#: three control bytes AND (b) contains exactly group-count-1 \x01
#: bytes could spoof a match; log lines containing \x01\x02\x03
#: control bytes are outside every format this engine parses.
_MARK = "\x02\x03\x02"


def onepass_map(src: Column, pattern_java: str, groups: dict[str, int]) -> Column:
    """SINGLE regex execution per row: rewrite the whole line to
    marker + \\x01-joined groups, split, zip with names; null when the
    pattern did not match (no marker). The trailing ``(?s:.*)$``
    consumes the unmatched tail so nothing leaks into the last group.
    Rows where a group VALUE contains \\x01 (split count mismatch)
    fall back to guarded per-group extraction — branch evaluation is
    per-row, so the fallback costs nothing on the happy path.

    Pure function of its arguments; memoized process-wide (colmemo)
    so repeated pipeline constructions reuse the built tree."""
    from ..colmemo import memo_column

    return memo_column(
        ("onepass_map", str(src), pattern_java, tuple(groups.items())),
        lambda: _build_onepass_map(src, pattern_java, groups),
    )


def _build_onepass_map(
    src: Column, pattern_java: str, groups: dict[str, int]
) -> Column:
    g = len(groups)
    repl = _MARK + _SEP.join(f"${idx}" for idx in groups.values())
    blob = F.regexp_replace(src, pattern_java + "(?s:.*)$", repl)
    parts = F.split(F.substr(blob, F.lit(len(_MARK) + 1)), _SEP, -1)
    names = F.array(*[F.lit(n) for n in groups])
    fast = F.map_from_arrays(names, parts)
    slow_entries: list[Column] = []
    for name, idx in groups.items():
        slow_entries.append(F.lit(name))
        slow_entries.append(F.regexp_extract(src, pattern_java, idx))
    slow = F.when(src.rlike(pattern_java), F.create_map(*slow_entries))
    # spoof guard: a NON-matching line that itself begins with the
    # marker would leave blob == src, pass the startswith check, and
    # (with exactly g-1 \x01 bytes) fast-parse garbage. Any source row
    # already starting with the marker takes the rlike-guarded slow
    # path, where a non-match correctly nulls out.
    return (
        F.when(F.startswith(src, F.lit(_MARK)), slow)
        .when(~F.startswith(blob, F.lit(_MARK)), F.lit(None).cast(MAP_SS))
        .when(F.size(parts) == g, fast)
        .otherwise(slow)
    )


def strip_group_names(regex: str) -> str:
    """Java forbids '_' in group names; extraction is by index, so the
    Java-side pattern drops the names entirely."""
    return _re.sub(r"\(\?P<[^>]+>", "(", regex)


class ParserStage(ColumnStage):
    """Base for all parse_from/parse_to operators."""

    def __init__(
        self,
        parse_from: str = "body",
        parse_to: str = "attributes",
        timestamp: dict | None = None,
        severity: dict | None = None,
        trace: dict | None = None,
        scope_name: dict | None = None,
        **kw,
    ):
        super().__init__(**kw)
        self.parse_from = Field.parse(parse_from)
        self.parse_to = Field.parse(parse_to)
        self.subparsers = []
        if timestamp:
            self.subparsers.append(TimeParser(**timestamp))
        if severity:
            self.subparsers.append(SeverityParser(**severity))
        if trace:
            self.subparsers.append(TraceParser(**(trace or {})))
        if scope_name:
            self.subparsers.append(ScopeNameParser(**scope_name))

    def parse(self, src: Column) -> Column:
        """Return map<string,string>, null when the parse fails."""
        raise NotImplementedError

    def refine(self, raw: Column) -> Column:
        """Second-projection hook: turn the raw extraction map (already
        MATERIALIZED as a column) into the final attribute map. Default
        is identity. Parsers whose builtin impl derives many outputs
        from one regex extraction override this so the extraction
        subtree is evaluated once per row, not once per output key."""
        return raw

    def transform(self, df: DataFrame, cond: Column):
        src = self.parse_from.get().cast(T.StringType())
        parsed = self.parse(src)
        # materialize the parse result in its own projection first:
        # pandas-UDF-backed parsers cannot be referenced inside the
        # higher-order-function lambdas the merge uses
        # (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF)
        df = df.withColumn("_parsed_raw", F.when(cond & src.isNotNull(), parsed))
        df = df.withColumn(
            "_parsed", self.refine(F.col("_parsed_raw"))
        ).drop("_parsed_raw")
        err = src.isNull() | F.col("_parsed").isNull()
        df = apply_updates(df, self.parse_to.set_map(F.col("_parsed")))
        for sub in self.subparsers:
            df, sub_err = sub.embed_apply(df, cond)
            if sub_err is not None:
                err = err | F.coalesce(sub_err, F.lit(False))
        # per-operator postprocess (ProcessWithCallback's callback) runs
        # after all sub-parsers, gated on main-parse success, while
        # _parsed is still in scope
        df, err = self.postprocess(
            df, cond & F.col("_parsed").isNotNull(), err
        )
        # errors checked only after all sub-parsers ran (parser.go:171-184);
        # the drop filter runs here while _parsed is still in scope
        if self.on_error == "drop":
            df = df.filter(~(cond & F.coalesce(err, F.lit(False))))
        return df.drop("_parsed"), None

    def postprocess(self, df: DataFrame, ok: Column, err: Column):
        """Hook for operators with a postprocess callback (syslog).
        ``ok`` = stage cond AND the main parse succeeded."""
        return df, err


# --------------------------------------------------------------------
# regex_parser — operator/parser/regex/regex.go:43-146
# --------------------------------------------------------------------


@register("regex_parser")
class RegexParserStage(ParserStage):
    """Three execution strategies, all semantically identical:

      - ``onepass`` (default for ^-anchored patterns): ONE JVM regex
        execution per row via ``regexp_replace`` rewriting the line to
        its \\x01-joined capture groups (plus the rlike match guard =
        2 passes total, vs G+1). Measured on the 8-group Tomcat
        pattern at 32 cores / 2M rows: 0.78s vs builtin 0.98s median
        end-to-end incl. scan — ~2x on the parse fraction, and the gap
        widens with group count (BENCH.md).
      - ``builtin``: rlike + one ``regexp_extract`` per group (G+1
        regex executions — Catalyst does not CSE the matcher). Used
        automatically for unanchored patterns, where the replace trick
        would fire on every match occurrence.
      - ``pandas``: one-pass Arrow-vectorized ``Series.str.extract``.
        Slower end-to-end at high core counts (python workers
        oversubscribe the box) but kept for byte-level parity checks.

    ``impl='auto'`` picks onepass when eligible, else builtin."""

    def __init__(self, regex: str, impl: str = "auto", **kw):
        super().__init__(**kw)
        compiled = _re.compile(regex)
        if not compiled.groupindex:
            # build fails without named groups (regex.go:69-75)
            raise ValueError("regex pattern must contain named capture groups")
        self.groups = dict(compiled.groupindex)  # name -> group index
        self.pattern_py = regex
        self.pattern_java = strip_group_names(regex)
        if impl == "auto":
            # the replace trick needs the match pinned to the line
            # start, else regexp_replace rewrites EVERY occurrence
            impl = "onepass" if fully_anchored(regex) else "builtin"
        self.impl = impl

    def parse(self, src: Column) -> Column:
        if self.impl == "onepass":
            # onepass_map embeds the match guard (marker detection) —
            # no separate rlike execution
            return onepass_map(src, self.pattern_java, self.groups)
        if self.impl == "pandas":
            pat = self.pattern_py

            @F.pandas_udf(MAP_SS)
            def extract(s: pd.Series) -> pd.Series:
                rx = _re.compile(pat)

                def one(x):
                    if x is None:
                        return None
                    m = rx.search(x)
                    if m is None:
                        return None  # non-match is an error (regex.go:124-126)
                    # non-participating groups parse to "" like Go's
                    # matches[i] for an optional group
                    return {k: m.group(k) or "" for k in rx.groupindex}

                return s.map(one)

            return extract(src)
        matched = src.rlike(self.pattern_java)
        entries: list[Column] = []
        for name, idx in self.groups.items():
            entries.append(F.lit(name))
            entries.append(F.regexp_extract(src, self.pattern_java, idx))
        return F.when(matched, F.create_map(*entries))


# --------------------------------------------------------------------
# json_parser — operator/parser/json/json.go:41-82
# --------------------------------------------------------------------


@register("json_parser")
class JsonParserStage(ParserStage):
    """Default impl is builtin ``from_json(map<string,string>)``:
    flat values stringify, nested objects/arrays stay as their JSON
    text (exactly the canonical map representation, section 1.4), and
    non-object JSON nulls out = the reference's error path
    (json.go:70-82). The pandas impl re-encodes nested values with
    sorted keys; keep it for byte-stable nested output. Builtin runs
    inside codegen — measured 2x end-to-end on the flagship at 32
    cores, where python workers oversubscribe the box."""

    def __init__(self, impl: str = "builtin", **kw):
        super().__init__(**kw)
        self.impl = impl

    def parse(self, src: Column) -> Column:
        if self.impl == "builtin":
            return F.from_json(src, MAP_SS)

        @F.pandas_udf(MAP_SS)
        def parse_json(s: pd.Series) -> pd.Series:
            def one(x):
                if x is None:
                    return None
                try:
                    obj = _json.loads(x)
                except (ValueError, TypeError):
                    return None
                if not isinstance(obj, dict):
                    # non-map JSON is a parse error (json.go:70-82)
                    return None
                return {
                    str(k): v
                    if isinstance(v, str)
                    else _json.dumps(v, separators=(",", ":"), sort_keys=True)
                    for k, v in obj.items()
                }

            return s.map(one)

        return parse_json(src)


# --------------------------------------------------------------------
# csv_parser — operator/parser/csv/csv.go:43-200
# --------------------------------------------------------------------


@register("csv_parser")
class CsvParserStage(ParserStage):
    def __init__(
        self,
        header: str | None = None,
        header_attribute: str | None = None,
        delimiter: str = ",",
        lazy_quotes: bool = False,
        strict: bool = False,
        **kw,
    ):
        super().__init__(**kw)
        if (header is None) == (header_attribute is None):
            raise ValueError("exactly one of header / header_attribute required")
        if len(delimiter) != 1:
            raise ValueError("delimiter must be a single character (csv.go)")
        self.header = [h.strip() for h in header.split(delimiter)] if header else None
        self.header_attribute = header_attribute
        self.delimiter = delimiter
        self.lazy_quotes = lazy_quotes
        self.strict = strict

    def parse(self, src: Column) -> Column:
        if self.header is not None and not self.strict:
            # fast path: whole-stage-codegen CSV decode
            schema = ", ".join(f"`{h}` string" for h in self.header)
            struct = F.from_csv(src, schema, {"sep": self.delimiter})
            ok = struct.isNotNull()
            for h in self.header:
                ok = ok & struct.getField(h).isNotNull()
            entries: list[Column] = []
            for h in self.header:
                entries.append(F.lit(h))
                entries.append(struct.getField(h))
            return F.when(ok, F.create_map(*entries))
        delim = self.delimiter
        static_header = self.header

        if self.header_attribute is not None:
            hdr_col = F.try_element_at(F.col("attributes"), F.lit(self.header_attribute))
        else:
            hdr_col = F.lit(delim.join(static_header))

        @F.pandas_udf(MAP_SS)
        def parse_csv(s: pd.Series, hdr: pd.Series) -> pd.Series:
            import csv as _csv
            import io as _io

            def one(x, h):
                if x is None or h is None:
                    return None
                cols = [c.strip() for c in h.split(delim)]
                try:
                    rows = [
                        r
                        for r in _csv.reader(_io.StringIO(x), delimiter=delim)
                        if r
                    ]
                except _csv.Error:
                    return None
                if not rows:
                    return None
                # multi-line continuation (csv.go:154-180): each
                # subsequent record continues the previous record's
                # last field, joined with "\n" (the builtin from_csv
                # path gets the same semantics natively — univocity
                # keeps unquoted newlines inside the record)
                joined = rows[0]
                for nxt in rows[1:]:
                    joined[-1] += "\n" + nxt[0]
                    joined.extend(nxt[1:])
                if len(joined) != len(cols):
                    # wrong field count is an error (csv.go:189-192)
                    return None
                return dict(zip(cols, joined))

            return pd.Series(
                [one(x, h) for x, h in zip(s, hdr)], index=s.index, dtype=object
            )

        return parse_csv(src, hdr_col)


# --------------------------------------------------------------------
# key_value_parser — operator/parser/keyvalue/keyvalue.go:36-139
# --------------------------------------------------------------------

# quote-aware whitespace tokenizer. Space-only split (not \s):
# the reference's FieldsFunc splits on r == ' ' exclusively
# (keyvalue.go:130-139), so tabs ride inside tokens.
_QUOTE_AWARE_PAIR = _re.compile(r'(?:[^ "\']+|"[^"]*"|\'[^\']*\')+')


@register("key_value_parser")
class KeyValueParserStage(ParserStage):
    def __init__(
        self,
        delimiter: str = "=",
        pair_delimiter: str | None = None,
        impl: str = "builtin",
        **kw,
    ):
        super().__init__(**kw)
        if not delimiter:
            raise ValueError("delimiter must not be empty")
        self.delimiter = delimiter
        self.pair_delimiter = pair_delimiter
        self.impl = impl

    def _trim(self, c: Column) -> Column:
        # strings.TrimSpace(strings.Trim(x, "\"'")) — strip ALL
        # leading/trailing quote chars FIRST, then whitespace
        # (keyvalue.go:122-123)
        return F.trim(
            F.regexp_replace(F.regexp_replace(c, '^["\']+', ""), '["\']+$', "")
        )

    def _bad_pair(self, p: Column) -> Column:
        # strings.Split must yield exactly 2 items (keyvalue.go:114-117):
        # zero delimiters AND two-or-more delimiters (a=b=c, or a
        # quoted key/value containing the delimiter) are both malformed
        d = self.delimiter
        n = (F.length(p) - F.length(F.replace(p, F.lit(d), F.lit("")))) / F.lit(
            len(d)
        )
        return n != F.lit(1)

    def _kv_entries(self, pairs: Column) -> Column:
        delim = self.delimiter
        return F.transform(
            pairs,
            lambda p: F.struct(
                self._trim(F.substring_index(p, delim, 1)).alias("key"),
                self._trim(
                    F.substring(
                        p,
                        F.length(F.substring_index(p, delim, 1))
                        + F.lit(len(delim) + 1),
                        F.length(p),
                    )
                ).alias("value"),
            ),
        )

    def parse(self, src: Column) -> Column:
        # empty input is a parse error (keyvalue.go:105-107); a
        # non-empty input with zero extractable pairs parses to an
        # empty map with no error, like the Go loop over zero pairs
        nonempty = src.isNotNull() & (src != F.lit(""))
        if self.pair_delimiter is not None:
            # builtin expression pipeline: split pairs, Split-2 each
            pairs = F.split(src, _re.escape(self.pair_delimiter))
            bad = F.exists(pairs, self._bad_pair)
            return F.when(
                nonempty & ~bad, F.map_from_entries(self._kv_entries(pairs))
            )

        if self.impl == "builtin":
            # quote-aware whitespace pair split (keyvalue.go:130-139)
            # fully JVM-side: tokenize with the same quote-group regex
            # the pandas path compiles, then exact-2 split per pair.
            # No python worker in the hot path.
            pairs = F.regexp_extract_all(
                src, F.lit(_QUOTE_AWARE_PAIR.pattern), 0
            )
            bad = F.exists(pairs, self._bad_pair)
            return F.when(
                nonempty & ~bad, F.map_from_entries(self._kv_entries(pairs))
            )

        d = delim = self.delimiter

        @F.pandas_udf(MAP_SS)
        def parse_kv(s: pd.Series) -> pd.Series:
            def trim(x: str) -> str:
                # Trim(x, "\"'") then TrimSpace, same as the Go cleanup
                return x.strip("\"'").strip()

            def one(x):
                if x is None or x == "":
                    return None
                out = {}
                for pair in _QUOTE_AWARE_PAIR.findall(x):
                    parts = pair.split(d)
                    if len(parts) != 2:
                        return None  # malformed pair -> parse error
                    out[trim(parts[0])] = trim(parts[1])
                return out

            return s.map(one)

        return parse_kv(src)


# --------------------------------------------------------------------
# uri_parser — operator/parser/uri/uri.go:36-163
# --------------------------------------------------------------------


#: RFC 3986 appendix-B split, constrained to urllib's scheme grammar
#: (a scheme must start with a letter, else the ':' belongs to the
#: path — urlsplit does the same check). onepass_map appends
#: ``(?s:.*)$`` which consumes the #fragment.
_URI_SPLIT = r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?"
_URI_GROUPS = {"scheme": 1, "authority": 2, "path": 3, "query": 4}


@register("uri_parser")
class UriParserStage(ParserStage):
    """Default impl is ``builtin``: ONE regex execution per row (the
    RFC 3986 appendix-B split — the same algorithm urlsplit uses —
    through the shared onepass machinery), then pure column algebra:
    userinfo/host/port carved out of the authority with substring
    arithmetic, and the multi-valued query map built as array ops —
    split on '&', url-decode each side, group values per key in
    appearance order, sort keys, ``to_json`` the
    map<string,array<string>>. This is the reference's
    map[string][]string JSON encoding
    (operator/parser/uri/uri.go:129-163) with zero Python in the hot
    path. ``impl='pandas'`` keeps the urllib implementation for
    byte-level parity tests."""

    def __init__(self, impl: str = "builtin", **kw):
        super().__init__(**kw)
        self.impl = impl

    @staticmethod
    def _query_json(qs: Column) -> Column:
        """querystring -> JSON text of {key: [values...]} with sorted
        keys, parse_qs(keep_blank_values=True) semantics: tokens split
        on '&', empty tokens dropped, bare 'k' means k=''."""

        def dec(c: Column) -> Column:
            # urllib PARTIALLY decodes mixed tokens (valid escapes
            # decoded, invalid %-sequences kept verbatim), while
            # URLDecoder throws on the first invalid escape. Pre-escape
            # every % NOT followed by two hex digits to %25 — the
            # decode then round-trips it back to a literal '%' and
            # still decodes the valid escapes, matching urllib on
            # tokens like 'k=%zz%20'. try_ + coalesce stays as a belt
            # for non-UTF8 decode results.
            esc = F.regexp_replace(c, r"%(?![0-9A-Fa-f]{2})", "%25")
            return F.coalesce(F.try_url_decode(esc), c)

        toks = F.filter(F.split(qs, "&", -1), lambda t: t != F.lit(""))
        pairs = F.transform(
            toks,
            lambda t: F.struct(
                dec(F.substring_index(t, "=", 1)).alias("k"),
                dec(
                    F.when(
                        F.instr(t, "=") > 0,
                        F.substr(t, F.instr(t, "=") + F.lit(1)),
                    ).otherwise(F.lit(""))
                ).alias("v"),
            ),
        )
        keys = F.array_sort(
            F.array_distinct(F.transform(pairs, lambda p: p.getField("k")))
        )
        entries = F.transform(
            keys,
            lambda k: F.struct(
                k.alias("key"),
                F.transform(
                    F.filter(pairs, lambda p: p.getField("k") == k),
                    lambda p: p.getField("v"),
                ).alias("value"),
            ),
        )
        return F.to_json(F.map_from_entries(entries))

    def refine(self, raw: Column) -> Column:
        """Builtin path: raw split map {scheme,authority,path,query}
        (or {bare_query}) -> final attribute map with empties omitted
        (uri.go:99-127) and the query JSON-encoded. urllib semantics:
        scheme/host lowercased, userinfo = authority before the LAST
        '@', username = userinfo before ':', port = trailing digits,
        IPv6 brackets stripped.

        The tree is a pure function of (impl, raw) and ~500 py4j
        calls to build (measured ~0.5s per construction), so it is
        memoized process-wide (colmemo)."""
        if self.impl != "builtin":
            return raw
        from ..colmemo import memo_column

        return memo_column(
            ("uri_refine", str(raw)), lambda: self._build_refine(raw)
        )

    def _build_refine(self, raw: Column) -> Column:

        def g(k: str) -> Column:
            return F.try_element_at(raw, F.lit(k))

        empty = F.create_map().cast(MAP_SS)

        def opt(k: str, v: Column, cond: Column) -> Column:
            # conditional singleton map: map_concat of these stays
            # inside whole-stage codegen (higher-order filter /
            # map_from_entries would fall back to interpreted eval —
            # measured 2-3x slower at 5M rows)
            return F.when(
                cond, F.create_map(F.lit(k), v.cast(T.StringType()))
            ).otherwise(empty)

        bare = g("bare_query")
        auth = F.coalesce(g("authority"), F.lit(""))
        hostpart = F.substring_index(auth, "@", -1)
        userinfo = F.when(
            F.instr(auth, "@") > 0,
            F.substring(auth, F.lit(1), F.length(auth) - F.length(hostpart) - 1),
        ).otherwise(F.lit(""))
        port = F.regexp_extract(hostpart, r":([0-9]+)$", 1)
        # urllib parity on port edges: int round-trip normalizes
        # leading zeros (:0080 -> 80), port 0 is falsy and omitted,
        # and out-of-range (>65535 or int-overflow) is a PARSE ERROR
        # (u.port raises ValueError -> pandas path nulls the row)
        port_i = F.when(port != "", port.try_cast(T.IntegerType()))
        bad_port = (port != "") & (
            port_i.isNull() | (port_i > 65535)
        )
        port_out = F.when(
            port_i.isNotNull() & (port_i > 0), port_i.cast(T.StringType())
        ).otherwise(F.lit(""))
        hostnoport = F.when(
            port != "",
            F.substring(
                hostpart, F.lit(1),
                F.length(hostpart) - F.length(port) - 1,
            ),
        ).otherwise(hostpart)
        host = F.lower(F.regexp_replace(hostnoport, r"^\[|\]$", ""))
        user = F.substring_index(userinfo, ":", 1)
        full = F.map_concat(
            opt("scheme", F.lower(g("scheme")), g("scheme") != ""),
            opt("user", user, user != ""),
            opt("host", host, host != ""),
            opt("port", port_out, port_out != ""),
            opt("path", g("path"), g("path") != ""),
            opt("query", self._query_json(g("query")), g("query") != ""),
        )
        built = F.when(
            bare.isNotNull(),
            F.create_map(F.lit("query"), self._query_json(bare)),
        ).otherwise(F.when(~bad_port & (F.size(full) > 0), full))
        return F.when(raw.isNotNull(), built)

    def parse(self, src: Column) -> Column:
        if self.impl == "builtin":
            # bare query string (uri.go:79-97): '?...' carries ONLY
            # the query (even when empty); everything else takes the
            # single-regex RFC 3986 split
            return F.when(
                src.startswith("?"),
                F.create_map(F.lit("bare_query"), F.substr(src, F.lit(2))),
            ).otherwise(onepass_map(src, _URI_SPLIT, _URI_GROUPS))

        @F.pandas_udf(MAP_SS)
        def parse_uri(s: pd.Series) -> pd.Series:
            from urllib.parse import parse_qs, urlsplit

            def qmap(q: str) -> str:
                parsed = parse_qs(q, keep_blank_values=True)
                # ensure_ascii=False: the canonical query JSON carries
                # raw UTF-8 (same bytes to_json emits on the builtin path)
                return _json.dumps(
                    parsed, separators=(",", ":"), sort_keys=True,
                    ensure_ascii=False,
                )

            def one(x):
                if x is None:
                    return None
                try:
                    # bare query string (uri.go:79-97)
                    if x.startswith("?"):
                        return {"query": qmap(x[1:])}
                    u = urlsplit(x)
                    # u.port raises ValueError for out-of-range ports
                    # (e.g. :99999) — inside the try so a bad port is
                    # a parse error (null row), not a task failure
                    port = u.port
                except ValueError:
                    return None
                out = {}
                # empties omitted (uri.go:99-127)
                if u.scheme:
                    out["scheme"] = u.scheme
                if u.username:
                    out["user"] = u.username
                if u.hostname:
                    out["host"] = u.hostname
                if port:
                    out["port"] = str(port)
                if u.path:
                    out["path"] = u.path
                if u.query:
                    out["query"] = qmap(u.query)
                return out or None

            return s.map(one)

        return parse_uri(src)


# --------------------------------------------------------------------
# syslog_parser — operator/parser/syslog/syslog.go:39-272
# --------------------------------------------------------------------

_RFC5424 = _re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<version>\d{1,2}) "
    r"(?P<ts>\S+) (?P<hostname>\S+) (?P<appname>\S+) "
    r"(?P<proc_id>\S+) (?P<msg_id>\S+) "
    r"(?P<sd>-|(?:\[[^\]]*\])+)(?: (?P<message>.*))?$"
)

_RFC3164 = _re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<ts>[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) (?P<tag>[^\[:\s]+)(?:\[(?P<proc_id>\d+)\])?:? ?"
    r"(?P<message>.*)$"
)

# fixed 0-7 priority table (syslog.go:225-250)
_SYSLOG_SEVERITY = [21, 19, 18, 17, 13, 10, 9, 5]
_SYSLOG_SEVERITY_TEXT = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]


#: named-group indexes for the onepass JVM extraction (match the
#: compiled groupindex of _RFC3164/_RFC5424 above)
_RFC3164_GROUPS = dict(_RFC3164.groupindex)
_RFC5424_GROUPS = dict(_RFC5424.groupindex)


@register("syslog_parser")
class SyslogParserStage(ParserStage):
    """RFC3164/5424 parse + the reference's postprocess: the parsed
    timestamp becomes the entry ``ts`` via a default embedded
    TimeParser on ``attributes.timestamp`` (syslog.go:61-66) and the
    helper attributes (severity, timestamp) are deleted afterwards
    (syslog.go:252-269). RFC3164 timestamps carry no year, so the
    default TimeParser runs missing-year inference against the
    injected reference clock ``now``; ``location`` configures the
    zone RFC3164 wall-clock stamps are interpreted in (SyslogBase's
    Location field, syslog.go Build; default UTC).

    Default impl is ``builtin``: both RFC patterns are ^-anchored, so
    the shared one-pass JVM machinery (onepass_map) extracts all
    groups in ONE regex execution inside whole-stage codegen, and the
    attribute map (priority arithmetic + NILVALUE omission) is pure
    column algebra in a second projection (``refine``). No Python
    worker in the hot path. ``impl='pandas'`` keeps the original
    Arrow-batched implementation for byte-level parity tests."""

    def __init__(
        self,
        protocol: str = "rfc3164",
        now: str | None = None,
        location: str = "UTC",
        impl: str = "builtin",
        **kw,
    ):
        from .time_parser import DEFAULT_NOW, TimeParser

        has_user_ts = kw.get("timestamp") is not None
        super().__init__(**kw)
        if protocol not in ("rfc3164", "rfc5424"):
            raise ValueError(f"unsupported protocol {protocol!r}")
        self.protocol = protocol
        self.impl = impl
        if not has_user_ts:
            # default wiring: parse attributes.timestamp into ts
            # (syslog.go:61-66 builds a native TimeParser when the
            # config carries none)
            if protocol == "rfc3164":
                # "Jan 2 15:04:05" — no year; strptime + inference.
                # The parse normalizes the space-padded day, so
                # %e ("d") matches single- and double-digit days.
                tp = TimeParser(
                    "attributes.timestamp",
                    layout="%b %e %H:%M:%S",
                    layout_type="strptime",
                    now=now or DEFAULT_NOW,
                    location=location,
                )
            else:
                # RFC5424 ts is ISO8601 — native cast handles it
                tp = TimeParser("attributes.timestamp", layout_type="native")
            self.subparsers.append(tp)

    def parse(self, src: Column) -> Column:
        proto = self.protocol
        if self.impl == "builtin":
            rx = _RFC5424 if proto == "rfc5424" else _RFC3164
            groups = _RFC5424_GROUPS if proto == "rfc5424" else _RFC3164_GROUPS
            pattern_java = strip_group_names(rx.pattern)
            return onepass_map(src, pattern_java, groups)

        @F.pandas_udf(MAP_SS)
        def parse_syslog(s: pd.Series) -> pd.Series:
            def one(x):
                if x is None:
                    return None
                rx = _RFC5424 if proto == "rfc5424" else _RFC3164
                m = rx.match(x)
                if m is None:
                    return None
                pri = int(m.group("pri"))
                out = {
                    "priority": str(pri),
                    "facility": str(pri // 8),
                    "severity": str(pri % 8),
                    "hostname": m.group("hostname"),
                    "message": m.group("message") or "",
                    # normalize the RFC3164 space-padded day ("Jan  2")
                    # so the default TimeParser's "MMM d" layout parses
                    # it; the attribute is deleted at postprocess anyway
                    "timestamp": " ".join(m.group("ts").split()),
                }
                if proto == "rfc5424" and m.group("ts") == "-":
                    del out["timestamp"]  # NILVALUE ts -> absent (toSafeMap)
                if proto == "rfc5424":
                    out["version"] = m.group("version")
                    for k in ("appname", "proc_id", "msg_id"):
                        v = m.group(k)
                        if v != "-":
                            out[k] = v
                    sd = m.group("sd")
                    if sd != "-":
                        out["structured_data"] = sd
                else:
                    out["appname"] = m.group("tag")
                    if m.group("proc_id"):
                        out["proc_id"] = m.group("proc_id")
                # '-' hostname means nil in rfc5424
                if out.get("hostname") == "-":
                    del out["hostname"]
                return out

            return s.map(one)

        return parse_syslog(src)

    def refine(self, raw: Column) -> Column:
        """Builtin path only: raw extraction map (one column read per
        key — the extraction itself already ran once) -> final
        attribute map with priority arithmetic and NILVALUE/absent-key
        omission, mirroring the pandas impl and syslog.go's toSafeMap.
        Null raw (failed parse / skipped row) stays null."""
        if self.impl != "builtin":
            return raw

        def g(k: str) -> Column:
            return F.try_element_at(raw, F.lit(k))

        empty = F.create_map().cast(MAP_SS)

        def opt(k: str, v: Column, cond: Column) -> Column:
            # conditional singleton maps concatenated with map_concat
            # stay inside whole-stage codegen (higher-order filter /
            # map_from_entries fall back to interpreted eval)
            return F.when(
                cond, F.create_map(F.lit(k), v.cast(T.StringType()))
            ).otherwise(empty)

        def s(c: Column) -> Column:
            return c.cast(T.StringType())

        pri = g("pri").cast(T.IntegerType())
        host = g("hostname")
        always = F.create_map(
            # int round-trip strips leading zeros like str(int(x))
            F.lit("priority"), s(pri),
            F.lit("facility"), s(F.floor(pri / F.lit(8)).cast(T.IntegerType())),
            F.lit("severity"), s(pri % F.lit(8)),
            F.lit("message"), F.coalesce(g("message"), F.lit("")),
        )
        parts = [always, opt("hostname", host, host != "-")]
        if self.protocol == "rfc5424":
            ts = g("ts")
            parts.append(opt("timestamp", ts, ts != "-"))
            parts.append(opt("version", g("version"), F.lit(True)))
            for k in ("appname", "proc_id", "msg_id"):
                v = g(k)
                parts.append(opt(k, v, v != "-"))
            sd = g("sd")
            parts.append(opt("structured_data", sd, sd != "-"))
        else:
            # normalize the RFC3164 space-padded day ("Jan  2") so the
            # default TimeParser's "MMM d" layout parses it; the
            # attribute is deleted at postprocess anyway
            parts.append(
                opt(
                    "timestamp",
                    F.regexp_replace(g("ts"), r"\s+", " "),
                    F.lit(True),
                )
            )
            parts.append(opt("appname", g("tag"), F.lit(True)))
            # optional group: Java substitutes "" when non-participating
            pid = g("proc_id")
            parts.append(opt("proc_id", pid, pid != ""))
        return F.when(raw.isNotNull(), F.map_concat(*parts))

    def postprocess(self, df: DataFrame, ok: Column, err: Column):
        # postprocess (syslog.go:252-269): attributes.severity (0-7)
        # -> entry severity via the fixed table, then delete the
        # helper attributes (severity AND timestamp); runs only when
        # the main parse succeeded, like ProcessWithCallback
        attrs = F.col("attributes")
        sev_raw = F.try_element_at(attrs, F.lit("severity")).try_cast(T.IntegerType())
        sev_map = F.create_map(
            *[
                c
                for i in range(8)
                for c in (F.lit(str(i)), F.lit(_SYSLOG_SEVERITY[i]))
            ]
        )
        text_map = F.create_map(
            *[
                c
                for i in range(8)
                for c in (F.lit(str(i)), F.lit(_SYSLOG_SEVERITY_TEXT[i]))
            ]
        )
        ok_sev = ok & sev_raw.isNotNull()
        df = df.withColumn(
            "severity",
            F.when(ok_sev, F.try_element_at(sev_map, sev_raw.cast(T.StringType())))
            .otherwise(F.col("severity")),
        )
        df = df.withColumn(
            "severity_text",
            F.when(ok_sev, F.try_element_at(text_map, sev_raw.cast(T.StringType())))
            .otherwise(F.col("severity_text")),
        )
        df = df.withColumn(
            "attributes",
            F.when(
                ok,
                F.map_filter(
                    F.col("attributes"),
                    lambda k, _v: (k != F.lit("severity"))
                    & (k != F.lit("timestamp")),
                ),
            ).otherwise(F.col("attributes")),
        )
        return df, err
