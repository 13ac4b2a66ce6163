"""Expression-language subset -> Spark Column, compiled at plan time.

The reference embeds the antonmedv/expr language for `if` predicates,
router routes, filter and recombine boundaries, and `EXPR(...)` string
templates (operator/helper/expr_string.go:39-151, docs/types/
expression.md). The environment exposes ``body`` (alias ``$``),
``attributes``, ``resource``, ``timestamp``, ``severity`` plus an
``env()`` function.

Instead of evaluating per entry the way the reference does
(operator/helper/transformer.go:66-72 compiles then runs per row), we
*translate* the expression once into a Catalyst Column tree, so the
predicate participates in pushdown/codegen and costs nothing in Python
at runtime.

Supported subset (everything the reference's own tests/fixtures use):
literals (string/number/bool/nil), field paths with dot or bracket
syntax, ``== != < <= > >=``, ``and or not ! && ||``, infix
``startsWith endsWith contains matches``, ``+`` (concat/add),
``in`` over list literals, parentheses, ``env("NAME")``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fields import Field

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
      | (?P<num>\d+\.\d+|\d+)
      | (?P<op>==|!=|<=|>=|&&|\|\||[()<>+,\[\]!])
      | (?P<word>[A-Za-z_$][A-Za-z0-9_$.]*)
    )""",
    re.VERBOSE,
)

_INFIX_WORDS = {"startsWith", "endsWith", "contains", "matches", "in"}


class ExprError(ValueError):
    pass


#: regex metacharacters that make a pattern more than a literal
_REGEX_META = set(".^$*+?()[]{}|\\")


def _regex_prefix_literal(pat: str) -> str | None:
    """The literal prefix P when ``pat`` is exactly ``^<literal>``
    (escapes of metacharacters allowed, e.g. ``^10\\.`` -> ``10.``);
    None when the pattern uses any real regex construct. Used to fold
    ``matches`` guards into ``startswith``."""
    if not pat.startswith("^"):
        return None
    out: list[str] = []
    i = 1
    while i < len(pat):
        c = pat[i]
        if c == "\\":
            if i + 1 >= len(pat):
                return None
            nxt = pat[i + 1]
            # \d \w \s \b etc. are classes/anchors, not escapes
            if nxt.isalnum():
                return None
            out.append(nxt)
            i += 2
            continue
        if c in _REGEX_META:
            return None
        out.append(c)
        i += 1
    return "".join(out)


def _tokenize(s: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ExprError(f"cannot tokenize {s!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        toks.append((kind, m.group(kind)))
    return toks


@dataclass
class _Val:
    """A translated operand: the Column plus enough type info to pick
    sensible comparison casts (map values are strings)."""

    col: Column
    kind: str  # 'str' | 'num' | 'bool' | 'nil' | 'field' | 'list'
    items: list | None = None  # for list literals
    lit: str | None = None  # python value for string literals


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ExprError("unexpected end of expression")
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        t = self.next()
        if t[1] != val:
            raise ExprError(f"expected {val!r}, got {t[1]!r}")

    # or_expr := and_expr (('or'|'||') and_expr)*
    def parse_or(self) -> _Val:
        left = self.parse_and()
        while (t := self.peek()) and t[1] in ("or", "||"):
            self.next()
            right = self.parse_and()
            left = _Val(_as_bool(left) | _as_bool(right), "bool")
        return left

    def parse_and(self) -> _Val:
        left = self.parse_not()
        while (t := self.peek()) and t[1] in ("and", "&&"):
            self.next()
            right = self.parse_not()
            left = _Val(_as_bool(left) & _as_bool(right), "bool")
        return left

    def parse_not(self) -> _Val:
        t = self.peek()
        if t and t[1] in ("not", "!"):
            self.next()
            inner = self.parse_not()
            return _Val(~_as_bool(inner), "bool")
        return self.parse_cmp()

    def parse_cmp(self) -> _Val:
        left = self.parse_sum()
        t = self.peek()
        if not t:
            return left
        op = t[1]
        if op in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.parse_sum()
            return _Val(_compare(op, left, right), "bool")
        if t[0] == "word" and op in _INFIX_WORDS:
            self.next()
            right = self.parse_sum()
            lc = left.col.cast(T.StringType())
            if op == "startsWith":
                return _Val(lc.startswith(right.col), "bool")
            if op == "endsWith":
                return _Val(lc.endswith(right.col), "bool")
            if op == "contains":
                return _Val(lc.contains(right.col), "bool")
            if op == "matches":
                if right.lit is None:
                    raise ExprError("matches requires a string literal pattern")
                # ^-anchored pure-literal patterns fold to startswith:
                # Java regex without MULTILINE anchors ^ at input start
                # only, so `matches "^10\\."` IS a prefix test — and a
                # codegen startswith costs a fraction of the regex
                # machinery the guard otherwise runs on every row
                # (the flagship evaluates several such guards per row)
                prefix = _regex_prefix_literal(right.lit)
                if prefix is not None:
                    return _Val(lc.startswith(F.lit(prefix)), "bool")
                return _Val(lc.rlike(right.lit), "bool")
            if op == "in":
                if right.items is None:
                    raise ExprError("'in' requires a list literal")
                return _Val(left.col.isin(*right.items), "bool")
        return left

    def parse_sum(self) -> _Val:
        left = self.parse_primary()
        while (t := self.peek()) and t[1] == "+":
            self.next()
            right = self.parse_primary()
            if left.kind == "num" and right.kind == "num":
                left = _Val(left.col + right.col, "num")
            else:
                left = _Val(
                    F.concat(
                        left.col.cast(T.StringType()),
                        right.col.cast(T.StringType()),
                    ),
                    "str",
                )
        return left

    def parse_primary(self) -> _Val:
        kind, v = self.next()
        if kind == "str":
            s = _unquote(v)
            return _Val(F.lit(s), "str", lit=s)
        if kind == "num":
            return _Val(F.lit(float(v) if "." in v else int(v)), "num")
        if v == "(":
            inner = self.parse_or()
            self.expect(")")
            return inner
        if v == "[":
            items = []
            while True:
                t = self.peek()
                if t and t[1] == "]":
                    self.next()
                    break
                item = self.next()
                if item[0] == "str":
                    items.append(_unquote(item[1]))
                elif item[0] == "num":
                    items.append(float(item[1]) if "." in item[1] else int(item[1]))
                else:
                    raise ExprError("only literal lists supported")
                t = self.peek()
                if t and t[1] == ",":
                    self.next()
            return _Val(F.lit(None), "list", items)
        if kind == "word":
            if v == "true":
                return _Val(F.lit(True), "bool")
            if v == "false":
                return _Val(F.lit(False), "bool")
            if v == "nil":
                return _Val(F.lit(None), "nil")
            if v == "env":
                # env("NAME") snapshots the driver environment when
                # the stage plan is BUILT — and stages compile their
                # expressions inside apply()/transform(), so every
                # pipeline run re-reads the variable. The reference
                # reads it per rendered entry (expr_string.go:133-151);
                # in a batch plan all entries of one run share one
                # render epoch, so per-run == per-render. Within a
                # single action the value is constant by design.
                self.expect("(")
                name_t = self.next()
                self.expect(")")
                return _Val(F.lit(os.environ.get(_unquote(name_t[1]), "")), "str")
            return self._field(v)
        raise ExprError(f"unexpected token {v!r}")

    def _field(self, word: str) -> _Val:
        if word == "$":
            word = "body"
        # bracket continuation: attributes["k8s.pod.name"]
        path = word
        while (t := self.peek()) and t[1] == "[":
            self.next()
            key_t = self.next()
            self.expect("]")
            path += f"[{key_t[1]}]"
        return _Val(Field.parse(path).get(), "field")


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace('\\"', '"').replace("\\'", "'").replace("\\\\", "\\")


def _as_bool(v: _Val) -> Column:
    if v.kind == "field":
        # truthiness of a string field: non-null and not "" / "false"
        c = v.col.cast(T.StringType())
        return c.isNotNull() & (c != "") & (F.lower(c) != "false")
    return v.col.cast(T.BooleanType())


def _compare(op: str, left: _Val, right: _Val) -> Column:
    lc, rc = left.col, right.col
    # nil comparisons -> null checks (expr-lang semantics)
    if right.kind == "nil":
        return lc.isNull() if op == "==" else lc.isNotNull()
    if left.kind == "nil":
        return rc.isNull() if op == "==" else rc.isNotNull()
    # map values are strings; comparing against a numeric literal
    # compares numerically like expr-lang does on parsed numbers
    if left.kind == "field" and right.kind == "num":
        lc = lc.try_cast(T.DoubleType())
    if right.kind == "field" and left.kind == "num":
        rc = rc.try_cast(T.DoubleType())
    if op == "==":
        return lc == rc
    if op == "!=":
        return lc != rc
    if op == "<":
        return lc < rc
    if op == "<=":
        return lc <= rc
    if op == ">":
        return lc > rc
    return lc >= rc


def _parse(expression: str) -> _Val:
    p = _Parser(_tokenize(expression))
    out = p.parse_or()
    if p.peek() is not None:
        raise ExprError(f"trailing tokens in {expression!r}")
    return out


def compile_expr(expression: str) -> Column:
    """Compile an expr-language expression to a Column."""
    return _parse(expression).col


def compile_bool(expression: str) -> Column:
    """Compile to a boolean Column (expr.AsBool semantics:
    operator/helper/transformer.go:66-72). The compiled tree is a
    pure function of the source string, so it is memoized
    process-wide (colmemo) — if-guards and router routes recompile
    on every pipeline construction otherwise."""
    from .colmemo import memo_column

    return memo_column(
        ("compile_bool", expression), lambda: _as_bool(_parse(expression))
    )


def _find_expr_spans(template: str) -> list[tuple[int, int, str]]:
    """Locate EXPR(...) spans with balanced parens, quote-aware —
    the same scan expr_string.go:39-104 does."""
    spans = []
    i = 0
    while (start := template.find("EXPR(", i)) >= 0:
        depth, j = 1, start + 5
        quote = None
        while j < len(template) and depth:
            c = template[j]
            if quote:
                if c == "\\":
                    j += 1
                elif c == quote:
                    quote = None
            elif c in "\"'":
                quote = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth:
            raise ExprError(f"unbalanced EXPR() in {template!r}")
        spans.append((start, j, template[start + 5 : j - 1]))
        i = j
    return spans


def compile_template(template: str) -> Column:
    """``"literal EXPR( ... ) literal"`` -> concat Column
    (operator/helper/expr_string.go:39-104)."""
    parts: list[Column] = []
    pos = 0
    for start, end, inner in _find_expr_spans(template):
        if start > pos:
            parts.append(F.lit(template[pos:start]))
        parts.append(compile_expr(inner).cast(T.StringType()))
        pos = end
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)
