"""Operator registry — importing this package registers every
operator type, the analogue of the reference's per-package init()
calls feeding operator/registry.go:17-57."""

from . import enrich, io, net_input, parsers, recombine, router, severity, time_parser, trace_scope, transforms  # noqa: F401

from ..pipeline import build_stage  # noqa: F401
