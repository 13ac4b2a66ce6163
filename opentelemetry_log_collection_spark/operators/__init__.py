"""Operator registry — importing this package registers every
operator type, the analogue of the reference's per-package init()
calls feeding operator/registry.go:17-57."""

from . import enrich, io, journald, k8s_event, net_input, parsers, recombine, router, severity, time_parser, trace_scope, transforms, windows_eventlog  # noqa: F401

from ..pipeline import build_stage  # noqa: F401
