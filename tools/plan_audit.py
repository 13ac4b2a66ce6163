"""Physical-plan audit: prints .explain("formatted") for the headline
queries and flags plan smells (missing pushdown, python in hot path,
unexpected shuffles).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from opentelemetry_log_collection_spark.session import get_spark  # noqa: E402

AUDIT = [
    "regex_tomcat",
    "severity_http",
    "syslog_rfc3164",
    "syslog_rfc5424",
    "uri_request",
    "lang_id",
    "routed_rows",
    "router_counts",
    "recombine_conv",
    "enrich_roles",
    "dedup_exact",
    "minhash_pairs",
    "embed_topk",
    "ann_lsh",
    "ann_ivf",
    "token_stats",
]


def audit_one(name: str, df) -> list[str]:
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    smells = []
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_python = len(re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", plan))
    n_codegen = len(re.findall(r"WholeStageCodegen", plan))
    scans = re.findall(r"ReadSchema: [^\n]+", plan)
    pushed = re.findall(r"PushedFilters: [^\n]+", plan)
    print(f"\n===== {name} =====")
    print(f"exchanges={n_exchange} python_nodes={n_python} codegen_spans={n_codegen}")
    for s in scans[:4]:
        print(" ", s[:160])
    for p in pushed[:4]:
        print(" ", p[:160])
    # mapInPandas is the DESIGN for multimodal decode; everything else
    # (incl. syslog/uri/lang_id since their builtin rewrites) must be
    # python-free
    if n_python and name not in ("media_features", "media_frames"):
        smells.append(f"{name}: python node(s) in plan ({n_python})")
    if "full" in " ".join(sys.argv):
        print(plan)
    return smells


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = [a for a in sys.argv[2:] if a != "full"]
    spark = get_spark("local[4]", shuffle_partitions=4, app_name="plan-audit")
    qs = E.queries()
    smells: list[str] = []
    for name in (only or AUDIT):
        smells += audit_one(name, qs[name](spark, sf_dir))
    print("\nSMELLS:" if smells else "\nNO SMELLS")
    for s in smells:
        print(" -", s)


if __name__ == "__main__":
    main()
