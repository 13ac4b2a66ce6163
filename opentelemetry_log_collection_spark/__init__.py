"""A brand-new PySpark-native rebuild of the stanza operator pipeline
(open-telemetry/opentelemetry-log-collection): parse -> transform ->
route -> output, re-expressed as declarative DataFrame stages.

Not a port: the reference is a push-based row-at-a-time Go agent
(/root/reference/operator/operator.go:53); this engine declares every
operator as Catalyst-optimizable column expressions (vectorized pandas
UDFs only where builtins can't express the parse), so predicate
pushdown, column pruning, whole-stage codegen and AQE come for free.

Public surface:
  - fields:      JSON-dot field paths (entry/field.go semantics)
  - exprs:       the expr-language subset -> Spark Column
  - transcripts: deterministic transcript table synthesis (dual-dialect)
  - pipeline:    YAML config -> Stage DAG -> DataFrame plan
  - operators:   the 20+ operator types from SURVEY.md section 2
  - flagship:    parse -> enrich -> route -> multi-sink reference pipeline
  - checkpoint:  bucketed resume with per-partition lineage + metrics
  - streaming:   Structured Streaming layer (stateful recombine,
                 foreachBatch multi-sink)
  - dedup / similarity / textops / multimodal: training-data pipeline
                 extensions (minhash-LSH, simhash, ANN, lang-ID, media)
"""

__version__ = "0.1.0"
