"""logstash_spark — a PySpark-native parse → enrich → route → aggregate engine.

Brand-new engine with the query/data-processing capabilities of Logstash
(reference: original-brownbear/logstash, a mirror-fork of elastic/logstash),
re-expressed Spark-first: DataFrame/SQL plans compiled once per pipeline,
vectorized pandas/Arrow UDFs where Catalyst can't express the semantics
(grok capture structs, html→text extraction), broadcast joins for every
lookup-style enrichment, and explicit url-hash bucketing + checkpoint
manifests for resumable 10^12-document runs.

Layout (see SURVEY.md §7):
  session.py     SparkSession factory (AQE, Arrow, UTC)
  extract.py     deterministic html→text extractor + vectorized wrapper
  grok.py        grok pattern compiler → vectorized capture structs
  dissect.py     dissect tokenizer compiler
  fieldref.py    [a][b] field references + %{...} sprintf interpolation
  conditions.py  Logstash conditional expressions → Column predicates
  datagen.py     deterministic synthetic pages/dim fixtures (seed 42)
  stages/        the filter/plugin library (parse, mutate, enrich, flow)
  router.py      conditional fan-out to sinks + dead-letter
  pipeline.py    pipeline spec → one DataFrame DAG; metrics; checkpoints
  metrics.py     node-stats-shaped metrics JSON
  checkpoint.py  per-bucket checkpoint manifest (resume support)
  datapipe/      training-data ops: dedup, similarity, text stats, multimodal
"""

__version__ = "0.1.0"
