"""petropandas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ondrolexa/petropandas (reference read-only at
``/root/reference``), built Spark-first from public knowledge.

Architecture (SURVEY.md §7): the scalar layer is *dual-dialect SQL
generation* (``sqlgen.Plan``) — every operator is a chain of projection
stages whose expressions are valid in both Spark SQL and DuckDB.  Spark
executes them via ``selectExpr`` (ordinary Catalyst expressions:
whole-stage-codegen'd, constant-folded, collapsed, pushed down); the same
builder renders the DuckDB oracle SQL for the driver's correctness gate,
so both engines evaluate the identical IEEE-754 expression tree.

Layers:
  core         driver-side chemistry (column-name → constants)
  sqlgen       dual-dialect expression/stage/plan builders
  functions/   U*/V*/Q* scalar operators (SURVEY.md §2.3-2.5)
  minerals     Mineral configs, site allocation M3, end-members E1-E16
  frame        PetroFrame: Spark DataFrame + units metadata wrapper
  pipeline/    scale extensions: dedup, similarity, text analysis, streaming
"""

__version__ = "0.1.0"
