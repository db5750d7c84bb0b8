"""lakehouses_spark — a PySpark-native analytics engine.

Re-provides, as a standalone library, every data-processing capability the
reference (jcenteno-ucm/lakehouses, a Databricks lakehouse curriculum) exercises:

- lakehouse tables with ACID DML + time travel (``lakehouses_spark.tables``)
- a declarative incremental ingestion engine (``lakehouses_spark.ingest``)
- the full relational operator surface — scans, filters, joins, aggregations,
  windows, set ops, scalar functions (``lakehouses_spark.queries``)
- streaming/batch unification over Structured Streaming
  (``lakehouses_spark.streaming``)
- large-scale training-data pipeline operators: dedup, similarity search,
  text analysis, multimodal columns (``lakehouses_spark.queries``,
  ``lakehouses_spark.multimodal``)

Everything is idiomatic Spark: declarative DataFrame/SQL plans optimized by
Catalyst, Arrow-batched Pandas UDFs only where built-ins can't express the
semantics, and no driver-side row loops in any engine path.
"""

from lakehouses_spark.session import get_spark  # noqa: F401
from lakehouses_spark.io import TABLES, load_table, register_views, spread  # noqa: F401
from lakehouses_spark.tables import (  # noqa: F401
    LakeCatalog,
    LakeSQL,
    LakeTable,
)

__version__ = "0.1.0"
