"""Lakehouse table layer: ACID DML + time travel over parquet + a JSON
transaction log (SURVEY §2.10 D1-D11).

The reference drives Delta Lake / Iceberg for this surface
(notebooks/01.formatos_ficheros/02.delta_lake_primer.py,
03.iceberg_primer.py). Neither runtime jar ships in this environment, so the
same semantics are implemented Spark-natively:

- data lives as parquet part-files; the table state is ONLY what the log says
  (readers never list the data directory — exactly Delta's design, which is
  what makes object-store listing consistency irrelevant)
- each commit is one atomically-renamed JSON file `_tx_log/NNNNNNNNNN.json`
  holding add/remove file actions + schema + operation metadata (the log
  format the reference inspects at 01.parquet_primer.py:199-222)
- DML (DELETE/UPDATE/MERGE) is copy-on-write: identify affected files via the
  `_metadata.file_path` hidden column, rewrite only those, commit
  remove+add atomically — the same join-against-file-index strategy Delta's
  MergeIntoCommand uses (SURVEY §3.1 step 4)
- time travel replays the log to a version or timestamp (D5/D6)
- schema is enforced on append (02.delta_lake_primer.py:354-358) and evolves
  with merge_schema=True (:362)
"""

from lakehouses_spark.tables.table import (  # noqa: F401
    ChangeDataUnavailableError,
    ConcurrentWriteError,
    ConstraintViolationError,
    LakeTable,
    SchemaMismatchError,
)
from lakehouses_spark.tables.catalog import LakeCatalog  # noqa: F401
from lakehouses_spark.tables.sql import LakeSQL, LakeSQLError  # noqa: F401
