"""Declarative incremental ingestion engine (SURVEY §2.1 S10-S20, §3.3).

Re-provides the reference's config-driven engine
(notebooks/04.ingestas_motor/01.ingestas_motor.py) on OSS Spark:

- ``landing``    — timestamped landing-zone extracts (S20 `land_file`)
- ``autoloader`` — incremental file discovery with persisted schema
                   inference/evolution + rescued-data (the Auto Loader
                   `cloudFiles` replacement, S10)
- ``engine``     — config dict → readStream → metadata columns →
                   foreachBatch bronze write + landing→raw archival (S18),
                   exactly-once via checkpoint + idempotent batch commits
"""

from lakehouses_spark.ingest.landing import land_file  # noqa: F401
from lakehouses_spark.ingest.autoloader import IncrementalFileSource  # noqa: F401
from lakehouses_spark.ingest.engine import IngestionEngine  # noqa: F401
