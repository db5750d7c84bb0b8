"""Named query builders — one per implemented operator from SURVEY §2.

Modules register into ``lakehouses_spark.registry`` at import time:

- ``relational``  — scans, filters, joins, aggregations, sorts, set ops
- ``windows``     — window functions (top-k per group, running sums, lag)
- ``scalar``      — scalar function families (string/date/array/json/map/math)
- ``timeseries``  — as-of join, range join, sessionization, tumbling windows
- ``dedup``       — exact + near-duplicate detection
- ``similarity``  — embedding similarity search
- ``text``        — text analysis (tokens, quality, language)
"""
