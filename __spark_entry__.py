"""Driver contract for the spark-graft builder (PySpark target).

Implementation lives in the package (osm_inertial_flow_partitioner_spark
.entry); this module re-exports the three driver hooks:

- ``entry(spark)``     — flagship end-to-end tile assignment on sf0.001;
- ``queries()``        — one callable per implemented operator
                         (SURVEY.md §2 + training-data-pipeline ops);
- ``oracle_sql()``     — DuckDB twins built on identical arithmetic
                         (portable md5 hashing, integer-cents sums,
                         integer-derived coordinates).
"""

from __future__ import annotations

from osm_inertial_flow_partitioner_spark.entry import (  # noqa: F401
    entry,
    oracle_sql,
    queries,
)
