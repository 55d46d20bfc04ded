"""Batch source/layout utilities.

Streaming sources live in ``go_fish_spark.streaming.sources``; the batch
source factory is ``plans.compiler.make_source``. This package holds
layout-level tooling — currently bucketing (:mod:`.bucketing`), the
shuffle-elimination technique for repeated co-located joins.
"""

from .bucketing import bucketize  # noqa: F401
