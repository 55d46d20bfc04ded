"""x-series — large-scale data-pipeline extensions (dedup, similarity,
text analysis, multimodal), per the north-star (BASELINE.json). Filled in
incrementally; each op lives in go_fish_spark.operators and is exposed here
as a query with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations
