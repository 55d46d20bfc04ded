"""x-series — large-scale data-pipeline extensions (dedup, similarity,
text analysis, sampling, multimodal/pipeline), per the north-star
(BASELINE.json). Split by family (round-5 registry hygiene); importing
this package registers every family's queries. Driver-window order is
unaffected: final registry order is set by
``queries._reorder_for_driver_window`` (the `_VERIFIED_TAIL` rotation),
not by intra-package import order.

Each query exposes one operator from go_fish_spark.operators / functions
over the `documents` / `embeddings` tables. DuckDB oracles mirror the
Spark expression **operation-for-operation in the same order**, so
double-typed outputs are bit-identical and hash-comparable — including
the sketch family: MinHash-LSH and SimHash run their `portable` arms
(md5-prefix token hashes, integer-exact mirrors), and the quantizer ops
(IVF, SemDeDup) embed deterministically-fit centroids as SQL literals
(`fit_quantizer_det` + `duck_dist_list`), so every registry entry
carries a value-hash oracle. tests/test_dedup.py additionally checks
sketch recall against the exact-Jaccard / brute-force baselines.
"""

from __future__ import annotations

from . import dedup as _dedup_family  # noqa: F401
from . import ann as _ann_family  # noqa: F401
from . import text as _text_family  # noqa: F401
from . import sampling as _sampling_family  # noqa: F401
from . import pipeline as _pipeline_family  # noqa: F401
from . import profile as _profile_family  # noqa: F401
