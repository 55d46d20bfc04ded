"""SQL-callable table functions — the UDTF arm of the pluggable-task
surface (SURVEY.md §2.8).

The reference's extensibility is compiled Go plugins (`rule.go:15-22`); the
Spark-native mapping is layered: Column expressions (fast path), the Task
protocol over pandas UDFs (`tasks/protocol.py`), and — for users living in
``spark.sql`` — Python UDTFs registered as table functions, callable with
``LATERAL``/``TABLE()`` syntax (Spark 3.5+ ``@udtf``).

UDTFs are row-at-a-time Python — the SLOW path, kept off hot loops by
design. They exist here as the *pluggability* surface: `chunk_text` is the
SQL-visible twin of the Column-based ``chunking.chunk_documents`` (zero
shuffles, vectorized), and the test suite asserts the two produce
identical rows so the convenience form can't drift from the fast one.
"""

from __future__ import annotations


def has_udtf() -> bool:
    """Capability check: Python UDTFs landed in Spark 3.5."""
    try:
        from pyspark.sql.functions import udtf  # noqa: F401
    except ImportError:
        return False
    return True


def make_chunk_text_udtf():
    """Build the ``chunk_text(text, win, stride)`` UDTF class: yields
    (chunk_id, n_tokens, chunk) rows, same semantics as
    ``chunking.chunk_documents`` (whitespace tokens; windows start every
    ``stride`` tokens; a document shorter than ``win`` yields its single
    full-text chunk)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int, chunk string")
    class ChunkText:
        def eval(self, text: str, win: int, stride: int):
            import math

            if text is None:
                return
            toks = text.split(" ")
            n = len(toks)
            # 1:1 with chunk_documents: ceil(max(n-win,0)/stride)+1 chunks,
            # chunk c covers toks[c*stride : c*stride+win], n_tokens =
            # min(win, n - c*stride).
            n_chunks = math.ceil(max(n - win, 0) / stride) + 1
            for cid in range(n_chunks):
                s = cid * stride
                yield cid, min(win, n - s), " ".join(toks[s : s + win])

    return ChunkText


def register_sql_udtfs(spark) -> list[str]:
    """Register all engine table functions on the session; returns the
    registered names. No-op (empty list) on runtimes without UDTF."""
    if not has_udtf():
        return []
    spark.udtf.register("chunk_text", make_chunk_text_udtf())
    return ["chunk_text"]
