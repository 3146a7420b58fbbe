"""Python UDTFs (user-defined TABLE functions, PySpark 4) — the last
member of the UDF surface (SURVEY §2.5 R10) next to scalar/pandas
UDFs, mapInPandas, applyInPandas(+State), and pandas UDAFs.

A UDTF runs row-at-a-time Python and yields 0..n output rows per input
row — the LATERAL-join escape hatch for per-row expansion whose logic
is genuinely imperative (stateful lookahead, early exit) and cannot be
phrased as array expressions. That also makes it the SLOW path: for
anything expressible with explode/transform/sequence (token counts,
fixed-window chunking — see operators/text.py chunk_documents), the
JVM expression form wins by an order of magnitude. Use a UDTF only
when the semantics demand it; these two exist to keep that surface
tested and documented.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: int, chunk_text: string, n_words: int")
class SentenceChunks:
    """Greedy sentence-packing chunker: split on '.', pack whole
    sentences into chunks of at most ``max_words`` words, never
    splitting inside a sentence (a sentence longer than the budget
    gets its own oversized chunk — fail-soft, nothing dropped).

    This is the boundary-respecting variant of the fixed-window
    ``chunk_documents``: the greedy lookahead ("does the NEXT sentence
    still fit?") is inherently sequential per document, which is what
    justifies the UDTF form.
    """

    def eval(self, text: str, max_words: int):  # noqa: D102
        if not text:
            return
        sentences = [s.strip() for s in text.split(".") if s.strip()]
        chunk: list[str] = []
        n = 0
        cid = 0
        for s in sentences:
            w = len(s.split())
            if chunk and n + w > max_words:
                yield cid, ". ".join(chunk) + ".", n
                cid, chunk, n = cid + 1, [], 0
            chunk.append(s)
            n += w
        if chunk:
            yield cid, ". ".join(chunk) + ".", n


@udtf(returnType="word: string, n: int")
class WordCounts:
    """Per-row word histogram as rows — the minimal LATERAL-join
    demo (deterministically ordered for stable tests)."""

    def eval(self, text: str):  # noqa: D102
        from collections import Counter

        for w, n in sorted(Counter((text or "").split()).items()):
            yield w, n


def register_udtfs(spark) -> list[str]:
    """Register the packaged UDTFs for SQL use (LATERAL / table-factor
    position). Returns the registered names."""
    spark.udtf.register("sentence_chunks", SentenceChunks)
    spark.udtf.register("word_counts", WordCounts)
    return ["sentence_chunks", "word_counts"]
