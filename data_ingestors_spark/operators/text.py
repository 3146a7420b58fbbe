"""Text analysis operators: stats, language-ID heuristic, token
counting, document fingerprinting. All built-in-function expressions
(no UDFs) so they run inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestors_spark.functions.rounding import fround
from data_ingestors_spark.operators.dedup import normalize_text

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic — deliberately small + deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality stats: chars, words, avg word length,
    punctuation ratio, digit ratio, uppercase ratio."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.trim(t) == "", 0).otherwise(F.size(words)).cast("long")
    n_chars = F.length(t).cast("long")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("long")
    n_digit = (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        fround(n_chars.cast("double") / F.greatest(n_words, F.lit(1)), 4).alias("chars_per_word"),
        n_punct.alias("n_punct"),
        fround(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        fround(n_digit.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
    )


def _marker_hits(text_col: str, lang: str) -> "F.Column":
    """Count of stopword-marker occurrences (word-boundary regex)."""
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(pat)).cast("long")


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-marker language heuristic: argmax of per-language
    marker hit counts; 'und' (undetermined) when all zero. Ties break
    by fixed language priority en > de > fr > es — a deterministic
    CASE cascade that the SQL oracle mirrors verbatim."""
    hits = {lang: _marker_hits(text_col, lang) for lang in LANG_MARKERS}
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    pred = (
        F.when((en == 0) & (de == 0) & (fr == 0) & (es == 0), "und")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[hits[lang].alias(f"hits_{lang}") for lang in LANG_MARKERS],
        pred.alias("lang_pred"),
    )


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    ws = F.when(F.trim(t) == "", 0).otherwise(F.size(F.split(F.trim(t), r"\s+"))).cast("long")
    bpe = F.regexp_count(t, F.lit(TOKEN_RE)).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"), ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Canonical-form document fingerprint (md5 of normalized text) +
    a 64-bit content hash for compact join keys."""
    norm = normalize_text(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp64"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite document-quality tier (0-5) from the text_stats
    signals: length band, word count, punctuation/digit ratios, and
    chars-per-word band — the standard pre-training corpus filter
    (C4/Gopher-style heuristics re-expressed as portable column
    expressions). Pure codegen'd projection; no shuffle."""
    stats = text_stats(df, text_col, id_col)
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    score = (
        flag(F.col("n_chars").between(100, 2000))
        + flag(F.col("n_words") >= 20)
        + flag(F.col("punct_ratio") <= 0.10)
        + flag(F.col("digit_ratio") <= 0.20)
        + flag(F.col("chars_per_word").between(3.0, 12.0))
    )
    return stats.select("doc_id", score.cast("long").alias("quality"))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    A1.1 — the filter set reused by Dolma/RedPajama/DataTrove) as
    per-rule boolean flags plus the conjunction, so downstream
    pipelines can both filter and audit WHICH rule fired:

    - ``f_word_count``     — 50 ≤ words ≤ 100 000
    - ``f_mean_word_len``  — 3 ≤ mean word length ≤ 10
    - ``f_symbol_ratio``   — (# + ellipsis occurrences) / words ≤ 0.1
    - ``f_bullet_lines``   — < 90% of lines start with a bullet
    - ``f_ellipsis_lines`` — < 30% of lines end with an ellipsis
    - ``f_alpha_words``    — ≥ 80% of words contain a letter
    - ``f_stopwords``      — ≥ 2 of the 8 required stop words occur

    Everything is a row-local codegen expression over ONE let-bound
    word array and ONE line array (no shuffle, no UDF); the repetition
    rules of the same appendix live in ``dup_ngram_chars`` /
    ``repetition_stats``. Empty documents fail the count rules and
    ratio rules are guarded against /0.
    """
    from data_ingestors_spark.operators.dedup import let_bound

    t = F.col(text_col)

    def build(ws):
        n_words = F.size(ws)
        nw = F.greatest(n_words, F.lit(1)).cast("double")
        mean_wl = (
            F.aggregate(ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
            .cast("double") / nw
        )
        n_sym = (
            F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), 0)).cast("double")
        )
        lines0 = F.split(t, r"\n")
        lines = F.transform(lines0, lambda l: F.trim(l))
        nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
        bullet = F.size(
            F.filter(lines, lambda l: l.rlike(r"^[•‣▪◦*-]"))
        ).cast("double")
        ell = F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        low = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
        n_stop = sum(
            F.when(
                low.rlike(r"[^a-z]" + s + r"[^a-z]"), F.lit(1)
            ).otherwise(F.lit(0))
            for s in GOPHER_STOPWORDS
        )
        return F.struct(
            n_words.cast("long").alias("n_words"),
            fround(mean_wl, 4).alias("mean_word_len"),
            n_words.between(50, 100_000).alias("f_word_count"),
            mean_wl.between(3.0, 10.0).alias("f_mean_word_len"),
            ((n_sym / nw) <= 0.1).alias("f_symbol_ratio"),
            ((bullet / nl) < 0.9).alias("f_bullet_lines"),
            ((ell / nl) < 0.3).alias("f_ellipsis_lines"),
            ((alpha / nw) >= 0.8).alias("f_alpha_words"),
            (n_stop >= 2).alias("f_stopwords"),
        )

    ws0 = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    s = let_bound(ws0, build)
    out = df.select(F.col(id_col).alias("doc_id"), s.alias("_g"))
    flags = [
        "f_word_count", "f_mean_word_len", "f_symbol_ratio", "f_bullet_lines",
        "f_ellipsis_lines", "f_alpha_words", "f_stopwords",
    ]
    passes = None
    for f in flags:
        c = F.col(f"_g.{f}")
        passes = c if passes is None else (passes & c)
    return out.select(
        "doc_id",
        F.col("_g.n_words").alias("n_words"),
        F.col("_g.mean_word_len").alias("mean_word_len"),
        *[F.col(f"_g.{f}").alias(f) for f in flags],
        passes.alias("passes_gopher"),
    )


def c4_line_filter(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The C4 line-level cleaning rules (Raffel et al. 2020 §2.2) as
    a rewrite + audit flags: keep a line only if it ends in terminal
    punctuation (``. ! ? "``), has at least 5 words, and does not
    mention javascript; at the document level flag the "lorem ipsum"
    and curly-brace (code) rules, and require at least 3 surviving
    lines. (The original also applies a bad-words list and URL-level
    dedup — the list is not shipped here, and URL dedup belongs to
    the dedup family.)

    Everything is one let-bound line-array expression — filter /
    transform HOFs, fully row-local, no shuffle. Output per input
    document: (doc_id, n_lines, n_kept, cleaned_text, has_lorem,
    has_brace, passes_c4) where cleaned_text joins kept lines with
    newlines (empty string when nothing survives).
    """
    from data_ingestors_spark.operators.dedup import let_bound

    t = F.col(text_col)

    def build(lines):
        kept = F.filter(
            lines,
            lambda l: l.rlike(r'[.!?"]$')
            & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != "")) >= 5)
            & ~F.lower(l).contains("javascript"),
        )
        return F.struct(
            F.size(lines).cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, "\n").alias("cleaned_text"),
        )

    lines0 = F.filter(
        F.transform(F.split(t, r"\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    s = let_bound(lines0, build)
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    return df.select(
        F.col(id_col).alias("doc_id"),
        s.alias("_c"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
    ).select(
        "doc_id",
        F.col("_c.n_lines").alias("n_lines"),
        F.col("_c.n_kept").alias("n_kept"),
        F.col("_c.cleaned_text").alias("cleaned_text"),
        "has_lorem",
        "has_brace",
        (~F.col("has_lorem") & ~F.col("has_brace") & (F.col("_c.n_kept") >= 3))
        .alias("passes_c4"),
    )


PII_PATTERNS = {
    # syntax subset Java regex and RE2 agree on (no lookaround/backrefs)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9][0-9() .-]{7,}[0-9]",
}


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Scrub emails, URLs, and phone-shaped numbers from a text
    column, counting each category — the standard pre-training PII
    pass. Pure JVM-side regex expressions (codegen'd, no UDF). Counts
    are per-category over the ORIGINAL text (independent matches);
    redaction applies email -> url -> phone sequentially."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
    red = F.col("t")
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return src.select(
        "doc_id",
        *[
            F.size(F.regexp_extract_all("t", F.lit(pat), 0)).cast("long").alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
        red.alias("redacted"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document's word sequence into overlapping fixed-size
    chunks — the context-window preparation step every LLM training /
    RAG-indexing pipeline runs before tokenization proper.

    Chunk k covers words [1 + k·stride, 1 + k·stride + chunk_size) with
    stride = chunk_size − overlap; the last chunk is the (possibly
    short) tail, and a doc shorter than chunk_size yields exactly one
    chunk. Entirely row-local array expressions (sequence → transform →
    inline): ZERO shuffles, scales as a projection over the corpus
    scan. Output: (doc_id, chunk_id, n_words, chunk_text).
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap ({overlap}) must be < chunk_size ({chunk_size})")
    stride = chunk_size - overlap

    def build(ws):
        n_chunks = F.lit(1) + F.ceil(
            F.greatest(F.size(ws) - chunk_size, F.lit(0)) / F.lit(stride)
        ).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda k: F.struct(
                k.cast("long").alias("chunk_id"),
                F.least(
                    F.size(ws) - k * stride, F.lit(chunk_size)
                ).cast("long").alias("n_words"),
                F.concat_ws(" ", F.slice(ws, k * stride + 1, chunk_size)).alias(
                    "chunk_text"
                ),
            ),
        )

    from data_ingestors_spark.operators.dedup import let_bound

    chunks = let_bound(F.split(F.col(text_col), " "), build)
    return df.select(
        F.col(id_col).alias("doc_id"), F.inline(chunks)
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS scheme): hash every k-word gram, slide a
    window of ``window`` consecutive gram hashes, keep each window's
    minimum; the distinct minima are the document's fingerprint set.
    Guarantees every match of length >= window+k-1 words shares at
    least one fingerprint, at ~2/(window+1) sampling density.

    Engine-portable determinism: gram hashes are the first 60 bits of
    md5 as a BIGINT (Spark ``conv(substr(md5, 1, 15), 16, 10)`` ==
    DuckDB ``CAST('0x' || substr(md5, 1, 15) AS BIGINT)``) and the
    window minimum is the numeric min — identical in any SQL engine,
    no seeded integer hash needed. Longs compare ~10x cheaper than the
    32-char hex strings they replace (the window-min is O(n·window)
    comparisons per doc) and shrink the exploded (doc_id, fp) rows the
    inverted-index self-join shuffles. Entirely row-local array
    expressions; output is (doc_id, fp) exploded rows, ready for an
    inverted-index self-join (same shape as ngram_jaccard_pairs) to
    find cross-document overlap.
    """
    ws = F.split(F.col(text_col), " ")
    n_grams = F.greatest(F.size(ws) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(ws, i, k))), 1, 15), 16, 10
        ).cast("long"),
    )

    def build(g):
        n_win = F.greatest(F.size(g) - (window - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda i: F.array_min(F.slice(g, i, window)),
            )
        )

    from data_ingestors_spark.operators.dedup import let_bound

    fps = let_bound(grams, build)
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(fps).alias("fp")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    smoothing: float = 0.5,
) -> DataFrame:
    """Unigram language-model score per document — the cheap
    perplexity proxy corpus curation uses to rank fluency before any
    neural scoring (documents full of rare/garbage tokens score low,
    i.e. high negative log-probability per word).

    Model: corpus unigram frequencies with add-``smoothing`` Laplace
    smoothing; score = mean over the doc's words of
    −log₂ p(word). Returns (doc_id, n_words, bits_per_word).

    Scale shape: the model is ONE groupBy over exploded words
    (map-side partial agg), joined back by word — the frequency table
    is vocabulary-sized, which Spark's AQE broadcasts when it fits and
    shuffle-joins when it does not; the per-doc score is then a single
    reaggregation by doc. Nothing is collected to the driver.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w")).filter(
        F.col("w") != ""
    )
    stats = base.groupBy("w").agg(F.count("*").alias("cnt"))
    totals = stats.agg(
        F.sum("cnt").alias("n_tokens"), F.count("*").alias("n_vocab")
    )
    model = stats.crossJoin(F.broadcast(totals)).select(
        "w",
        (
            -F.log2(
                (F.col("cnt") + F.lit(smoothing))
                / (F.col("n_tokens") + F.lit(smoothing) * F.col("n_vocab"))
            )
        ).alias("bits"),
    )
    return (
        base.join(model, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.avg("bits").alias("bits_per_word"),
        )
    )


def bm25_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of each document to a bag of query terms —
    the standard lexical ranking function (Robertson/Spärck Jones; the
    Lucene +1 idf variant keeps scores non-negative when a term appears
    in more than half the corpus).

    Returns (doc_id, bm25_dec) with the score accumulated in DECIMAL:
    each per-(doc, term) contribution is a pure scalar of (tf, df, dl,
    avgdl, N), so quantizing to 1e-10 before the cross-term sum makes
    the total independent of reduction order (and bit-identical to any
    engine evaluating the same expression tree).

    Scale shape: doc lengths and per-(doc, term) term frequencies are
    ONE explode + two groupBys (map-side partials); the term filter
    prunes the exploded stream to query terms before any shuffle; df
    and the (N, avgdl) scalar are term-count / 1-row frames, broadcast.
    Nothing is collected to the driver.
    """
    words = F.split(F.col(text_col), " ")
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w")).filter(
        F.col("w") != ""
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum(F.col("dl").cast("decimal(30,10)")).cast("double") / F.count("*")).alias(
            "avgdl"
        ),
    )
    tf = (
        toks.filter(F.col("w").isin(*terms))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    score = (
        idf
        * (F.col("tf") * (F.lit(k1) + F.lit(1.0)))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(score.cast("decimal(30,10)")).alias("bm25_dec"))
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span: int = 30,
) -> DataFrame:
    """Exact duplicated-substring detection: per document, the fraction
    of its length-``span`` character windows (stride 1) that occur more
    than once anywhere in the corpus — the substring-dedup primitive of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022), as a DataFrame program instead of a suffix
    array.

    Plan shape — every shuffle is a combiner-friendly groupBy; there is
    no window function and no join keyed on the window string. One
    zero-shuffle projection explodes each doc into its windows
    (sequence → transform → explode, all codegen); groupBy(w, doc_id)
    reduces the raw span stream once with map-side combine;
    groupBy(w) folds those to global counts — a corpus-hot span (a
    license header, a whitespace run) shared by d documents collapses
    map-side to at most one partial row per task, so no reducer ever
    sees d rows for one key. The fold back to documents needs no join
    on "w": a globally-UNIQUE window (n_occ == 1) lives in exactly one
    document, so its owner is recoverable as max(doc_id), and
    n_dup_windows(doc) = n_windows(doc) − n_unique(doc). At 100 TB the
    window column can be replaced by ``xxhash64(window)`` to shuffle
    8-byte keys (collision odds ~n²/2⁶⁴) — kept as the raw string here
    so the DuckDB oracle is bit-exact.

    Output: (doc_id, n_windows, n_dup_windows, dup_frac). Documents
    shorter than ``span`` have no windows and are absent.
    """
    s = F.col(text_col)
    n_wins = F.greatest(F.length(s) - F.lit(span - 1), F.lit(0))
    windows = F.when(n_wins > 0, F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda i: F.substring(s, i, F.lit(span)),
    )).otherwise(F.expr("CAST(array() AS array<string>)"))

    spans = df.select(
        F.col(id_col).alias("doc_id"), F.explode(windows).alias("w")
    )
    per = spans.groupBy("w", "doc_id").agg(F.count("*").alias("c"))
    # Unique-window attribution: n_occ == 1 implies exactly one
    # (doc, c=1) row for that window, so max(doc_id) IS the owning
    # document — no join back on "w", hence no skew on hot spans.
    uniq = (
        per.groupBy("w")
        .agg(F.sum("c").alias("n_occ"), F.max("doc_id").alias("doc_id"))
        .filter(F.col("n_occ") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_uniq"))
    )
    totals = per.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n_windows"))
    return (
        totals.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            (F.col("n_windows") - F.coalesce(F.col("n_uniq"), F.lit(0)))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac",
            fround(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
    )


def dup_span_merge(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span: int = 30,
) -> DataFrame:
    """MAXIMAL duplicated spans per document: merge the fixed-length
    duplicated windows of :func:`dup_span_stats` into variable-length
    regions — the two-pass approximation of the maximal-duplicated-
    substring primitive (Lee et al., ACL 2022: a suffix array yields
    maximal spans directly; here fixed-span seeds + interval merging
    recover them as a DataFrame program).

    Two duplicated windows at character positions p and q (p < q)
    merge when q − p ≤ span — overlap (< span) or exact adjacency
    (= span) — so each output region is a contiguous run of characters
    covered by duplicated windows. Per document this is the classic
    gaps-and-islands: break when the gap exceeds ``span``, then
    min/max positions per island.

    Scale shape: the global window-frequency groupBy is the same
    combiner-friendly reduction as dup_span_stats (hot spans collapse
    map-side); duplicated POSITIONS are recovered without any join
    keyed on the window string — globally-unique windows attribute
    their (doc, pos) via max() on the single surviving row, and an
    anti-join on the uniformly-distributed (doc_id, pos) key removes
    them from the position stream. The islands window partitions by
    doc_id, bounded by document length, never by corpus frequency.

    Output: (doc_id, n_spans, dup_chars, max_span_chars) — documents
    with no duplicated window are absent. ``dup_chars`` can exceed the
    n_dup_windows of dup_span_stats because merged regions count
    covered characters, not windows.
    """
    islands = _dup_islands(df, text_col, id_col, span)
    return islands.select(
        "doc_id", (F.col("end") - F.col("start") + 1).alias("chars")
    ).groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("chars").cast("long").alias("dup_chars"),
        F.max("chars").cast("long").alias("max_span_chars"),
    )


def _dup_islands(
    df: DataFrame, text_col: str, id_col: str, span: int
) -> DataFrame:
    """Maximal duplicated regions per document as 1-based inclusive
    character intervals (doc_id, start, end) — the shared core of
    :func:`dup_span_merge` (statistics) and :func:`strip_dup_spans`
    (rewrite). See dup_span_merge for the merge semantics and the
    hot-span-safe plan shape. Consecutive islands are separated by at
    least one uncovered character (the break condition is a position
    gap > span), so the intervals are disjoint and non-adjacent."""
    s = F.col(text_col)
    n_wins = F.greatest(F.length(s) - F.lit(span - 1), F.lit(0))
    windows = F.when(n_wins > 0, F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda i: F.substring(s, i, F.lit(span)),
    )).otherwise(F.expr("CAST(array() AS array<string>)"))

    spans = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(windows).alias("pos", "w")
    ).withColumn("pos", F.col("pos") + 1)  # 1-based, matches substring

    # (doc, pos) of every globally-unique window — exactly one row
    # survives the n_occ == 1 filter per window, so max() attributes
    # both coordinates without a join back on "w".
    uniq_pos = (
        spans.groupBy("w")
        .agg(
            F.count("*").alias("n_occ"),
            F.max("doc_id").alias("doc_id"),
            F.max("pos").alias("pos"),
        )
        .filter(F.col("n_occ") == 1)
        .select("doc_id", "pos")
    )
    # uniq_pos is CORPUS-sized by construction (on a diverse corpus
    # nearly every window is unique), so the anti-join must never
    # broadcast it: its (doc_id, pos) pairs compress ~20× in shuffle
    # files, and AQE's broadcast conversion reads the COMPRESSED stage
    # size — at the 100× synthetic sf10 the "64 MB" side deserialized
    # to >1 GiB of driver-built broadcast and killed the job on
    # spark.driver.maxResultSize. The merge hint pins the spill-safe
    # sort-merge join AQE would otherwise convert away (shuffle_hash
    # also avoids the broadcast but its per-partition hash map is
    # memory-bound — it OOM'd at the same scale the broadcast did).
    dup_pos = spans.select("doc_id", "pos").join(
        uniq_pos.hint("merge"), ["doc_id", "pos"], "left_anti"
    )

    from pyspark.sql import Window

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w_doc) <= span, F.lit(0)
    ).otherwise(F.lit(1))
    return (
        dup_pos.withColumn("brk", brk)
        .withColumn(
            "grp", F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("int").alias("start"),
            (F.max("pos") + span - 1).cast("int").alias("end"),
        )
        .select("doc_id", "start", "end")
    )


def strip_dup_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span: int = 30,
    min_len: int | None = None,
) -> DataFrame:
    """Boilerplate scrub: rewrite each document with its maximal
    duplicated regions (per :func:`dup_span_merge`, optionally only
    those of at least ``min_len`` characters) CUT OUT — the action
    step after measuring duplication. This variant removes a
    duplicated region from EVERY document containing it (the
    boilerplate interpretation: text that also occurs elsewhere is
    noise); the keep-one-canonical-copy variant of Lee et al. needs a
    global canonical assignment per span and is intentionally not
    conflated with this operator.

    The rewrite is row-local after the region computation: regions
    collect into a sorted per-doc array (bounded by doc length /
    span), join back to the document by doc_id (uniform key), and one
    codegen ``aggregate`` fold stitches the kept segments — no UDF,
    no per-character shuffle.

    Output: (doc_id, cleaned_text, n_regions, removed_chars) for
    EVERY input document (unchanged docs pass through with 0 / 0).
    """
    min_len = span if min_len is None else min_len
    regions = _dup_islands(df, text_col, id_col, span).filter(
        F.col("end") - F.col("start") + 1 >= min_len
    )
    regs = regions.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("regs")
    )
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    t = F.col("_t")
    acc0 = F.struct(
        F.lit(0).cast("int").alias("last"), F.lit("").alias("acc")
    )
    stitched = F.aggregate(
        F.col("regs"),
        acc0,
        lambda acc, r: F.struct(
            r["end"].alias("last"),
            F.concat(
                acc["acc"], t.substr(acc["last"] + 1, r["start"] - 1 - acc["last"])
            ).alias("acc"),
        ),
        lambda acc: F.concat(
            acc["acc"], t.substr(acc["last"] + 1, F.length(t) - acc["last"])
        ),
    )
    joined = base.join(regs, "doc_id", "left")
    cleaned = F.when(F.col("regs").isNull(), t).otherwise(stitched)
    return joined.select(
        "doc_id",
        cleaned.alias("cleaned_text"),
        F.coalesce(F.size("regs"), F.lit(0)).cast("long").alias("n_regions"),
        (F.length(t) - F.length(cleaned)).cast("long").alias("removed_chars"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    smoothing: float = 0.5,
) -> DataFrame:
    """Bigram language-model score per document: mean over the doc's
    adjacent word pairs of −log₂ p(wᵢ | wᵢ₋₁), with add-``smoothing``
    Laplace smoothing — p = (c(prev,w)+s) / (c(prev)+s·V). The
    standard n-gram step up from :func:`unigram_logprob`: repeated
    unlikely transitions (template spam, shuffled text) score high
    bits even when every individual word is common.

    Scale shape mirrors the unigram op: bigram extraction is a
    zero-shuffle row-local array expression; the model is two groupBys
    (pair counts, context counts) plus a 1-row vocab scalar; scoring
    joins the model back by pair — AQE broadcasts the model when it
    fits. Docs with fewer than 2 words have no bigrams and are absent.

    Returns (doc_id, n_bigrams, bits_per_bigram).
    """
    from data_ingestors_spark.operators.dedup import let_bound

    ws0 = F.split(normalize_text(F.col(text_col)), " ")

    # let-bind the filtered word array: referencing it directly inside
    # the transform lambda re-evaluates normalize+split+filter per
    # bigram position (O(words^2) per row — Catalyst does no
    # subexpression elimination in interpreted lambdas)
    def build(ws):
        return F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.struct(
                    F.element_at(ws, i).alias("prev"),
                    F.element_at(ws, i + F.lit(1)).alias("w"),
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<prev:string,w:string>>)"))

    pairs = let_bound(F.filter(ws0, lambda w: w != ""), build)
    base = df.select(F.col(id_col).alias("doc_id"), F.inline(pairs))

    bg = base.groupBy("prev", "w").agg(F.count("*").alias("c_bg"))
    ctx = base.groupBy("prev").agg(F.count("*").alias("c_ctx"))
    vocab = base.agg(F.countDistinct("w").alias("v"))
    model = (
        bg.join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "w",
            (
                -F.log2(
                    (F.col("c_bg") + F.lit(smoothing))
                    / (F.col("c_ctx") + F.lit(smoothing) * F.col("v"))
                )
            ).alias("bits"),
        )
    )
    return (
        base.join(model, ["prev", "w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("bits").alias("bits_per_bigram"),
        )
    )
