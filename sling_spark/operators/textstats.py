"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Every operator is pure JVM column expressions (split/filter/regexp
arithmetic) so the hot path is whole-stage codegen — and every
formula is reproducible in ANSI SQL, which is exactly how the driver's
DuckDB oracle validates them. Doubles are rounded to 6 places for
engine-portable comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets: language ID scores a document
# by counting tokens equal to each language's marker words (exact
# token equality over the whitespace split). Deterministic heuristic in
# the spirit of fastText-lite; NOT a trained model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "es", "una", "que"],
}


def _tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text; the split artifacts an
    empty/whitespace-edged text produces ('' tokens) are removed."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda x: F.length(x) > 0
    )


def _marker_count(toks: Column, words: list[str]) -> Column:
    """#tokens equal to any marker word — EXACT token equality, not the
    length/replace substring trick: that trick consumes the shared
    separator between adjacent occurrences (' the the ' counts 1, not
    2) and misses non-space whitespace boundaries, systematically
    under-scoring exactly the repetitive text these filters target.
    The lambda form is identically expressible in ANSI/DuckDB SQL
    (list_filter + IN), which the contract oracles mirror."""
    return F.size(F.filter(toks, lambda x: x.isin(*words))).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace token count, null/empty-safe, JVM-side."""
    trimmed = F.trim(text)
    return F.when(
        text.isNull() | (F.length(trimmed) == 0), F.lit(0).cast("long")
    ).otherwise(F.size(F.split(trimmed, r"\s+")).cast("long"))


def word_marker_score(text: Column, lang: str) -> Column:
    """Marker-word token count for one language."""
    return _marker_count(_tokens(text), LANG_MARKERS[lang])


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Predicted language = argmax marker score; ties break by language
    code order; zero evidence → 'und'.

    Built as staged projections (tokens → per-lang scores → best → pred)
    so each codegen stage stays small — one flat expression tree here
    multiplies the tokenize subtree 20x and stalls Catalyst."""
    langs = sorted(LANG_MARKERS)
    scored = df.withColumn("__toks", _tokens(F.col(text_col)))
    for lang in langs:
        scored = scored.withColumn(
            f"__s_{lang}", _marker_count(F.col("__toks"), LANG_MARKERS[lang])
        )
    scored = scored.withColumn(
        "__best", F.greatest(*[F.col(f"__s_{lang}") for lang in langs])
    )
    pred = F.lit("und")
    for lang in sorted(langs, reverse=True):
        pred = F.when(
            (F.col(f"__s_{lang}") == F.col("__best")) & (F.col("__best") > 0),
            F.lit(lang),
        ).otherwise(pred)
    return scored.withColumn(out_col, pred).drop(
        "__toks", "__best", *[f"__s_{lang}" for lang in langs]
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    features + a composite quality score in [0,1].

    The score is a deterministic arithmetic blend (each feature clamped
    to a target band) — the shape of C4/Gopher-style quality rules,
    expressible identically in Spark and ANSI SQL."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("long")
    n_tokens = token_count(text)
    n_punct = (
        n_chars
        - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    ).cast("long")
    n_stop = _marker_count(_tokens(text), LANG_MARKERS["en"])
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / safe_tokens, 6)
    mean_word_len = F.round(n_chars / safe_tokens, 6)
    # banded sub-scores
    len_score = F.when((n_tokens >= 20) & (n_tokens <= 100000), 1.0).otherwise(0.0)
    stop_score = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.0)
    word_len_score = F.when(
        (mean_word_len >= 3.0) & (mean_word_len <= 12.0), 1.0
    ).otherwise(0.0)
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    quality = F.round(
        (len_score + stop_score + word_len_score + punct_score) / 4.0, 6
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"),
        quality.alias("quality"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "doc_fp") -> DataFrame:
    """64-bit portable content fingerprint: first 15 hex digits of
    md5(normalized text) as a BIGINT. Portable: DuckDB computes the
    identical value via ('0x'||substr(md5(x),1,15))::BIGINT."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    fp = F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
    return df.withColumn(out_col, fp)


def ngram_profile(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct character n-grams per document (rolling window over the
    lowercased text) — the building block for n-gram language models and
    near-dup shingling. JVM-side: sequence + transform + explode. Text
    shorter than ``n`` yields no rows (the unguarded sequence(1, 0)
    would COUNT DOWN — Spark's sequence defaults to step -1 when
    start > stop — and emit bogus sub-n grams)."""
    lowered = F.lower(F.col(text_col))
    idx = F.sequence(F.lit(1), F.length(lowered) - (n - 1))
    grams = F.when(
        F.length(lowered) >= n,
        F.transform(idx, lambda i: lowered.substr(i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        "*", F.explode(F.array_distinct(grams)).alias(f"gram{n}")
    )


# ---------------------------------------------------------------------------
# n-gram language-model scoring + repetition signals (pretraining QC)
# ---------------------------------------------------------------------------


def _ngram_array(text: Column, n: int) -> Column:
    """Array of word n-gram strings (with multiplicity), JVM-side:
    lower → split → sliding concat_ws over an index sequence; short
    documents yield an empty array. Empty tokens are filtered: split of
    an empty/whitespace text yields [''], which would otherwise count
    the empty string as a unigram (inflating the LM vocabulary)."""
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda x: F.length(x) > 0
    )
    idx = F.sequence(F.lit(1), F.size(toks) - n + 1)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """Bigram language-model perplexity per document — the CCNet-style
    quality-filtering signal (score documents by an n-gram LM trained
    on the corpus; outliers on either end are boilerplate or garbage).
    Model: P(w2|w1) = (C(w1 w2) + k) / (C(w1·) + k·V), add-k smoothing,
    V = corpus vocabulary size; score = mean -log2 P over the
    document's bigrams, perplexity = 2^score. Documents with no bigram
    (fewer than two tokens) are absent.

    Scale shape: counts are two corpus-wide hash aggregations with
    map-side combine; scoring joins each document's bigram occurrences
    against the count tables on their natural keys (bigram string /
    history word) — count tables are vocabulary-sized, so the joins
    shuffle by key and AQE broadcast-converts them when small; the
    vocabulary size enters as one broadcast scalar. Everything is JVM
    column expressions — no Python in the pipeline."""
    big = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_ngram_array(F.col(text_col), 2)).alias("bigram"),
    ).withColumn("w1", F.substring_index("bigram", " ", 1))
    bcounts = big.groupBy("bigram").agg(F.count("*").cast("long").alias("cb"))
    hcounts = big.groupBy("w1").agg(F.count("*").cast("long").alias("ch"))
    vocab = docs.select(
        F.explode(_ngram_array(F.col(text_col), 1)).alias("w")
    ).agg(F.countDistinct("w").cast("long").alias("v"))
    nll = -F.log2(
        (F.col("cb") + F.lit(k)) / (F.col("ch") + F.lit(k) * F.col("v"))
    )
    return (
        big.join(bcounts, on="bigram")
        .join(hcounts, on="w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
        )
        .withColumn("perplexity", F.round(F.pow(F.lit(2.0), "avg_nll"), 6))
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals — the published Gopher-style
    repetition filters for pretraining corpora: the fraction of bigram
    occurrences taken by the single most frequent bigram, and the
    fraction of trigram occurrences that are duplicates. High values
    flag templated/looping text. Two (doc, gram)-keyed partial
    aggregations + one doc-keyed rollup, all JVM; short documents
    report zero fractions."""

    def frac(n: int, out: str, mode: str) -> DataFrame:
        g = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_ngram_array(F.col(text_col), n)).alias("g"),
        )
        per = g.groupBy("doc_id", "g").agg(F.count("*").cast("long").alias("c"))
        agg = per.groupBy("doc_id").agg(
            F.sum("c").cast("long").alias("total"),
            (F.max("c") if mode == "top" else F.count("*").cast("long")).alias("x"),
        )
        val = (
            F.col("x") / F.col("total")
            if mode == "top"
            else (F.col("total") - F.col("x")) / F.col("total")
        )
        return agg.select("doc_id", F.round(val, 6).alias(out))

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.when(
                F.length(F.trim(F.col(text_col))) > 0,
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            ).otherwise(F.array().cast("array<string>"))
        ).cast("long").alias("n_tokens"),
    )
    return (
        base.join(frac(2, "top_bigram_frac", "top"), on="doc_id", how="left")
        .join(frac(3, "dup_trigram_frac", "dup"), on="doc_id", how="left")
        .fillna(0.0, subset=["top_bigram_frac", "dup_trigram_frac"])
    )


# ---------------------------------------------------------------------------
# PII / URL scrubbing (pretraining redaction pass)
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) applied IN ORDER on the progressively
#: scrubbed text — URLs first so credentials/emails inside a URL vanish
#: with it; per-step counts therefore equal replacements actually made.
#: Patterns are deliberately RE2-compatible (no backrefs/lookaround) so
#: the DuckDB oracle evaluates the identical regexes.
PII_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{9,}\b", "<NUM>"),
]


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact URLs, emails, IPv4 addresses and long id-like digit runs
    — the standard pretraining-corpus scrubbing pass. Pure JVM
    regexp_count/regexp_replace column expressions (whole-stage
    codegen; at 100 TB this is a narrow map over the corpus scan, no
    shuffle). Returns (doc_id, clean_text, n_url, n_email, n_ipv4,
    n_idnum, n_redactions)."""
    cur = F.col(text_col)
    counts = []
    for name, pat, rep in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, rep)
    out = docs.select(
        F.col(id_col).alias("doc_id"), cur.alias("clean_text"), *counts
    )
    total = None
    for name, _p, _r in PII_RULES:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_redactions", total.cast("long"))
