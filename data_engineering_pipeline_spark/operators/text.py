"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Catalyst expressions (split/filter/
transform/aggregate lambdas) — JVM-side, no Python UDFs, so the operators
whole-stage-codegen and scale linearly with input: tokenization and
scoring are per-row map work (no shuffle at all), and the only shuffles
in the downstream queries are the final aggregations.

Ops: tokenization + token counting, quality scoring (length / punct /
stopword ratios), language-ID (marker-word heuristic), document
fingerprinting (polynomial rolling hash). The rolling hash uses exact
int64 arithmetic mod 1e9+7 so an external engine (the DuckDB oracle)
reproduces it bit-for-bit; xxhash64 would be marginally faster but is
Spark-only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mirrored in SQL oracles — keep literal lists in sync with queries/text.py.
STOPWORDS_EN = ("the", "a", "an", "of", "and", "to", "in", "is")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "an", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "las", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "zh": ("的", "是", "了", "在", "和", "有"),
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokenization, empty tokens dropped.

    Metric functions below accept EITHER raw text (tokenize inline) or a
    pre-tokenized array column via `toks=`. For multi-metric queries,
    materialize the tokens once in their own projection and pass them in
    — Catalyst does not CSE the tokenization across metric expressions,
    so inline re-tokenization multiplies the regex work per row (same
    pitfall as the shingle construction, operators/dedup.py)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def _toks(text: Column | str | None, toks: Column | None) -> Column:
    if toks is not None:
        return toks
    if text is None:
        raise ValueError("pass text or toks")
    return tokens(text)


def token_count(text: Column | str | None = None, *, toks: Column | None = None) -> Column:
    return F.size(_toks(text, toks))


def distinct_token_count(text: Column | str | None = None, *, toks: Column | None = None) -> Column:
    return F.size(F.array_distinct(_toks(text, toks)))


def stopword_ratio(
    text: Column | str | None = None,
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    *,
    toks: Column | None = None,
) -> Column:
    """Fraction of token occurrences that are stopwords."""
    t = _toks(text, toks)
    stop = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    # nullif-guard (r9 review): a zero-token doc (whitespace-only
    # text passes upstream length gates) made this raise ANSI
    # DIVIDE_BY_ZERO and kill the whole job — the same class as the
    # r8 zero-norm cosine fix. NULL on empty. The guard wraps ONLY
    # the cheap divisor: a CASE WHEN around the whole ratio would
    # exclude the expensive lambda numerator from subexpression
    # elimination wherever a query projects the ratio next to other
    # metrics sharing that subtree (measured +50% on text-quality).
    return n_stop.cast("double") / F.nullif(F.size(t), F.lit(0))


def punct_ratio(text: Column | str, punct_class: str = r"[.,!?;:\'\"()]") -> Column:
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, punct_class, "")
    # nullif divisor guard: empty text raised ANSI DIVIDE_BY_ZERO
    # (r9 review; see stopword_ratio for why not a CASE WHEN)
    return (F.length(col) - F.length(stripped)).cast(
        "double"
    ) / F.nullif(F.length(col), F.lit(0))


def mean_token_length(text: Column | str | None = None, *, toks: Column | None = None) -> Column:
    t = _toks(text, toks)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    # nullif divisor guard: zero-token doc raised ANSI DIVIDE_BY_ZERO
    # (r9 review; see stopword_ratio for why not a CASE WHEN)
    return total.cast("double") / F.nullif(F.size(t), F.lit(0))


def quality_score(text: Column | str, *, toks: Column | None = None) -> Column:
    """Deterministic composite quality heuristic in [0, 1]: rewards
    mid-length docs, lexical diversity, and a sane stopword rate;
    penalizes punctuation soup. A stand-in for model-based quality
    filters; the shape (pure per-row expression) is what matters."""
    col = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(col, toks=toks)
    diversity = distinct_token_count(col, toks=toks).cast(
        "double"
    ) / F.nullif(n_tok, F.lit(0))
    len_score = F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0))
    stop_pen = F.least(stopword_ratio(col, toks=toks) * 2.0, F.lit(1.0))
    punct_pen = F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    raw = (
        0.4 * len_score + 0.4 * diversity + 0.2 * stop_pen - 0.2 * punct_pen
    )
    # zero-token docs must score 0.0 (r9 review): before the divisor
    # guards this path raised ANSI DIVIDE_BY_ZERO — one whitespace-
    # only doc (which PASSES a length(text) gate) killed the whole
    # curation job — and a null-propagating raw alone would slip
    # through least/greatest (they SKIP nulls) as a PERFECT 1.0.
    # The empty-doc zero is ARITHMETIC, not a CASE WHEN around raw: a
    # conditional branch would exclude raw's expensive subtrees from
    # subexpression elimination with sibling metric columns (measured
    # +50% on text-quality). For n_tok = 0 every nullif-guarded term
    # is NULL, least/greatest skip them (clamp -> 1.0), and the 0/1
    # indicator multiplies the result to 0.0; coalesce covers the
    # only remaining NULL case (n_tok = 0 making the product NULL).
    clamped = F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0))
    return F.coalesce(
        clamped * (n_tok > 0).cast("double"), F.lit(0.0)
    )


def gopher_rules(
    text: Column | str,
    *,
    toks: Column | None = None,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    max_symbol_pm: int = 100,
    min_alpha_pm: int = 800,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """Gopher-style heuristic quality rules (Rae et al. 2021, table A1
    adapted to flat text): the standard cheap pre-filter a curation
    pipeline runs BEFORE model-based scoring. Returns one boolean
    Column per rule plus the conjunction under "keep":

      word_count     min_tokens <= n <= max_tokens
      mean_word_len  min_mean_len <= total_chars/n <= max_mean_len
      symbol_ratio   (#'#' + #'...') / n <= max_symbol_pm / 1000
      alpha_words    words containing an ASCII letter >= min_alpha_pm
                     / 1000 of all words
      stop_words     >= min_stopwords stopword occurrences

    Every comparison is DIVISION-FREE integer arithmetic (the ratio
    thresholds are per-mille ints, cross-multiplied), so the rules are
    bit-exact cross-engine, immune to float boundary ties, and
    ANSI-safe on zero-token docs (no divisor to guard — an empty doc
    simply fails word_count). Per-row map work only: one scan, no
    shuffle, whole-stage codegen."""
    col = F.col(text) if isinstance(text, str) else text
    t = _toks(text if toks is None else None, toks)
    n = F.size(t)
    total_chars = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    n_hash = F.size(F.split(col, "#", -1)) - 1
    n_ellipsis = F.size(F.split(col, r"\.\.\.", -1)) - 1
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
    rules = {
        "word_count": (n >= min_tokens) & (n <= max_tokens),
        "mean_word_len": (total_chars >= min_mean_len * n)
        & (total_chars <= max_mean_len * n),
        "symbol_ratio": (n_hash + n_ellipsis) * 1000 <= max_symbol_pm * n,
        "alpha_words": n_alpha * 1000 >= min_alpha_pm * n,
        "stop_words": n_stop >= min_stopwords,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else keep & c
    rules["keep"] = keep
    return rules


def lang_scores(
    text: Column | str | None = None, *, toks: Column | None = None
) -> dict[str, Column]:
    """Marker-word hit counts per language (counts token occurrences)."""
    t = _toks(text, toks)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    return out


def lang_id(
    text: Column | str | None = None, *, toks: Column | None = None
) -> Column:
    """argmax language by marker score; 'und' when no marker hits.
    Deterministic tie-break: language order en<de<es<fr<zh (first max
    wins via strict > comparison in that order)."""
    scores = lang_scores(text, toks=toks)
    langs = list(LANG_MARKERS)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fold left: strictly-greater keeps the earliest language on ties
    for lang in langs:
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best_lang


def fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over characters: left fold of
    acc*31 + ascii(char) (mod 1e9+7). Exact int64 math (no overflow:
    acc < 1e9+7 so acc*31+255 < 2^63), reproducible in any engine."""
    col = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + F.ascii(c)) % FINGERPRINT_MOD,
    )


# PII scrubbing patterns — the Java-regex / RE2 COMMON SUBSET only
# (\d, \b, bounded repeats, explicit classes; no lookaround), so the
# DuckDB oracle runs the identical pattern strings. Order matters:
# emails are redacted before IPs so a dotted-quad inside a hostname is
# already gone.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-pattern match counts (pre-redaction, on the raw text)."""
    col = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(col, F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its typed placeholder. Pure
    regexp_replace chain — per-row map work, whole-stage codegen, no
    shuffle; the shape of every scrubbing pass (PII, secrets, URLs)."""
    col = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def oov_rate(
    docs,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Out-of-vocabulary rate per document against the corpus' own
    top-`vocab_size` words — the vocab-coverage filter a tokenizer
    pipeline runs before training (a doc whose tokens are mostly
    outside the working vocabulary is noise, markup, or the wrong
    language; its sequences explode into rare-piece soup). Returns
    (id, n_tokens, n_oov, oov_rate) for every doc with >= 1 token;
    oov_rate is an int/int IEEE division (bit-deterministic).

    Scale shape: the vocabulary is ONE partial-aggregated word count
    + an ordered limit (TakeOrderedAndProject — per-partition heaps,
    never a global sort of the vocabulary; ties break on the word so
    the cut is deterministic), broadcast back; the corpus pays one
    explode + one broadcast membership join + one id groupBy. The
    vocab is corpus-derived here (self-coverage); pass-through of a
    FROZEN external vocabulary is the same join with the limit
    replaced by a table read."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    ex = docs.select(F.col(id_col), F.explode(toks).alias("w"))
    vocab = (
        ex.groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), "w")
        .limit(int(vocab_size))
        .select("w", F.lit(1).alias("__in_v"))
    )
    return (
        ex.join(F.broadcast(vocab), "w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_v").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.col("n_oov").cast("double") / F.col("n_tokens"),
        )
    )
