"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All pure JVM column expressions with exact ANSI-SQL oracles. Regexes are
restricted to syntax with identical semantics in Java regex (Spark) and RE2
(DuckDB): literal alternations and simple character classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cds_spark.operators.textdedup import _spread, _stable_hash_expr, _stable_hash_sql

# a tiny deterministic "stopword" model for the heuristic scorers
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
FINGERPRINT_K = 8


def _words(text_col: str = "text") -> F.Column:
    return F.split(F.lower(F.col(text_col)), " ")


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + a composite score: length, word stats,
    stopword ratio, alpha ratio. (The heuristic itself is arbitrary but
    fixed; what matters is deterministic distributed computation.)"""
    w = _words()
    n_words = F.size(w).cast("long")
    n_chars = F.length("text").cast("long")
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS))).cast("long")
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("long")
    # greatest(denom, 1): an empty doc must yield defined ratios (0), not
    # an ANSI DIVIDE_BY_ZERO that kills the job (Spark 4 default); the SQL
    # oracle applies the identical guard so the hash-match is unaffected
    nw = F.greatest(n_words, F.lit(1))
    nc = F.greatest(n_chars, F.lit(1))
    stop_ratio = F.round(n_stop.cast("double") / nw, 6)
    alpha_ratio = F.round(alpha_chars.cast("double") / nc, 6)
    avg_word_len = F.round(n_chars.cast("double") / nw, 6)
    score = F.round(
        F.least(stop_ratio * 2.0, F.lit(0.4)) + F.least(alpha_ratio, F.lit(0.4))
        + F.when((avg_word_len >= 3) & (avg_word_len <= 10), 0.2).otherwise(0.0),
        6,
    )
    return docs.select(
        "doc_id", n_chars.alias("n_chars"), n_words.alias("n_words"),
        stop_ratio.alias("stop_ratio"), alpha_ratio.alias("alpha_ratio"),
        avg_word_len.alias("avg_word_len"), score.alias("quality_score"),
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(lower(text), ' '), t -> t IN ({_STOP_IN}))) AS BIGINT) AS n_stop,
         CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars
  FROM documents
)
SELECT doc_id, n_chars, n_words,
       round(n_stop::DOUBLE / greatest(n_words, 1), 6) AS stop_ratio,
       round(alpha_chars::DOUBLE / greatest(n_chars, 1), 6) AS alpha_ratio,
       round(n_chars::DOUBLE / greatest(n_words, 1), 6) AS avg_word_len,
       round(least(round(n_stop::DOUBLE / greatest(n_words, 1), 6) * 2.0, 0.4)
             + least(round(alpha_chars::DOUBLE / greatest(n_chars, 1), 6), 0.4)
             + CASE WHEN round(n_chars::DOUBLE / greatest(n_words, 1), 6) BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END,
             6) AS quality_score
FROM base
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram/stopword language heuristic: English stopword density vs a
    CJK-codepoint check; 'und' when neither fires."""
    w = _words()
    stop_ratio = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS))).cast("double") / F.size(w)
    # \x{...} escapes: identical semantics in Java regex and RE2 (DuckDB)
    has_cjk = F.length(F.regexp_replace(F.col("text"), "[^\\x{4e00}-\\x{9fff}]", "")) > 0
    pred = (
        F.when(has_cjk, "zh").when(stop_ratio >= 0.05, "en").otherwise("und")
    )
    return docs.select("doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang"))


LANG_ID_SQL = f"""
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN len(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0 THEN 'zh'
            WHEN len(list_filter(string_split(lower(text), ' '), t -> t IN ({_STOP_IN})))::DOUBLE
                 / len(string_split(lower(text), ' ')) >= 0.05 THEN 'en'
            ELSE 'und' END AS predicted_lang
FROM documents
"""


def token_counts(docs: DataFrame) -> DataFrame:
    """BPE-ish regex tokenizer: alpha runs | digit runs | single symbols.
    Token counting is the unit of data budgeting in training pipelines."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
    ws = F.size(F.split(F.col("text"), " ")).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("n_whitespace_tokens"),
        F.size(toks).cast("long").alias("n_regex_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_whitespace_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_regex_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT) AS n_unique_tokens
FROM documents
"""


def fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint: min and max stable hash over
    k-char shingles (winnowing-lite; equal fingerprints => near-identical
    prefixes). Used for fast containment/versioning checks."""
    t = F.lower(F.col("text"))
    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (FINGERPRINT_K - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(FINGERPRINT_K)),
    )
    hashes = F.transform(arr, lambda s: _stable_hash_expr(s))
    # one md5 per character of text: heavy per-row compute, spread it
    return _spread(docs).select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_min([{_stable_hash_sql("substr(lower(text), i, " + str(FINGERPRINT_K) + ")")}
                 for i in generate_series(1, greatest(len(lower(text)) - {FINGERPRINT_K - 1}, 1))]) AS fp_min,
       list_max([{_stable_hash_sql("substr(lower(text), i, " + str(FINGERPRINT_K) + ")")}
                 for i in generate_series(1, greatest(len(lower(text)) - {FINGERPRINT_K - 1}, 1))]) AS fp_max
FROM documents
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: RE2-and-Java-compatible patterns (no lookaround/backrefs) so the Spark
#: plan and the DuckDB oracle execute the SAME regexes
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9() .-]{6,}[0-9]"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / phone-ish numbers / IPv4 literals to typed tags —
    the standard scrub pass before training-corpus release. Pure JVM
    regexp_replace/extract_all chain: linear scan, no shuffle, no UDF.
    Order matters: emails first (their local part can look phone-ish),
    then IPs (before phones: dotted quads contain digit runs), then
    phones over the already-redacted text."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).cast("long")
    step1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(step1, F.lit(PII_IPV4_RE), 0)).cast("long")
    step2 = F.regexp_replace(step1, PII_IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(step2, F.lit(PII_PHONE_RE), 0)).cast("long")
    clean = F.regexp_replace(step2, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


#: oracle: same regexes via DuckDB's RE2. The synthetic corpus carries no
#: PII, so the oracle query plants deterministic PII derived from doc_id
#: in BOTH engines and asserts the scrub actually fires (not just a no-op
#: pass over clean text).
PII_SCRUB_SQL = f"""
WITH seeded AS (
  SELECT doc_id,
         concat(text, ' reach user', doc_id, '@example.com or 10.0.',
                doc_id % 256, '.7 or +1 (555) 01', doc_id % 10, '-4242') AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM seeded
), s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '{PII_IPV4_RE}')) AS BIGINT) AS n_ips,
         regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
       regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       n_emails, n_ips,
       CAST(len(regexp_extract_all(t2, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones
FROM s2
"""


# ---------------------------------------------------------------------------
# document chunking
# ---------------------------------------------------------------------------

CHUNK_CHARS = 500
CHUNK_OVERLAP = 100


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = CHUNK_CHARS,
    overlap: int = CHUNK_OVERLAP,
    text_col: str = "text",
) -> DataFrame:
    """Split each doc into overlapping fixed-width character windows
    (stride = chunk - overlap) — the context-window packing step of a
    training pipeline. posexplode over an integer sequence: linear work,
    integer-exact chunk count in any engine."""
    if chunk_chars <= 0 or overlap < 0 or overlap >= chunk_chars:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < chunk_chars "
            f"(got chunk_chars={chunk_chars}, overlap={overlap})"
        )
    stride = chunk_chars - overlap
    n_extra = F.floor(
        (F.greatest(F.length(text_col) - chunk_chars, F.lit(0)) + (stride - 1))
        / stride
    ).cast("long")
    idx = F.explode(F.sequence(F.lit(0), n_extra)).alias("chunk_idx")
    return (
        docs.filter(F.length(text_col) > 0)
        .select("doc_id", F.col(text_col).alias("_t"), idx)
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(f"substr(_t, chunk_idx * {stride} + 1, {chunk_chars})").alias("chunk"),
        )
    )


CHUNK_SQL = f"""
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       substr(text, CAST(i AS INTEGER) * {CHUNK_CHARS - CHUNK_OVERLAP} + 1, {CHUNK_CHARS}) AS chunk
FROM documents,
     unnest(generate_series(0,
        CAST(floor((greatest(len(text) - {CHUNK_CHARS}, 0) + {CHUNK_CHARS - CHUNK_OVERLAP - 1})
                   / {CHUNK_CHARS - CHUNK_OVERLAP}) AS BIGINT))) AS u(i)
WHERE len(text) > 0
"""


# ---------------------------------------------------------------------------
# deterministic holdout split
# ---------------------------------------------------------------------------

VAL_PCT = 5
TEST_PCT = 5


def holdout_split(
    docs: DataFrame,
    val_pct: int = VAL_PCT,
    test_pct: int = TEST_PCT,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc a stable train/val/test split by hashing its id —
    membership must be a pure function of the id (never rand()/row order/
    partitioning), so re-runs, engine swaps, and corpus growth never leak
    a val doc into train. Salted md5 bucket 0-99: the same expression is
    ANSI-SQL-replicable (see SPLIT_SQL), which is the whole point."""
    from cds_spark.functions import stable_long_hash

    bucket = F.pmod(
        stable_long_hash(F.concat(F.lit("split:"), F.col(id_col).cast("string"))),
        F.lit(100),
    ).cast("long")
    return docs.select(
        id_col,
        bucket.alias("split_bucket"),
        F.when(bucket < val_pct, "val")
        .when(bucket < val_pct + test_pct, "test")
        .otherwise("train")
        .alias("split"),
    )


SPLIT_SQL = f"""
WITH b AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 15)) AS BIGINT)
           % 100 AS split_bucket
  FROM documents
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < {VAL_PCT} THEN 'val'
            WHEN split_bucket < {VAL_PCT + TEST_PCT} THEN 'test'
            ELSE 'train' END AS split
FROM b
"""


# ---------------------------------------------------------------------------
# per-source weighted sampling (corpus mixing)
# ---------------------------------------------------------------------------


def weighted_sample(
    docs: DataFrame,
    rates,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source downsampling — the corpus-mixing step
    (e.g. keep 100% of books, 20% of common-crawl). ``rates`` is either a
    {source: keep_pct} dict (missing sources keep 100) or a Column giving
    the pct. Membership hashes the doc id (never rand()): re-runs and
    engine swaps keep the identical sample, and growth in one source
    never reshuffles another's."""
    from cds_spark.functions import stable_long_hash

    if isinstance(rates, dict):
        m = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
        rate = F.coalesce(m[F.col(source_col)], F.lit(100)).cast("long")
    else:
        rate = rates.cast("long")
    bucket = F.pmod(
        stable_long_hash(F.concat(F.lit("samp:"), F.col(id_col).cast("string"))),
        F.lit(100),
    ).cast("long")
    return (
        docs.select(
            id_col,
            source_col,
            bucket.alias("sample_bucket"),
            rate.alias("rate_pct"),
        )
        .where(F.col("sample_bucket") < F.col("rate_pct"))
    )


#: oracle rates: derived from the source NAME by the same stable hash
#: (10-99%), so both engines compute the mixing table instead of sharing
#: a literal list
def weighted_sample_rate_expr(source_col: str = "source"):
    from cds_spark.functions import stable_long_hash

    return 10 + F.pmod(
        stable_long_hash(F.concat(F.lit("rate:"), F.col(source_col))), F.lit(90)
    )


WEIGHTED_SAMPLE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(concat('samp:', doc_id)), 1, 15)) AS BIGINT)
           % 100 AS sample_bucket,
         10 + CAST(concat('0x', substr(md5(concat('rate:', source)), 1, 15)) AS BIGINT)
           % 90 AS rate_pct
  FROM documents
)
SELECT * FROM r WHERE sample_bucket < rate_pct
"""
