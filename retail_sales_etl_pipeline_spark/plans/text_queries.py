"""Text-analysis queries over the `documents` table: language ID, quality
scoring, token counting, fingerprinting — the per-document featurization
pass of a training-data pipeline. All pure SQL expressions (no UDFs), all
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import LANG_STOPWORDS, char_shingle_hashes_pair, poly_hash_pair
from ..sources import load_table
from .registry import register

_LANGS = list(LANG_STOPWORDS)  # en, de, fr, es, zh


def _stoplist_sql(lang: str, dialect: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    if dialect == "spark":
        return f"array({words})"
    return f"[{words}]"


def _score_exprs(dialect: str) -> dict[str, str]:
    """Per-language stopword-hit counts over distinct lowercase tokens."""
    out = {}
    for lang in _LANGS:
        if dialect == "spark":
            out[lang] = (
                f"size(array_intersect(array_distinct(split(lower(text), ' ')), "
                f"{_stoplist_sql(lang, 'spark')}))"
            )
        else:
            out[lang] = (
                f"len(list_intersect(list_distinct(string_split(lower(text), ' ')), "
                f"{_stoplist_sql(lang, 'duck')}))"
            )
    return out


def _predict_expr(scores: dict[str, str]) -> str:
    """Argmax with deterministic precedence (list order breaks ties)."""
    # lang wins if its score >= all later langs' scores and > all earlier
    # ones is equivalent to a first-max CASE chain in list order.
    conds = []
    for i, lang in enumerate(_LANGS):
        others = [
            f"({scores[lang]}) >= ({scores[o]})" for o in _LANGS if o != lang
        ]
        conds.append(f"WHEN {' AND '.join(others)} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


_SPARK_SCORES = _score_exprs("spark")
_DUCK_SCORES = _score_exprs("duck")


@register(
    "q24_lang_id",
    oracle=f"""
    SELECT doc_id,
           {", ".join(f"CAST({_DUCK_SCORES[lang]} AS INTEGER) AS score_{lang}" for lang in _LANGS)},
           {_predict_expr(_DUCK_SCORES)} AS predicted_lang,
           lang AS labeled_lang,
           CAST(({_predict_expr(_DUCK_SCORES)}) = lang AS INTEGER) AS agree
    FROM documents
    """,
    doc="Heuristic language ID: stopword-hit counts per language over "
    "distinct tokens, argmax with deterministic tie order. One projection "
    "pass, no shuffle; the stopword arrays are constant-folded literals.",
    tags=("text",),
)
def q24_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = _predict_expr(_SPARK_SCORES)
    return docs.select(
        "doc_id",
        *[
            F.expr(_SPARK_SCORES[lang]).cast("int").alias(f"score_{lang}")
            for lang in _LANGS
        ],
        F.expr(pred).alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
        (F.expr(pred) == F.col("lang")).cast("int").alias("agree"),
    )


@register(
    "q25_text_quality",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)
               AS avg_token_span,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT)
               AS n_punct,
           CASE WHEN len(string_split(text, ' ')) < 5 THEN 'too_short'
                WHEN length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                     > len(string_split(text, ' ')) THEN 'punct_heavy'
                ELSE 'ok' END AS quality_band
    FROM documents
    """,
    doc="Quality scoring: length/token/punctuation stats + banding. "
    "Ratios are int/int double divisions — bit-deterministic per row.",
    tags=("text",),
)
def q25_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    ).cast("long")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        (F.length("text").cast("double") / n_tokens.cast("double")).alias(
            "avg_token_span"
        ),
        n_punct.alias("n_punct"),
        F.when(n_tokens < 5, "too_short")
        .when(n_punct > n_tokens, "punct_heavy")
        .otherwise("ok")
        .alias("quality_band"),
    )


@register(
    "q26_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
               AS bpe_ish_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
    doc="Token counting: whitespace tokens + a BPE-ish regex token count "
    "(letter runs / digit runs / single other-symbols). The regex is "
    "dialect-portable (no lookaround), so Java regex and RE2 agree.",
    tags=("text",),
)
def q26_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
        ).cast("long").alias("bpe_ish_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


_FP_SPARK, _FP_DUCK = poly_hash_pair("text", "text")
_SH8_SPARK, _SH8_DUCK = char_shingle_hashes_pair("text", 8)


@register(
    "q27_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CAST({_FP_DUCK} AS BIGINT) AS content_fp,
           CAST(list_min({_SH8_DUCK}) AS BIGINT) AS min_shingle_fp
    FROM documents
    """,
    doc="Document fingerprinting: full-text rolling polynomial hash (exact "
    "identity, cheaper than sha256 to recompute incrementally) + the "
    "minimum 8-char-shingle hash (a 1-permutation MinHash — winnowing-lite "
    "locality signature).",
    tags=("text",),
)
def q27_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import fingerprint_pandas

    docs = load_table(spark, sf_dir, "documents")
    # Arrow/numpy path — identical integers to the SQL form in the oracle
    # (interpreted lambda chains make the expression form ~30x slower).
    return fingerprint_pandas(docs)
