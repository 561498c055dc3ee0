"""Text-analysis operators (SURVEY.md §2.11 X5): tokenization, quality
scoring, language-ID, document fingerprinting.

All JVM-side expressions (split/regexp/aggregate) — text analysis at
100 TB lives or dies on staying out of Python; nothing here crosses
the Arrow boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

FP_MOD = 1_000_000_007
FP_BASE = 31

#: tiny marker-word lexicon for the language-ID heuristic. The fixture
#: corpus is synthetic (shared vocabulary), so markers double as a
#: determinism test: predictions are whatever the argmax says, on both
#: engines.
LANG_MARKERS: list[tuple[str, str]] = [
    ("the", "en"), ("and", "en"), ("query", "en"),
    ("le", "fr"), ("et", "fr"), ("données", "fr"),
    ("el", "es"), ("y", "es"), ("datos", "es"),
    ("der", "de"), ("und", "de"), ("daten", "de"),
    ("的", "zh"), ("数据", "zh"), ("查询", "zh"),
]


def tokenize(text: Column | str, sep: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def regex_tokens(text: Column | str, pattern: str = "[a-z0-9]+") -> Column:
    """BPE-ish regex token extraction (letters/digit runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over characters, mod 1e9+7.

    h = fold(chars, 0, (acc, ch) -> (acc*31 + codepoint(ch)) mod M).
    Exact integer arithmetic → identical in any engine/partitioning.
    """
    c = F.col(text) if isinstance(text, str) else text
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )


def lexicon_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LANG_MARKERS, ["marker", "marker_lang"])


def predict_language(
    docs: DataFrame, spark: SparkSession, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Marker-word argmax language ID.

    Explode tokens, join the (broadcast) lexicon, count matches per
    (doc, lang), keep the argmax (ties → lexicographically first lang;
    no matches → 'und').  Deterministic by construction.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    hits = toks.join(
        F.broadcast(lexicon_df(spark)), toks.tok == F.col("marker")
    ).groupBy(id_col, "marker_lang").agg(F.count(F.lit(1)).alias("n_hits"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("n_hits").desc(), F.col("marker_lang")
    )
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("marker_lang").alias("pred_lang"))
    )
    return docs.select(id_col).join(best, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
    )
