"""Round-16 rotation stock (authored in round 11's second session):
one fresh shape for each family that empties once the r12 panel
consumes the pre-validated shortlist — F1-F6 (the sanctioned Python
boundary, one more flavor each), A3 (approx aggregates) and P3 (JSON
parse).  Same program as plans/round10-14.py: every query is a
different SHAPE from its checked siblings (noted per docstring), all
integer-exact or convention-pinned so the DuckDB twin hashes equal.

The F-family queries live here rather than udf_queries.py only to
keep that module at its current size; tests/test_lint.py sanctions
row-UDFs per MODULE, so this module is registered alongside
udf_queries.py in its allowlist.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# F1 — row UDF #4: str-in/str-OUT transform (the checked siblings all
# return numbers; this one produces a derived string column)
# ---------------------------------------------------------------------------


@register(
    "q_udf_altcaps",
    tags=("F1", "FN-string"),
    oracle="""
SELECT doc_id,
       array_to_string(list_transform(
         range(1, len(substr(text, 1, 20)) + 1),
         i -> CASE WHEN (i - 1) % 2 = 0
                   THEN upper(substr(text, CAST(i AS INT), 1))
                   ELSE lower(substr(text, CAST(i AS INT), 1)) END), '')
         AS alt_head
FROM documents WHERE doc_id < 300
""",
)
def q_udf_altcaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF #4: alternating-case transform of the
    document head — str→str (every checked F1 sibling returns a
    number), covering the string-PRODUCING UDF signature.  Built-in
    twin: a per-character list_transform with positional case (the
    oracle)."""

    @F.udf("string")
    def altcaps(s: str) -> str:
        return "".join(
            c.upper() if i % 2 == 0 else c.lower() for i, c in enumerate(s)
        )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id", altcaps(F.substring("text", 1, 20)).alias("alt_head")
    )


# ---------------------------------------------------------------------------
# F2 — pandas UDF #4: branchy numeric → categorical (np.select), where
# the checked siblings are single-expression arithmetic
# ---------------------------------------------------------------------------


@register(
    "q_pandas_udf_grade",
    tags=("F2", "P5"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS price_grade
FROM orders WHERE o_orderkey < 400
""",
)
def q_pandas_udf_grade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series→series pandas UDF #4: vectorized BRANCHING (np.select
    over thresholds → string label) — the conditional shape, where the
    checked F2 siblings are branch-free arithmetic.  Threshold
    comparisons on the raw double are identical in both engines (no
    arithmetic before the compare, so no rounding divergence)."""

    @pandas_udf("string")
    def grade(price: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            np.select(
                [price < 50000, price < 150000], ["low", "mid"], "high"
            ),
            index=price.index,
        )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select("o_orderkey", grade("o_totalprice").alias("price_grade"))


# ---------------------------------------------------------------------------
# F3 — grouped-agg UDAF #5: bit-domain reduction (bitwise OR), where
# the checked siblings are order-statistics / sums / centroids
# ---------------------------------------------------------------------------


@register(
    "q_grouped_agg_bitmask",
    tags=("F3", "FN-math"),
    oracle="""
SELECT l_orderkey,
       CAST(bit_or(CAST(1 AS BIGINT) << l_linenumber) AS BIGINT)
         AS line_mask,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem WHERE l_orderkey < 600
GROUP BY l_orderkey
""",
)
def q_grouped_agg_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF #5: per-order line-number BITMASK
    (bitwise-OR reduction over 1 << l_linenumber) — a bit-domain,
    order-independent reduction no checked F3 sibling covers; exact by
    construction (integers only), and associative, so any partitioning
    agrees."""
    import numpy as np

    @pandas_udf("long")
    def line_mask(ln: pd.Series) -> int:
        return int(
            np.bitwise_or.reduce(
                np.left_shift(np.int64(1), ln.to_numpy(dtype=np.int64))
            )
        )

    @pandas_udf("long")
    def n_lines(ln: pd.Series) -> int:
        return int(len(ln))

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 600)
    return li.groupBy("l_orderkey").agg(
        line_mask("l_linenumber").alias("line_mask"),
        n_lines("l_linenumber").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# F4 — applyInPandas #4: run-length encoding per group (sort +
# consecutive-equal grouping), vs head-k / diff / normalize siblings
# ---------------------------------------------------------------------------


@register(
    "q_apply_in_pandas_runs",
    tags=("F4", "W2"),
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rk
  FROM events
), runs AS (
  SELECT user_id, event_type, rn - rk AS grp, COUNT(*) AS run_len
  FROM o GROUP BY user_id, event_type, rn - rk
)
SELECT user_id,
       CAST(MAX(run_len) AS BIGINT) AS longest_run,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM runs GROUP BY user_id
""",
)
def q_apply_in_pandas_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas #4: run-length profile per user —
    sort the group by (ts, event_id) (a UNIQUE key, so the order and
    therefore the runs are deterministic), collapse consecutive equal
    event_types, report the longest run and the run count.  The
    oracle derives identical runs with the classic rn − rk
    gaps-and-islands identity."""

    def runs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        et = pdf["event_type"]
        run_id = (et != et.shift()).cumsum()
        lens = run_id.value_counts()
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "longest_run": [int(lens.max())],
                "n_runs": [int(len(lens))],
            }
        )

    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return e.groupBy("user_id").applyInPandas(
        runs, "user_id long, longest_run long, n_runs long"
    )


# ---------------------------------------------------------------------------
# F5 — mapInPandas #4: vectorized string PARSE (ELT shape), where the
# checked siblings are arithmetic / filter / expand bodies
# ---------------------------------------------------------------------------


@register(
    "q_map_in_pandas_parse",
    tags=("F5", "P3"),
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CAST(json_extract_string(props, '$.k') AS INT) % 2 = 1 AS k_odd
FROM events WHERE event_id < 3000
""",
)
def q_map_in_pandas_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas #4: vectorized string parse inside the Arrow batch
    (pandas .str.extract of the JSON payload's k field) — the ELT
    shape: the batch body does the schema-on-read work a JVM
    from_json would, proving strings survive the Arrow crossing."""

    def parse(batches):
        for pdf in batches:
            k = (
                pdf["props"]
                .str.extract(r'"k":\s*(\d+)', expand=False)
                .astype("int64")
            )
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "k": k.astype("int32"),
                    "k_odd": (k % 2 == 1),
                }
            )

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 3000).select(
        "event_id", "props"
    )
    return e.mapInPandas(parse, "event_id long, k int, k_odd boolean")


# ---------------------------------------------------------------------------
# F6 — UDTF #4: strided multi-column emission (start position + the
# window), vs the tokens/bigrams/chargrams single-column explodes
# ---------------------------------------------------------------------------


@register(
    "q_udtf_windows",
    tags=("F6", "X5"),
    oracle="""
SELECT doc_id, CAST(i AS BIGINT) AS start_pos,
       array_to_string(t[i:i+2], ' ') AS win
FROM (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE doc_id < 120
), UNNEST(range(1, len(t) - 1, 2)) AS r(i)
""",
)
def q_udtf_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF #4: STRIDED 3-word windows with their 1-based start
    position — two output columns per yield and a stride-2 walk (the
    checked F6 siblings emit one column at stride 1); the fixed-stride
    window walk is the context-window chunking primitive."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start_pos bigint, win string")
    class WindowUDTF:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks) - 2, 2):
                yield (i + 1, " ".join(toks[i : i + 3]))

    spark.udtf.register("window_udtf", WindowUDTF)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    d.createOrReplaceTempView("__udtf_docs_windows")
    return spark.sql(
        "SELECT doc_id, t.start_pos, t.win "
        "FROM __udtf_docs_windows, LATERAL window_udtf(text) t"
    )


# ---------------------------------------------------------------------------
# A3 — approx aggregate with an EXACT twin: percentile_approx on an
# integer column at high accuracy degenerates to the exact discrete
# quantile, so DuckDB's quantile_disc checks it value-for-value
# ---------------------------------------------------------------------------


@register(
    "q_approx_quartiles",
    tags=("A3", "A1"),
    oracle="""
SELECT l_returnflag,
       CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS q25,
       CAST(quantile_disc(l_quantity, 0.50) AS DOUBLE) AS q50,
       CAST(quantile_disc(l_quantity, 0.75) AS DOUBLE) AS q75,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def q_approx_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-percentile quartiles of an INTEGER-valued column at
    accuracy 10000: with ~50 distinct quantities, the Greenwald-Khanna
    sketch is exact (ε·n < 1 inter-value gap), and Spark's returned
    order statistic matches DuckDB's quantile_disc at every quartile —
    verified at all three fixture scales.  The A3 shape no checked
    sibling covers: the approx aggregate used AS an exact one inside
    its accuracy envelope (the checked approx_top_k twins pin the
    bounded-domain analogue for heavy hitters).

    PRECONDITION (r12 advisor fix — checked, not assumed): exact
    agreement is an empirical guarantee that holds only while every
    quartile rank sits ≥ ε·n ranks away from its value-run boundary
    (GK may legally return any order statistic within ε·n ranks; if
    that window crosses into the adjacent value, the hash gate turns
    flaky).  tests/test_batch_queries.py::
    test_approx_quartiles_exactness_precondition recomputes the
    run-margin at every fixture tier and fails WITH A DIAGNOSIS if a
    future fixture change (or a larger SF) erodes the margin — so the
    gate breaks loudly there, not as a mystery hash mismatch in the
    driver.

    At 100 TB the same call is genuinely approximate (ε = 1/accuracy
    of the rank) but the sketch stays ~KB per group and merges
    associatively — that is why the pipeline uses percentile_approx,
    never a per-group sort."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.25, 10000).alias("q25"),
        F.percentile_approx("l_quantity", 0.50, 10000).alias("q50"),
        F.percentile_approx("l_quantity", 0.75, 10000).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# P3 — malformed-JSON tolerance: parse a payload column where some
# rows are corrupt, extract what parses, flag what does not
# ---------------------------------------------------------------------------


@register(
    "q_json_malformed",
    tags=("P3", "P5"),
    oracle="""
SELECT event_id,
       CASE WHEN json_valid(p)
            THEN CAST(json_extract_string(p, '$.k') AS INT) END AS k,
       NOT json_valid(p) AS corrupt
FROM (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN replace(props, '{', '<')
              ELSE props END AS p
  FROM events WHERE event_id < 3000
)
""",
)
def q_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read under CORRUPTION: every 7th payload is mangled
    (brace swapped out), and the parse must extract k where the JSON
    is valid and flag — not fail on — the rest.  get_json_object
    returns NULL on malformed input (Spark's permissive contract);
    the corrupt flag itself comes from try_parse_json IS NULL, the
    engine's actual validity judgment, mirrored by DuckDB's
    json_valid.  The P3 shape no checked sibling covers: every other
    JSON query parses clean payloads."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    p = F.when(
        F.col("event_id") % 7 == 0,
        F.regexp_replace("props", "\\{", "<"),
    ).otherwise(F.col("props"))
    withp = e.select("event_id", p.alias("p"))
    return withp.select(
        "event_id",
        F.get_json_object("p", "$.k").cast("int").alias("k"),
        F.try_parse_json("p").isNull().alias("corrupt"),
    )


# ---------------------------------------------------------------------------
# Fifth flavor per F family (r14-ahead stock): each covers an API
# surface none of the four prior flavors touches.
# ---------------------------------------------------------------------------


@register(
    "q_udf_checkdigit",
    tags=("F1", "FN-math"),
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST((o_orderkey * 7 + o_custkey * 3) % 10 AS INT) AS check_digit
FROM orders WHERE o_orderkey < 400
""",
)
def q_udf_checkdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row UDF #5: TWO-argument signature — every prior F1 flavor is
    unary; this one combines two key columns into a mod-10 check
    digit (int, int) → int."""

    @F.udf("int")
    def check_digit(ok: int, ck: int) -> int:
        return (ok * 7 + ck * 3) % 10

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        "o_custkey",
        check_digit("o_orderkey", "o_custkey").alias("check_digit"),
    )


@register(
    "q_pandas_udf_iter",
    tags=("F2",),
    oracle="""
SELECT o_orderkey,
       o_totalprice - 100.0 AS adj_price
FROM orders WHERE o_orderkey < 300
""",
)
def q_pandas_udf_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series UDF #5: the ITERATOR variant
    (Iterator[pd.Series] → Iterator[pd.Series]) — the API flavor for
    amortizing expensive per-worker init (model load, dictionary
    build) across Arrow batches; the 'model' here is a constant
    offset loaded once before the loop, and the arithmetic is a
    single subtraction so the IEEE result is identical in both
    engines."""

    @pandas_udf("double")
    def adj_price(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        offset = 100.0  # the amortized one-time "load"
        for s in batches:
            yield s - offset

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select("o_orderkey", adj_price("o_totalprice").alias("adj_price"))


@register(
    "q_grouped_agg_wavg",
    tags=("F3", "A1"),
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / (100.0 * SUM(CAST(l_quantity AS BIGINT))) AS wavg_price
FROM lineitem GROUP BY l_returnflag
""",
)
def q_grouped_agg_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg UDAF #6: TWO-COLUMN signature (quantity-weighted
    mean price) — every prior F3 flavor reduces one series.  The body
    sums integer cents × integer quantity and divides ONCE, so the
    result is bit-identical at any row order / partitioning (the
    functions/numeric.py discipline applied inside a pandas UDAF)."""
    import numpy as np

    @pandas_udf("double")
    def wavg_price(price: pd.Series, qty: pd.Series) -> float:
        cents = np.round(price.to_numpy() * 100).astype(np.int64)
        q = qty.to_numpy().astype(np.int64)
        return float((cents * q).sum()) / (100.0 * float(q.sum()))

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg_price("l_extendedprice", "l_quantity").alias("wavg_price")
    )


@register(
    "q_cogroup_stats",
    tags=("F4", "J1", "A1"),
    oracle="""
SELECT c.c_custkey AS user_id,
       CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
       CASE WHEN c.c_acctbal < 0 THEN 'debt'
            WHEN c.c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS tier
FROM customer c JOIN events e ON e.user_id = c.c_custkey
WHERE c.c_custkey < 120
GROUP BY c.c_custkey, c.c_acctbal
""",
)
def q_cogroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas #5: the COGROUP variant — two keyed relations
    (events, customer) meet inside one pandas callback per key, the
    join happening IN PYTHON (the flavor for per-key logic that needs
    both sides materialized: custom matching, reconciliation,
    asymmetric aggregation).  Keys present on only one side emit
    nothing, mirroring the oracle's inner join; the threshold
    comparisons are on the raw double."""

    def stats(key, events_pdf: pd.DataFrame, cust_pdf: pd.DataFrame):
        if len(events_pdf) == 0 or len(cust_pdf) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "tier": pd.Series([], dtype="object"),
                }
            )
        bal = float(cust_pdf["c_acctbal"].iloc[0])
        tier = "debt" if bal < 0 else ("mid" if bal < 5000 else "rich")
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [len(events_pdf)],
                "tier": [tier],
            }
        )

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 120).select(
        "user_id", "event_id"
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 120).select(
        F.col("c_custkey").alias("user_id"), "c_acctbal"
    )
    return (
        e.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(stats, "user_id long, n_events long, tier string")
    )


@register(
    "q_map_in_pandas_chunks",
    tags=("F5", "X5"),
    oracle="""
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       substr(text, CAST(i AS INT) * 16 + 1, 16) AS chunk
FROM documents, UNNEST(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT)))
     AS r(i)
WHERE doc_id < 80
""",
)
def q_map_in_pandas_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas #5: 1→N EXPANSION with a derived position column
    (fixed 16-char chunking, the context-window slicing shape) — the
    prior F5 flavors are 1:1, filtering, or duplication; this one
    fans each row out to ceil(len/16) DISTINCT rows built in numpy.
    Documents are non-empty in this fixture, so every row emits ≥ 1
    chunk (the empty-payload guard of q_payload_chunks applies where
    lengths are data-dependent)."""

    def chunks(batches):
        for pdf in batches:
            rows_id, rows_idx, rows_chunk = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                n = (len(text) + 15) // 16
                for i in range(n):
                    rows_id.append(did)
                    rows_idx.append(i)
                    rows_chunk.append(text[i * 16 : (i + 1) * 16])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows_id, dtype="int64"),
                    "chunk_idx": pd.Series(rows_idx, dtype="int32"),
                    "chunk": rows_chunk,
                }
            )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 80).select(
        "doc_id", "text"
    )
    return d.mapInPandas(chunks, "doc_id long, chunk_idx int, chunk string")


@register(
    "q_udtf_ngrams_n",
    tags=("F6", "X5"),
    oracle="""
SELECT doc_id,
       array_to_string(t[i:i + CAST(2 + doc_id % 2 AS INT) - 1], ' ')
         AS gram
FROM (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE doc_id < 100
), UNNEST(range(1, len(t) - CAST(2 + doc_id % 2 AS INT) + 2)) AS r(i)
""",
)
def q_udtf_ngrams_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF #5: PARAMETERIZED yield — the n-gram width comes in
    as a second LATERAL argument that varies PER ROW (bigrams for even
    doc_ids, trigrams for odd), the flavor none of the fixed-width F6
    siblings covers.  The oracle reproduces the row-dependent width
    arithmetic inline."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram string")
    class NgramUDTF:
        def eval(self, text: str, n: int):
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield (" ".join(toks[i : i + n]),)

    spark.udtf.register("ngram_n_udtf", NgramUDTF)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("__udtf_docs_ngrams_n")
    return spark.sql(
        "SELECT doc_id, t.gram FROM __udtf_docs_ngrams_n, "
        "LATERAL ngram_n_udtf(text, CAST(2 + doc_id % 2 AS INT)) t"
    )
