#!/usr/bin/env python3
"""Adversarial-fixture differential: re-run convention-sensitive
queries on a DOCTORED copy of sf0.001 that actually CONTAINS the
hazard cases the shipped fixtures mask.

The r13 ADVICE and this round's proactive audits found three classes
of fixture-masked divergence: (a) rounding-convention splits that only
bite on values landing EXACTLY on n + 0.5 after fixed-point scaling
(pandas half-to-even vs DuckDB/Spark half-away); (b) ordering-key
splits that only bite when one user has two events inside the SAME
second with microsecond order OPPOSITE to event-id order (DuckDB
epoch() fractions vs Spark unix_timestamp truncation); (c) integer- vs
float-division band arithmetic that only bites at an ODD total row
count.  All three were fixed convention-side; this tool proves the
fixes by CONSTRUCTING data where the old code would diverge and
running the real differential harness over it:

  - events.parquet gains, per hazard user, two same-second events
    whose µs order is the REVERSE of their id order, plus rows whose
    `value` scales to exact halves in cents AND micros (dyadic values
    like 0.125 → 12.5 cents; micros halves found numerically);
  - orders.parquet drops one row so the total count is ODD;
  - documents.parquet gains a same-language CJK prefix pair at
    character distance 1 but byte distance 3 (the byte-vs-char
    levenshtein split the ASCII gate must neutralize), and (r15) one
    doc INSIDE q_udtf_sentences' doc_id < 150 slice gains sentence
    fragments with TABS adjacent to '.' — the Python-bare-strip() vs
    DuckDB-trim() (spaces-only) split the r14 ADVICE flagged: a
    "\\t word word" fragment word-counts 3 under the spaces-only
    convention but 2 under bare strip, and a " \\t " fragment is KEPT
    (1 word) under spaces-only but DROPPED under bare strip;
  - lineitem.parquet gets one price set to a dyadic cent-half inside
    q_pandas_udf_bucket's slice.

Run: python tools/fuzz_conventions.py            # build + verify
Exit code 0 = every convention-sensitive query still matches its
DuckDB oracle on the adversarial data.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: queries whose conventions the doctored data attacks
QUERIES = [
    "q_apply_in_pandas_cumsum",   # half-up cents on exact-half values
    "q_apply_in_pandas_scale",    # half-up micros in the scale kernel
    "q_session_bookends",         # same-second tie pack (truncated s)
    "q_priority_dedup",           # same-second tie pack
    "q_setops_first_last",        # same-second tie pack
    "q_first_event_daily",        # µs-within-day pack (control: immune)
    "q_median_band_orders",       # odd-count integer band
    "q_roundtrip_casts",          # f32 leg on the new values
    "q_prefix_edit_pairs",        # ASCII gate vs byte/char levenshtein
    "q_pandas_udf_bucket",        # half-up cents on a doctored price
    "q_udtf_sentences",           # spaces-only strip vs bare strip
]


def exact_half_values() -> list[float]:
    """Doubles whose scaled products land EXACTLY on n+0.5 — found
    numerically (the cents kernel needs v·100 on a half, the micros
    kernels need v·10⁶ on a half; dyadic v like 0.125 handles cents
    exactly, and the micros halves are searched because 10⁻⁶ is not
    dyadic).  Mixed into one list so every hazard row stresses at
    least one kernel; construction failure raises loudly."""
    cents_halves = [v for v in (0.125, 0.375, 2.625, 7.875)
                    if (v * 100.0) % 1.0 == 0.5]
    micros_halves = []
    for k in range(10, 4000):
        v = (k + 0.5) / 1_000_000.0
        if (v * 1_000_000.0) % 1.0 == 0.5:
            micros_halves.append(v)
            if len(micros_halves) >= 4:
                break
    assert len(cents_halves) >= 3, cents_halves
    assert len(micros_halves) >= 3, micros_halves
    out = []
    for a, b in zip(cents_halves, micros_halves):
        out.extend([a, b])
    return out


def doctor_events(src: str, dst: str) -> None:
    t = pq.read_table(os.path.join(src, "events.parquet"))
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    ts_type = t.schema.field("ts").type

    max_id = max(cols["event_id"])
    users = sorted(set(cols["user_id"]))[:4]
    add = {k: [] for k in cols}

    def add_row(eid, ts_us, uid, etype, value):
        add["event_id"].append(eid)
        add["ts"].append(ts_us)
        add["user_id"].append(uid)
        add["event_type"].append(etype)
        add["value"].append(value)
        add["props"].append('{"k": 1}')

    base_us = 1_704_100_000_000_000  # inside the fixture's window
    halves = exact_half_values()
    eid = max_id + 1
    for i, uid in enumerate(users):
        sec = base_us + i * 3_600_000_000  # one hour apart per user
        # SAME second, µs order REVERSED vs id order: the lower id has
        # the LATER microsecond — DuckDB epoch() fractions would rank
        # them opposite to Spark's (truncated-second, id) pack.  The
        # types differ so first/last picks are visibly order-sensitive.
        add_row(eid, sec + 900_000, uid, "purchase", halves[0])
        add_row(eid + 1, sec + 100_000, uid, "click", halves[1])
        # exact-half purchase values for the cents/micros kernels
        add_row(eid + 2, sec + 30_000_000, uid, "purchase", halves[2 % len(halves)])
        add_row(
            eid + 3,
            sec + 60_000_000,
            uid,
            "purchase",
            halves[(i + 1) % len(halves)],
        )
        eid += 4

    for k in cols:
        if k == "ts":
            # source ts came back as datetimes; convert additions from µs
            import datetime as dt

            new = [
                dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
                for us in add["ts"]
            ]
            cols["ts"] = cols["ts"] + new
        else:
            cols[k] = cols[k] + add[k]

    schema = t.schema
    out = pa.table(
        {name: pa.array(cols[name], schema.field(name).type) for name in t.column_names},
        schema=schema,
    )
    pq.write_table(out, os.path.join(dst, "events.parquet"))


def doctor_documents(src: str, dst: str) -> None:
    """Plant a same-language CJK near-pair whose 20-char prefixes are
    at CHARACTER distance 1 but BYTE distance 3 — divergent under the
    old unfiltered levenshtein predicate (Spark chars vs DuckDB
    bytes); the shipped ASCII gate must EXCLUDE both rows in both
    engines, keeping the pair census identical."""
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    max_id = max(cols["doc_id"])
    base = "中文档案开头的一段文字用来测试前缀编辑距离的行为与约定"
    twin = base[:19] + "变" + base[20:]
    for i, text in enumerate((base, twin)):
        cols["doc_id"].append(max_id + 1 + i)
        cols["text"].append(text)
        cols["lang"].append("zh")
        cols["source"].append("fuzz")
        cols["n_chars"].append(len(text))
    # r15: tab-adjacent-to-'.' sentence fragments INSIDE the
    # q_udtf_sentences slice (doc_id < 150): one fragment with a tab
    # BETWEEN the dot and its words (word-count diverges: spaces-only
    # conventions see the tab as a word, bare strip eats it) and one
    # whitespace-only "\t" fragment (kept under spaces-only trim,
    # dropped under bare strip)
    k = next(i for i, d in enumerate(cols["doc_id"]) if d < 150)
    cols["text"][k] = cols["text"][k] + ".\t alpha beta. \t . end"
    cols["n_chars"][k] = len(cols["text"][k])
    out = pa.table(
        {n: pa.array(cols[n], t.schema.field(n).type) for n in t.column_names},
        schema=t.schema,
    )
    pq.write_table(out, os.path.join(dst, "documents.parquet"))


def doctor_lineitem(src: str, dst: str) -> None:
    """Set one row's extendedprice to a dyadic cent-half (0.125 →
    12.5 cents exactly) inside q_pandas_udf_bucket's orderkey < 200
    slice — the value class where half-to-even and half-up rounding
    differ by one cent."""
    t = pq.read_table(os.path.join(src, "lineitem.parquet"))
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    idx = next(
        i for i, k in enumerate(cols["l_orderkey"]) if k < 200
    )
    cols["l_extendedprice"][idx] = 0.125
    assert (0.125 * 100.0) % 1.0 == 0.5
    out = pa.table(
        {n: pa.array(cols[n], t.schema.field(n).type) for n in t.column_names},
        schema=t.schema,
    )
    pq.write_table(out, os.path.join(dst, "lineitem.parquet"))


def doctor_orders(src: str, dst: str) -> None:
    t = pq.read_table(os.path.join(src, "orders.parquet"))
    n = t.num_rows
    if n % 2 == 0:
        t = t.slice(0, n - 1)  # make the total ODD
    assert t.num_rows % 2 == 1
    pq.write_table(t, os.path.join(dst, "orders.parquet"))


def assert_discriminates(tmp: str) -> None:
    """The doctored data must make the OLD conventions visibly diverge
    from the shipped ones — otherwise the whole harness is vacuous.
    Checked DuckDB-side (fast, no Spark session)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'"
    )
    diverging_users = con.execute(
        """
        WITH ev AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000)
                    AS ts, user_id, event_type FROM events)
        SELECT COUNT(*) FROM (
          SELECT user_id FROM ev GROUP BY user_id
          HAVING arg_min(event_type, epoch(ts) * 10000000 + event_id)
              <> arg_min(event_type,
                         (epoch_us(ts) // 1000000) * 10000000 + event_id))
        """
    ).fetchone()[0]
    assert diverging_users >= 2, (
        "same-second hazard rows do not discriminate the fractional-"
        f"epoch key ({diverging_users} diverging users)"
    )
    vals = np.array(
        [
            v
            for (v,) in con.execute(
                "SELECT value FROM events WHERE (value*100) % 1.0 = 0.5 "
                "OR (value*1000000) % 1.0 = 0.5"
            ).fetchall()
        ]
    )
    cents_even = np.round(vals * 100).astype("int64")
    cents_up = np.floor(vals * 100 + 0.5).astype("int64")
    assert (cents_even != cents_up).sum() >= 3, (
        "exact-half rows do not discriminate the rounding conventions"
    )
    # the planted CJK prefix pair must diverge under UNFILTERED
    # byte-vs-char levenshtein (char distance 1, byte distance > 2) —
    # i.e. it attacks exactly the predicate the ASCII gate protects
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM '{tmp}/documents.parquet'"
    )
    byte_d = con.execute(
        """
        SELECT levenshtein(a.pre, b.pre) FROM
          (SELECT substring(text,1,20) pre FROM docs
           WHERE source='fuzz' ORDER BY doc_id LIMIT 1) a,
          (SELECT substring(text,1,20) pre FROM docs
           WHERE source='fuzz' ORDER BY doc_id DESC LIMIT 1) b
        """
    ).fetchone()[0]
    assert byte_d > 2, (
        f"CJK pair byte distance {byte_d} would NOT diverge from the "
        "char distance (1) — hazard row construction failed"
    )
    # r15: the tab-fragment doc must make Python's BARE strip() (the
    # pre-fix q_udtf_sentences convention) diverge from the shipped
    # spaces-only strip in BOTH suppressed-fragment count and word
    # counts (pure-Python check: both conventions are Python-side)
    (hazard_text,) = [
        txt
        for (txt,) in con.execute(
            "SELECT text FROM docs WHERE doc_id < 150 AND contains(text, chr(9))"
        ).fetchall()
    ]

    def frags(strip_chars):
        return [
            f.strip(strip_chars) if strip_chars else f.strip()
            for f in hazard_text.split(".")
        ]

    old_kept = [f for f in frags(None) if f]
    new_kept = [f for f in frags(" ") if f]
    assert len(old_kept) != len(new_kept), (
        "tab fragment does not discriminate suppression conventions"
    )
    old_words = [len(f.split(" ")) for f in old_kept]
    new_words = [len(f.split(" ")) for f in new_kept]
    assert old_words != new_words[: len(old_words)] or len(old_words) != len(
        new_words
    ), "tab fragment does not discriminate word-count conventions"


def build(tmp: str) -> None:
    for name in TABLES:
        fn = f"{name}.parquet"
        if name in ("events", "orders", "documents", "lineitem"):
            continue
        shutil.copy(os.path.join(SRC, fn), os.path.join(tmp, fn))
    doctor_events(SRC, tmp)
    doctor_orders(SRC, tmp)
    doctor_documents(SRC, tmp)
    doctor_lineitem(SRC, tmp)
    assert_discriminates(tmp)


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="fuzz_sf_")
    try:
        build(tmp)
        print(f"adversarial fixture at {tmp} (discriminance asserted)", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "verify_local.py"), tmp]
            + QUERIES,
            cwd=ROOT,
        )
        return r.returncode
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
