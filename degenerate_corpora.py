#!/usr/bin/env python
"""Degenerate-shape corpus synthesizer (VERDICT r11 next-round #1).

The round-11 sf0.1 sweep proved that "correct at the graded SF" can
still hide a statistic that is mathematically undefined on a corpus
with a different SHAPE (zero-variance degree graph → DIVIDE_BY_ZERO in
`graph_degree_assortativity`).  This script generalizes the discovery
method: it synthesizes four tiny adversarial corpora with the EXACT
arrow schemas of the shipped sf tables, so the full 474-key parity
matrix (`selfcheck.py --sf <dir>`) can be run over each.  The gate per
key is the usual one — agree with DuckDB or return a defined NULL —
plus the stricter "never throw" rule: a SPARK-ERROR/ORACLE-ERROR on
any of these shapes is a latent wrong-at-scale bug.

The four shapes, chosen for the failure classes they provoke:

* ``empty``     — zero rows everywhere: empty aggregates, empty joins,
                  percentiles/medians of nothing, min/max of nothing.
* ``single``    — exactly one row per table: window frames of width 1,
                  lag/lead all-NULL, variance of a singleton (NULL vs
                  0 disagreements), degenerate graphs.
* ``allequal``  — the first row replicated 40× VERBATIM, duplicate
                  primary keys included: total ties in every ranking,
                  100%-duplicate dedup corpora, join fan-out on
                  repeated keys, zero variance AND zero key diversity.
* ``onegroup``  — 40 rows with UNIQUE sequential primary keys but every
                  other column frozen to row 0's value: one group, one
                  user, one language, one label; zero variance with
                  distinct keys (the exact assortativity-bug shape).
* ``nullmeasures`` — the first 40 real rows with every NUMERIC MEASURE
                  column (prices, balances, quantities, discounts,
                  values, n_chars) NULLed on odd rows: SUM/AVG/COUNT
                  null-skipping, NULL propagation through money
                  expressions, and COUNT(col) vs COUNT(*) divergences.
                  Keys, timestamps, categoricals and text stay non-null
                  — the shape isolates NULL-AGGREGATE semantics rather
                  than opening the ill-defined NULL-group/NULL-time
                  question.
* ``extremetext`` — the first 40 real rows with every TEXT PAYLOAD
                  column (documents.text, events.props, c_name,
                  s_name, p_name) cycled through a pool of adversarial
                  strings: empty / whitespace-only / exotic whitespace
                  (NBSP, zero-width), combining accents (NFD vs NFC),
                  CJK + emoji (4-byte UTF-8) + RTL scripts, embedded
                  newlines/tabs/quotes (serialization seams), regex
                  metacharacters (LIKE/regexp dialect seams), case-
                  mapping traps (ß, Turkish dotless ı), literal
                  "null"/"NaN" strings, a 600-char single token, an
                  extreme-repetition document, and malformed JSON in
                  ``props``.  Keys, numerics, timestamps and grouping
                  categoricals stay real — the shape isolates STRING-
                  FUNCTION semantics (tokenization, length, casing,
                  regex, JSON parsing, CSV/JSON round-trips) from the
                  group-key question.  documents.n_chars is recomputed
                  as the codepoint length of the new text so the
                  corpus keeps its own invariant.
* ``nanmeasures`` — the first 40 real rows with IEEE NaN (not NULL) in
                  every DOUBLE measure on odd rows: NaN-skipping vs
                  NaN-poisoning aggregates, NaN ordering in order
                  statistics, NaN comparison semantics, and the
                  NaN→DECIMAL cast boundary (errors on BOTH engines —
                  the round-13 mechanical-sweep class; see
                  NOTES_r12.md).  Integer measures stay intact: NaN
                  has no integer representation.
* ``skewed``    — (round 13) heavy KEY skew, the one failure mode the
                  seven value-shapes don't cover: one order owns 90%
                  of line items, one customer 90% of orders, one user
                  99% of events, one nation ~99% of customers, one
                  part+supplier half the lineitem FKs, one lang/source
                  95% of documents.  Deterministic zipf-like remap of
                  FK columns only (values stay real, key uniqueness
                  and FK validity preserved); a few thousand rows per
                  fact table so a hot key is a real single-partition
                  hazard.  See :func:`_skewed_tables`.

Schema fidelity: tables are rebuilt column-by-column from the source
parquet's own arrays (slice/concat/sequential-cast), then written with
the ORIGINAL arrow schema, so Spark and DuckDB read identical physical
types to the shipped corpora (timestamp[us], list<float>, int32 keys).

100 TB posture: test-fixture synthesis only — nothing here is on any
scaled data path; corpora are ≤40 rows by construction.

Usage:
    python degenerate_corpora.py [--out /tmp/degenerate_corpora] [--src /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: primary-key columns kept unique in the ``onegroup`` shape
KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    # one order with N lines IS the one-group shape for lineitem
    "lineitem": ["l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

N_ROWS = 40


#: numeric measure columns NULLed (odd rows) in the ``nullmeasures`` shape
MEASURE_COLS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice", "p_size"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "events": ["value"],
    "documents": ["n_chars"],
    "region": [],
    "nation": [],
    "embeddings": [],
}


#: adversarial string pool for the ``extremetext`` shape — each entry
#: targets a specific seam class (see module docstring); row i gets
#: pool[i % len(pool)] so all classes land in every 40-row table
EXTREME_STRINGS = [
    "",                                         # empty
    "   ",                                      # ASCII whitespace only
    "\t \t ",                                   # tabs
    "\u00a0\u200b zero\u00a0width\u200band nbsp",  # NBSP + zero-width
    "héllo wörld café naïve",  # NFC diacritics
    "cafe\u0301 combining re\u0301sume\u0301",  # NFD combining marks
    "日本語のテキスト 形態素 解析",  # CJK
    "\U0001f680 emoji \U0001f389 test \U0001f600\U0001f600",  # 4-byte UTF-8
    "العربية עברית ελληνικά",  # RTL + Greek
    "line1\nline2\r\nline3",                    # embedded newlines
    'comma, "quoted" and \'single\'',           # CSV quoting seam
    "tab\tseparated\tfields",
    "regex .* [a-z]+ (meta) {chars} \\ $^|?",   # regex metachars
    "ß STRASSE straße İstanbul ıi MiXeD CaSe",  # case traps
    "null NaN Infinity None nan",               # literal-string confusion
    "x" * 600,                                  # one 600-char token
    ("word " * 120).strip(),                    # extreme repetition
    "<html><b>tags</b> &amp; entities &lt;x&gt;</html>",  # markup
    "percent % underscore _ like-wildcards %_%",  # LIKE wildcards
    "ALL CAPS SHOUTING WITH 12345 DIGITS 67890",
]

#: ``props`` carries JSON payloads, so its pool stresses JSON parsing
EXTREME_JSON = [
    "",                                         # empty string, not JSON
    "{not json",                                # malformed
    "null",                                     # JSON null literal
    "[]",                                       # non-object JSON
    '{"k": "v with } brace and \\" quote"}',
    '{"日本語": "\U0001f680", "nested": {"a": [1, 2, {"b": null}]}}',
    '{"num": 1e308, "neg": -0.0, "big": 99999999999999999999}',
    '{"s": "line1\\nline2\\ttab"}',
    '{"dup": 1, "dup": 2}',                     # duplicate keys
    '  {"padded": true}  ',                     # surrounding whitespace
]

#: temporal columns remapped in the ``extremedates`` shape (round 14,
#: VERDICT r13 item 5 — the tenth shape, stressing the one axis the
#: other nine never touch: the calendar)
TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
    "region": [],
    "nation": [],
    "customer": [],
    "supplier": [],
    "part": [],
    "documents": [],
    "embeddings": [],
}

from datetime import datetime as _dt  # noqa: E402

#: century-scale pool for ORDER/SHIP dates (midnight timestamps, like
#: the shipped corpus).  Floor is 1900 — NOT 0001 — deliberately:
#: pre-1582-10-15 parquet timestamps hit Spark's Julian/Gregorian
#: rebase-mode machinery, which the driver's vanilla session does not
#: configure (and pre-1677 overflows datetime64[ns], below); 1900 on is
#: calendar-unambiguous on both engines.  Ceiling is 2260 — NOT 9999 —
#: because the comparison HARNESS (the driver's pandas canonicalization,
#: replicated by selfcheck parity mode) materializes timestamps as
#: Arrow→pandas datetime64[ns], whose horizon is 2262-04-11: the first
#: census run proved year-9999 values crash canonicalization on 8 keys
#: before any engine semantics are compared.  2260 keeps ~2 years of
#: headroom for operators that shift data timestamps forward (+1 year
#: YoY frames, +interval month-ends) while still being a far-future
#: 4-digit-year century.  Axes covered: pre-1970 negative epochs,
#: pre-1990 negative datediffs (the business-day ``//``-vs-floor seam),
#: the 1900/2000/2260 century-vs-400 leap rules, month-end arithmetic
#: targets (Jan 31 / Feb 29 / Mar 31), and the far future.
EXTREME_DATES = [
    _dt(1900, 1, 1),
    _dt(1900, 2, 28),    # 1900 is NOT a leap year (century rule)
    _dt(1969, 12, 31),
    _dt(1970, 1, 1),     # epoch 0
    _dt(2000, 2, 29),    # 2000 IS a leap year (400 rule)
    _dt(2024, 1, 31),    # month-end: add_months/last_day seam
    _dt(2024, 2, 29),
    _dt(2024, 3, 31),
    _dt(2260, 2, 29),    # far-future leap day (2260 % 4 == 0, not a century)
    _dt(2260, 12, 31),   # far-future year-end, ~2y under the ns horizon
]

#: BOUNDED pool for events.ts, straddling epoch 0 within ±31 days:
#: several operators build hourly/daily spines over the OBSERVED ts
#: range (ts_hourly_gapfill, ts_calendar_dim, the xcorr family), so a
#: century-scale events range would explode the spine to millions of
#: rows on both engines; 61 days keeps every spine ≤ ~1.5k rows while
#: still forcing negative epoch-microseconds through every window
#: bucketing, session gap, and as-of comparison (floor-vs-truncate
#: integer division diverges EXACTLY and ONLY below zero).  Sub-second
#: values sit 1 µs either side of hour boundaries so window assignment
#: at the boundary is exercised, not just near it.
EXTREME_EVENT_TS = [
    _dt(1969, 12, 31, 23, 59, 59, 999999),   # epoch −1 µs
    _dt(1970, 1, 1, 0, 0, 0),                # epoch 0
    _dt(1970, 1, 1, 0, 0, 0, 1),             # epoch +1 µs
    _dt(1969, 12, 28, 1, 0, 0),              # exact negative hour edge
    _dt(1969, 12, 28, 0, 59, 59, 999999),    # 1 µs before that edge
    _dt(1969, 12, 15, 12, 30, 0, 500000),    # negative half-second
    _dt(1969, 12, 1, 0, 0, 0),               # range lo anchor
    _dt(1970, 1, 15, 1, 0, 0),               # exact positive hour edge
    _dt(1970, 1, 15, 0, 59, 59, 999999),     # 1 µs before that edge
    _dt(1970, 1, 31, 23, 59, 59, 999999),    # range hi anchor
]


def _extreme_dates(t: pa.Table, cols: list[str], n: int) -> pa.Table:
    """Tenth shape: remap every temporal column to its adversarial pool
    (row i gets pool[i % len(pool)], so all axes land in every table).
    Everything else — keys, measures, categoricals, text — stays real:
    the shape isolates CALENDAR semantics (window bucketing at negative
    epochs, month-end arithmetic, ISO week/era boundaries, epoch
    extraction signs) from the value and key questions the other nine
    shapes own."""
    head = t.slice(0, n).combine_chunks()
    m = len(head)
    out = []
    for field in head.schema:
        col = head[field.name].combine_chunks()
        if field.name in cols:
            pool = EXTREME_EVENT_TS if field.name == "ts" else EXTREME_DATES
            col = pa.array([pool[i % len(pool)] for i in range(m)], type=field.type)
        out.append(col)
    return pa.table(out, schema=head.schema)


#: text payload columns mutated in the ``extremetext`` shape — group
#: keys, categoricals (lang, source, event_type, brands, statuses) and
#: TPC-H filter targets (r_name, n_name, p_type) stay real
TEXT_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_name"],
    "supplier": ["s_name"],
    "part": ["p_name"],
    "orders": [],
    "lineitem": [],
    "events": ["props"],
    "documents": ["text"],
    "embeddings": [],
}


def _extreme_text(t: pa.Table, cols: list[str], n: int) -> pa.Table:
    head = t.slice(0, n).combine_chunks()
    m = len(head)
    out = []
    for field in head.schema:
        col = head[field.name].combine_chunks()
        if field.name in cols:
            pool = EXTREME_JSON if field.name == "props" else EXTREME_STRINGS
            col = pa.array(
                [pool[i % len(pool)] for i in range(m)], type=field.type
            )
        elif field.name == "n_chars" and "text" in cols:
            # keep the corpus invariant n_chars == codepoint length
            txt = [EXTREME_STRINGS[i % len(EXTREME_STRINGS)] for i in range(m)]
            col = pa.array([len(s) for s in txt], type=field.type)
        out.append(col)
    return pa.table(out, schema=head.schema)


def _nan_measures(t: pa.Table, cols: list[str], n: int) -> pa.Table:
    """NaN (not NULL) in every DOUBLE measure on odd rows — the float
    column a real telemetry feed delivers.  Integer measures (p_size)
    stay intact: NaN has no integer representation, and the shape
    isolates IEEE-NaN semantics (NaN-skipping vs NaN-poisoning
    aggregates, NaN ordering, NaN grouping) from the NULL question
    nullmeasures already covers."""
    head = t.slice(0, n).combine_chunks()
    odd = pa.array([bool(i % 2) for i in range(len(head))])
    out = []
    for field in head.schema:
        col = head[field.name].combine_chunks()
        if field.name in cols and pa.types.is_floating(field.type):
            nanv = pa.array([float("nan")] * len(head), type=field.type)
            col = pa.compute.if_else(odd, nanv, col)
        out.append(col)
    return pa.table(out, schema=head.schema)


def _neg_measures(t: pa.Table, cols: list[str], n: int) -> pa.Table:
    """Round-13 ninth-shape PROBE: NEGATE every numeric measure on odd
    rows (refunds/chargebacks/corrections — the sign a real ledger
    feed carries).  Exercises sign conventions in concentration/
    inequality statistics, ln/sqrt domain edges, ABS-vs-raw
    accumulation, and bin edges below zero.  2-dp exactness is
    preserved (negation is exact), so the money discipline itself is
    untouched — only the SIGN assumptions are stressed."""
    head = t.slice(0, n).combine_chunks()
    odd = pa.array([bool(i % 2) for i in range(len(head))])
    out = []
    for field in head.schema:
        col = head[field.name].combine_chunks()
        if field.name in cols and (
            pa.types.is_floating(field.type) or pa.types.is_integer(field.type)
        ):
            neg = pa.compute.negate_checked(col)
            col = pa.compute.if_else(odd, neg, col)
        out.append(col)
    return pa.table(out, schema=head.schema)


def _null_measures(t: pa.Table, cols: list[str], n: int) -> pa.Table:
    head = t.slice(0, n).combine_chunks()
    odd = pa.array([bool(i % 2) for i in range(len(head))])
    out = []
    for field in head.schema:
        col = head[field.name].combine_chunks()
        if field.name in cols:
            col = pa.compute.if_else(odd, pa.nulls(len(head), field.type), col)
        out.append(col)
    return pa.table(out, schema=head.schema)


def _repeat_first_row(t: pa.Table, n: int) -> pa.Table:
    one = t.slice(0, 1)
    return pa.concat_tables([one] * n).combine_chunks()


def _onegroup(t: pa.Table, keys: list[str], n: int) -> pa.Table:
    rep = _repeat_first_row(t, n)
    cols = []
    for field in t.schema:
        if field.name in keys:
            seq = pa.array(range(1, n + 1)).cast(field.type)
            cols.append(seq)
        else:
            cols.append(rep[field.name].combine_chunks())
    return pa.table(cols, schema=t.schema)


#: rows per table in the ``skewed`` shape — big enough that one hot key
#: owning ~90-99% of a table is a real skew surface, small enough that
#: the full 474-key sweep stays a ~15-minute gate
SKEW_ROWS = {
    "region": None,       # full (5 rows)
    "nation": None,       # full (25 rows)
    "customer": 400,
    "supplier": 40,
    "part": 400,
    "orders": 1000,
    "lineitem": 4000,
    "events": 2000,
    "documents": 200,
    "embeddings": 200,
}


def _skewed_tables(src: str) -> dict[str, pa.Table]:
    """Eighth shape (VERDICT r12 item 4): heavy KEY skew — the failure
    mode AQE skew-join handling and salted joins exist for, which none
    of the seven value-shapes covers.  Zipf-like by construction, fully
    deterministic: one order owns 90% of line items (a ~3.6k-line
    order), one part/supplier pair rides 50% of them, one customer
    owns 90% of orders, one user owns 99% of events, one nation holds
    ~99% of customers.  FK validity and composite-key uniqueness are
    preserved: every remapped key is drawn from the referenced slice's
    own key set, and l_linenumber is re-sequenced per order so
    (l_orderkey, l_linenumber) stays unique.  Measures, timestamps,
    text and payloads stay REAL — the shape isolates the key-skew
    question from every value question the other shapes own."""
    raw = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in TABLES
    }
    out: dict[str, pa.Table] = {}
    for name in TABLES:
        n = SKEW_ROWS[name]
        out[name] = raw[name] if n is None else raw[name].slice(0, n).combine_chunks()

    def _remap(table: pa.Table, col: str, values: list) -> pa.Table:
        idx = table.schema.get_field_index(col)
        arr = pa.array(values, type=table.schema.field(col).type)
        return table.set_column(idx, table.schema.field(col), arr)

    # customer.c_nationkey: ~99% in one nation
    cust = out["customer"]
    nat_keys = out["nation"]["n_nationkey"].to_pylist()
    m = len(cust)
    cust = _remap(
        cust, "c_nationkey",
        [nat_keys[0] if i < m - 4 else nat_keys[i % len(nat_keys)] for i in range(m)],
    )
    out["customer"] = cust

    # supplier.s_nationkey: ~90% in the same hot nation
    sup = out["supplier"]
    m = len(sup)
    sup = _remap(
        sup, "s_nationkey",
        [nat_keys[0] if i < (m * 9) // 10 else nat_keys[i % len(nat_keys)] for i in range(m)],
    )
    out["supplier"] = sup

    # orders.o_custkey: one customer owns 90% of orders
    orders = out["orders"]
    cust_keys = out["customer"]["c_custkey"].to_pylist()
    m = len(orders)
    orders = _remap(
        orders, "o_custkey",
        [cust_keys[0] if i < (m * 9) // 10 else cust_keys[i % len(cust_keys)] for i in range(m)],
    )
    out["orders"] = orders

    # lineitem: one order owns 90% of lines; one part and one supplier
    # ride 50%; linenumber re-sequenced per order for uniqueness
    li = out["lineitem"]
    m = len(li)
    order_keys = out["orders"]["o_orderkey"].to_pylist()
    part_keys = out["part"]["p_partkey"].to_pylist()
    sup_keys = out["supplier"]["s_suppkey"].to_pylist()
    lo = [
        order_keys[0] if i < (m * 9) // 10 else order_keys[1 + i % (len(order_keys) - 1)]
        for i in range(m)
    ]
    counts: dict = {}
    ln = []
    for k in lo:
        counts[k] = counts.get(k, 0) + 1
        ln.append(counts[k])
    li = _remap(li, "l_orderkey", lo)
    li = _remap(li, "l_linenumber", ln)
    li = _remap(
        li, "l_partkey",
        [part_keys[0] if i < m // 2 else part_keys[i % len(part_keys)] for i in range(m)],
    )
    li = _remap(
        li, "l_suppkey",
        [sup_keys[0] if i < m // 2 else sup_keys[i % len(sup_keys)] for i in range(m)],
    )
    out["lineitem"] = li

    # events: one user owns 99%, one event_type carries 95%
    ev = out["events"]
    m = len(ev)
    users = ev["user_id"].to_pylist()
    types = ev["event_type"].to_pylist()
    ev = _remap(
        ev, "user_id",
        [users[0] if i < (m * 99) // 100 else users[i] for i in range(m)],
    )
    ev = _remap(
        ev, "event_type",
        [types[0] if i < (m * 95) // 100 else types[i] for i in range(m)],
    )
    out["events"] = ev

    # documents: one lang/source carries ~95% — grouped text statistics
    # (per-lang Zipf fits, language mixes) meet a dominant group
    doc = out["documents"]
    m = len(doc)
    langs = doc["lang"].to_pylist()
    srcs = doc["source"].to_pylist()
    doc = _remap(
        doc, "lang",
        [langs[0] if i < (m * 95) // 100 else langs[i] for i in range(m)],
    )
    doc = _remap(
        doc, "source",
        [srcs[0] if i < (m * 95) // 100 else srcs[i] for i in range(m)],
    )
    out["documents"] = doc
    return out


def build(src: str, out_root: str) -> list[str]:
    made = []
    skewed = None
    for shape in (
        "empty", "single", "allequal", "onegroup", "nullmeasures",
        "extremetext", "nanmeasures", "skewed", "negmeasures",
        "extremedates",
    ):
        out_dir = os.path.join(out_root, shape)
        os.makedirs(out_dir, exist_ok=True)
        if shape == "skewed":
            if skewed is None:
                skewed = _skewed_tables(src)
            for name in TABLES:
                pq.write_table(skewed[name], os.path.join(out_dir, f"{name}.parquet"))
            made.append(out_dir)
            continue
        for name in TABLES:
            t = pq.read_table(os.path.join(src, f"{name}.parquet"))
            if shape == "empty":
                d = t.slice(0, 0)
            elif shape == "single":
                d = t.slice(0, 1)
            elif shape == "allequal":
                d = _repeat_first_row(t, N_ROWS)
            elif shape == "onegroup":
                d = _onegroup(t, KEY_COLS[name], N_ROWS)
            elif shape == "nullmeasures":
                d = _null_measures(t, MEASURE_COLS[name], N_ROWS)
            elif shape == "nanmeasures":
                d = _nan_measures(t, MEASURE_COLS[name], N_ROWS)
            elif shape == "negmeasures":
                d = _neg_measures(t, MEASURE_COLS[name], N_ROWS)
            elif shape == "extremedates":
                d = _extreme_dates(t, TS_COLS[name], N_ROWS)
            else:
                d = _extreme_text(t, TEXT_COLS[name], N_ROWS)
            pq.write_table(d, os.path.join(out_dir, f"{name}.parquet"))
        made.append(out_dir)
    return made


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/degenerate_corpora")
    args = ap.parse_args()
    for d in build(args.src, args.out):
        print(d)
    return 0


if __name__ == "__main__":
    main()
