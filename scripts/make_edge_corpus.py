#!/usr/bin/env python3
"""Build the EDGE-CASE verification corpus: a copy of an sf dir whose
`documents` table is replaced with hostile inputs (empty text,
whitespace-only, 1-token, degenerate repeats, unicode, one huge token,
mixed whitespace) — the distributions the synthetic corpus never
exercises, where cross-engine divergences hide (e.g. DuckDB's
array_to_string(empty) = NULL vs Spark array_join(empty) = '').

Usage: make_edge_corpus.py [srcSfDir] [outDir]
Then:  scripts/run_main.sh graft.Verify <outDir> /tmp/verify_edge
       python3 scripts/check_oracle.py <outDir> /tmp/verify_edge
"""
import shutil, sys
from pathlib import Path

import duckdb

src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/edge_sf")

out.mkdir(parents=True, exist_ok=True)
for p in src.glob("*.parquet"):
    shutil.copy(p, out / p.name)

raw_docs = [
    (0, "", "en"),                                       # empty
    (31, "doc with a NULL language tag and enough filler tokens the and "
         "of to pass every quality gate in the pipeline today", None),
    (1, "   ", "en"),                                    # whitespace only
    (2, "single", "en"),                                 # 1 token
    (3, "two tokens", "en"),                             # 2 tokens
    (4, "the the the the the the the the the the", "en"),  # degenerate repeat
    (5, "café naïve résumé 中文文档 über straße", "de"),  # unicode
    (6, "a" * 500, "en"),                                # one huge token
    (7, "tab\tseparated\nnewline  double  space", "en"),  # mixed whitespace
    (8, "the quick brown fox jumps over the lazy dog and runs far away "
        "home tonight with joy and speed to rest", "en"),
    (9, "el la de que y el la de que y el la de que y el la de que y",
        "es"),                                           # es stopwords
    (10, "punctuation, only! and? some; weird: stuff...", "und"),
    (11, None, "en"),                                    # NULL text
] + [(i, f"filler doc {i} with some shared tokens the and of plus unique "
         f"w{i} x{i} y{i} z{i} tail tokens to pass gates maybe twenty "
         "total now", "en") for i in range(12, 30)]

# r9 — q135 sequence-packing edges: docs at exactly seqLen-1 / seqLen /
# seqLen+1 whitespace tokens (the boundary-spanning cut), plus a
# single-shard token-mass skew: doc_ids chosen so the portable shard
# hash (md5-fold % 32) collides on one shard
import hashlib

def shard_of(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 32

def ntok_text(n, tag):
    return " ".join(f"{tag}{j}" for j in range(n))

raw_docs += [(40, ntok_text(2047, "pka"), "en"),
             (41, ntok_text(2048, "pkb"), "en"),
             (42, ntok_text(2049, "pkc"), "en")]
skew_ids = [i for i in range(100, 4000) if shard_of(i) == 7][:6]
raw_docs += [(i, ntok_text(300 + 13 * k, f"sk{k}u"), "en")
             for k, i in enumerate(skew_ids)]

# r9 — q134 perceptual-dup edges: an all-identical-thumb cluster (same
# first-64 chars, distinct tails -> a hamming-0 clique), astral-plane
# codepoints inside the 64-char head (codePointAt walk vs DuckDB's
# character substr), and texts at exactly 63/64/65 chars
thumb_head = ("thumbhead " * 7)[:64]
raw_docs += [(60 + j, thumb_head + f" tail variant {j}", "en")
             for j in range(4)]
raw_docs += [(64, "\U0001F389\U0001F680" * 40, "und"),
             (65, "x" * 63, "en"), (66, "y" * 64, "en"),
             (67, "z" * 65, "en"),
             (68, thumb_head, "en")]

# r9 — selection edges (q136/q137): a lang stratum whose 51 docs all
# share ONE exact score (0.25 — per-doc-unique filler so no fuzzy/near-
# dup blowup) making the whole lang a single degenerate band, with the
# cumulative token total hitting the 20000 budget EXACTLY at doc 50
# (strict-prefix boundary + in-band doc_id ordering, both cross-engine);
# plus repeated-single-bigram docs (one hot bucket, target vs raw copies
# so the quantized log-ratio weights must agree engine-to-engine)
raw_docs += [(500000 + j,
              " ".join(f"the u{j}x{m}a u{j}x{m}b u{j}x{m}c"
                       for m in range(100)),
              "bq") for j in range(1, 52)]
raw_docs += [(70, "rep " * 50, "en"), (71, "rep " * 50, "es"),
             (72, "the of " * 25, "en"), (73, "the of " * 25, "und")]

# r10 — DSIR degenerate-target structures (q136, is_tgt = lang='en'):
# bigrams living ONLY in target docs (per-bucket all-target:
# t_cnt == r_cnt, log-ratio driven purely by the smoothing totals),
# bigrams with ZERO target presence, an identical-text en/fr pair (same
# buckets, is_tgt split — quantized weights must agree on both copies),
# and a dense single-bigram repeat (one bucket referenced 799x by one
# doc — stresses the BIGINT micro-sum against any per-element rounding)
raw_docs += [(80, "tgtonly alpha tgtonly beta tgtonly gamma " * 10, "en"),
             (81, "rawonly uno rawonly dos rawonly tres " * 10, "fr"),
             (82, "mirror pair text shared across languages exactly", "en"),
             (83, "mirror pair text shared across languages exactly", "fr"),
             (84, "dense " * 800, "en")]

# r10 — budgetCut all-one-score group at CORPUS scale (q137): 300 docs
# in one lang, every doc the same 0.25 score and 100 tokens, budget
# 20000 -> the cut lands at doc 200 INSIDE the one degenerate band, so
# the whole group takes the boundary-band in-band window (the documented
# worst-case collapse) over 300 rows. Per-doc-unique filler keeps the
# near-dup/fuzzy families from pair blowup.
raw_docs += [(600000 + j,
              " ".join(f"the v{j}m{m}a v{j}m{m}b v{j}m{m}c"
                       for m in range(25)),
              "bw") for j in range(1, 301)]

docs = [(i, t, lang, "edge", len(t) if t is not None else None)
        for (i, t, lang) in raw_docs]
assert len({d[0] for d in docs}) == len(docs), "duplicate edge doc_id"

con = duckdb.connect()
con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", docs)
con.execute(f"COPY d TO '{out / 'documents.parquet'}' (FORMAT PARQUET)")

# hostile embeddings (64 dims, schema-matched): zero vector (NaN cosine),
# exact duplicate, negation (cos -1), tiny/huge magnitudes, then a
# deterministic spread so centroid cells are non-trivial
DIMS = 64
def vec(f):
    return [float(f(i)) for i in range(DIMS)]

import math
vecs = [
    (0, vec(lambda i: math.sin(i * 0.3) + 1.0), 0),    # the query vector
    (1, vec(lambda i: math.sin(i * 0.3) + 1.0), 0),    # duplicate of 0
    (2, vec(lambda i: 0.0), 1),                        # ZERO vector -> NaN cos
    (3, vec(lambda i: -(math.sin(i * 0.3) + 1.0)), 2), # negation, cos -1
    (4, vec(lambda i: 1e-30 * (i + 1)), 3),            # tiny magnitude
    (5, vec(lambda i: 1e30 if i == 0 else 1.0), 4),    # huge single spike
    (6, vec(lambda i: 1.0 if i % 2 == 0 else -1.0), 5),
    (7, vec(lambda i: float(i)), 6),
] + [(i, vec(lambda d, i=i: math.sin(d * 0.1 + i) + 0.2 * (i % 7)), i % 10)
     for i in range(8, 40)]

con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO e VALUES (?,?,?)", vecs)
con.execute(f"COPY e TO '{out / 'embeddings.parquet'}' (FORMAT PARQUET)")

# hostile events (TIMESTAMP_NS parquet, schema-matched via pyarrow):
# exact session-gap boundaries, identical timestamps, as-of orphans,
# NULL value/type/ts, out-of-order event ids
import pyarrow as pa
import pyarrow.parquet as papq
from datetime import datetime

BASE = datetime(2024, 1, 1, 0, 0, 0)
def at(sec):
    return datetime.fromtimestamp(BASE.timestamp() + sec)

evs = []  # (event_id, ts, user_id, event_type, value, props)
# u1: the 1800 s session-gap BOUNDARY: +1800 continues, +1801 breaks
evs += [(100, at(0), 1, "click", 1.0, '{"k": 1}'),
        (101, at(1800), 1, "click", 2.0, '{"k": 2}'),
        (102, at(1800 + 3601), 1, "purchase", 3.0, '{"k": 3}')]
# u2: five events at ONE timestamp (ordering must fall back to ids)
evs += [(110 + i, at(100), 2, "view", float(i), '{"k": 0}')
        for i in range(5)]
# u3: a single event
evs += [(120, at(50), 3, "click", 7.5, '{"k": 9}')]
# u4: as-of orphans - click with no later purchase, purchase before click
evs += [(130, at(1000), 4, "purchase", 10.0, "{}"),
        (131, at(2000), 4, "click", 0.0, "{}")]
# u5: value edges incl. NULLs and a NULL event_type / NULL ts row
evs += [(140, at(10), 5, "click", 0.0, "{}"),
        (141, at(20), 5, "click", -5.5, "{}"),
        (142, at(30), 5, "purchase", 99999.99, "{}"),
        (143, at(40), 5, "view", None, "{}"),
        (144, at(60), 5, None, 1.0, None),
        (145, None, 5, "view", 2.0, "{}")]
# u6: event ids out of order vs time
evs += [(159, at(5), 6, "click", 1.0, "{}"),
        (150, at(3600), 6, "purchase", 2.0, "{}")]
# u7: rows exactly on tumbling-window edges (the hour boundary)
evs += [(160, at(3600), 7, "view", 1.0, "{}"),
        (161, at(7200), 7, "view", 1.0, "{}")]
# filler traffic so aggregates/sketches have mass
evs += [(200 + i, at(90 + 37 * i), 8 + i % 5,
         ["click", "view", "purchase", "signup", "error"][i % 5],
         round(1.0 + 0.5 * i, 2), '{"k": %d}' % i) for i in range(40)]

tbl = pa.table({
    "event_id": pa.array([e[0] for e in evs], pa.int64()),
    "ts": pa.array([e[1] for e in evs], pa.timestamp("ns")),
    "user_id": pa.array([e[2] for e in evs], pa.int64()),
    "event_type": pa.array([e[3] for e in evs], pa.string()),
    "value": pa.array([e[4] for e in evs], pa.float64()),
    "props": pa.array([e[5] for e in evs], pa.string()),
})
papq.write_table(tbl, out / "events.parquet")

# hostile relational rows APPENDED to the real sf tables (cardinality and
# join behavior of the base data preserved): NULL segments/dates/prices,
# names without the '#' delimiter, orphan foreign keys
con.execute(f"""CREATE TABLE cust AS
    SELECT * FROM '{out / 'customer.parquet'}'""")
con.execute("""INSERT INTO cust VALUES
    (900001, 'NoDelimiterName', 0, 0.0, NULL),
    (900002, '', 1, -999.99, 'MACHINERY'),
    (900003, 'Customer#900003', 2, NULL, 'machinery'),
    (900004, NULL, 3, 1.0, 'HOUSEHOLD')""")
# r12 — hostile JSON-special names (VERDICT r11 #4): quotes, backslashes,
# real tab/newline control chars, unicode incl. astral plane, apostrophes —
# these flow into q142's PractitionerRole display fields, where BOTH
# engines must serialize them through to_json identically (the escape
# contract: \" \\ \t \n as two-char escapes, non-ASCII raw UTF-8).
# Keys chosen to spread across q142's mod arms (%4 started, %5 ended,
# %7 insert, %11 active, %13 period-end).
hostile_names = [
    (900005, 'Dr "Air" Quotes', 4, 10.0, 'SEG"QUOTE'),
    (900006, 'Back\\slash\\\\double', 5, 11.0, 'TAB\tSEG'),
    (900007, 'New\nline and\ttab', 6, 12.0, 'UNI中文🎉'),
    (900008, "O'Brien-D'Arcy", 7, 13.0, "APOS'SEG"),
    (900011, '中文 naïve 🎉 straße', 8, 14.0, 'MIX"\\\n中'),
    (900013, '{"fake":"json"}', 9, 15.0, '[not,json]'),
]
con.executemany("INSERT INTO cust VALUES (?,?,?,?,?)", hostile_names)
con.execute(f"COPY cust TO '{out / 'customer.parquet'}' (FORMAT PARQUET)")

con.execute(f"""CREATE TABLE ords AS
    SELECT * FROM '{out / 'orders.parquet'}'""")
con.execute("""INSERT INTO ords VALUES
    (910001, 900001, 'F', NULL, TIMESTAMP '1995-06-15', '1-URGENT'),
    (910002, 777777, 'O', 123.45, NULL, '5-LOW'),
    (910003, 900002, NULL, 0.0, TIMESTAMP '1992-01-01', NULL),
    (910004, 900001, 'P', 200000.01, TIMESTAMP '1998-12-31', '2-HIGH')""")
# r9 — q45 adversarial strata: a TINY 'P' stratum (a handful of rows;
# sf0.001's orders are overwhelmingly F/O) probes the binomial bound
# oracle where 4*sigma+1 is dominated by the +1 slack
con.execute("""INSERT INTO ords
    SELECT 911000 + i, 900001, 'P', 100.0 + i, TIMESTAMP '1997-01-01',
           '3-MEDIUM'
    FROM range(5) t(i)""")
con.execute(f"COPY ords TO '{out / 'orders.parquet'}' (FORMAT PARQUET)")

# hostile nation names: JSON-special characters probe the document
# builders' escaping (to_json vs raw concat)
con.execute(f"""CREATE TABLE nat AS
    SELECT * FROM '{out / 'nation.parquet'}'""")
con.execute("""INSERT INTO nat VALUES
    (930001, 'QUOTE"INSIDE', 0),
    (930002, 'BACK\\SLASH', 1),
    (930003, 'UNI中文ÇODE', 2),
    (930004, '', 3)""")
con.execute(f"COPY nat TO '{out / 'nation.parquet'}' (FORMAT PARQUET)")

con.execute(f"""CREATE TABLE pt AS
    SELECT * FROM '{out / 'part.parquet'}'""")
con.execute("""INSERT INTO pt VALUES
    (940001, NULL, 'Brand#0', NULL, NULL, NULL),
    (940002, 'odd part', '', 'TYPE A', -1, 0.0)""")
con.execute(f"COPY pt TO '{out / 'part.parquet'}' (FORMAT PARQUET)")

con.execute(f"""CREATE TABLE sup AS
    SELECT * FROM '{out / 'supplier.parquet'}'""")
con.execute("""INSERT INTO sup VALUES
    (950001, NULL, NULL, NULL),
    (950002, 'Supplier#950002', 999, -0.0)""")
con.execute(f"COPY sup TO '{out / 'supplier.parquet'}' (FORMAT PARQUET)")

con.execute(f"""CREATE TABLE li AS
    SELECT * FROM '{out / 'lineitem.parquet'}'""")
con.execute("""INSERT INTO li VALUES
    (920001, 1, 1, 1, NULL, 100.0, 0.05, 0.02, 'N', 'O',
       TIMESTAMP '1996-03-01'),
    (920002, 2, 2, 1, 10.0, NULL, NULL, NULL, 'A', 'F', NULL),
    (920003, 3, 3, 1, 0.0, 0.0, 0.0, 0.0, 'R', 'F',
       TIMESTAMP '1992-01-01'),
    (920004, 4, 4, 1, 9999999999.99, 9999999999.99, 0.99, 0.99, NULL, NULL,
       TIMESTAMP '1999-12-31')""")
con.execute(f"COPY li TO '{out / 'lineitem.parquet'}' (FORMAT PARQUET)")

print(f"wrote {len(docs)} edge docs + {len(vecs)} edge embeddings + "
      f"{len(evs)} edge events + 4+4+4 hostile customer/order/lineitem "
      f"rows into {out}")
