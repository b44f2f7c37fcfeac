#!/usr/bin/env python3
"""Scale the driver-generated testdata by integer replication with
key-space shifting — the sf1.0 receipts generator (round-11 judge ask).

Usage: python3 tools/scale_data.py <src_sf_dir> <dst_dir> [REP=10]
       [--span-years=N] [--only=table,...]

--span-years=N (round 16, the time-axis decade): every generated decade
used to multiply ROWS at a frozen ~30-day calendar, so span guards,
window ops, sessionization, and watermark/expiry paths were never
exercised on a realistic multi-year axis. With N set, each events
replica r is shifted forward by r * floor(365*N / REP) DAYS (replica 0
keeps the original dates), growing the events table's global span to
~N years while preserving every within-replica pattern (per-user
fan-out, session shapes, funnel step gaps) exactly. User key-space
shifting is unchanged, so each user's activity still spans <= 30 days
EXCEPT that distinct replicas now live in distinct eras — the corpus
shape of a long-lived product with user-generation waves. Only events
takes the shift (orders/lineitem dates feed price/flag queries, not
calendar-axis operators).

Method (documented in BASELINE.md "sf1 scale sweep"):
- dims region/nation copy verbatim (TPC-H dims don't scale);
- every other table is replicated REP times with each key column
  shifted by r * stride (stride = max(key)+1), and FK columns shifted
  by the SAME stride as their parent, so referential structure and
  per-key fan-outs are exactly preserved at 10x cardinality;
- name-like unique text columns get a '#r<r>' suffix for r>0 so
  name-grouped results stay 10x, not merged;
- documents: replica r>0 passes every token through a replica-PRIVATE
  SYNTHESIZED VOCABULARY (a bijection from the base vocabulary onto
  fresh tokens that exist only in that replica). This preserves, per
  replica, the exact token-frequency shape, document lengths and
  per-token character classes (each synthesized token has the same
  length and lowercase/uppercase/digit pattern as the base token it
  replaces), boilerplate/near-dup planted structure, and chunk
  repetition — while keeping cross-replica shingle overlap ~0, so the
  corpus dup-RATE stays constant as the corpus grows 10x (replicating
  text verbatim would instead turn every doc into a 10-way duplicate
  cluster and blow the pair count quadratically).
  ROUND-18 FIX of the r17 band-granularity saturation (BASELINE's own
  disclosure: candidate-pair rate 3.94/doc at REP=10000 vs 0.064/doc
  at the base — x62): the previous construction PERMUTED the base
  31-token vocabulary per replica, so all replicas drew shingles from
  the same 31 tokens and at REP=10000 the permutation space collides
  at 4-hash MinHash band granularity — band buckets fill with
  cross-replica docs that share banded hash patterns without sharing
  text. Synthesis removes the shared support entirely: two replicas
  share a word-k-gram shingle only if k CONSECUTIVE independently
  synthesized tokens collide character-for-character (probability
  ~26^-(sum of the k token lengths) per replica pair — vanishing),
  so cross-replica candidates are structurally ~0 at any REP, not
  just below a permutation-space threshold. Within each replica the
  31 images are collision-checked against each other and against the
  base vocabulary (deterministic salt bump on a hit), so the replica-
  local frequency shape is an exact bijection. The construction
  remains probabilistic-distinct across replicas (a single shared
  token image between two replicas is harmless — it cannot form a
  shared shingle alone), which is the correct construction for
  unbounded REP: globally-disjoint length-preserving images are
  impossible (the base vocab has a 1-char token and only 26 1-char
  lowercase strings exist). Cross-engine comparisons stay exact
  either way (both engines read the same files);
- embeddings: replica r>0 applies an ORTHOGONAL transform (component
  rotation by r + deterministic sign flips keyed on (r, i)). Within a
  replica all norms and pairwise cosines are exactly preserved (planted
  near-dup pairs and cluster geometry scale 10x); across replicas the
  sign flips decorrelate even structured directions, so near-dup pair
  counts scale linearly, not quadratically.

Everything is deterministic — no RNG, all seeds are (r, index) hashes —
so the dataset is reproducible byte-for-byte from the sf0.1 inputs.
Writes through DuckDB => TIMESTAMP(MICROS, no-UTC) parquet, the same
family the round-10 testdata ships and graft.Tables normalizes.
"""
import os
import re
import sys
import hashlib

import duckdb

REP_DEFAULT = 10


def copy(con, src, dst, table):
    con.sql(f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")


def stride(con, src, table, key):
    return con.sql(
        f"SELECT max({key})+1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


def replicate(con, src, dst, table, select_exprs, rep):
    """Write REP key-shifted replicas; `r` ranges over 0..REP-1 in exprs."""
    sql = (f"COPY (SELECT {select_exprs} "
           f"FROM read_parquet('{src}/{table}.parquet') "
           f"CROSS JOIN range({rep}) t(r)) "
           f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    con.sql(sql)


def suffixed(col):
    """name#r<r> for r>0 — keeps name-keyed groupings 10x, not merged."""
    return f"CASE WHEN r = 0 THEN {col} ELSE {col} || '#r' || r END AS {col}"


TOKEN_SPLIT = re.compile(r"(\s+)")


def synth_token(t, r, attempt):
    """Deterministic fresh token for base token `t` in replica `r`:
    same length, same per-character class (lower/upper/digit; other
    characters pass through), bytes drawn from an iterated md5 stream
    keyed on (r, attempt, t)."""
    raw = b""
    ctr = 0
    while len(raw) < len(t):
        raw += hashlib.md5(f"synth:{r}:{attempt}:{t}:{ctr}".encode()).digest()
        ctr += 1
    out = []
    for c, b in zip(t, raw):
        if c.islower():
            out.append(chr(ord("a") + b % 26))
        elif c.isupper():
            out.append(chr(ord("A") + b % 26))
        elif c.isdigit():
            out.append(chr(ord("0") + b % 10))
        else:
            out.append(c)
    return "".join(out)


def vocab_synthesis(vocab, r):
    """Replica-private vocabulary for replica r (identity for r=0):
    a bijection from the base vocabulary onto freshly synthesized
    tokens. The image set is collision-checked within the replica and
    against the base vocabulary (bump the salt on a hit) — so each
    replica's token-frequency shape is an exact bijection and no
    replica reuses a base token. Distinctness ACROSS replicas is
    probabilistic by design (see module docstring: a single shared
    image cannot form a shared shingle, and globally-disjoint
    length-preserving images are impossible for 1-char tokens)."""
    if r == 0:
        return {t: t for t in vocab}
    base = set(vocab)
    attempt = 0
    while True:
        m = {t: synth_token(t, r, attempt) for t in vocab}
        imgs = set(m.values())
        if len(imgs) == len(vocab) and not (imgs & base):
            return m
        attempt += 1


def write_documents(con, src, dst, rep, sd):
    """Chunked, template-based writer (round 16 — the sf1000 decade).

    The round-15 form built ALL rep*|docs| rows in one pandas frame
    (fine through REP=1000 / 5M docs; at REP=10000 the 50M Python
    string tuples would hold ~15 GB of text plus object overhead and
    the per-doc regex split ran once per REPLICA). Two changes, values
    byte-identical per row:
    - each base doc is tokenized ONCE into a `str.format` template
      ("{5} {17} ..." by vocabulary index), so applying a replica's
      vocabulary is one C-level format call with the 31 replica-
      private tokens as arguments (identity tuple at r=0 reproduces
      the original text exactly — format is a pure reassembly);
    - rows stream through a pyarrow ParquetWriter in ~1M-doc row
      groups (bounded memory at any REP; row groups stay splittable
      for Spark and DuckDB alike).
    """
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{src}/documents.parquet') ORDER BY doc_id").fetchall()
    vocab = sorted({t for _, text, _, _ in rows
                    for t in TOKEN_SPLIT.split(text)[::2] if t})
    n = len(vocab)
    if n < 2 and rep > 1:
        sys.exit("documents vocabulary too small to resynthesize — cannot "
                 "scale without creating cross-replica duplicates")
    tok_ix = {t: i for i, t in enumerate(vocab)}
    templates = []
    for doc_id, text, lang, source in rows:
        parts = TOKEN_SPLIT.split(text)
        for i in range(0, len(parts), 2):
            if parts[i]:
                parts[i] = "{%d}" % tok_ix[parts[i]]
        templates.append(("".join(parts), doc_id, lang, source))
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    writer = pq.ParquetWriter(f"{dst}/documents.parquet", schema)
    chunk_reps = max(1, 1_000_000 // max(1, len(rows)))
    ids, texts, langs, sources, lens = [], [], [], [], []

    def flush():
        if not ids:
            return
        writer.write_table(pa.table(
            {"doc_id": ids, "text": texts, "lang": langs,
             "source": sources, "n_chars": lens}, schema=schema))
        ids.clear(); texts.clear(); langs.clear(); sources.clear(); lens.clear()

    for r in range(rep):
        vmap = vocab_synthesis(vocab, r)
        plist = [vmap[t] for t in vocab]
        base = r * sd
        for tmpl, doc_id, lang, source in templates:
            new = tmpl.format(*plist)
            ids.append(doc_id + base)
            texts.append(new)
            langs.append(lang)
            sources.append(source)
            lens.append(len(new))
        if (r + 1) % chunk_reps == 0:
            flush()
    flush()
    writer.close()


def sign(r, i):
    """Deterministic ±1 from (r, i); ~half negative. r=0 => +1."""
    if r == 0:
        return 1.0
    h = hashlib.md5(f"{r}:{i}".encode()).digest()[0]
    return 1.0 if h & 1 else -1.0


def write_embeddings(con, src, dst, rep, sv):
    """Chunked, matrix-based writer (round 18 — the sf1000 decade).

    The earlier form built ALL rep*|vecs| rows as Python tuples in one
    pandas frame — fine through REP=1000 (2M rows), but at REP=10000
    the 20M rows of 64 boxed floats would hold ~50 GB of objects.
    Values are unchanged per row: each replica is one vectorized
    numpy roll+sign-flip of the base matrix, streamed through a
    pyarrow ParquetWriter in ~1M-row row groups.
    """
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{src}/embeddings.parquet') ORDER BY vec_id").fetchall()
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    base_ids = np.array([v for v, _, _ in rows], dtype=np.int64)
    labels = pa.array([l for _, _, l in rows])
    mat = np.array([e for _, e, _ in rows], dtype=np.float32)
    n, dim = mat.shape
    schema = pa.schema([("vec_id", pa.int64()),
                       ("embedding", pa.list_(pa.float32())),
                       ("label", labels.type)])
    writer = pq.ParquetWriter(f"{dst}/embeddings.parquet", schema)
    chunk_reps = max(1, 1_000_000 // max(1, n))
    pending = []

    def flush():
        if not pending:
            return
        writer.write_table(pa.Table.from_batches(pending, schema=schema))
        pending.clear()

    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * dim)
    for r in range(rep):
        if r == 0:
            m = mat
        else:
            signs = np.array([sign(r, i) for i in range(dim)], dtype=np.float32)
            m = np.roll(mat, r % dim, axis=1) * signs[None, :]
        emb = pa.ListArray.from_arrays(offsets, pa.array(m.reshape(-1)))
        pending.append(pa.record_batch(
            [pa.array(base_ids + r * sv), emb, labels], schema=schema))
        if (r + 1) % chunk_reps == 0:
            flush()
    flush()
    writer.close()


def main():
    # --only=documents[,embeddings,...] regenerates a subset in place
    # (round 13: refresh the doc corpora under the permutation fix
    # without re-replicating the TPC-H tables)
    only = None
    span_years = 0
    pos = []
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--span-years="):
            span_years = int(a.split("=", 1)[1])
        else:
            pos.append(a)
    src, dst = pos[0], pos[1]
    rep = int(pos[2]) if len(pos) > 2 else REP_DEFAULT

    def want(t):
        return only is None or t in only

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 16")
    # r16 (the sf1000 decade): COPY under the default
    # preserve_insertion_order=true MATERIALIZES the whole replicated
    # relation before writing — at REP=10000 the 1B-row events cross
    # join held ~80 GB of vectors and never reached the writer. Row
    # order inside the generated files is irrelevant (every consumer
    # compares as a set: aggregates, hash sums, checksums), so stream:
    con.sql("SET preserve_insertion_order=false")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")

    sc = stride(con, src, "customer", "c_custkey")
    ss = stride(con, src, "supplier", "s_suppkey")
    sp = stride(con, src, "part", "p_partkey")
    so = stride(con, src, "orders", "o_orderkey")
    se = stride(con, src, "events", "event_id")
    su = stride(con, src, "events", "user_id")
    sd = stride(con, src, "documents", "doc_id")
    sv = stride(con, src, "embeddings", "vec_id")

    if want("region"):
        copy(con, src, dst, "region")
    if want("nation"):
        copy(con, src, dst, "nation")
    if want("customer"):
        replicate(con, src, dst, "customer",
                  f"c_custkey + r*{sc} AS c_custkey, {suffixed('c_name')}, "
                  "c_nationkey, c_acctbal, c_mktsegment", rep)
    if want("supplier"):
        replicate(con, src, dst, "supplier",
                  f"s_suppkey + r*{ss} AS s_suppkey, {suffixed('s_name')}, "
                  "s_nationkey, s_acctbal", rep)
    if want("part"):
        replicate(con, src, dst, "part",
                  f"p_partkey + r*{sp} AS p_partkey, {suffixed('p_name')}, "
                  "p_brand, p_type, p_size, p_retailprice", rep)
    if want("orders"):
        replicate(con, src, dst, "orders",
                  f"o_orderkey + r*{so} AS o_orderkey, o_custkey + r*{sc} AS o_custkey, "
                  "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority", rep)
    if want("lineitem"):
        replicate(con, src, dst, "lineitem",
                  f"l_orderkey + r*{so} AS l_orderkey, l_partkey + r*{sp} AS l_partkey, "
                  f"l_suppkey + r*{ss} AS l_suppkey, l_linenumber, l_quantity, "
                  "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
                  "l_shipdate", rep)
    if want("events"):
        shift_days = (365 * span_years) // rep if span_years else 0
        ts_expr = (f"ts + r * {shift_days} * INTERVAL 1 DAY AS ts"
                   if shift_days else "ts")
        replicate(con, src, dst, "events",
                  f"event_id + r*{se} AS event_id, {ts_expr}, "
                  f"user_id + r*{su} AS user_id, "
                  "event_type, value, props", rep)
        if shift_days:
            span = con.sql(
                f"SELECT date_diff('day', min(ts), max(ts)) FROM "
                f"read_parquet('{dst}/events.parquet')").fetchone()[0]
            print(f"events calendar span: {span} days "
                  f"(replica shift {shift_days} days)")
    if want("documents"):
        write_documents(con, src, dst, rep, sd)
    if want("embeddings"):
        write_embeddings(con, src, dst, rep, sv)

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        if not want(t):
            continue
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
