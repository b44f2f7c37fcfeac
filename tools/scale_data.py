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
- documents: replica r>0 passes every token through a replica-specific
  VOCABULARY PERMUTATION (a bijection on the corpus vocabulary). This
  preserves, per replica, the exact token-frequency shape, document
  lengths (up to token-length drift), boilerplate/near-dup planted
  structure, and chunk repetition — while keeping cross-replica shingle
  overlap ~0, so the corpus dup-RATE stays constant as the corpus grows
  10x (replicating text verbatim would instead turn every doc into a
  10-way duplicate cluster and blow the pair count quadratically).
  ROUND-13 FIX of the round-12 saturation caveat: the bijection used to
  be a cyclic ROTATION, of which only |vocab| = 31 distinct ones exist,
  so REP=100/1000 collapsed to 31.0%/3.1% distinct text (~3.2/~32
  exact copies per doc) — a duplicate-saturated crawl, not the
  constant-rate design. The bijection is now a deterministic RANDOM
  PERMUTATION per replica (tokens sorted by md5(r, attempt, token);
  the permutation tuple is collision-checked against all previous
  replicas and the identity, bumping `attempt` on a hit), of which
  31! >> REP exist. Residual cross-replica exact-text collisions are
  possible only for docs with very few distinct tokens (a doc with k
  distinct tokens collides between two replicas with probability
  1/(31*30*...*(31-k+1))) — negligible at the corpus's doc lengths,
  and pairwise-everywhere-distinct bijections beyond 31 replicas are
  mathematically impossible (a Latin square has n rows), so
  probabilistic distinctness is the correct construction. Cross-engine
  comparisons stay exact either way (both engines read the same files);
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


def vocab_permutation(vocab, r, seen):
    """Deterministic random bijection on the vocabulary for replica r
    (identity for r=0). `seen` holds the permutation tuples of earlier
    replicas; a collision (or the identity, for r>0) deterministically
    bumps the salt until the permutation is fresh — so every replica's
    bijection is distinct even though fewer than REP pairwise-
    everywhere-distinct bijections exist."""
    if r == 0:
        p = {t: t for t in vocab}
        seen.add(tuple(vocab))
        return p
    attempt = 0
    while True:
        shuffled = sorted(
            vocab,
            key=lambda t: hashlib.md5(f"perm:{r}:{attempt}:{t}".encode()).digest())
        key = tuple(shuffled)
        if key not in seen:
            seen.add(key)
            return dict(zip(vocab, shuffled))
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
      permutation is one C-level format call with the 31 permuted
      tokens as arguments (identity tuple at r=0 reproduces the
      original text exactly — format is a pure reassembly);
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
        sys.exit("documents vocabulary too small to permute — cannot scale "
                 "without creating cross-replica duplicates")
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
    seen_perms = set()
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
        perm = vocab_permutation(vocab, r, seen_perms)
        plist = [perm[t] for t in vocab]
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
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{src}/embeddings.parquet') ORDER BY vec_id").fetchall()
    import pandas as pd
    import numpy as np
    recs = []
    for r in range(rep):
        dim = len(rows[0][1])
        signs = np.array([sign(r, i) for i in range(dim)], dtype=np.float32)
        for vec_id, emb, label in rows:
            v = np.asarray(emb, dtype=np.float32)
            if r > 0:
                v = np.roll(v, r % dim) * signs
            recs.append((vec_id + r * sv, v.tolist(), label))
    df = pd.DataFrame.from_records(recs, columns=["vec_id", "embedding", "label"])
    con.register("emb_py", df)
    con.sql(f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, "
            f"label FROM emb_py) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    con.unregister("emb_py")


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
