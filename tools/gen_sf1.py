#!/usr/bin/env python3
"""Generate a local ~sf1 (10x sf0.1) documents/events/embeddings stress set.

Dev tooling only (like check.py): the shipped Scala library never reads
this; it exists so the dedup family and the custom execs can be measured
past the driver-provided sf0.1 before a real cluster run. Statistics
mirror the sf0.1 fixtures (vocab drawn from the real corpus, same lang/
source shares, same event-type mix and time span) so per-query work
scales with the data, not with a distribution shift. Deterministic
(seeded); writes single parquet files like the fixtures.

Usage: python3 tools/gen_sf1.py [outdir=/tmp/graft-sf1] [scale=10]
"""
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def gen_documents(out, scale):
    con = duckdb.connect()
    base = con.execute(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    # per-lang token pools from the real corpus: generated docs stay
    # lexically faithful (shared Zipfian vocabulary per language), which is
    # what drives LSH bucket sizes and jaccard verify volume
    pools = {}
    for _, text, lang, _ in base:
        pools.setdefault(lang, []).extend(text.split(" "))
    langs = sorted(pools)
    rng = random.Random(20260813)
    n = len(base) * scale
    rows = []
    by_lang = {l: [t for _, t, lg, _ in base if lg == l] for l in langs}
    lang_weights = [len(by_lang[l]) for l in langs]
    for i in range(n):
        if i < len(base):
            # keep the real corpus verbatim as a prefix (ids align)
            doc_id, text, lang, source = base[i]
            rows.append((doc_id, text, lang, source, len(text)))
            continue
        lang = rng.choices(langs, weights=lang_weights)[0]
        r = rng.random()
        if r < 0.02:
            text = rng.choice(by_lang[lang])  # exact dup of a real doc
        elif r < 0.05:
            toks = rng.choice(by_lang[lang]).split(" ")  # near dup: 1-2 edits
            for _ in range(rng.randint(1, 2)):
                toks[rng.randrange(len(toks))] = rng.choice(pools[lang])
            text = " ".join(toks)
        else:
            k = max(5, int(rng.gauss(48, 18)))  # fresh doc, corpus vocab
            text = " ".join(rng.choice(pools[lang]) for _ in range(k))
        rows.append((i, text, lang, f"src{rng.randrange(20)}", len(text)))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"documents: {len(rows)} rows")


def gen_events(out, scale):
    rng = random.Random(20260814)
    n = 100000 * scale
    types = ["click", "view", "purchase", "signup", "error"]
    t0 = 1704067200_000000  # 2024-01-01 UTC micros
    span = 30 * 24 * 3600 * 1000000
    users = 1500 * scale // 2  # heavier per-user streams than pure 10x
    ts_sorted = sorted(rng.randrange(span) for _ in range(n))
    rows_ts, rows_uid, rows_ty, rows_v, rows_p = [], [], [], [], []
    for i in range(n):
        rows_ts.append(t0 + ts_sorted[i])
        rows_uid.append(rng.randrange(users))
        rows_ty.append(types[rng.randrange(5)])
        rows_v.append(round(min(560.0, rng.expovariate(1 / 50.0)), 2))
        rows_p.append('{"k": %d}' % rng.randrange(100))
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(rows_ts, pa.timestamp("us")),
        "user_id": pa.array(rows_uid, pa.int64()),
        "event_type": pa.array(rows_ty, pa.string()),
        "value": pa.array(rows_v, pa.float64()),
        "props": pa.array(rows_p, pa.string()),
    })
    pq.write_table(tbl, f"{out}/events.parquet")
    print(f"events: {n} rows")


def gen_embeddings(out, scale):
    """Scale the embedding corpus by `scale`: each copy of a real vector
    gets small deterministic gaussian jitter, so cluster structure (labels,
    LSH bucket distribution, IVF cell shape) stays faithful while the
    corpus grows — near-dup planting falls out for free because jittered
    copies are each other's near neighbors."""
    rng = random.Random(20260814)
    con = duckdb.connect()
    base = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id").fetchall()
    n0 = len(base)
    ids, vecs, labels = [], [], []
    for c in range(scale):
        for (vid, emb, lab) in base:
            ids.append(c * n0 + vid)
            if c == 0:
                vecs.append(list(emb))
            else:
                vecs.append([v + rng.gauss(0.0, 0.02) for v in emb])
            labels.append(lab)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(ids)} rows")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os
    os.makedirs(out, exist_ok=True)
    gen_documents(out, scale)
    gen_events(out, scale)
    gen_embeddings(out, scale)
    # the remaining tables aren't under stress test; link the sf0.1 copies
    # so Tables.load finds a complete directory
    import shutil
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    print(f"done: {out}")


if __name__ == "__main__":
    main()
