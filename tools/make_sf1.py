#!/usr/bin/env python3
"""Synthesize a LOCAL sf1 fixture (10x sf0.1) for oracle-checked scale
sweeps (round 12, r11 verdict item 5).

The driver fixtures stop at sf0.1; the scale probes measure 10x wall
ratios on in-memory blowups but nothing above sf0.1 was ever
ORACLE-CHECKED. This tool writes an sf1-shaped set of the same ten
tables to ``.localdata/sf1/`` inside the repo (gitignored — the
/root/testdata tree is read-only and nothing outside the repo may be
written), so ``tools/check_oracle.py --sf-dir .localdata/sf1`` can
hash-compare Spark vs DuckDB at 6M lineitem rows / 50k documents / 20k
embeddings.

Construction (seed 4242, fully deterministic):

- ``region``/``nation``: copied (dimension tables don't scale).
- ``customer``/``supplier``/``part``/``orders``/``lineitem``/``events``:
  10 replicas with every key column offset by ``replica * n_rows(base
  key table)`` — keys stay dense and 0-based, FK consistency holds
  within each replica (an order's lineitems move with it), and no id
  crosses the 10M twin-offset guard used by the SemDeDup queries.
- ``documents``: replica 0 is the original corpus (its planted near-dup
  structure stays intact); replicas 1-9 are fresh texts sampled from
  the base corpus' word-frequency distribution with matching length /
  lang / source marginals — cross-replica Jaccard stays near zero, so
  pair-stage volume grows ~10x, not 100x.
- ``embeddings``: replica 0 original; replicas 1-9 fresh uniform
  [-0.5, 0.5) float32 vectors (the base fixture's distribution),
  labels uniform over the base label domain.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
SRC = Path("/root/testdata/sf0.1")
OUT = REPO / ".localdata" / "sf1"
REPLICAS = 10
SEED = 4242

#: per-table key columns and the base-table whose row count sets the
#: offset stride (keys are dense and 0-based in the driver fixtures)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_users"},
}


def _strides(con) -> dict[str, int]:
    s = {}
    for t in ["customer", "supplier", "part", "orders", "events"]:
        s[t] = con.sql(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
    s["_users"] = con.sql(
        f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    return s


def replicate_keyed(con, strides) -> None:
    for table, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
            ).fetchall()
        ]
        selects = []
        for r in range(REPLICAS):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {r * strides[keys[c]]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'"
            )
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{OUT}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


def copy_dims(con) -> None:
    for t in ["region", "nation"]:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")


def make_documents(con, rng) -> None:
    base = con.sql(
        f"SELECT doc_id, text, lang, source FROM "
        f"'{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n = len(base)
    # word-frequency distribution of the base corpus
    vocab_rows = con.sql(
        f"""
        SELECT w, count(*) AS c FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
          FROM '{SRC}/documents.parquet') t
        WHERE w <> '' GROUP BY w ORDER BY w
        """
    ).fetchall()
    # The base fixture's vocabulary is only ~31 words — dense enough
    # that EVERY pair of 50k sampled docs would share bigrams, which
    # turns gram-keyed joins quadratic and (measured) fills the disk
    # with shuffle spill on the exact-Jaccard harness family. Real
    # corpora have heavy-tailed vocabularies, so expand each base word
    # into 20 Zipf-weighted variants (w, w2..w20): ~620 distinct words
    # keeps common words common while giving documents enough rare
    # surface that cross-doc overlap is realistic, not total.
    words_l: list[str] = []
    p_l: list[float] = []
    zipf = [1.0 / (k + 1) for k in range(20)]
    zs = sum(zipf)
    for w, c in vocab_rows:
        for k in range(20):
            words_l.append(w if k == 0 else f"{w}{k + 1}")
            p_l.append(c * zipf[k] / zs)
    words = np.array(words_l)
    p = np.array(p_l, dtype=np.float64)
    p /= p.sum()
    lengths = np.array([len(t[1].split()) for t in base])
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for did, text, lang, source in base:
        doc_ids.append(did)
        texts.append(text)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(text))
    for r in range(1, REPLICAS):
        n_words = rng.choice(lengths, size=n)
        for i in range(n):
            t = " ".join(rng.choice(words, size=int(n_words[i]), p=p))
            doc_ids.append(r * n + i)
            texts.append(t)
            langs.append(base[i][2])
            sources.append(base[i][3])
            n_chars.append(len(t))
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(tbl, OUT / "documents.parquet")
    print(f"documents: {len(doc_ids)} rows")


def make_embeddings(con, rng) -> None:
    base = con.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"'{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    n = len(base)
    dim = len(base[0][1])
    max_label = max(b[2] for b in base)
    vec_ids = [b[0] for b in base]
    vecs = [b[1] for b in base]
    labels = [b[2] for b in base]
    for r in range(1, REPLICAS):
        fresh = (rng.random((n, dim), dtype=np.float32) - 0.5).astype(
            np.float32
        )
        for i in range(n):
            vec_ids.append(r * n + i)
            vecs.append(fresh[i].tolist())
            labels.append(int(rng.integers(0, max_label + 1)))
    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, OUT / "embeddings.parquet")
    print(f"embeddings: {len(vec_ids)} rows x {dim} dims")


def main() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(SEED)
    copy_dims(con)
    replicate_keyed(con, _strides(con))
    make_documents(con, rng)
    make_embeddings(con, rng)
    print(f"sf1 fixture written to {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
