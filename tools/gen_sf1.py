#!/usr/bin/env python3
"""Generate 10x (sf1) documents AND embeddings tables for the scale
spot-gate.

The driver ships sf0.001/0.01/0.1 only; this synthesizes an sf1-sized
documents.parquet in the SAME distribution family as the driver's
generator (empirical word frequencies, word-count distribution and
lang/source marginals measured from sf0.1), seeded, so the heavy
dedup/ANN families can be probed at 10x the bench scale.

embeddings.parquet is generated DOC-LINKED at full corpus coverage
(one vec per doc, vec_id = doc_id): sf0.1's embeddings measure as
unit-norm isotropic float32 vectors with random labels (the per-label
centroid norm is exactly the 1/sqrt(n_label) sampling noise of a mean
of random unit vectors, and the residual std is the isotropic 1/8),
so the sf1 family is seeded standard-normal / normalize / uniform
labels on the measured marginals. Earlier rounds copied the 2,000-row
sf0.1 table, which proved the semantic family's determinism at 10x
docs but never at 10x vector volume (VERDICT-r13 #1).

Other tables are copied from sf0.1.

Usage: python3 tools/gen_sf1.py /tmp/sf1 [n_docs=50000]
"""
import random
import shutil
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'").df()
    words = Counter()
    lengths = []
    for t in docs.text:
        ws = t.split()
        words.update(ws)
        lengths.append(len(ws))
    vocab = sorted(words)
    wts = [words[w] for w in vocab]
    langs = sorted(Counter(docs.lang).items())
    sources = sorted(Counter(docs.source).items())
    rnd = random.Random(42)
    rows = []
    for i in range(n_docs):
        n = rnd.choice(lengths)
        text = " ".join(rnd.choices(vocab, weights=wts, k=n))
        lang = rnd.choices([k for k, _ in langs],
                           weights=[v for _, v in langs])[0]
        source = rnd.choices([k for k, _ in sources],
                             weights=[v for _, v in sources])[0]
        rows.append((i, text, lang, source, len(text)))
    # Duplicate structure mirroring sf0.1's measured rate (8 dup groups /
    # 5000 docs): the last 0.4%% of slots become exact copies and the
    # 0.4%% before them near-copies (a few words swapped) of earlier
    # docs, so the dedup/LSH families have real candidates to find at 10x
    # rather than an all-unique corpus that trivially short-circuits.
    n_exact = n_docs // 250
    n_near = n_docs // 250
    for j in range(n_exact):
        i = n_docs - 1 - j
        src = rows[rnd.randrange(n_docs - n_exact - n_near)]
        rows[i] = (i, src[1], src[2], src[3], src[4])
    for j in range(n_near):
        i = n_docs - n_exact - 1 - j
        src = rows[rnd.randrange(n_docs - n_exact - n_near)]
        ws = src[1].split()
        for _ in range(max(1, len(ws) // 20)):
            ws[rnd.randrange(len(ws))] = rnd.choices(vocab, weights=wts)[0]
        text = " ".join(ws)
        rows[i] = (i, text, src[2], src[3], len(text))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                     "n_chars"])
    import os
    os.makedirs(out, exist_ok=True)
    df.to_parquet(f"{out}/documents.parquet", index=False)

    # doc-linked embeddings at full coverage: vec_id = doc_id, one
    # unit-norm isotropic float32 vector per doc, labels on sf0.1's
    # measured marginals (they are random there: centroid norm ==
    # mean-of-unit-vectors sampling noise)
    emb_labels = con.execute(
        f"SELECT label FROM '{SRC}/embeddings.parquet'").df().label
    lab_keys = sorted(Counter(emb_labels).keys())
    lab_wts = [int((emb_labels == k).sum()) for k in lab_keys]
    rng = np.random.RandomState(20260816)
    vecs = rng.standard_normal((n_docs, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # labels from the SAME dedicated RandomState as the vectors (after
    # the vecs draw, so both are fixed given the seed): drawing them
    # from the shared module-level `rnd` stream would re-assign every
    # label whenever doc-gen consumes a different number of draws,
    # silently weakening the seeded-reproducibility claim.
    lab_p = np.array(lab_wts, dtype=np.float64)
    labels = rng.choice(np.array(lab_keys), size=n_docs,
                        p=lab_p / lab_p.sum())
    emb = pd.DataFrame({
        "vec_id": np.arange(n_docs, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": np.array(labels, dtype=np.int32)})
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    pq.write_table(pa.Table.from_pandas(emb, schema=schema),
                   f"{out}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"wrote {out}/documents.parquet with {len(df)} docs; "
          f"vocab={len(vocab)} avg_words={sum(lengths)/len(lengths):.1f}; "
          f"embeddings {len(emb)} doc-linked unit vecs")


if __name__ == "__main__":
    main()
