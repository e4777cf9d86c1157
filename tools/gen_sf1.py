#!/usr/bin/env python3
"""Dev-only sf1 fixture generator for the round-15 scale soak.

Mirrors the driver fixtures' generative shape at 10x the sf0.1 scale
(50,000 documents / 20,000 dim-64 embeddings, seed 42): the same 30-word
uniform vocabulary plus the rare 'dup' marker, the same doc-length band
(19-90 tokens), 5 langs and 20 sources at the sf0.1 proportions, planted
exact-duplicate and near-duplicate runs for the dedup walks, and 10
gaussian label clusters with planted near-identical vector pairs for the
semantic/ANN paths. NOT driver data — written to testdata_sf1/ (ignored
by git) purely so docs/perf/SOAK_r15_sf1.txt can probe the blocking-knob
fences at 10x bench scale. Uses driver-side python libs only.

Usage: python3 tools/gen_sf1.py [outDir] [vocabSize] [zipfA]

Round 16 (verdict ask #2): with vocabSize given (e.g. 10000), the
30-word uniform vocabulary is replaced by a vocabSize-word Zipf(zipfA,
default 1.1) vocabulary at the SAME doc count — the realistic-sparsity
twin. The dense fixture makes ~half of all doc pairs true near-dups
(its own soak's "pathologically self-similar" caveat), so it cannot
separate true-pair-density cost from blocking cost; the sparse twin's
true pairs come only from the planted duplicate runs (O(docs)), which
is the real-web shape.
"""
import os, sys, random
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
os.makedirs(out, exist_ok=True)
rng = random.Random(42)
nprng = np.random.default_rng(42)

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "row",
         "the", "a", "agg", "key", "query", "scan", "batch"]
VOCAB_WEIGHTS = None
if len(sys.argv) > 2:
    vsize = int(sys.argv[2])
    zipf_a = float(sys.argv[3]) if len(sys.argv) > 3 else 1.1
    # grow with synthetic words or shrink to a prefix — either way the
    # weight list length must equal the vocabulary length
    VOCAB = (VOCAB + [f"w{i}" for i in range(len(VOCAB), vsize)])[:vsize]
    VOCAB_WEIGHTS = [1.0 / (r + 1) ** zipf_a for r in range(len(VOCAB))]

def pick_words(n):
    if VOCAB_WEIGHTS is None:
        return [rng.choice(VOCAB) for _ in range(n)]
    return rng.choices(VOCAB, weights=VOCAB_WEIGHTS, k=n)
LANGS = ["en"] * 41 + ["zh"] * 15 + ["es"] * 15 + ["fr"] * 15 + ["de"] * 14

N_DOCS = 50_000
doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
i = 0
while i < N_DOCS:
    n = rng.randint(19, 90)
    words = pick_words(n)
    if rng.random() < 0.005:
        words[rng.randrange(n)] = "dup"
    text = " ".join(words)
    lang = rng.choice(LANGS)
    src = f"src{rng.randrange(20)}"
    doc_ids.append(i); texts.append(text); langs.append(lang)
    sources.append(src); n_chars.append(len(text)); i += 1
    # planted near-dup run: 2% of docs get 1-3 copies with ~1 word mutated
    # (jaccard >= 0.9 on token sets), same (lang, source) block so the
    # blocked pair walks can find them
    if rng.random() < 0.02 and i < N_DOCS:
        for _ in range(rng.randint(1, 3)):
            if i >= N_DOCS:
                break
            w2 = list(words)
            w2[rng.randrange(n)] = rng.choice(VOCAB)
            t2 = " ".join(w2)
            doc_ids.append(i); texts.append(t2); langs.append(lang)
            sources.append(src); n_chars.append(len(t2)); i += 1
    # planted exact dup: 0.3%
    if rng.random() < 0.003 and i < N_DOCS:
        doc_ids.append(i); texts.append(text); langs.append(lang)
        sources.append(src); n_chars.append(len(text)); i += 1

pq.write_table(pa.table({
    "doc_id": pa.array(doc_ids, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array(n_chars, pa.int64()),
}), f"{out}/documents.parquet")

N_VECS = 20_000
DIM = 64
centers = nprng.normal(0, 1.0, size=(10, DIM)).astype(np.float32)
vec_ids, embs, labels = [], [], []
j = 0
while j < N_VECS:
    lbl = int(nprng.integers(0, 10))
    v = centers[lbl] + nprng.normal(0, 0.35, DIM).astype(np.float32)
    vec_ids.append(j); embs.append(v.tolist()); labels.append(lbl); j += 1
    # planted near-identical pair (cosine ~0.999) for the semantic dedup
    if nprng.random() < 0.01 and j < N_VECS:
        v2 = v + nprng.normal(0, 0.005, DIM).astype(np.float32)
        vec_ids.append(j); embs.append(v2.tolist()); labels.append(lbl); j += 1

pq.write_table(pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array(embs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}), f"{out}/embeddings.parquet")
print(f"wrote {out}/documents.parquet ({len(doc_ids)}) and "
      f"{out}/embeddings.parquet ({len(vec_ids)})")
