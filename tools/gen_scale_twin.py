"""Generate 10x/50x synthetic twins of the documents/embeddings
fixtures so the dedup/ANN/text scaling exponents are fit over >=2
decades instead of the single 500->5k decade the driver fixtures span
(VERDICT r4 task 3).

The twins reproduce the fixture's OBSERVED generative structure (not
its bytes): documents draw 10-100 words from a Zipf-weighted
vocabulary headed by the fixture's own 31 words, with ~5% of docs
created as mutated near-copies of an earlier doc (the near-dup
cluster structure the dedup operators mine) and a small exact-dup
tail; embeddings are label-count-matched Gaussian CLUSTERS with
realistic separation (see WITHIN_COS — the fixture's own embeddings
are isotropic noise, an artifact no trained embedding corpus shares).
Seeded, deterministic.

Why the vocabulary grows past the fixture's 31 words: a 31-word
closed vocabulary puts every RANDOM doc pair at ~0.3 character-5-gram
Jaccard, so LSH band collisions — and any candidate-generation scheme
— degenerate toward all-pairs as n grows. That is a fixture artifact,
not a property any real corpus shares (web-scale background Jaccard
is <0.01; vocabulary grows with corpus size per Heaps' law). The twin
therefore extends the head vocabulary with a Zipf tail (10k types),
which keeps true near-dup pairs (mutated copies, J >= 0.6) intact
while giving unrelated docs realistic dissimilarity — measuring the
OPERATOR's growth rather than the toy vocabulary's.

Output: .scale_twin/x10/{documents,embeddings}.parquet (50k docs /
20k vecs) and .scale_twin/x50 (250k / 100k). Only the two tables the
twin probes drive — the TPC-H side keeps its own sf ladder.

Usage: python tools/gen_scale_twin.py [--base /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_BASE = os.path.join(REPO, ".scale_twin")

SCALES = {"x10": (50_000, 20_000), "x50": (250_000, 100_000)}


def load_fixture_stats(base: str):
    docs = pq.read_table(os.path.join(base, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.split(" ")})
    langs = docs.column("lang").to_pylist()
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()

    emb = pq.read_table(os.path.join(base, "embeddings.parquet"))
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(emb.column("label").to_pylist())
    by_label = {}
    for lab in np.unique(labels):
        sel = vecs[labels == lab]
        by_label[int(lab)] = (sel.mean(axis=0), sel.std(axis=0))
    return vocab, (list(lang_vals), lang_p), by_label, vecs.shape[1]


VOCAB_TYPES = 10_000  # Zipf-tail vocabulary size (Heaps-law realism)


def gen_documents(n: int, vocab, lang_dist, rng: np.random.Generator):
    lang_vals, lang_p = lang_dist
    n_sources = 20
    texts: list[str] = []
    doc_ids = np.arange(n, dtype=np.int64)
    # head = the fixture's own vocabulary, tail = synthetic types;
    # Zipf(s=1.1) weights so the head words stay the most frequent
    vocab_arr = np.array(
        list(vocab) + [f"w{i:05d}" for i in range(VOCAB_TYPES - len(vocab))]
    )
    ranks = np.arange(1, len(vocab_arr) + 1, dtype=np.float64)
    zipf_p = ranks ** -1.1
    zipf_p /= zipf_p.sum()
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.01:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.05:  # near-dup: mutate ~10% of the words
            src = texts[rng.integers(0, i)].split(" ")
            k = max(1, len(src) // 10)
            idx = rng.choice(len(src), size=k, replace=False)
            repl = rng.choice(len(vocab_arr), size=k, p=zipf_p)
            for j, w in zip(idx, repl):
                src[j] = vocab_arr[w]
            texts.append(" ".join(src))
        else:
            ln = rng.integers(10, 101)
            texts.append(" ".join(vocab_arr[rng.choice(len(vocab_arr), ln, p=zipf_p)]))
    langs = rng.choice(lang_vals, size=n, p=lang_p)
    sources = [f"src{rng.integers(0, n_sources)}" for _ in range(n)]
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_ids,
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": n_chars,
        }
    )


# Within-cluster cosine for the synthetic embedding clusters. The
# FIXTURE's embeddings are isotropic noise (measured: within-label
# AND cross-label mean cosine both 0.000; a vector's true top-5
# neighbors share its label 9% of the time — chance). That is a
# fixture artifact no real embedding corpus shares: trained text/image
# embeddings are strongly clustered (within-topic cosine ~0.5-0.7 for
# sentence-embedding families), and it is exactly that structure that
# makes sublinear ANN possible — on isotropic data, concentration of
# measure makes every index degenerate to exhaustive search. The twin
# therefore gives each label a unit-direction mean with noise scaled
# so E[within-label cosine] ≈ this value (cross-label ≈ 0), measuring
# the INDEX's behavior on realistic geometry rather than the noise
# floor's.
WITHIN_COS = 0.55


def gen_embeddings(n: int, by_label, dim: int, rng: np.random.Generator):
    n_labels = len(by_label)
    labels = rng.integers(0, n_labels, size=n)
    # unit cluster directions; noise std from s^2/(s^2 + d*sigma^2) =
    # WITHIN_COS with s = 1
    dirs = rng.standard_normal((n_labels, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sigma = np.sqrt((1.0 / WITHIN_COS - 1.0) / dim)
    out = (
        dirs[labels] + sigma * rng.standard_normal((n, dim))
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(out), type=pa.list_(pa.float32())),
            "label": labels.astype(np.int32),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    vocab, lang_dist, by_label, dim = load_fixture_stats(args.base)
    print(f"fixture stats: |vocab|={len(vocab)}, labels={len(by_label)}, dim={dim}")
    for name, (n_docs, n_vecs) in SCALES.items():
        rng = np.random.default_rng(42)
        out_dir = os.path.join(OUT_BASE, name)
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            gen_documents(n_docs, vocab, lang_dist, rng),
            os.path.join(out_dir, "documents.parquet"),
        )
        pq.write_table(
            gen_embeddings(n_vecs, by_label, dim, rng),
            os.path.join(out_dir, "embeddings.parquet"),
        )
        print(f"{name}: {n_docs} docs, {n_vecs} vecs -> {out_dir}")


if __name__ == "__main__":
    main()
