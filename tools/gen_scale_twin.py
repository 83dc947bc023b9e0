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

# x250 (VERDICT r7 task 1) is a documents/embeddings-only tier: it
# exists to give the dedup/ANN production headliners a THIRD measured
# decade (50k -> 250k -> 1.25M docs); the relational families' ladder
# stops at x50 where their exponents were already fit over two decades.
SCALES = {
    "x10": (50_000, 20_000),
    "x50": (250_000, 100_000),
    "x250": (1_250_000, 500_000),
}


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

# --- web-realistic background twin (judge r9 task 1) ---------------------
# The standard twin's background 5-gram Jaccard is ADVERSARIAL by
# construction: its synthetic tail types ("w00042") all share the "w0.."
# character prefix, so unrelated docs overlap heavily at the character
# level (measured mean J 0.082 / p99 0.137 at 10k types) — useful as the
# miner's worst case, but no real corpus looks like that. The web twin
# keeps the SAME duplication structure (exact/near events, identical
# rates and mutation mechanics, same sidecar) while giving the
# background realistic character diversity: 100k types whose tails are
# random letter strings of length 3-10 (diverse grams, as real
# vocabulary is) under a flatter Zipf (s=1.05), with the fixture's own
# 31 head words kept most frequent (function words are what real docs
# legitimately share). Measured background on generated docs: mean
# 5-gram J ≈ 0.017, p99 ≈ 0.044 — order-of-magnitude below the
# adversarial twin and in the range real char-5-gram backgrounds
# occupy; at the miner's rows=5 banding the per-band collision rate is
# J^5 ≈ 1e-9 vs the adversarial twin's ~6e-6.
WEB_VOCAB_TYPES = 100_000
WEB_ZIPF_S = 1.05


def _web_vocab(head, rng: np.random.Generator) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 11, WEB_VOCAB_TYPES - len(head))
    tail = ["".join(letters[rng.integers(0, 26, ln)]) for ln in lens]
    return np.array(list(head) + tail)


def gen_documents(
    n: int,
    vocab,
    lang_dist,
    rng: np.random.Generator,
    vocab_arr: np.ndarray | None = None,
    zipf_s: float = 1.1,
):
    """Returns (documents_table, true_pairs_table). The second table is
    the GROUND-TRUTH dup sidecar: one (a, b, kind) row per duplication
    event the generator performed (kind 'exact' = verbatim copy,
    'near' = ~10% word mutation) — written as true_pairs.parquet next
    to documents.parquet so recall probes can measure the miner
    against known truth at scales where exact all-pairs verification
    is infeasible (judge r7: 'the 256-member cap's recall at 1.25M').
    Recording the sidecar adds NO rng draws, so documents.parquet is
    byte-identical with or without it. ``vocab_arr``/``zipf_s``
    override the background vocabulary (the web-realistic twin passes
    `_web_vocab`; the duplication structure is shared either way)."""
    lang_vals, lang_p = lang_dist
    n_sources = 20
    pair_a: list[int] = []
    pair_b: list[int] = []
    pair_kind: list[str] = []
    texts: list[str] = []
    doc_ids = np.arange(n, dtype=np.int64)
    if vocab_arr is None:
        # head = the fixture's own vocabulary, tail = synthetic types;
        # Zipf(s=1.1) weights so the head words stay the most frequent
        vocab_arr = np.array(
            list(vocab) + [f"w{i:05d}" for i in range(VOCAB_TYPES - len(vocab))]
        )
    ranks = np.arange(1, len(vocab_arr) + 1, dtype=np.float64)
    zipf_p = ranks ** -zipf_s
    zipf_p /= zipf_p.sum()
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.01:  # exact duplicate of an earlier doc
            src_i = int(rng.integers(0, i))
            texts.append(texts[src_i])
            pair_a.append(src_i)
            pair_b.append(i)
            pair_kind.append("exact")
        elif i > 10 and r < 0.05:  # near-dup: mutate ~10% of the words
            src_i = int(rng.integers(0, i))
            src = texts[src_i].split(" ")
            pair_a.append(src_i)
            pair_b.append(i)
            pair_kind.append("near")
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
    docs_tbl = pa.table(
        {
            "doc_id": doc_ids,
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": n_chars,
        }
    )
    # explicit string type: with zero duplication events (tiny n) an
    # empty Python list would infer a null-typed 'kind' column and
    # break readers that groupBy('kind') (advisor r8)
    pairs_tbl = pa.table(
        {
            "a": np.array(pair_a, dtype=np.int64),
            "b": np.array(pair_b, dtype=np.int64),
            "kind": pa.array(pair_kind, type=pa.string()),
        }
    )
    return docs_tbl, pairs_tbl


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


def gen_embeddings(n: int, by_label, dim: int, rng: np.random.Generator,
                   anisotropic: bool = False):
    n_labels = len(by_label)
    labels = rng.integers(0, n_labels, size=n)
    # unit cluster directions; noise std from s^2/(s^2 + d*sigma^2) =
    # WITHIN_COS with s = 1
    dirs = rng.standard_normal((n_labels, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sigma = np.sqrt((1.0 / WITHIN_COS - 1.0) / dim)
    out = dirs[labels] + sigma * rng.standard_normal((n, dim))
    if anisotropic:
        # "rogue dimension" distortion (written as embeddings_aniso):
        # a few directions carry ~60x the variance — the shape every
        # trained encoder's output has (anisotropy papers: a handful
        # of dominant dims dominate cosine). Measured effect: IVF
        # same-label purity 0.605 raw vs 0.947 whitened at 3k vecs —
        # the geometry sim_knn_join_ivf_whitened exists for.
        q = np.linalg.qr(rng.standard_normal((dim, dim)))[0]
        scales = np.ones(dim)
        scales[:_ANISO_ROGUE_DIMS] = _ANISO_ROGUE_SCALE
        out = out @ (q @ np.diag(scales) @ q.T).T
    out = out.astype(np.float32)
    return pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(out), type=pa.list_(pa.float32())),
            "label": labels.astype(np.int32),
        }
    )


_ANISO_ROGUE_DIMS = 4
_ANISO_ROGUE_SCALE = 60.0


# ---------------------------------------------------------------------------
# Relational / events twins (VERDICT r6 task 1): the TPC-H core and the
# behavioral/streaming families had no measured evidence past sf0.1.
# These reproduce the sf0.1 fixture's OBSERVED generative structure at
# 10x/50x while preserving every key-cardinality ratio (orders/customer
# = 10, lineitem/orders ≈ 4, part = lineitem/30, supplier = lineitem/600)
# and the events table's sessionization structure (uniform (user, ts)
# over the same 30-day window with users scaled 10x/50x, so the
# per-user event rate — and hence the inter-event-gap distribution the
# sessionizers cut on — is IDENTICAL to the fixture's). region/nation
# are fixed-size dims at every scale (as in TPC-H itself) and are
# copied from the fixture verbatim. Categorical vocabularies
# (mktsegment, p_type, priorities, event types, …) are read from the
# fixture so literal-filtering queries see the same domains. Measured
# fixture distributions mirrored: o_totalprice ~ U(1000, 500000),
# l_quantity ~ U{1..50}, l_extendedprice ~ U(900, 105000), discounts
# U(0, .10) / tax U(0, .08) at 2dp, shipdate an independent day-aligned
# uniform over its own window (measured: shipdate ⟂ orderdate, diff
# spans ±2400 days), lines/order ~ 1+Poisson(3) (measured mean 4.0,
# max 17), linenumber = 1+(seq mod 7) (measured cap 7), event value ~
# Exp(50) (measured median 34.7 ≈ 50·ln 2), props = {"k": U{0..99}}.
# ---------------------------------------------------------------------------

TPCH_MULT = {"x10": 10, "x50": 50}

_BASE_COUNTS = {  # sf0.1 row counts the multipliers scale from
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events_users": 1_500,
    "events": 100_000,
}

_DAY_US = 86_400_000_000


def _cat(base: str, table: str, col: str) -> np.ndarray:
    tbl = pq.read_table(os.path.join(base, f"{table}.parquet"), columns=[col])
    return np.array(sorted(set(tbl.column(col).to_pylist())))


def _ts_days(start: str, days: np.ndarray) -> pa.Array:
    origin = np.datetime64(start, "us").astype(np.int64)
    return pa.array(origin + days.astype(np.int64) * _DAY_US, pa.timestamp("us"))


def gen_tpch(base: str, out_dir: str, mult: int, rng: np.random.Generator) -> None:
    n_cust = _BASE_COUNTS["customer"] * mult
    n_supp = _BASE_COUNTS["supplier"] * mult
    n_part = _BASE_COUNTS["part"] * mult
    n_ord = _BASE_COUNTS["orders"] * mult

    # fixed dims: verbatim fixture copies (5 regions / 25 nations)
    for dim_table in ("region", "nation"):
        pq.write_table(
            pq.read_table(os.path.join(base, f"{dim_table}.parquet")),
            os.path.join(out_dir, f"{dim_table}.parquet"),
        )

    segments = _cat(base, "customer", "c_mktsegment")
    pq.write_table(
        pa.table(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": segments[rng.integers(0, len(segments), n_cust)],
            }
        ),
        os.path.join(out_dir, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": np.arange(n_supp, dtype=np.int64),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
        os.path.join(out_dir, "supplier.parquet"),
    )
    pnames = _cat(base, "part", "p_name")
    ptypes = _cat(base, "part", "p_type")
    pbrands = _cat(base, "part", "p_brand")
    pkeys = np.arange(n_part, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pkeys,
                "p_name": pnames[rng.integers(0, len(pnames), n_part)],
                "p_brand": pbrands[rng.integers(0, len(pbrands), n_part)],
                "p_type": ptypes[rng.integers(0, len(ptypes), n_part)],
                "p_size": rng.integers(1, 51, n_part).astype(np.int32),
                # fixture rule: 900.0 + (partkey % 1000) / 10
                "p_retailprice": 900.0 + (pkeys % 1000) / 10.0,
            }
        ),
        os.path.join(out_dir, "part.parquet"),
    )

    statuses = _cat(base, "orders", "o_orderstatus")
    priorities = _cat(base, "orders", "o_orderpriority")
    okeys = np.arange(n_ord, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": okeys,
                "o_custkey": rng.integers(0, n_cust, n_ord),
                "o_orderstatus": statuses[rng.integers(0, len(statuses), n_ord)],
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _ts_days(
                    "1995-01-01", rng.integers(0, 2405, n_ord)
                ),
                "o_orderpriority": priorities[
                    rng.integers(0, len(priorities), n_ord)
                ],
            }
        ),
        os.path.join(out_dir, "orders.parquet"),
    )

    lines = 1 + rng.poisson(3.0, n_ord)
    n_li = int(lines.sum())
    lkeys = np.repeat(okeys, lines)
    seq = np.arange(n_li, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lines)[:-1])), lines
    )
    flags = np.array(["A", "N", "R"])
    lstat = np.array(["F", "O"])
    pq.write_table(
        pa.table(
            {
                "l_orderkey": lkeys,
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_supp, n_li),
                "l_linenumber": (1 + seq % 7).astype(np.int32),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.uniform(0, 0.10, n_li), 2),
                "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
                "l_returnflag": flags[rng.integers(0, 3, n_li)],
                "l_linestatus": lstat[rng.integers(0, 2, n_li)],
                "l_shipdate": _ts_days("1995-01-02", rng.integers(0, 2499, n_li)),
            }
        ),
        os.path.join(out_dir, "lineitem.parquet"),
    )

    n_users = _BASE_COUNTS["events_users"] * mult
    n_ev = _BASE_COUNTS["events"] * mult
    etypes = _cat(base, "events", "event_type")
    # uniform (user, ts) over the fixture's 30-day window — per-user
    # rate (≈66 events/user) and gap distribution preserved exactly
    origin = np.datetime64("2024-01-01", "us").astype(np.int64)
    span_us = 30 * _DAY_US
    ks = rng.integers(0, 100, n_ev)
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(n_ev, dtype=np.int64),
                "ts": pa.array(
                    origin + rng.integers(0, span_us, n_ev), pa.timestamp("us")
                ),
                "user_id": rng.integers(0, n_users, n_ev),
                "event_type": etypes[rng.integers(0, len(etypes), n_ev)],
                "value": np.round(rng.exponential(50.0, n_ev), 2),
                "props": [f'{{"k": {k}}}' for k in ks],
            }
        ),
        os.path.join(out_dir, "events.parquet"),
    )
    print(
        f"  tpch mult={mult}: customer {n_cust}, orders {n_ord}, "
        f"lineitem {n_li}, events {n_ev} ({n_users} users)"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--only",
        choices=["docs", "tpch"],
        default=None,
        help="regenerate just the document/embedding twins or just the "
        "relational/events twins (default: both)",
    )
    ap.add_argument(
        "--background",
        choices=["adversarial", "web"],
        default="adversarial",
        help="'web' writes web-realistic-background document twins "
        "(diverse-character vocabulary, measured background 5-gram "
        "J ~ 0.017 vs the standard twin's adversarial 0.082) to "
        ".scale_twin/web_<tier>/ — documents + true_pairs only (the "
        "embedding/TPC-H side is background-independent)",
    )
    ap.add_argument(
        "--tier",
        choices=list(SCALES),
        default=None,
        help="regenerate just one tier (default: all); generation is "
        "seeded per-tier so a single-tier run is byte-identical to the "
        "same tier from a full run",
    )
    args = ap.parse_args()

    if args.only != "tpch":
        vocab, lang_dist, by_label, dim = load_fixture_stats(args.base)
        print(
            f"fixture stats: |vocab|={len(vocab)}, labels={len(by_label)}, dim={dim}"
        )
    if args.background == "web":
        # web twins: documents + sidecar only, under web_<tier>/ — the
        # vocabulary is built once (seeded separately from the doc rng
        # so each tier's doc stream stays tier-seeded like the standard
        # twins)
        web_vocab = _web_vocab(list(vocab), np.random.default_rng(99))
        for name, (n_docs, _) in SCALES.items():
            if args.tier is not None and name != args.tier:
                continue
            out_dir = os.path.join(OUT_BASE, f"web_{name}")
            os.makedirs(out_dir, exist_ok=True)
            docs_tbl, pairs_tbl = gen_documents(
                n_docs,
                vocab,
                lang_dist,
                np.random.default_rng(42),
                vocab_arr=web_vocab,
                zipf_s=WEB_ZIPF_S,
            )
            pq.write_table(docs_tbl, os.path.join(out_dir, "documents.parquet"))
            pq.write_table(pairs_tbl, os.path.join(out_dir, "true_pairs.parquet"))
            print(f"web_{name}: {n_docs} docs -> {out_dir}")
        return
    for name, (n_docs, n_vecs) in SCALES.items():
        if args.tier is not None and name != args.tier:
            continue
        out_dir = os.path.join(OUT_BASE, name)
        os.makedirs(out_dir, exist_ok=True)
        if args.only != "tpch":
            rng = np.random.default_rng(42)
            docs_tbl, pairs_tbl = gen_documents(n_docs, vocab, lang_dist, rng)
            pq.write_table(docs_tbl, os.path.join(out_dir, "documents.parquet"))
            pq.write_table(pairs_tbl, os.path.join(out_dir, "true_pairs.parquet"))
            pq.write_table(
                gen_embeddings(n_vecs, by_label, dim, rng),
                os.path.join(out_dir, "embeddings.parquet"),
            )
            pq.write_table(
                gen_embeddings(
                    n_vecs, by_label, dim, np.random.default_rng(43), anisotropic=True
                ),
                os.path.join(out_dir, "embeddings_aniso.parquet"),
            )
            print(f"{name}: {n_docs} docs, {n_vecs} vecs -> {out_dir}")
        if args.only != "docs" and name in TPCH_MULT:
            gen_tpch(args.base, out_dir, TPCH_MULT[name], np.random.default_rng(7))


if __name__ == "__main__":
    main()
