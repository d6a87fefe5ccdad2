"""Tests for the training-data operators: dedup suite, text stats,
similarity search."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from sits_classification_ray.stages.dedup_docs import (
    MinHasher,
    SimHasher,
    embedding_near_dup,
    exact_dedup,
    ngram_jaccard_pairs,
)
from sits_classification_ray.stages.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    train_centroids,
)
from sits_classification_ray.stages.textstats import LangId, text_stats


@pytest.fixture(scope="module")
def docs_ds():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",        # exact dup
        "the quick brown fox jumps over the lazy cat",        # near dup
        "completely different content about databases and queries",
        "der schnelle braune fuchs springt über den faulen hund und die katze",
        "le renard brun rapide saute par dessus le chien paresseux dans le jardin",
        "short",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_exact_dedup(docs_ds):
    out = exact_dedup(docs_ds).to_pandas().sort_values("doc_id")
    assert len(out) == 6                       # 7 docs, one exact dup pair
    assert out[out["doc_id"] == 0]["n_copies"].iloc[0] == 2
    assert (out[out["doc_id"] != 0]["n_copies"] == 1).all()
    assert 1 not in set(out["doc_id"])         # min id survives


def test_minhash_finds_near_dups(docs_ds):
    pairs = ngram_jaccard_pairs(docs_ds, threshold=0.5).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in found                     # exact dup: jaccard 1.0
    assert (0, 2) in found or (1, 2) in found  # near dup
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert exact["jaccard"].iloc[0] == 1.0


def test_minhash_signature_deterministic():
    a = MinHasher(seed=1).signature("hello world, this is a document")
    b = MinHasher(seed=1).signature("hello world, this is a document")
    np.testing.assert_array_equal(a, b)


def test_simhash_similar_docs_close():
    sh = SimHasher()
    a = int(sh.simhash("the quick brown fox jumps over the lazy dog"))
    b = int(sh.simhash("the quick brown fox jumps over the lazy cat"))
    c = int(sh.simhash("completely different content about databases"))
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


def test_text_stats(docs_ds):
    out = text_stats(docs_ds).to_pandas().sort_values("doc_id")
    row = out.iloc[0]
    assert row["n_tokens"] == 9
    assert row["n_words"] == 9
    assert row["n_chars"] == len("the quick brown fox jumps over the lazy dog")
    assert row["chars_per_token"] == row["n_chars"] / row["n_tokens"]


def test_langid():
    lid = LangId()
    assert lid.classify("the cat and the dog are in the house") == "en"
    assert lid.classify("der hund und die katze sind nicht da") == "de"
    assert lid.classify("le chien est dans le jardin avec une balle") == "fr"
    assert lid.classify("你好世界这是一个测试文档今天天气很好") == "zh"
    assert lid.classify("") == "und"


@pytest.fixture(scope="module")
def emb_ds():
    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    base[7] = base[3] + rng.normal(scale=0.01, size=16)  # planted near-dup
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in base],
                              pa.list_(pa.float32())),
    }))


def test_embedding_near_dup(emb_ds):
    out = embedding_near_dup(emb_ds, threshold=0.99).to_pandas()
    assert {(3, 7)} == set(map(tuple, out[["id_a", "id_b"]].to_numpy()))


def test_brute_force_topk_self_is_best(emb_ds):
    rows = {r["vec_id"]: np.asarray(r["embedding"])
            for r in emb_ds.take_all()}
    out = brute_force_topk(emb_ds, {3: rows[3]}, k=5)
    assert out.iloc[0]["vec_id"] == 3          # self first (score 1.0)
    assert out.iloc[1]["vec_id"] == 7          # planted near-dup second
    assert len(out) == 5


def test_ivf_recalls_planted_neighbor(emb_ds):
    rows = {r["vec_id"]: np.asarray(r["embedding"])
            for r in emb_ds.take_all()}
    cent = train_centroids(emb_ds, n_lists=4, iters=5, seed=0)
    assigned = ivf_assign(emb_ds, cent)
    out = ivf_topk(assigned, cent, {3: rows[3]}, k=5, n_probe=2)
    got = out[out["query_id"] == 3]["vec_id"].tolist()
    assert got[0] == 3 and 7 in got[:2]


def test_fingerprint_matches_naive_polynomial():
    from sits_classification_ray.stages.textstats import (_FP_BASE, _FP_OFF,
                                                          fingerprint_batch)

    def naive(t: str) -> np.int64:
        data = t.encode()
        with np.errstate(over="ignore"):
            h = _FP_OFF
            for b in data:
                h = h * _FP_BASE + np.uint64(b)
            return np.int64(h.astype(np.int64))

    texts = ["hello world", "", "a", "päällystö δοκιμή", "x" * 3000,
             "hello worle"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert got == [int(naive(x)) for x in texts]
    assert len(set(got)) == len(got)          # all distinct here


def test_verify_jaccard_distributed_join(docs_ds):
    """The join-based verify must equal a local shingle-Jaccard."""
    from sits_classification_ray.stages.dedup_docs import verify_jaccard

    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([0, 0, 3], pa.int64()),
        "id_b": pa.array([1, 2, 4], pa.int64()),
    }))
    out = (verify_jaccard(pairs, docs_ds, shingle_k=5, threshold=0.0)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    texts = {r["doc_id"]: r["text"] for r in docs_ds.take_all()}

    def jac(a, b):
        sa = {texts[a][i:i + 5] for i in range(len(texts[a]) - 4)} or {texts[a]}
        sb = {texts[b][i:i + 5] for i in range(len(texts[b]) - 4)} or {texts[b]}
        return len(sa & sb) / max(1, len(sa | sb))

    assert out["id_a"].tolist() == [0, 0, 3]
    np.testing.assert_allclose(
        out["jaccard"].to_numpy(),
        [jac(0, 1), jac(0, 2), jac(3, 4)])
    assert out["jaccard"].iloc[0] == 1.0


def test_top_k_per_group(docs_ds):
    from sits_classification_ray.stages.sampling import top_k_per_group

    lens = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "grp": pa.array(["a", "a", "a", "a", "b", "b", "b", "b"]),
        "score": pa.array([5, 9, 9, 1, 2, 8, 3, 8], pa.int64()),
    }))
    out = (top_k_per_group(lens, ["grp"], "score", k=2, tie_col="doc_id")
           .to_pandas().sort_values(["grp", "doc_id"]).reset_index(drop=True))
    # a: scores 9(doc1),9(doc2); b: 8(doc5),8(doc7)
    assert out["doc_id"].tolist() == [1, 2, 5, 7]


def test_url_canonicalization_rules():
    from sits_classification_ray.stages.urlnorm import canonicalize_url

    cases = {
        "HTTP://Example.COM:80/a?b=2&a=1#frag": "http://example.com/a?a=1&b=2",
        "https://Example.com:443": "https://example.com/",
        "https://example.com:8443/x": "https://example.com:8443/x",
        "http://example.com/path/": "http://example.com/path/",
        "https://site.example.com/u/3": "https://site.example.com/u/3",
    }
    for raw, want in cases.items():
        assert canonicalize_url(raw) == want, raw


def test_repetition_matches_bruteforce():
    import random

    from sits_classification_ray.stages.textstats import repetition_batch

    random.seed(11)
    texts = ["the cat sat the cat sat on mat", "a a a a a", "", "one",
             "x y", "x y x y x y z", " ", "a  b"]
    texts += [" ".join(random.choice(["a", "b", "c", "dd", "e f"])
                       for _ in range(random.randint(0, 40)))
              for _ in range(60)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    out = repetition_batch(t).to_pandas()

    def brute(s):
        toks = s.split(" ")
        bg = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        tg = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        frac = lambda l: 0.0 if not l else 1.0 - len(set(l)) / len(l)
        return len(bg), frac(bg), frac(tg)

    for i, s in enumerate(texts):
        nb, f2, f3 = brute(s)
        r = out.iloc[i]
        assert (r["n_2grams"], r["dup_2gram_frac"],
                r["dup_3gram_frac"]) == (nb, f2, f3), (i, s)


def test_repetition_batch_boundary_independent(docs_ds):
    """Splitting the dataset into many blocks must not change any
    per-document result (factorize codes are batch-local)."""
    from sits_classification_ray.stages.textstats import repetition

    a = (repetition(docs_ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (repetition(docs_ds.repartition(7)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_tfidf_topk_hand_computed():
    import math

    from sits_classification_ray.stages.textstats import tfidf_topk

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["apple banana apple", "banana cherry", "cherry cherry date"],
    })
    out = (tfidf_topk(rd.from_pandas(docs), k=1).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # df: apple 1, banana 2, cherry 2, date 1; N = 3
    want = {
        1: ("apple", round((2 / 3) * math.log(3 / 1), 6)),
        2: ("banana", round((1 / 2) * math.log(3 / 2), 6)),
        3: ("cherry", round((2 / 3) * math.log(3 / 2), 6)),
    }
    # doc 3: cherry tf=2/3 idf=ln(1.5) vs date tf=1/3 idf=ln(3)
    assert round((2 / 3) * math.log(3 / 2), 6) > \
        round((1 / 3) * math.log(3 / 1), 6) is False or True
    for _, r in out.iterrows():
        tok, score = want[r["doc_id"]]
        best = max(
            ((t, round((c / n) * math.log(3 / df), 6))
             for t, c, n, df in {
                 1: [("apple", 2, 3, 1), ("banana", 1, 3, 2)],
                 2: [("banana", 1, 2, 2), ("cherry", 1, 2, 2)],
                 3: [("cherry", 2, 3, 2), ("date", 1, 3, 1)],
             }[r["doc_id"]]),
            key=lambda x: (x[1], [chr(255 - ord(c)) for c in x[0]]))
        assert (r["token"], r["tfidf"]) == best, r


def test_tfidf_partition_invariant(docs_ds):
    from sits_classification_ray.stages.textstats import tfidf_topk

    a = (tfidf_topk(docs_ds, k=2).to_pandas()
         .sort_values(["doc_id", "token"]).reset_index(drop=True))
    b = (tfidf_topk(docs_ds.repartition(9), k=2).to_pandas()
         .sort_values(["doc_id", "token"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_simhash_drift_semantics():
    from sits_classification_ray.stages.dedup_docs import simhash_drift

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600_000_000, "us")
    rows = [
        # url a: identical text twice, then a big change
        ("a", t0, "the quick brown fox jumps over the lazy dog"),
        ("a", t0 + h, "the quick brown fox jumps over the lazy dog"),
        ("a", t0 + 2 * h, "completely different content now entirely"),
        # url b: single snapshot -> no drift row
        ("b", t0, "lonely page"),
        # url a duplicate snapshot at t0 (same ts) -> deduped
        ("a", t0, "the quick brown fox jumps over the lazy dog"),
    ]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    df["text_len"] = df["text"].str.len().astype(np.int64)
    out = (simhash_drift(rd.from_pandas(df)).to_pandas()
           .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    assert list(out["url"]) == ["a", "a"]
    assert out.loc[0, "hamming"] == 0          # identical text
    assert out.loc[1, "hamming"] > 0           # changed text
    assert out.loc[0, "prev_ts"] == t0
    assert out.loc[1, "prev_ts"] == t0 + h


def test_clean_corpus_filters_and_dedups():
    from sits_classification_ray.stages.textstats import clean_corpus

    good = "the fast data " * 10 + "extra words here make it longer now ok"
    docs = pd.DataFrame({
        "doc_id": [5, 3, 9, 1],
        "text": [good, good,                       # dup -> keep id 3
                 "short text",                     # < min_tokens
                 "a a a a a a a a a a a a a a a a a a a a a a a a a a"],
    })
    out = (clean_corpus(rd.from_pandas(docs), min_tokens=10,
                        max_stopword_ratio=0.5, max_dup_2gram_frac=0.9)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # the all-'a' doc has dup_2gram_frac ~1 -> only the dup pair survives
    assert list(out["doc_id"]) == [3]
    assert out.loc[0, "n_tokens"] == len(good.split(" "))


def test_connected_components_chain_and_singleton_pairs():
    from sits_classification_ray.stages.dedup_docs import \
        connected_components

    # a 9-hop chain (needs several propagation rounds), a 2-clique,
    # and a star — cluster_id must be the component minimum everywhere
    chain = [(i, i + 1) for i in range(10, 19)]
    pairs = pd.DataFrame(chain + [(101, 100), (200, 201), (200, 202)],
                         columns=["id_a", "id_b"])
    out = (connected_components(rd.from_pandas(pairs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert all(got[v] == 10 for v in range(10, 20))
    assert got[100] == 100 and got[101] == 100
    assert got[200] == 200 and got[201] == 200 and got[202] == 200
    assert len(got) == 15


def test_connected_components_empty():
    from sits_classification_ray.stages.dedup_docs import \
        connected_components

    pairs = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64)})
    out = connected_components(rd.from_pandas(pairs))
    # to_pandas() on a 0-row dataset drops columns; check the schema
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "cluster_id"]


def test_near_dup_keep_one_drops_non_canonical():
    from sits_classification_ray.stages.dedup_docs import near_dup_keep_one

    docs = pd.DataFrame({"doc_id": np.arange(1, 8, dtype=np.int64),
                         "n_chars": np.arange(1, 8, dtype=np.int64) * 10})
    # clusters {2,5,6} and {3,7}; 1 and 4 untouched
    pairs = pd.DataFrame({"id_a": [5, 6, 7], "id_b": [2, 5, 3]})
    out = (near_dup_keep_one(rd.from_pandas(docs), rd.from_pandas(pairs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    # int dtype survives the null-padded exchange (cast-back)
    assert out["n_chars"].dtype == np.int64
    assert list(out["n_chars"]) == [10, 20, 30, 40]


def test_scrub_pii_redacts_and_counts():
    from sits_classification_ray.stages.textstats import scrub_pii

    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": [
            "mail a@b.org or c.d+x@e-f.co.uk, host 192.168.0.1 now",
            "call +49 30 1234-5678 or 555 867 5309 today",
            "nothing sensitive here",
        ],
    })
    out = (scrub_pii(rd.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "n_email"] == 2
    assert out.loc[0, "n_ipv4"] == 1
    assert out.loc[0, "scrubbed"] == \
        "mail <EMAIL> or <EMAIL>, host <IP> now"
    assert out.loc[1, "n_phone"] == 2
    assert out.loc[1, "scrubbed"] == "call <PHONE> or <PHONE> today"
    assert out.loc[2, "scrubbed"] == "nothing sensitive here"
    assert (out.loc[2, ["n_email", "n_ipv4", "n_phone"]] == 0).all()


def test_label_centroids_match_numpy(emb_ds):
    from sits_classification_ray.stages.similarity import label_centroids

    with_labels = emb_ds.map_batches(
        lambda df: df.assign(label=(df["vec_id"] % 3).astype(np.int64)),
        batch_format="pandas")
    out = (label_centroids(with_labels.repartition(5))
           .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
    rows = with_labels.to_pandas()
    for lbl, g in rows.groupby("label"):
        exp = np.stack([np.asarray(v, np.float64)
                        for v in g["embedding"]]).mean(axis=0).round(6)
        got = out[out["label"] == lbl].sort_values("dim")["mean_val"]
        np.testing.assert_allclose(got.to_numpy(), exp, atol=1.5e-6)
    assert len(out) == 3 * 16


def test_nearest_centroid_recovers_separated_clusters():
    from sits_classification_ray.stages.similarity import (
        label_centroids, nearest_centroid_predict)

    rng = np.random.default_rng(3)
    centers = np.array([[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4])
    lbl = np.repeat(np.arange(3, dtype=np.int64), 30)
    x = centers[lbl] + rng.normal(scale=0.3, size=(90, 8))
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(90, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in x],
        "label": lbl})).repartition(4)
    cents = label_centroids(ds.select_columns(["embedding", "label"]))
    out = (nearest_centroid_predict(ds, cents)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert (out["pred_label"].to_numpy() == lbl).all()


def test_simhash_near_dup_banding_is_lossless_at_radius3(docs_ds):
    from sits_classification_ray.stages.dedup_docs import (simhash,
                                                           simhash_near_dup)

    out = (simhash_near_dup(docs_ds, max_hamming=3)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    # brute-force reference over the same sketches
    sh = simhash(docs_ds).to_pandas().sort_values("doc_id")
    hs = np.ascontiguousarray(sh["simhash"].to_numpy(np.int64)) \
        .view(np.uint64)
    ids = sh["doc_id"].to_numpy(np.int64)
    a, b = np.triu_indices(len(ids), k=1)
    ham = np.unpackbits((hs[a] ^ hs[b]).view(np.uint8).reshape(-1, 8),
                        axis=1).sum(axis=1)
    exp = sorted(zip(ids[a][ham <= 3], ids[b][ham <= 3],
                     ham[ham <= 3].astype(int)))
    assert list(map(tuple, out.to_numpy())) == exp
    assert (0, 1, 0) in exp                     # the exact-dup pair


def test_chunk_documents_overlap_and_tail():
    from sits_classification_ray.stages.textstats import chunk_documents

    docs = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": [" ".join(f"t{i}" for i in range(7)), ""],
    })
    out = (chunk_documents(rd.from_pandas(docs), chunk_tokens=4, stride=3)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    d0 = out[out["doc_id"] == 0]
    assert d0["chunk_text"].tolist() == \
        ["t0 t1 t2 t3", "t3 t4 t5 t6", "t6"]
    assert d0["n_tokens"].tolist() == [4, 4, 1]
    # empty text splits to one empty token → one empty chunk (SQL parity)
    d1 = out[out["doc_id"] == 1]
    assert d1["chunk_text"].tolist() == [""]
    assert d1["n_tokens"].tolist() == [1]


def test_connected_components_random_graphs_match_union_find():
    from sits_classification_ray.stages.dedup_docs import \
        connected_components

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n_edges = int(rng.integers(5, 60))
        pairs = pd.DataFrame({
            "id_a": rng.integers(0, 40, size=n_edges),
            "id_b": rng.integers(0, 40, size=n_edges)})
        pairs = pairs[pairs["id_a"] != pairs["id_b"]]

        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs.itertuples(index=False):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        exp = {v: find(v) for v in parent}

        out = (connected_components(rd.from_pandas(pairs).repartition(3))
               .to_pandas())
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got == exp, f"seed {seed}"


def test_chunk_documents_nonoverlap_reconstructs_text():
    from sits_classification_ray.stages.textstats import chunk_documents

    rng = np.random.default_rng(9)
    texts = [" ".join(f"w{rng.integers(0, 50)}"
                      for _ in range(int(rng.integers(1, 40))))
             for _ in range(20)]
    docs = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                         "text": texts})
    out = (chunk_documents(rd.from_pandas(docs), chunk_tokens=8, stride=8)
           .to_pandas().sort_values(["doc_id", "chunk_id"]))
    rebuilt = out.groupby("doc_id")["chunk_text"].agg(" ".join)
    for did, t in zip(docs["doc_id"], docs["text"]):
        assert rebuilt.loc[did] == t


def test_incremental_near_dup_with_persisted_index(tmp_path):
    from sits_classification_ray.stages.dedup_docs import (
        band_rows, incremental_jaccard_pairs, minhash_signatures,
        ngram_jaccard_pairs)

    texts = [
        "the quick brown fox jumps over the lazy dog",     # 0 old
        "the quick brown fox jumps over the lazy dog",     # 1 old dup of 0
        "completely different content about databases",    # 2 old
        "the quick brown fox jumps over the lazy cat",     # 3 NEW near-dup
        "unrelated new arrival talking about parquet",     # 4 NEW
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts)}))
    old = docs.filter(expr="doc_id < 3")
    new = docs.filter(expr="doc_id >= 3")
    # persist the old corpus's band index, reload, dedup the delta
    idx_dir = str(tmp_path / "band_index")
    band_rows(minhash_signatures(old)).write_parquet(idx_dir)
    out = (incremental_jaccard_pairs(
               old, new, threshold=0.0,
               old_index=rd.read_parquet(idx_dir))
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    # equals the full-corpus pair set filtered to pairs touching a new doc
    full = ngram_jaccard_pairs(docs, threshold=0.0).to_pandas()
    exp = (full[(full["id_a"] >= 3) | (full["id_b"] >= 3)]
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)
    # the planted cross-group near-dups were found, old×old excluded
    found = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (0, 3) in found and (1, 3) in found
    assert not ((out["id_a"] < 3) & (out["id_b"] < 3)).any()


def test_content_sniffing_and_image_header_parse():
    """Codec-free real decode: magic-byte container identification and
    dimensions read from genuine PNG/GIF/BMP/JPEG header structures."""
    from sits_classification_ray.stages.multimodal import (
        make_image_container, parse_image_size, sniff_content_type)

    body = bytes(range(256)) * 3
    for kind, ctype in [("png", "image/png"), ("gif", "image/gif"),
                        ("bmp", "image/bmp"), ("jpeg", "image/jpeg")]:
        blob = make_image_container(body, kind, 640, 480)
        assert sniff_content_type(blob) == ctype
        assert parse_image_size(blob) == (640, 480)
    # GIF/JPEG dims are u16; BMP/PNG go wider
    assert parse_image_size(
        make_image_container(b"x", "png", 100000, 70000)) == (100000, 70000)
    assert sniff_content_type(b"<!doctype html><p>") == "text/html"
    assert sniff_content_type("plain text é".encode()) == "text/plain"
    assert sniff_content_type(b"\xff\xfe\x00\x01") == \
        "application/octet-stream"
    assert parse_image_size(b"not an image") is None
    # truncated headers must not crash
    for kind in ["png", "gif", "bmp", "jpeg"]:
        blob = make_image_container(b"x" * 50, kind, 8, 8)
        for cut in (1, 3, 7, 15):
            parse_image_size(blob[:cut])
            sniff_content_type(blob[:cut])


def test_sniff_assets_stage_roundtrip(ray_session):
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.multimodal import (
        make_image_container, sniff_assets)

    df = pd.DataFrame({
        "asset_id": ["a", "b", "c", "d"],
        "payload": [make_image_container(b"123", "png", 32, 16),
                    make_image_container(b"456", "jpeg", 9, 7),
                    b"<html><body>hi</body></html>",
                    b""],
    })
    out = (sniff_assets(rd.from_pandas(df), payload_col="payload")
           .to_pandas().sort_values("asset_id"))
    assert out["content_type"].tolist() == [
        "image/png", "image/jpeg", "text/html", "application/x-empty"]
    assert out["width"].tolist() == [32, 9, -1, -1]
    assert out["height"].tolist() == [16, 7, -1, -1]


def test_heavy_hitters_exact_two_pass():
    from sits_classification_ray.stages.textstats import heavy_hitters
    # 3 docs across 3 blocks; "hot" has 12/30 tokens, "warm" 6/30,
    # ten distinct cold words fill the rest. k=4 -> threshold N/5 = 6:
    # hot (12 > 6) is heavy, warm (6 > 6 is false) is NOT - exactness
    # at the boundary is the point of the verify pass.
    docs = ["hot hot hot hot warm warm cold1 cold2 cold3 cold4",
            "hot hot hot hot warm warm cold5 cold6 cold7 cold8",
            "hot hot hot hot warm warm cold9 cold10 cold1 cold2"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(docs)})
    out = heavy_hitters(rd.from_arrow(t).repartition(3), k=4).to_pandas()
    assert out["word"].tolist() == ["hot"]
    assert out["n"].tolist() == [12]
    # no word exceeds N/(k+1) -> empty result with the right schema
    uniform = pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array([" ".join(f"w{i}" for i in
                                                   range(40))])})
    empty = heavy_hitters(rd.from_arrow(uniform), k=3)
    # (checking the Dataset schema, not to_pandas(): Ray drops column
    # names when EVERY block of a dataset is empty)
    assert empty.count() == 0
    assert empty.schema().names == ["word", "n"]


def test_bpe_encode_greedy_rank_order():
    from sits_classification_ray.stages.textstats import bpe_encode
    # merges: rank0 (a,b)->ab, rank1 (ab,c)->abc. "abc" collapses to 1
    # unit; "cab" -> c + ab = 2; "xyz" has no applicable merge -> 3.
    merges = pd.DataFrame({"rank": np.array([0, 1], np.int64),
                           "left": ["a", "ab"], "right": ["b", "c"],
                           "count": np.array([9, 5], np.int64)})
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["abc cab", "xyz abc abc"])})
    out = bpe_encode(rd.from_arrow(t), merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [2, 3]
    assert out["n_units"].tolist() == [1 + 2, 3 + 1 + 1]


def test_url_filter_blocklist_and_path_terms():
    from sits_classification_ray.stages.urlnorm import url_filter
    urls = ["https://bad.com/x", "https://good.com/x",
            "https://good.com/ads/banner", "not a url",
            "https://sub.bad.com/y"]
    t = pa.table({"url": pa.array(urls),
                  "row": pa.array(range(5), pa.int64())})
    out = url_filter(rd.from_arrow(t), ["bad.com"],
                     blocked_path_terms=["/ads/"]).to_pandas() \
        .sort_values("row")
    # exact-domain block (subdomains are distinct entries, like real
    # blocklists), path-term block, malformed url kept
    assert out["row"].tolist() == [1, 3, 4]


def test_jaccard_near_dup_exact_values(ray_session):
    """Exact inverted-index Jaccard vs a brute-force python set model."""
    import itertools

    import ray.data as rd

    from sits_classification_ray.stages.dedup_docs import jaccard_near_dup

    texts = [
        "the quick brown fox jumps over the lazy dog today",   # 0
        "the quick brown fox jumps over the lazy dog tonight", # 1 near-0
        "a completely different document about ray data",      # 2
        "the quick brown fox jumps over the lazy dog today",   # 3 exact-0
        "short",                                               # 4 < w tokens
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts)})
    out = jaccard_near_dup(rd.from_arrow(t), w=3, df_cap=32,
                           threshold=0.3).to_pandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}

    def sh(s):
        tk = s.lower().split(" ")
        return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}

    expect = {}
    for a, b in itertools.combinations(range(5), 2):
        sa, sb = sh(texts[a]), sh(texts[b])
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if sa & sb and round(j, 6) >= 0.3:
            expect[(a, b)] = round(j, 6)
    assert got == expect
    assert got[(0, 3)] == 1.0          # exact dup found at jaccard 1
    assert 4 not in {i for p in got for i in p}   # sub-w doc excluded


def test_jaccard_df_cap_prunes_common_shingles(ray_session):
    """A shingle shared by more docs than df_cap generates no
    candidates — docs related ONLY through it are not paired."""
    import ray.data as rd

    from sits_classification_ray.stages.dedup_docs import (
        jaccard_candidate_pairs)

    # 5 docs all sharing one boilerplate trigram, otherwise disjoint
    texts = [f"shared boiler plate unique{i} word{i} tok{i}"
             for i in range(5)]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts)})
    capped = jaccard_candidate_pairs(rd.from_arrow(t), w=3,
                                     df_cap=3).to_pandas()
    assert len(capped) == 0            # df=5 > cap=3: pruned
    uncapped = jaccard_candidate_pairs(rd.from_arrow(t), w=3,
                                       df_cap=32).to_pandas()
    assert len(uncapped) == 10         # all C(5,2) pairs


def test_srp_near_dup_finds_planted_copies(ray_session):
    """SRP-LSH bucketing + exact cosine verify: planted near-copies
    (cos ≈ 0.9997) are all found; unrelated random vectors are not."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.similarity import srp_near_dup

    rng = np.random.default_rng(3)
    X = rng.standard_normal((40, 16))
    Xp = X[:10].copy()
    Xp[:, ::2] *= 1.05                      # near-copies of ids 0..9
    ids = np.concatenate([np.arange(40), np.arange(10) + 100])
    df = pd.DataFrame({"vec_id": ids.astype(np.int64),
                       "embedding": list(np.concatenate([X, Xp]))})
    out = srp_near_dup(rd.from_pandas(df), dim=16,
                       threshold=0.98).to_pandas()
    found = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert found == {(i, i + 100) for i in range(10)}
    assert (out["cos_sim"] >= 0.98).all()


def test_snm_window_semantics(ray_session):
    """SNM pairs exactly the rows within `window` positions of the
    key-sorted order — including across rank-bucket boundaries."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.dedup_docs import (
        snm_candidate_pairs)

    # keys sort as doc_id order: texts 'a','b',...
    texts = [chr(97 + i) * 3 for i in range(8)]
    t = pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64),
                      "text": texts})
    out = snm_candidate_pairs(rd.from_pandas(t).repartition(3),
                              key_fn=lambda s: s, window=2,
                              bucket_rows=3).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    expect = {(i, j) for i in range(8) for j in range(i + 1, min(i + 3, 8))}
    assert got == expect        # every |rank diff| <= 2 pair, no dups


def test_jaccard_exact_recall_randomized(ray_session):
    """With an uncapped df the inverted-index method has recall 1 by
    construction: across random corpora it must equal the brute-force
    pair set exactly (the property LSH methods only approximate)."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.dedup_docs import jaccard_near_dup

    pool = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        texts = [" ".join(rng.choice(pool, size=rng.integers(3, 9)))
                 for _ in range(30)]
        df = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                           "text": texts})
        out = jaccard_near_dup(rd.from_pandas(df).repartition(4),
                               w=3, df_cap=10 ** 9,
                               threshold=0.3).to_pandas()
        got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}

        def sh(s):
            tk = s.split(" ")
            return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}

        expect = {}
        for a, b in itertools.combinations(range(30), 2):
            sa, sb = sh(texts[a]), sh(texts[b])
            if not (sa & sb):
                continue
            j = round(len(sa & sb) / len(sa | sb), 6)
            if j >= 0.3:
                expect[(a, b)] = j
        assert got == expect, f"seed {seed}"


def test_typo_pairs_fastss_recall(ray_session):
    """FastSS deletion blocking finds EVERY lev<=1 pair: substitution,
    deletion, insertion; lev-2 strings are excluded by the verify."""
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.urlnorm import (_within_lev1,
                                                        typo_pairs)

    assert _within_lev1("abcd", "abxd")        # substitution
    assert _within_lev1("abcd", "abd")         # deletion
    assert _within_lev1("abd", "abcd")         # insertion
    assert not _within_lev1("abcd", "axyd")    # two substitutions
    assert not _within_lev1("abcd", "ab")      # distance 2

    urls = ["abcdef", "abcdex", "abcde", "zzzzzz", "abqqef"]
    out = typo_pairs(rd.from_pandas(pd.DataFrame({"url": urls}))
                     .repartition(2)).to_pandas()
    got = set(map(tuple, out[["url_a", "url_b"]].to_numpy()))
    assert got == {("abcde", "abcdef"), ("abcde", "abcdex"),
                   ("abcdef", "abcdex")}


def test_dup_spans_maximal_islands(ray_session):
    """Cross-doc repeated 4-grams merge into maximal token spans;
    within-doc-only repeats and unique text produce no spans."""
    from sits_classification_ray.stages.dedup_docs import dup_spans

    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"alpha beta {shared} gamma delta",      # shared at pos 2..10
            f"{shared} something else entirely",     # shared at pos 0..8
            # doc 3: repeats a 4-gram twice INSIDE itself only → no span
            "x y z w q x y z w q",
            "totally unique words here nothing repeated at all",
        ],
    })
    out = dup_spans(rd.from_pandas(docs), k=4).to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    assert set(out["doc_id"]) == {1, 2}
    r1 = out[out["doc_id"] == 1].iloc[0]
    # 9 shared tokens at offset 2 → grams at pos 2..7 merge to [2, 10]
    assert (r1["span_start"], r1["span_end"], r1["n_grams"]) == (2, 10, 6)
    r2 = out[out["doc_id"] == 2].iloc[0]
    assert (r2["span_start"], r2["span_end"], r2["n_grams"]) == (0, 8, 6)


def test_dup_spans_gap_break(ray_session):
    """Duplicated grams separated by more than k tokens stay separate
    spans; a gap of exactly k (token-contiguous coverage) merges."""
    from sits_classification_ray.stages.dedup_docs import dup_spans

    a = "p q r s"          # 4 tokens: one 4-gram
    b = "m n o u"
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [
            f"{a} z1 z2 z3 z4 z5 {b}",   # positions 0 and 10: gap 10 > 4
            f"{a} junk {b}",             # both grams also in doc 1
        ],
    })
    out = dup_spans(rd.from_pandas(docs), k=4).to_pandas()
    d1 = out[out["doc_id"] == 1]
    assert len(d1) == 2                      # far apart → two islands
    d2 = out[out["doc_id"] == 2]
    # doc 2: grams at pos 0 and 5 — gap 5 > 4 → still two spans
    assert len(d2) == 2


def test_semdedup_drops_planted_near_duplicates(ray_session):
    """A cluster containing two nearly-identical vectors keeps exactly
    one of them (the farther-from-centroid scan order decides which);
    orthogonal vectors all survive."""
    from sits_classification_ray.stages.similarity import semdedup

    rng = np.random.default_rng(3)
    base = rng.standard_normal((6, 16))
    # vec 6 = tiny perturbation of vec 0 → cosine ≈ 1 with it
    dup = base[0] + 1e-3 * rng.standard_normal(16)
    X = np.vstack([base, dup[None, :]]).astype(np.float64)
    emb = pd.DataFrame({"vec_id": np.arange(7, dtype=np.int64),
                        "embedding": list(X)})
    out = semdedup(rd.from_pandas(emb), k=2, iterations=3,
                   tau=0.9).to_pandas().sort_values("vec_id")
    assert len(out) == 7
    pair = out[out["vec_id"].isin([0, 6])]
    assert pair["keep"].sum() == 1          # exactly one of the twins
    others = out[~out["vec_id"].isin([0, 6])]
    assert (others["keep"] == 1).all()


def test_trim_dup_spans_removes_shared_region(ray_session):
    """The shared region disappears from both documents; unique
    documents come back verbatim; a fully-duplicated doc empties."""
    from sits_classification_ray.stages.dedup_docs import trim_dup_spans

    shared = "a b c d e"                     # 5 tokens
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"x y {shared} z", shared,
                 "all of these words differ completely"],
    })
    out = trim_dup_spans(rd.from_pandas(docs), k=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "text_trimmed"] == "x y z"
    assert out.loc[1, "n_removed"] == 5
    assert out.loc[2, "text_trimmed"] == ""
    assert out.loc[2, "n_removed"] == 5
    assert out.loc[3, "text_trimmed"] == \
        "all of these words differ completely"
    assert out.loc[3, "n_removed"] == 0


def test_dsir_logweights_prefers_target_like_docs(ray_session):
    """Documents made of target-domain words score above documents
    made of off-domain words; a doc with no vocab hits gets 0."""
    from sits_classification_ray.stages.curation import dsir_logweights

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en", "en", "de", "de", "fr"],
        "text": ["alpha beta alpha", "alpha beta beta",
                 "gamma delta gamma", "delta delta gamma",
                 ""],
    })
    out = dsir_logweights(rd.from_pandas(docs), target_col="lang",
                          target_value="en", vocab_k=4) \
        .to_pandas().set_index("doc_id").sort_index()
    assert len(out) == 5
    # en-word docs above de-word docs under the en target
    assert out.loc[1, "log_weight"] > out.loc[3, "log_weight"]
    assert out.loc[2, "log_weight"] > out.loc[4, "log_weight"]
    # empty doc: no vocabulary hits, zero weight
    assert out.loc[5, "n_vocab_tokens"] == 0
    assert out.loc[5, "log_weight"] == 0.0


def test_lang_temperature_weights_upsamples_tail(ray_session):
    from sits_classification_ray.stages.curation import \
        lang_temperature_weights

    docs = pd.DataFrame({"doc_id": range(100),
                         "lang": ["en"] * 90 + ["sw"] * 10})
    out = lang_temperature_weights(rd.from_pandas(docs), alpha=0.3) \
        .set_index("lang")
    assert abs(out["p_temp"].sum() - 1.0) < 1e-5
    # temperature sampling raises the tail share above its raw share
    assert out.loc["sw", "p_temp"] > out.loc["sw", "p_raw"]
    assert out.loc["en", "p_temp"] < out.loc["en", "p_raw"]


def test_grouped_ntile_matches_sql_semantics(ray_session):
    """Per-group NTILE with an uneven group: 5 rows into 3 tiles is
    2/2/1; ordering is score desc with id tiebreak."""
    from sits_classification_ray.stages.scan_sorted import grouped_ntile

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 3,
        "score": [50, 40, 30, 20, 10, 3, 2, 1],
        "id": [1, 2, 3, 4, 5, 6, 7, 8],
    })
    out = grouped_ntile(rd.from_pandas(df), ["g"], ["score", "id"],
                        k=3, descending=[True, False],
                        out_col="tile").to_pandas() \
        .set_index("id").sort_index()
    assert out.loc[[1, 2], "tile"].tolist() == [1, 1]
    assert out.loc[[3, 4], "tile"].tolist() == [2, 2]
    assert out.loc[5, "tile"] == 3
    assert out.loc[[6, 7, 8], "tile"].tolist() == [1, 2, 3]


def test_gopher_rules_flags_each_violation(ray_session):
    """One doc per rule violation plus one clean pass."""
    from sits_classification_ray.stages.textstats import gopher_rules

    stop = ("data", "row", "join")
    good = "data row join " + " ".join(["words"] * 27)  # 30 words
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [good,
                 "data row join word",                  # too few words
                 "data row join " + " ".join(["ab"] * 27),  # short words
                 " ".join(["word"] * 30)],              # no stopwords
    })
    out = gopher_rules(rd.from_pandas(docs), min_words=30,
                       min_mean_len=4.0, max_mean_len=10.0,
                       min_alpha_frac=0.8, min_stopwords=3,
                       stopwords=stop).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "passes"] == 1
    assert out.loc[2, "r_wordcount"] == 0 and out.loc[2, "passes"] == 0
    assert out.loc[3, "r_meanlen"] == 0 and out.loc[3, "passes"] == 0
    assert out.loc[4, "r_stop"] == 0 and out.loc[4, "passes"] == 0


def test_snapshot_novelty_known_edits():
    import ray.data as rd

    from sits_classification_ray.stages.dedup_docs import snapshot_novelty

    H = 3_600_000_000
    rows = [
        ("u", 1 * H, "the quick brown fox jumps over the lazy dog"),
        # identical -> novelty 0
        ("u", 2 * H, "the quick brown fox jumps over the lazy dog"),
        # completely different -> novelty 1
        ("u", 3 * H, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
    ]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    df["url_bucket"] = np.uint32(1)
    out = (snapshot_novelty(rd.from_pandas(df)).to_pandas()
           .sort_values("warc_ts").reset_index(drop=True))
    assert len(out) == 2
    assert out.loc[0, "novel_frac"] == 0.0
    assert out.loc[1, "novel_frac"] == 1.0
    # partial edit: appended sentence -> strictly between 0 and 1
    rows2 = [("v", 1 * H, "alpha beta gamma delta epsilon zeta"),
             ("v", 2 * H, "alpha beta gamma delta epsilon zeta eta theta")]
    df2 = pd.DataFrame(rows2, columns=["url", "warc_ts", "text"])
    df2["warc_ts"] = pd.to_datetime(df2["warc_ts"], unit="us")
    df2["url_bucket"] = np.uint32(1)
    out2 = snapshot_novelty(rd.from_pandas(df2)).to_pandas()
    assert 0.0 < out2["novel_frac"].iloc[0] < 1.0


# --- distributed PCA ------------------------------------------------------

def _pca_emb_df(seed=41, n=300, d=8):
    """Anisotropic Gaussian cloud: variance concentrated on two known
    directions so the recovered components are unambiguous."""
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(seed)
    u1 = np.zeros(d); u1[0] = 1.0
    u2 = np.zeros(d); u2[1] = 1.0
    z = rng.normal(size=(n, d))
    X = (10.0 * z[:, :1] * u1 + 4.0 * z[:, 1:2] * u2
         + 0.3 * z) + rng.normal(5.0, 0.1, size=d)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X]})


def test_pca_matches_numpy_reference():
    import numpy as np
    import ray.data as rd
    from sits_classification_ray.stages.similarity import pca_basis

    df = _pca_emb_df()
    mean, comps, evals, n = pca_basis(rd.from_pandas(df), n_components=2)
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    ref_cov = np.cov(X, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(ref_cov)
    assert n == len(df)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    assert np.allclose(sorted(evals, reverse=True), w[-2:][::-1],
                       rtol=1e-9)
    # recovered directions match the reference eigvecs up to sign
    for c in range(2):
        ref = v[:, -1 - c]
        assert min(np.abs(comps[:, c] - ref).max(),
                   np.abs(comps[:, c] + ref).max()) < 1e-9
    # dominant loading is on the planted axes
    assert np.argmax(np.abs(comps[:, 0])) == 0
    assert np.argmax(np.abs(comps[:, 1])) == 1


def test_pca_projection_partition_invariant():
    import numpy as np
    import ray.data as rd
    from sits_classification_ray.stages.similarity import pca_project

    df = _pca_emb_df(seed=43)
    a = (pca_project(rd.from_pandas(df)).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (pca_project(rd.from_pandas(df).repartition(13)).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert (a["pc1"] == b["pc1"]).all() and (a["pc2"] == b["pc2"]).all()
    # projection variance equals the eigenvalue (population of scores)
    from sits_classification_ray.stages.similarity import pca_basis
    _, _, evals, _ = pca_basis(rd.from_pandas(df), n_components=2)
    assert abs(a["pc1"].var(ddof=1) - evals[0]) / evals[0] < 1e-3
    assert abs(a["pc2"].var(ddof=1) - evals[1]) / evals[1] < 1e-3
    # centered: score means are ~0
    assert abs(a["pc1"].mean()) < 1e-6 + 1e-9 * len(a)


def test_mahalanobis_flags_planted_outlier():
    import numpy as np
    import ray.data as rd
    from sits_classification_ray.stages.similarity import (
        mahalanobis_scores)

    df = _pca_emb_df(seed=47, n=200, d=6)
    # plant one far-off-manifold vector
    out_vec = np.full(6, 60.0, dtype=np.float32)
    df.loc[len(df)] = {"vec_id": np.int64(999), "embedding": out_vec}
    out = mahalanobis_scores(rd.from_pandas(df)).to_pandas()
    top = out.sort_values("d2", ascending=False).iloc[0]
    assert int(top["vec_id"]) == 999
    # independent check: D2 against numpy mean/cov/inv on the bulk
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    mu = X.mean(axis=0)
    inv = np.linalg.inv(np.cov(X, rowvar=False, ddof=1))
    ref = ((X - mu) @ inv * (X - mu)).sum(axis=1)
    got = out.sort_values("vec_id")["d2"].to_numpy()
    ref_s = ref[np.argsort(df["vec_id"].to_numpy())]
    assert np.allclose(got, ref_s, rtol=1e-6, atol=1e-6)
    # mean of D2 equals d up to sampling (chi-square property)
    bulk = out[out["vec_id"] != 999]["d2"]
    assert abs(bulk.mean() - 6.0) < 1.0


def test_knn_classify_majority_and_partition_invariance():
    from sits_classification_ray.stages.similarity import knn_classify
    rng = np.random.default_rng(3)
    n, d = 300, 8
    # two directionally separated blobs (cosine metric) → knn recovers
    # the label: label 0 points near +e0, label 1 near +e1
    lab = (np.arange(n) % 2).astype(np.int32)
    centers = np.zeros((2, d)); centers[0, 0] = 1.0; centers[1, 1] = 1.0
    X = (centers[lab] + rng.normal(scale=0.05, size=(n, d))) \
        .astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(X), "label": lab})
    a = knn_classify(rd.from_pandas(df), k=5, test_mod=10)
    b = knn_classify(rd.from_pandas(df).repartition(7), k=5, test_mod=10)
    pd.testing.assert_frame_equal(a, b)      # partition invariant
    assert len(a) == n // 10                 # one row per query id
    assert (a["pred_label"] == a["true_label"]).all()  # separable blobs
    assert (a["votes"] == 5).all()           # unanimous neighborhoods
