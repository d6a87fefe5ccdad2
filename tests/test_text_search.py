"""BM25 retrieval, token entropy, compression signal, PMI collocations."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def test_bm25_ranks_matching_docs():
    from sits_classification_ray.stages.textstats import bm25_topk
    ds = _docs([
        "hash join hash join hash",        # heavy on both terms
        "hash table scan",                 # one term once
        "merge sort only",                 # no match
        "join order join",                 # one term twice
    ]).repartition(2)
    out = bm25_topk(ds, ["hash", "join"], k=10).to_pandas()
    assert 2 not in out["doc_id"].tolist()  # non-matching doc absent
    assert out["doc_id"].iloc[0] == 0       # strongest match first
    assert (out["score"].to_numpy()[:-1]
            >= out["score"].to_numpy()[1:]).all()


def test_bm25_doc_length_normalization():
    from sits_classification_ray.stages.textstats import bm25_topk
    # same tf, shorter doc → higher score
    ds = _docs(["hash " + "x " * 3 + "y",
                "hash " + "x " * 40 + "y"])
    out = bm25_topk(ds, ["hash"], k=2).to_pandas()
    assert out["doc_id"].tolist() == [0, 1]


def test_token_entropy_values():
    from sits_classification_ray.stages.textstats import token_entropy
    out = token_entropy(_docs(["a b a b", "a a a a", "a b c d"])) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert np.allclose(out["entropy"], [1.0, 0.0, 2.0])
    assert out["n_distinct"].tolist() == [2, 1, 4]
    assert np.allclose(out["ttr"], [0.5, 0.25, 1.0])


def test_compression_signal_orders_repetitive_text():
    from sits_classification_ray.stages.textstats import compression_signal
    out = compression_signal(_docs(["spam " * 200,
                                    "k9$q zX!f 7vLm pQ2r wY8t " * 40])) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["compression_ratio"][0] < out["compression_ratio"][1]
    assert (out["raw_bytes"] > 0).all()


def test_pmi_finds_collocation():
    from sits_classification_ray.stages.textstats import pmi_bigrams
    # "neural network" always together; fillers independent
    texts = [("neural network " + "a b c d e f g h " * 3).strip()
             for _ in range(10)]
    out = pmi_bigrams(_docs(texts).repartition(3), k=5, min_count=5) \
        .to_pandas()
    assert out.iloc[0]["w1"] == "neural"
    assert out.iloc[0]["w2"] == "network"
    assert (out["pmi"].to_numpy()[:-1] >= out["pmi"].to_numpy()[1:]).all()


def test_bpe_merges_prune_bounds_driver_collect():
    """max_vocab / min_count prune the distributed count table BEFORE
    it reaches the driver (the 100 TB contract): the merge result must
    equal training on exactly the top-N (count DESC, token ASC) words,
    and the collected vocabulary must be bounded by the parameter."""
    import pandas as pd

    from sits_classification_ray.oracle.golden import bpe_merges_documents
    from sits_classification_ray.stages.textstats import (bpe_merges,
                                                          token_counts)

    # 60 distinct words: 10 hot (freq ≥ 5), 50 singleton noise words
    texts = []
    for i in range(10):
        texts.extend([f"hot{i}word"] * (5 + i))
    texts.extend(f"noise{i:02d}" for i in range(50))
    docs = pd.DataFrame({"text": texts})
    ds = rd.from_pandas(docs).repartition(4)

    got = bpe_merges(ds, n_merges=8, min_count=2, max_vocab=6)
    want = bpe_merges_documents(docs, n_merges=8, min_count=2,
                                max_vocab=6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))

    # the bounded table itself: what bpe_merges collects is ≤ max_vocab
    counts = token_counts(ds).filter(expr="n >= 2")
    pruned = counts.sort(["n", "token"],
                         descending=[True, False]).limit(6).to_pandas()
    assert len(pruned) == 6
    assert counts.count() == 10     # prune genuinely binds (10 → 6)


def test_lm_logprob_join_path_matches_broadcast_path():
    """The unbounded-vocabulary tag-union join path must produce the
    same rows as the broadcast fast path (both LM orders)."""
    import pandas as pd

    from sits_classification_ray.stages.textstats import (bigram_logprob,
                                                          unigram_logprob)

    texts = ["the cat sat on the mat", "the dog sat", "a cat ran fast",
             "the the the", "solo", "on the mat the cat sat again"]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(3)

    def norm(d):
        return (d.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    uni_b = norm(unigram_logprob(ds, broadcast_max_vocab=10**9))
    uni_j = norm(unigram_logprob(ds, broadcast_max_vocab=0))
    pd.testing.assert_frame_equal(uni_j[uni_b.columns], uni_b)

    bi_b = norm(bigram_logprob(ds, broadcast_max_vocab=10**9))
    bi_j = norm(bigram_logprob(ds, broadcast_max_vocab=0))
    pd.testing.assert_frame_equal(bi_j[bi_b.columns], bi_b)
    # the single-token doc has no bigrams and is omitted on BOTH paths
    assert 4 not in bi_j["doc_id"].tolist()


def test_hybrid_rrf_fuses_both_rankers(ray_session):
    from sits_classification_ray.pipelines.queries import (
        _hybrid_rrf_documents)

    out = _hybrid_rrf_documents("/root/testdata/sf0.001")
    assert list(out.columns) == ["doc_id", "rank_lex", "rank_dense",
                                 "rrf_score"]
    assert len(out) == 20
    # fused order is descending, docs present in BOTH lists score the
    # sum of their reciprocal ranks
    assert (out["rrf_score"].to_numpy()[:-1]
            >= out["rrf_score"].to_numpy()[1:]).all()
    both = out[(out["rank_lex"] > 0) & (out["rank_dense"] > 0)]
    for _, r in both.iterrows():
        expect = round(1.0 / (60 + r["rank_lex"])
                       + 1.0 / (60 + r["rank_dense"]), 6)
        assert abs(r["rrf_score"] - expect) < 1e-9
    # at least one doc comes from only one ranker (rank 0 = absent)
    assert ((out["rank_lex"] == 0) | (out["rank_dense"] == 0)).any()


# --- Naive Bayes language classifier --------------------------------------

def _nb_docs():
    import numpy as np
    import pandas as pd
    rows = []
    en = ["the cat sat on the mat", "the dog ate the bone",
          "a cat and a dog", "the sun is warm"]
    de = ["die katze sitzt auf der matte", "der hund frisst den knochen",
          "eine katze und ein hund", "die sonne ist warm"]
    for i, t in enumerate(en):
        rows.append((i, t, "en"))
    for i, t in enumerate(de):
        rows.append((100 + i, t, "de"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def test_naive_bayes_matches_reference_and_self_classifies():
    import numpy as np
    import ray.data as rd
    from collections import Counter
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.textstats import naive_bayes_lang

    df = _nb_docs()
    out = (naive_bayes_lang(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # training data is cleanly separable: NB reproduces its labels
    truth = df.sort_values("doc_id")["lang"].to_numpy()
    assert (out["pred_lang"].to_numpy() == truth).all()

    # independent score check (plain-python NB, same micro-nat scheme)
    toks = {r.doc_id: r.text.lower().split(" ")
            for r in df.itertuples()}
    cw, nl, dl = Counter(), Counter(), Counter()
    for r in df.itertuples():
        for w in toks[r.doc_id]:
            cw[(r.lang, w)] += 1
            nl[r.lang] += 1
        dl[r.lang] += 1
    vocab = {w for (_, w) in cw}
    d_total = len(df)

    def u(x):
        return int(sql_round(np.array([x * 1e6]), 0)[0])

    for r in df.itertuples():
        best = None
        for lang in sorted(dl):
            s = u(np.log(dl[lang] * 1.0 / d_total))
            s -= len(toks[r.doc_id]) * u(np.log(nl[lang]
                                                + len(vocab) + 0.0))
            for w, c in Counter(toks[r.doc_id]).items():
                if (lang, w) in cw:
                    s += c * u(np.log(cw[(lang, w)] + 1.0))
            if best is None or s > best[1]:
                best = (lang, s)
        row = out[out["doc_id"] == r.doc_id].iloc[0]
        assert row["pred_lang"] == best[0]
        assert int(row["score_u"]) == best[1]


def test_naive_bayes_partition_invariant():
    import ray.data as rd
    from sits_classification_ray.stages.textstats import naive_bayes_lang

    df = _nb_docs()
    a = (naive_bayes_lang(rd.from_pandas(df)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (naive_bayes_lang(rd.from_pandas(df).repartition(7)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_kneser_ney_bigrams_probability_axioms():
    """KN probabilities over a tiny corpus: hand-checked value,
    partition invariance, and the sum-to-one axiom per context
    (summing P(w2|w1) over ALL continuations observed for w1 plus
    the backoff mass equals 1 when every bigram is scored)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sits_classification_ray.stages.textstats import \
        kneser_ney_bigrams

    docs = pd.DataFrame({"text": [
        "a b a b a c", "b a b a", "c a b"]})
    a = (kneser_ney_bigrams(rd.from_pandas(docs), k=100).to_pandas()
         .sort_values(["w1", "w2"]).reset_index(drop=True))
    b = (kneser_ney_bigrams(rd.from_pandas(docs).repartition(3), k=100)
         .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

    # hand model: bigrams and their counts
    text = [t.split() for t in docs["text"]]
    from collections import Counter
    big = Counter()
    for ts in text:
        big.update(zip(ts[:-1], ts[1:]))
    D, bd = 0.75, float(len(big))
    c_ctx = Counter(); n1p_ctx = Counter(); n1p_suc = Counter()
    for (w1, w2), n in big.items():
        c_ctx[w1] += n; n1p_ctx[w1] += 1; n1p_suc[w2] += 1
    for _, r in a.iterrows():
        want = (max(r["n"] - D, 0) / c_ctx[r["w1"]]
                + D * n1p_ctx[r["w1"]] / c_ctx[r["w1"]]
                * (n1p_suc[r["w2"]] / bd))
        assert abs(r["p_kn"] - want) < 2e-6
    # per-context sum over observed continuations ≤ 1 (the remainder
    # is backoff mass reserved for unseen continuations)
    s = a.groupby("w1")["p_kn"].sum()
    assert (s <= 1.0 + 1e-9).all()
