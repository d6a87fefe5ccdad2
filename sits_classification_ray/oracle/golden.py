"""Independent (pandas/numpy-only, Ray-free) implementations of the
non-SQL-expressible operators, used to produce golden-file oracles.

Each function takes plain DataFrames (read straight from the testdata
parquet, or derived by DuckDB from the shared ``CRAWL_PREFIX`` SQL) and
returns the expected output of the matching ``queries()`` entry. The
driver's oracle SQL then reads the stored golden parquet — so every
deterministic/seeded operator gets a real value-hash check instead of
the round-1 ``no_oracle`` rows-only pass (VERDICT r1 #4).

Determinism inputs these implementations replicate on purpose (the
"contract" side of each operator, not its engine code): sha1-based
shingle/token hashing, the seeded ``np.random.default_rng`` streams,
pandas' fixed-key SipHash, and ``np.linalg.lstsq`` on identical float64
inputs.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# language id + confusion
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "on", "are", "with", "as", "his", "they", "at", "be", "this"},
    "de": {"der", "die", "und", "das", "ist", "von", "den", "mit", "nicht",
           "ein", "eine", "auf", "sich", "des", "im", "dem", "zu", "auch"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "du", "dans",
           "que", "qui", "pour", "pas", "sur", "au", "avec", "ne", "se"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "del", "en",
           "que", "por", "con", "para", "su", "al", "lo", "como", "se"},
    "pt": {"o", "a", "os", "as", "e", "um", "uma", "do", "da", "em", "que",
           "para", "com", "por", "uma", "se", "na", "no", "mais"},
    "it": {"il", "la", "le", "e", "di", "che", "un", "una", "del", "in",
           "per", "con", "non", "si", "da", "sono", "al", "come"},
}

_WORD_RE = re.compile(r"[a-zà-ÿ]+")
_CJK_RE = re.compile(r"[一-鿿]")


def _classify(text: str) -> str:
    if text and len(_CJK_RE.findall(text)) / max(1, len(text)) > 0.2:
        return "zh"
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und"
    best, best_score = "und", 0.0
    for lang, table in _STOPWORDS.items():
        score = sum(1 for w in words if w in table) / len(words)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0.05 else "und"


def langid_documents(docs: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": docs["doc_id"].astype(np.int64),
        "lang": docs["lang"],
        "pred_lang": [_classify(t) for t in docs["text"]],
    })


def langid_confusion(docs: pd.DataFrame) -> pd.DataFrame:
    lid = langid_documents(docs)
    g = (lid.groupby(["lang", "pred_lang"], sort=False)
         .size().reset_index(name="n"))
    g["n"] = g["n"].astype(np.int64)
    return g


# ---------------------------------------------------------------------------
# simhash / fingerprint
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\w+")


def _sha1_u64_one(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


def simhash_documents(docs: pd.DataFrame) -> pd.DataFrame:
    out = np.empty(len(docs), dtype=np.uint64)
    bit_cols = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(docs["text"]):
        toks = _TOKEN_RE.findall((t or "").lower())
        if not toks:
            out[i] = 0
            continue
        hs = np.array([_sha1_u64_one(w) for w in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> bit_cols[None, :]) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(((votes > 0).astype(np.uint64) << bit_cols).sum())
    return pd.DataFrame({"doc_id": docs["doc_id"].astype(np.int64),
                         "simhash": out.astype(np.int64)})


def fingerprint_documents(docs: pd.DataFrame) -> pd.DataFrame:
    base = np.uint64(1099511628211)
    off = np.uint64(14695981039346656037)
    out = np.empty(len(docs), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(docs["text"]):
            h = off
            for b in (t or "").encode():
                h = h * base + np.uint64(b)      # Horner ≡ off·Bⁿ + Σ bⱼ·B^…
            out[i] = h
    return pd.DataFrame({"doc_id": docs["doc_id"].astype(np.int64),
                         "fingerprint": out.astype(np.int64)})


# ---------------------------------------------------------------------------
# minhash-LSH near-dup (full pipeline, pure python)
# ---------------------------------------------------------------------------


def minhash_near_dup_documents(docs: pd.DataFrame, shingle_k: int = 5,
                               num_perm: int = 64, bands: int = 16,
                               threshold: float = 0.5, seed: int = 1
                               ) -> pd.DataFrame:
    mers = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, mers, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, mers, size=num_perm, dtype=np.uint64)

    def shingles(t: str) -> set:
        if len(t) < shingle_k:
            return {t}
        return {t[i:i + shingle_k] for i in range(len(t) - shingle_k + 1)}

    def shingle_hash_set(t: str) -> set:
        """Naive per-shingle Horner polynomial mod 2^64, masked to 61
        bits — the sequential twin of the engine's vectorized form."""
        data = (t or "").encode()
        if not data:
            return {0}
        span = min(shingle_k, len(data))
        out = set()
        for i in range(max(1, len(data) - shingle_k + 1)):
            h = 0
            for byte in data[i:i + span]:
                h = (h * 1099511628211 + byte) % (1 << 64)
            out.add(h & ((1 << 61) - 1))
        return out

    def signature(t: str) -> np.ndarray:
        sh = shingle_hash_set(t)
        hs = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        hs = np.sort(hs)
        vals = (a[:, None] * hs[None, :] + b[:, None]) % mers
        return vals.min(axis=1)

    ids = docs["doc_id"].to_numpy(np.int64)
    texts = docs["text"].tolist()
    sigs = np.stack([signature(t) for t in texts])
    rows_per = num_perm // bands
    buckets: dict = {}
    for bi in range(bands):
        chunk = sigs[:, bi * rows_per:(bi + 1) * rows_per]
        for r in range(len(ids)):
            bh = int.from_bytes(
                hashlib.sha1(chunk[r].tobytes()).digest()[:8], "big") >> 1
            buckets.setdefault((bi, bh), []).append(ids[r])
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    text_of = dict(zip(ids, texts))
    rows = []
    for ia, ib in sorted(pairs):
        sa, sb = shingles(text_of[ia] or ""), shingles(text_of[ib] or "")
        inter = len(sa & sb)
        jac = inter / max(1, len(sa) + len(sb) - inter)
        if jac >= threshold:
            rows.append((ia, ib, jac))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
        {"id_a": np.int64, "id_b": np.int64, "jaccard": np.float64})


# ---------------------------------------------------------------------------
# IVF top-k
# ---------------------------------------------------------------------------


def ivf_topk(emb: pd.DataFrame, query_ids=(0, 1, 2), n_lists: int = 8,
             iters: int = 5, seed: int = 0, k: int = 10, n_probe: int = 3
             ) -> pd.DataFrame:
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    mat = mat / n
    ids = emb["vec_id"].to_numpy(np.int64)
    # Lloyd iterations identical to stages/similarity.train_centroids
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)),
                          replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = mat[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    lists = np.argmax(mat @ cent.T, axis=1)
    q_ids = np.array(sorted(query_ids), dtype=np.int64)
    q_mat = mat[[int(np.flatnonzero(ids == q)[0]) for q in q_ids]]
    probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    outs = []
    for qi, q in enumerate(q_ids):
        cand = np.isin(lists, probe[qi])
        scores = np.round(q_mat[qi] @ mat[cand].T, 6)
        sub = pd.DataFrame({"query_id": q, "vec_id": ids[cand],
                            "score": scores})
        sub = sub.sort_values(["score", "vec_id"],
                              ascending=[False, True], kind="mergesort")
        outs.append(sub.head(k))
    return pd.concat(outs, ignore_index=True).astype(
        {"query_id": np.int64, "vec_id": np.int64, "score": np.float64})


def embedding_near_dup_ivf(emb: pd.DataFrame, threshold: float = 0.4,
                           n_lists: int = 8, iters: int = 5, seed: int = 0
                           ) -> pd.DataFrame:
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    mat = mat / n
    ids = emb["vec_id"].to_numpy(np.int64)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)),
                          replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = mat[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    lists = np.argmax(mat @ cent.T, axis=1)
    rows = []
    for lid in np.unique(lists):
        m = lists == lid
        sub, sid = mat[m], ids[m]
        sims = sub @ sub.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = sid[ii], sid[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        for x, y, s in zip(lo, hi, sims[ii, jj]):
            rows.append((x, y, round(float(s), 6)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cos_sim"]).astype(
        {"id_a": np.int64, "id_b": np.int64, "cos_sim": np.float64})


# ---------------------------------------------------------------------------
# sampling / splits
# ---------------------------------------------------------------------------


def stratified_sample_documents(docs: pd.DataFrame, frac: float = 0.25,
                                seed: int = 7) -> pd.DataFrame:
    df = docs[["doc_id", "lang"]].copy()
    content = df.astype(str).agg("\x1f".join, axis=1)
    h = pd.util.hash_pandas_object(content, index=False,
                                   hash_key=f"{seed % 10**16:016d}")
    keep = (h % np.uint64(1_000_000)) < np.uint64(frac * 1_000_000)
    return df[keep.to_numpy()].reset_index(drop=True)


def train_test_split_sizes(n_rows: int, test_frac: float = 0.2
                           ) -> pd.DataFrame:
    n_test = int(round(n_rows * test_frac))
    return pd.DataFrame({"split": ["train", "test"],
                         "n": np.array([n_rows - n_test, n_test], np.int64)})


# ---------------------------------------------------------------------------
# crawl-derived: harmonic fit, augmented rollup, byte features, frames
# ---------------------------------------------------------------------------


def _url_bucket(urls: pd.Series, n_buckets: int = 64) -> np.ndarray:
    h = pd.util.hash_array(urls.to_numpy(dtype=object), categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.uint32)


def harmonic_daily(obs_long: pd.DataFrame, period_seconds: float = 7 * 86400.0,
                   k: int = 2, grid_seconds: int = 86400) -> pd.DataFrame:
    period_us = period_seconds * 1e6
    grid_us = grid_seconds * 1_000_000
    n_params = 1 + 2 * k

    def design(t: np.ndarray) -> np.ndarray:
        cols = [np.ones_like(t)]
        for kk in range(1, k + 1):
            w = 2.0 * np.pi * kk * t / period_us
            cols.append(np.cos(w))
            cols.append(np.sin(w))
        return np.stack(cols, axis=1)

    outs = []
    srt = obs_long.sort_values(["url", "metric", "warc_ts"],
                               kind="mergesort")
    for (url, _metric), g in srt.groupby(["url", "metric"], sort=True):
        ts = g["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g["value"].to_numpy(np.float64)
        if len(ts) < n_params:
            continue
        t0 = ts[0]
        x = (ts - t0).astype(np.float64)
        coef, *_ = np.linalg.lstsq(design(x), vals, rcond=None)
        lo = -(-int(ts[0]) // grid_us) * grid_us
        hi = (int(ts[-1]) // grid_us) * grid_us
        if hi < lo:
            continue
        grid = np.arange(lo, hi + grid_us, grid_us, dtype=np.int64)
        pred = design((grid - t0).astype(np.float64)) @ coef
        outs.append(pd.DataFrame({
            "url": url, "metric": "harmonic",
            "warc_ts": grid.astype("datetime64[us]"),
            "value": np.round(pred, 6)}))
    out = pd.concat(outs, ignore_index=True)
    out.insert(1, "url_bucket", _url_bucket(out["url"]))
    return out


def augmented_rollup(obs_long: pd.DataFrame, seed: int = 7) -> pd.DataFrame:
    """drop_observations(seed) → daily rollup counts (scale_gain does
    not alter counts, so only the drop RNG stream matters)."""
    srt = obs_long.sort_values(["url", "metric", "warc_ts"],
                               kind="mergesort")
    kept = []
    for (url, metric), g in srt.groupby(["url", "metric"], sort=True):
        key = str(url) + "\x1f" + str(metric)
        h = np.uint64(pd.util.hash_array(np.array([key], dtype=object))[0])
        rng = np.random.default_rng(np.uint64(seed) ^ h)
        n = len(g)
        frac = rng.uniform(0.05, 0.8)
        keep = rng.random(n) >= frac
        if not keep.any():
            keep[rng.integers(0, n)] = True
        kept.append(g[keep])
    aug = pd.concat(kept, ignore_index=True)
    aug["bucket_ts"] = pd.to_datetime(aug["warc_ts"]).dt.floor("1D")
    out = (aug.groupby(["url", "metric", "bucket_ts"], sort=True,
                       as_index=False).size()
           .rename(columns={"size": "count"}))
    out["count"] = out["count"].astype(np.int64)
    return out


def canonical_urls_crawl(obs: pd.DataFrame) -> pd.DataFrame:
    """Distinct url → canonical form (same rules as stages/urlnorm:
    lowercase scheme/host, default-port strip, "/" for empty path,
    fragment dropped, query params sorted)."""
    from urllib.parse import urlsplit

    urls = sorted(set(obs["url"]))
    out = []
    for u in urls:
        s = urlsplit(u)
        scheme = s.scheme.lower()
        host = (s.hostname or "").lower()
        port = ""
        if s.port is not None and not (
                (scheme == "http" and s.port == 80)
                or (scheme == "https" and s.port == 443)):
            port = f":{s.port}"
        path = s.path or "/"
        query = "?" + "&".join(sorted(s.query.split("&"))) if s.query else ""
        out.append((u, f"{scheme}://{host}{port}{path}{query}"))
    return pd.DataFrame(out, columns=["url", "canonical_url"])


def hll_distinct_urls_daily(obs: pd.DataFrame, p: int = 12) -> pd.DataFrame:
    """HLL distinct urls per day — same sha1 hash + FD estimator as
    functions/sketches.py, computed sequentially over exact per-day
    key sets (order-free by construction: register max is commutative)."""
    m = 1 << p
    day = pd.to_datetime(obs["warc_ts"]).dt.floor("1D")
    rows = []
    for d, g in obs.groupby(day, sort=True):
        reg = np.zeros(m, dtype=np.uint8)
        for url in set(g["url"]):
            h = int.from_bytes(hashlib.sha1(str(url).encode()).digest()[:8],
                               "big")
            idx = h >> (64 - p)
            rest = h & ((1 << (64 - p)) - 1)
            rho = (64 - p + 1) if rest == 0 else \
                (64 - p) - int(np.floor(np.log2(float(rest))))
            reg[idx] = max(reg[idx], rho)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.power(2.0,
                                       -reg.astype(np.float64)).sum()
        zeros = int((reg == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        rows.append((d, round(float(est), 6)))
    return pd.DataFrame(rows, columns=["bucket_ts", "hll_estimate"])


def html_byte_features(crawl: pd.DataFrame) -> pd.DataFrame:
    classes = np.zeros(256, dtype=np.int64)
    classes[9:14] = 1
    classes[48:58] = 2
    classes[65:91] = 3
    classes[97:123] = 4
    n_rows = len(crawl)
    byte_len = np.zeros(n_rows, np.int64)
    entropy = np.zeros(n_rows, np.float64)
    frac_lower = np.zeros(n_rows, np.float64)
    mode_byte = np.zeros(n_rows, np.int64)
    for i, p in enumerate(crawl["html"]):
        data = np.frombuffer(p or b"", dtype=np.uint8)
        n = len(data)
        byte_len[i] = n
        if n == 0:
            continue
        counts = np.bincount(data, minlength=256)
        probs = counts[counts > 0] / n
        entropy[i] = np.round(float(-(probs * np.log2(probs)).sum()), 6)
        cls = np.bincount(classes[data], minlength=5)
        frac_lower[i] = np.round(cls[4] / n, 6)
        mode_byte[i] = counts.argmax()
    ctypes = [_sniff_independent(p or b"") for p in crawl["html"]]
    return pd.DataFrame({"url": crawl["url"], "warc_ts": crawl["warc_ts"],
                         "byte_len": byte_len, "entropy": entropy,
                         "frac_lower": frac_lower, "mode_byte": mode_byte,
                         "content_type": ctypes})


def frame_samples(crawl: pd.DataFrame, n_frames: int = 4) -> pd.DataFrame:
    ids, idxs, sizes = [], [], []
    for aid, p in zip(crawl["url"], crawl["html"]):
        p = p or b""
        span = max(1, len(p) // n_frames)
        for f in range(n_frames):
            ids.append(aid)
            idxs.append(f)
            sizes.append(len(p[f * span:(f + 1) * span]))
    return pd.DataFrame({"asset_id": ids,
                         "frame_idx": np.array(idxs, dtype=np.int64),
                         "frame_bytes": np.array(sizes, dtype=np.int64)})


def hist_quantile_daily(obs: pd.DataFrame,
                        quantiles=(0.5, 0.9, 0.99),
                        n_bins: int = 1024,
                        bin_width: int = 8) -> pd.DataFrame:
    """Histogram-sketch quantiles of text_len per day — same fixed
    integer binning and integer rank rule as functions/sketches.py
    (bin upper edge at ceil(q·total)), computed sequentially from the
    exact per-day value lists so any merge-order bug in the engine's
    distributed sum would show up as a mismatch."""
    day = pd.to_datetime(obs["warc_ts"]).dt.floor("1D")
    rows = []
    for d, g in obs.groupby(day, sort=True):
        v = g["text_len"].to_numpy()
        b = np.minimum(v // bin_width, n_bins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=n_bins)
        total = int(counts.sum())
        cum = np.cumsum(counts)
        ests = []
        for q in quantiles:
            q_micro = int(round(q * 1_000_000))
            rank = max(-(-q_micro * total // 1_000_000), 1)
            ests.append(int(np.searchsorted(cum, rank, side="left") + 1)
                        * bin_width)
        rows.append((d, total, *ests))
    qcols = [f"q{int(round(q * 100)):02d}" for q in quantiles]
    return pd.DataFrame(rows, columns=["bucket_ts", "n", *qcols])


def gorilla_segments(obs_long: pd.DataFrame) -> pd.DataFrame:
    """Expected Gorilla segment sizes per (url, metric) stream — an
    independent sequential BIT-COST count of the same codec spec
    (Pelkonen et al. VLDB'15, with the engine's 64-bit wide class and
    31-cap leading-zero field), never touching the engine's bitstream
    writer: any packing or window-state bug in functions/gorilla.py
    shows up as a byte-length mismatch."""
    df = obs_long.sort_values(["url", "metric", "warc_ts"],
                              kind="mergesort")
    rows = []
    for (url, metric), g in df.groupby(["url", "metric"], sort=False):
        ts = g["warc_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        vals = np.ascontiguousarray(
            g["value"].to_numpy(np.float64)).view(np.uint64)
        n = len(ts)
        # timestamps: 64-bit header + per-point delta-of-delta class
        ts_bits = 64
        prev_delta = 0
        for i in range(1, n):
            delta = int(ts[i] - ts[i - 1])
            d = delta - prev_delta
            prev_delta = delta
            if d == 0:
                ts_bits += 1
            elif -63 <= d <= 64:
                ts_bits += 2 + 7
            elif -255 <= d <= 256:
                ts_bits += 3 + 9
            elif -2047 <= d <= 2048:
                ts_bits += 4 + 12
            else:
                ts_bits += 4 + 64
        # values: 64-bit header + XOR codes with leading/trailing window
        val_bits = 64
        lz_win = sig_win = -1
        for i in range(1, n):
            x = int(vals[i] ^ vals[i - 1])
            if x == 0:
                val_bits += 1
                continue
            lz = min(64 - x.bit_length(), 31)
            tz = (x & -x).bit_length() - 1
            sig = 64 - lz - tz
            if lz_win >= 0 and lz >= lz_win and tz >= 64 - lz_win - sig_win:
                val_bits += 2 + sig_win
            else:
                lz_win, sig_win = lz, sig
                val_bits += 2 + 5 + 6 + sig
        rows.append((url, metric, n, (ts_bits + 7) // 8,
                     (val_bits + 7) // 8, 16 * n, True))
    out = pd.DataFrame(rows, columns=["url", "metric", "n", "ts_bytes",
                                      "val_bytes", "raw_bytes",
                                      "roundtrip_ok"])
    out["n"] = out["n"].astype(np.int32)
    for c in ("ts_bytes", "val_bytes", "raw_bytes"):
        out[c] = out[c].astype(np.int64)
    return out


def simhash_drift_crawl(scr: pd.DataFrame) -> pd.DataFrame:
    """Per-url snapshot simhash drift — sequential reference: simhash
    each screened snapshot, dedup (url, ts) by (text_len, sim) order,
    then hamming distance between consecutive snapshots per url."""
    bit_cols = np.arange(64, dtype=np.uint64)
    sims = np.empty(len(scr), dtype=np.uint64)
    for i, t in enumerate(scr["text"]):
        toks = _TOKEN_RE.findall((t or "").lower())
        if not toks:
            sims[i] = 0
            continue
        hs = np.array([_sha1_u64_one(w) for w in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> bit_cols[None, :]) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sims[i] = np.uint64(((votes > 0).astype(np.uint64)
                             << bit_cols).sum())
    df = pd.DataFrame({
        "url": scr["url"], "warc_ts": scr["warc_ts"],
        "text_len": scr["text_len"], "sim": sims.astype(np.int64)})
    df = (df.sort_values(["url", "warc_ts", "text_len", "sim"],
                         kind="mergesort")
          .drop_duplicates(["url", "warc_ts"], keep="first"))
    rows = []
    for url, g in df.groupby("url", sort=True):
        s = g["sim"].to_numpy(np.int64).view(np.uint64)
        ts = g["warc_ts"].to_numpy()
        for i in range(1, len(g)):
            rows.append((url, ts[i], ts[i - 1],
                         int(bin(int(s[i] ^ s[i - 1])).count("1"))))
    out = pd.DataFrame(rows, columns=["url", "warc_ts", "prev_ts",
                                      "hamming"])
    out["hamming"] = out["hamming"].astype(np.int64)
    return out


def bloom_semi_join_documents(docs: pd.DataFrame, emb: pd.DataFrame,
                              m_bits: int = 1 << 20,
                              k: int = 7) -> pd.DataFrame:
    """Bloom semi-join reference: sequential build of the same m-bit
    double-hashed filter spec (sha1-prefix key hash, h1 = low 32 bits,
    h2 = high 32 bits forced odd, pos_i = (h1 + i·h2) mod m, LSB-first
    bit order), then probe — false positives and all."""
    bits = bytearray(m_bits // 8)

    def hash_of(key) -> tuple[int, int]:
        h = _sha1_u64_one(str(key))
        return int(h) & 0xFFFFFFFF, (int(h) >> 32) | 1

    for key in emb.loc[emb["label"] <= 3, "vec_id"]:
        h1, h2 = hash_of(key)
        for i in range(k):
            p = (h1 + i * h2) % m_bits
            bits[p >> 3] |= 1 << (p & 7)
    keep = []
    for key in docs["doc_id"]:
        h1, h2 = hash_of(key)
        hit = True
        for i in range(k):
            p = (h1 + i * h2) % m_bits
            if not (bits[p >> 3] >> (p & 7)) & 1:
                hit = False
                break
        keep.append(hit)
    out = docs.loc[keep, ["doc_id", "lang", "n_chars"]].copy()
    return out.reset_index(drop=True)


def kmv_distinct_urls_daily(obs: pd.DataFrame, k: int = 256) -> pd.DataFrame:
    """KMV distinct urls per day — sequential reference: exact per-day
    distinct key set, sha1-prefix hashes, k smallest, same estimator
    arithmetic as functions/sketches.py ((k-1)/u_k with u_k =
    (h_k + 1) / 2^64; exact count below k)."""
    day = pd.to_datetime(obs["warc_ts"]).dt.floor("1D")
    rows = []
    for d, g in obs.groupby(day, sort=True):
        hs = np.unique(np.array(
            [int.from_bytes(hashlib.sha1(str(u).encode()).digest()[:8],
                            "big") for u in set(g["url"])],
            dtype=np.uint64))
        n = len(hs)
        if n < k:
            est = float(n)
            n_sample = n
        else:
            u_k = (float(hs[:k][-1]) + 1.0) / 18446744073709551616.0
            est = (k - 1) / u_k
            n_sample = k
        rows.append((d, n_sample, round(est, 6)))
    return pd.DataFrame(rows, columns=["bucket_ts", "n_sample",
                                       "kmv_estimate"])


def near_dup_clusters_documents(docs: pd.DataFrame) -> pd.DataFrame:
    """Connected components over the near-dup pair graph — sequential
    reference: golden minhash pairs + classic union-find, cluster id =
    min doc_id per component."""
    pairs = minhash_near_dup_documents(docs)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ia, ib in pairs[["id_a", "id_b"]].itertuples(index=False):
        ra, rb = find(int(ia)), find(int(ib))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    rows = [(v, find(v)) for v in members]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"]).astype(
        {"doc_id": np.int64, "cluster_id": np.int64})


def near_dup_keep_one_documents(docs: pd.DataFrame) -> pd.DataFrame:
    """Keep-one corpus dedup — sequential reference: drop every doc
    whose union-find cluster id differs from its own id."""
    clusters = near_dup_clusters_documents(docs)
    drop = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"],
                            "doc_id"])
    out = docs.loc[~docs["doc_id"].isin(drop),
                   ["doc_id", "lang", "n_chars"]]
    return out.reset_index(drop=True)


def winnowing_near_dup_documents(docs: pd.DataFrame, k: int = 12,
                                 w: int = 8, min_shared: int = 8,
                                 df_cap: int = 32) -> pd.DataFrame:
    """Independent winnowing twin (defaults mirror the registered
    query's parameters so a default-argument caller regenerates a
    config-aligned golden): an explicit per-window Python loop
    (scan each length-w window left→right keeping the min with ≥ so
    later ties win = rightmost-minimum rule), dict-based inverted
    index and pair counting — no shared code with the engine beyond
    the published 61-bit Rabin–Karp constant."""
    BASE, MASK = 1099511628211, (1 << 61) - 1
    index: dict[int, list[int]] = {}
    for r in docs.itertuples():
        data = (r.text or "").encode("utf-8")
        n = len(data)
        span = min(k, max(1, n)) if n else 0
        hashes = []
        if n == 0:
            hashes = [0]
        else:
            m = max(1, n - k + 1)
            for i in range(m):
                h = 0
                for j in range(i, i + span):
                    h = (h * BASE + data[j]) & ((1 << 64) - 1)
                hashes.append(h & MASK)
        sel = set()
        if len(hashes) <= w:
            sel.add(min(hashes))
        else:
            for s in range(len(hashes) - w + 1):
                best, arg = hashes[s], s
                for j in range(s + 1, s + w):
                    if hashes[j] <= best:       # ties → rightmost
                        best, arg = hashes[j], j
                sel.add(hashes[arg])
        for fp in sel:
            index.setdefault(fp, []).append(int(r.doc_id))
    counts: dict[tuple[int, int], int] = {}
    for fp, ids in index.items():
        ids = sorted(set(ids))
        if len(ids) < 2 or len(ids) > df_cap:
            continue
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                p = (ids[i], ids[j])
                counts[p] = counts.get(p, 0) + 1
    rows = [(a, b, c) for (a, b), c in counts.items()
            if c >= min_shared]
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "shared"]
                        ).astype({"doc_a": np.int64, "doc_b": np.int64,
                                  "shared": np.int64})


def simhash_near_dup_documents(docs: pd.DataFrame,
                               max_hamming: int = 3) -> pd.DataFrame:
    """SimHash pair detection — sequential reference: brute-force
    all-pairs hamming over the golden sketches (the 4×16-bit banding
    is LOSSLESS at radius 3 by pigeonhole, so banded == brute force)."""
    sh = simhash_documents(docs)
    ids = sh["doc_id"].to_numpy(np.int64)
    hs = np.ascontiguousarray(sh["simhash"].to_numpy(np.int64)) \
        .view(np.uint64)
    a, b = np.triu_indices(len(ids), k=1)
    x = hs[a] ^ hs[b]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                        axis=1).sum(axis=1).astype(np.int64)
    keep = ham <= max_hamming
    out = pd.DataFrame({"id_a": ids[a][keep], "id_b": ids[b][keep],
                        "hamming": ham[keep]})
    swap = out["id_a"] > out["id_b"]
    out.loc[swap, ["id_a", "id_b"]] = \
        out.loc[swap, ["id_b", "id_a"]].to_numpy()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def incremental_near_dup_documents(docs: pd.DataFrame,
                                   split_id: int = 400) -> pd.DataFrame:
    """Delta dedup — sequential reference: full-corpus golden pairs
    filtered to pairs touching a doc with id ≥ split_id (banding is
    deterministic, so incremental == filtered full recompute)."""
    pairs = minhash_near_dup_documents(docs)
    m = (pairs["id_a"] >= split_id) | (pairs["id_b"] >= split_id)
    return pairs[m].reset_index(drop=True)


def lttb_downsample_crawl(obs_long: pd.DataFrame,
                          n_out: int = 20) -> pd.DataFrame:
    """LTTB per (url, metric) — sequential reference implementing
    Steinarsson's algorithm directly (same bucket boundaries:
    linspace(1, n-1, n_out-1) floored; next-bucket mean anchor; final
    anchor region runs to the series end)."""
    rows = []
    srt = obs_long.sort_values(["url", "metric", "warc_ts"],
                               kind="mergesort")
    for _, g in srt.groupby(["url", "metric"], sort=False):
        x = g["warc_ts"].astype("int64").to_numpy().astype(np.float64)
        y = g["value"].to_numpy(np.float64)
        n = len(x)
        if n_out >= n or n_out < 3:
            rows.append(g)
            continue
        bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        sel = [0]
        a = 0
        for i in range(n_out - 2):
            lo, hi = bounds[i], bounds[i + 1]
            nlo = bounds[i + 1]
            nhi = bounds[i + 2] if i < n_out - 3 else n
            ax_, ay_ = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            best, besta = -1.0, lo
            for j in range(lo, hi):
                area = abs((x[a] - ax_) * (y[j] - y[a])
                           - (x[a] - x[j]) * (ay_ - y[a]))
                if area > best:
                    best, besta = area, j
            a = besta
            sel.append(a)
        sel.append(n - 1)
        rows.append(g.iloc[sel])
    return pd.concat(rows, ignore_index=True)[
        ["url", "metric", "warc_ts", "value"]]


def ewma_crawl(obs_long: pd.DataFrame, alpha: float = 0.3
               ) -> pd.DataFrame:
    """Independent EWMA recursion (explicit Python loop per series,
    adjust=False semantics), rounded to 6 digits like the engine."""
    df = obs_long.sort_values(["url", "metric", "warc_ts"],
                              kind="mergesort").reset_index(drop=True)
    out = np.empty(len(df))
    for _, g in df.groupby(["url", "metric"], sort=False):
        v = g["value"].to_numpy(np.float64)
        s = np.empty(len(v))
        acc = v[0]
        s[0] = acc
        for i in range(1, len(v)):
            acc = (1.0 - alpha) * acc + alpha * v[i]
            s[i] = acc
        out[g.index.to_numpy()] = s
    df["ewma"] = np.round(out, 6)
    return df[["url", "metric", "warc_ts", "value", "ewma"]]


def james_stein_domains(obs: pd.DataFrame) -> pd.DataFrame:
    """Independent James-Stein twin: same url-sorted per-domain
    partials (n, Σμ, Σμ²), domain-sorted driver arithmetic."""
    g = obs.groupby("url")["text_len"].agg(["sum", "count"])
    per_url = pd.DataFrame({
        "url": g.index.to_numpy(),
        "mu": g["sum"].to_numpy(np.float64)
        / g["count"].to_numpy(np.float64)})
    per_url["domain"] = per_url["url"].str.extract(
        r"^[a-z]+://([^/]+)", expand=False)
    rows = []
    for d, sub in per_url.sort_values(["domain", "url"],
                                      kind="mergesort").groupby(
                                          "domain", sort=True):
        mu = sub["mu"].to_numpy(np.float64)
        rows.append((d, len(mu), float(mu.sum()),
                     float((mu * mu).sum())))
    parts = pd.DataFrame(rows, columns=["domain", "n", "sm", "sm2"])
    n = parts["n"].to_numpy(np.float64)
    xbar = parts["sm"].to_numpy(np.float64) / n
    var_w = parts["sm2"].to_numpy(np.float64) / n - xbar * xbar
    se2 = var_w / np.maximum(n - 1.0, 1.0)
    k = len(parts)
    mu_g = float(xbar.mean())
    S = float(((xbar - mu_g) ** 2).sum())
    # JS dominates only for k>=4 — degenerate fallback is NO shrinkage
    lam = max(0.0, 1.0 - (k - 3.0) * float(se2.mean()) / S) \
        if S > 0 and k > 3 else 1.0
    js = mu_g + lam * (xbar - mu_g)
    return pd.DataFrame({
        "domain": parts["domain"],
        "n_urls": parts["n"].to_numpy(np.int64),
        "mean_raw": _sql_round_arr(xbar) + 0.0,
        "mean_js": _sql_round_arr(js) + 0.0,
        "shrink_factor": _sql_round_arr(np.full(k, lam)) + 0.0})


def bootstrap_ci_crawl(obs: pd.DataFrame, B: int = 200, m: int = 200
                       ) -> pd.DataFrame:
    """Independent bootstrap-CI twin: per-url means via pandas
    groupby, same domain-SipHash seeds, RandomState draw matrix and
    percentile CI."""
    g = obs.groupby("url")["text_len"].agg(["sum", "count"])
    per_url = pd.DataFrame({
        "url": g.index.to_numpy(),
        "mu": g["sum"].to_numpy(np.float64)
        / g["count"].to_numpy(np.float64)})
    per_url["domain"] = per_url["url"].str.extract(
        r"^[a-z]+://([^/]+)", expand=False)
    rows = []
    for d, sub in per_url.sort_values(["domain", "url"],
                                      kind="mergesort").groupby(
                                          "domain", sort=True):
        x = sub["mu"].to_numpy(np.float64)
        n = len(x)
        seed = int(pd.util.hash_array(
            np.asarray([d], dtype=object))[0]) & 0xFFFFFFFF
        rng = np.random.RandomState(seed)
        take = min(n, m)
        idx = rng.randint(0, n, size=(B, take))
        means = x[idx].mean(axis=1)
        lo, hi = np.quantile(means, [0.025, 0.975])
        rows.append((d, n, float(x.mean()), float(lo), float(hi)))
    out = pd.DataFrame(rows, columns=["domain", "n_urls", "mean_len",
                                      "ci_lo", "ci_hi"])
    for c in ("mean_len", "ci_lo", "ci_hi"):
        out[c] = _sql_round_arr(out[c].to_numpy(np.float64)) + 0.0
    out["n_urls"] = out["n_urls"].astype(np.int64)
    return out


def dgim_change_count_crawl(obs: pd.DataFrame, window: int = 64
                            ) -> pd.DataFrame:
    """Independent DGIM twin: oldest-first bucket list, the same
    canonical ≤2-per-size cascade (merge the two oldest of a size,
    keep the newer timestamp), estimate = total − oldest + oldest//2."""
    rows = []
    for url, g in obs.sort_values(["url", "warc_ts"],
                                  kind="mergesort").groupby("url",
                                                            sort=True):
        v = g["text_len"].to_numpy(np.int64)
        n = len(v)
        bits = [0] + [1 if v[i] != v[i - 1] else 0 for i in range(1, n)]
        buckets: list[tuple[int, int]] = []     # (ts, size) OLDEST first
        for t in range(n):
            buckets = [(ts, sz) for ts, sz in buckets
                       if ts > t - window]
            if not bits[t]:
                continue
            buckets.append((t, 1))
            size = 1
            while sum(1 for _, sz in buckets if sz == size) > 2:
                idx = [j for j, (_, sz) in enumerate(buckets)
                       if sz == size]
                a, b = idx[0], idx[1]           # two oldest
                merged = (buckets[b][0], size * 2)   # newer timestamp
                buckets = [bk for j, bk in enumerate(buckets)
                           if j not in (a, b)]
                # insert keeping oldest-first timestamp order
                k = 0
                while k < len(buckets) and buckets[k][0] < merged[0]:
                    k += 1
                buckets.insert(k, merged)
                size *= 2
        exact = sum(bits[max(0, n - window):])
        if buckets:
            total = sum(sz for _, sz in buckets)
            oldest = buckets[0][1]
            est = total - oldest + oldest // 2
        else:
            est = 0
        rows.append((url, exact, est, len(buckets)))
    return pd.DataFrame(rows, columns=["url", "exact_changes",
                                       "dgim_estimate", "n_buckets"]
                        ).astype({"exact_changes": np.int64,
                                  "dgim_estimate": np.int64,
                                  "n_buckets": np.int64})


def hilbert_layout_crawl(obs: pd.DataFrame,
                         rows_per_file: int = 200) -> pd.DataFrame:
    """Independent Hilbert-layout twin (default ``rows_per_file``
    mirrors the registered query's parameter): scalar-loop xy→d (the
    canonical published algorithm, per point), pandas sort/rank/
    groupby for the file cuts and zone maps."""

    def xy2d(x: int, y: int, order: int = 16) -> int:
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if x & s else 0
            ry = 1 if y & s else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    us = obs["warc_ts"].to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    day = us // 86_400_000_000
    uid = obs["url"].str.extract(r"u/(\d+)$", expand=False) \
        .astype(np.int64).to_numpy() % 65536
    h = np.fromiter((xy2d(int(dx), int(u))
                     for dx, u in zip(day % 65536, uid)),
                    np.int64, len(day))
    df = pd.DataFrame({"url": obs["url"].to_numpy(), "warc_ts": us,
                       "day": day, "uid": uid, "h": h})
    df = df.sort_values(["h", "url", "warc_ts"], kind="mergesort",
                        ignore_index=True)
    df["file_id"] = (np.arange(len(df), dtype=np.int64)
                     // rows_per_file)
    out = df.groupby("file_id").agg(
        n=("day", "size"), min_day=("day", "min"),
        max_day=("day", "max"), min_uid=("uid", "min"),
        max_uid=("uid", "max")).reset_index()
    return out.astype({c: np.int64 for c in out.columns})


def partition_extents_crawl(obs: pd.DataFrame, n_buckets: int = 64
                            ) -> pd.DataFrame:
    """Per-partition extents (manifest/A8 contract): row count,
    distinct urls, min/max timestamp per url_bucket. Replicates the
    engine's bucket assignment (pandas fixed-key SipHash, per-value
    path) as part of the determinism contract."""
    h = pd.util.hash_array(obs["url"].to_numpy(object), categorize=False)
    b = (h % np.uint64(n_buckets)).astype(np.int64)
    g = obs.assign(url_bucket=b).groupby("url_bucket")
    out = g.agg(n_rows=("url", "size"), n_urls=("url", "nunique"),
                min_ts=("warc_ts", "min"), max_ts=("warc_ts", "max"))
    return out.reset_index()


def holt_linear_crawl(obs_long: pd.DataFrame, alpha: float = 0.5,
                      beta: float = 0.3) -> pd.DataFrame:
    """Independent Holt double-exponential recursion (explicit scalar
    loop per series): l_0 = x_0, b_0 = x_1 - x_0 (0 for singleton),
    l_t = a*x_t + (1-a)*(l+b), b_t = b_*(l_t-l) + (1-b_)*b."""
    df = obs_long.sort_values(["url", "metric", "warc_ts"],
                              kind="mergesort").reset_index(drop=True)
    out_l = np.empty(len(df))
    out_b = np.empty(len(df))
    for _, g in df.groupby(["url", "metric"], sort=False):
        v = g["value"].to_numpy(np.float64)
        idx = g.index.to_numpy()
        lev = v[0]
        tr = v[1] - v[0] if len(v) > 1 else 0.0
        out_l[idx[0]] = lev
        out_b[idx[0]] = tr
        for i in range(1, len(v)):
            lnew = alpha * v[i] + (1.0 - alpha) * (lev + tr)
            tr = beta * (lnew - lev) + (1.0 - beta) * tr
            lev = lnew
            out_l[idx[i]] = lev
            out_b[idx[i]] = tr
    df["level"] = np.round(out_l, 6)
    df["trend"] = np.round(out_b, 6)
    return df[["url", "metric", "warc_ts", "value", "level", "trend"]]


def cusum_crawl(obs_long: pd.DataFrame, k: float = 0.5, h: float = 4.0
                ) -> pd.DataFrame:
    """Independent two-sided CUSUM (explicit scalar loop per series)
    over per-series population z-scores; constant series (std == 0)
    carry null cusum and alarm false."""
    df = obs_long.sort_values(["url", "metric", "warc_ts"],
                              kind="mergesort").reset_index(drop=True)
    out_p = np.empty(len(df))
    out_m = np.empty(len(df))
    for _, g in df.groupby(["url", "metric"], sort=False):
        v = g["value"].to_numpy(np.float64)
        idx = g.index.to_numpy()
        std = float(np.sqrt(((v - v.mean()) ** 2).sum() / len(v)))
        if std == 0.0:
            out_p[idx] = np.nan
            out_m[idx] = np.nan
            continue
        mean = v.mean()
        sp = sm = 0.0
        for i in range(len(v)):
            z = (v[i] - mean) / std
            sp = max(0.0, sp + z - k)
            sm = max(0.0, sm - z - k)
            out_p[idx[i]] = sp
            out_m[idx[i]] = sm
    df["cusum_pos"] = np.round(out_p, 6)
    df["cusum_neg"] = np.round(out_m, 6)
    with np.errstate(invalid="ignore"):
        df["alarm"] = (out_p > h) | (out_m > h)
    return df[["url", "metric", "warc_ts", "value",
               "cusum_pos", "cusum_neg", "alarm"]]


def reservoir_sample_events(events: pd.DataFrame, k: int = 20
                            ) -> pd.DataFrame:
    """Independent bottom-k-by-hash sample: smallest k SipHash(event_id)
    per event_type (hash ties by event_id). The fixed-key pandas
    SipHash is the determinism contract, as in stratified_sample."""
    h = pd.util.hash_pandas_object(
        events["event_id"], index=False, categorize=False
    ).astype(np.int64)
    df = events.assign(_h=h).sort_values(
        ["event_type", "_h", "event_id"], kind="mergesort")
    out = df.groupby("event_type", sort=False).head(k)
    return out[["event_id", "event_type", "user_id", "ts"]] \
        .reset_index(drop=True)


def compression_signal_documents(docs: pd.DataFrame, level: int = 6
                                 ) -> pd.DataFrame:
    """Independent zlib compression-ratio computation (same pinned
    level; zlib output is deterministic for a given level/input)."""
    import zlib

    raw = np.array([len(t.encode("utf-8")) if t else 0
                    for t in docs["text"]], dtype=np.int64)
    comp = np.array(
        [len(zlib.compress(t.encode("utf-8"), level)) if t else 0
         for t in docs["text"]], dtype=np.int64)
    ratio = np.round(comp / np.maximum(raw, 1), 6)
    return pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(),
                         "raw_bytes": raw, "zlib_bytes": comp,
                         "compression_ratio": ratio})


def pagerank_words_documents(docs: pd.DataFrame, damping: float = 0.85,
                             iterations: int = 10) -> pd.DataFrame:
    """Independent weighted PageRank over the word bigram graph —
    replicates the engine's determinism contract exactly: per-node
    sums via pandas groupby-sum over rows mergesort-sorted by
    (node, _src), including the zero contribution row per node, so
    every float operation has the identical order.
    """
    w1s, w2s = [], []
    for t in docs["text"]:
        toks = (t or "").lower().split(" ")
        w1s.extend(toks[:-1])
        w2s.extend(toks[1:])
    edges = (pd.DataFrame({"w1": w1s, "w2": w2s})
             .groupby(["w1", "w2"], sort=False).size()
             .rename("n").reset_index())
    edges["n"] = edges["n"].astype(np.int64)
    nodes = np.unique(np.concatenate([edges["w1"].to_numpy(),
                                      edges["w2"].to_numpy()]))
    n_nodes = len(nodes)
    teleport = (1.0 - damping) / float(n_nodes)
    outw = edges.groupby("w1")["n"].sum()
    edges = edges.assign(outw=edges["w1"].map(outw).astype(np.int64))
    ranks = pd.Series(1.0 / float(n_nodes), index=nodes)
    zeros = pd.DataFrame({"node": nodes, "_src": "", "c": 0.0})
    for _ in range(iterations):
        r = edges["w1"].map(ranks).to_numpy(np.float64)
        w = edges["n"].to_numpy(np.float64)
        ow = edges["outw"].to_numpy(np.float64)
        contribs = pd.DataFrame({"node": edges["w2"].to_numpy(),
                                 "_src": edges["w1"].to_numpy(),
                                 "c": (r * w) / ow})
        allc = pd.concat([contribs, zeros], ignore_index=True) \
            .sort_values(["node", "_src"], kind="mergesort")
        s = allc.groupby("node", sort=False)["c"].sum()
        ranks = pd.Series(teleport + damping * s.to_numpy(np.float64),
                          index=s.index)
    # half-away-from-zero, same convention as the engine's sql_round
    r = ranks.to_numpy(np.float64) * 1e6
    r = np.copysign(np.floor(np.abs(r) + 0.5), r) / 1e6
    return pd.DataFrame({"node": ranks.index.to_numpy(), "rank": r})


def source_mixture_documents(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent hash-threshold Bernoulli thinning (fixed-key pandas
    SipHash, same contract as the reservoir sample): keep rows whose
    hash fraction falls under the source's target weight."""
    weights = {**{f"src{i}": 1.0 for i in range(5)},
               **{f"src{i}": 0.5 for i in range(5, 10)},
               **{f"src{i}": 0.1 for i in range(10, 15)}}
    h = pd.util.hash_pandas_object(docs["doc_id"], index=False,
                                   categorize=False).to_numpy()
    frac = h.astype(np.float64) / float(2**64)
    thr = (docs["source"].map(weights).fillna(0.0)
           .to_numpy(dtype=np.float64))
    out = docs[frac < thr][["doc_id", "source", "lang"]]
    return out.reset_index(drop=True)


def _kmeans_centroids(emb: pd.DataFrame, k: int = 8,
                      iterations: int = 5, num_partitions: int = 64
                      ) -> np.ndarray:
    """Centroid fit for :func:`kmeans_embeddings` /
    :func:`semdedup_embeddings` — the engine's determinism contract
    bit-for-bit: fixed hash partitions (``pd.util.hash_array(id) %
    P``), per-partition id-sorted ``np.add.at`` accumulation, merge
    sorted by (cluster, dim, pid), argmin ties to the smaller cluster,
    empty clusters keep their centroid."""
    ids = emb["vec_id"].to_numpy(np.int64)
    seed = emb[emb["vec_id"] < k].sort_values("vec_id")
    C = np.stack([np.asarray(v, dtype=np.float64)
                  for v in seed["embedding"]])
    d = C.shape[1]
    pid_all = (pd.util.hash_array(ids, categorize=False)
               % np.uint64(num_partitions)).astype(np.int64)

    def assign_of(X, Cm):
        d2 = (X ** 2).sum(1)[:, None] - 2.0 * (X @ Cm.T) \
            + (Cm ** 2).sum(1)[None, :]
        return np.argmin(d2, axis=1)

    for _ in range(iterations):
        parts = []
        for pid in np.unique(pid_all):
            sub = emb[pid_all == pid].sort_values("vec_id",
                                                  kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in sub["embedding"]])
            a = assign_of(X, C)
            acc = np.zeros((k, d), dtype=np.float64)
            np.add.at(acc, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            pf = pd.DataFrame({
                "pid": np.repeat(np.int64(pid), k * d),
                "cluster": np.repeat(np.arange(k, dtype=np.int64), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), k),
                "s": acc.ravel(),
                "n": np.repeat(cnt, d),
            })
            parts.append(pf[pf["n"] > 0])
        partials = pd.concat(parts, ignore_index=True).sort_values(
            ["cluster", "dim", "pid"], kind="mergesort")
        g = partials.groupby(["cluster", "dim"], sort=True)
        s = g["s"].sum()
        n = g["n"].sum()
        C_new = C.copy()
        for (ci, di), sv in s.items():
            nv = n[(ci, di)]
            if nv > 0:
                C_new[ci, di] = sv / float(nv)
        C = C_new
    return C


def _assign_of(X: np.ndarray, Cm: np.ndarray) -> np.ndarray:
    d2 = (X ** 2).sum(1)[:, None] - 2.0 * (X @ Cm.T) \
        + (Cm ** 2).sum(1)[None, :]
    return np.argmin(d2, axis=1)


def kmeans_embeddings(emb: pd.DataFrame, k: int = 8,
                      iterations: int = 5, num_partitions: int = 64
                      ) -> pd.DataFrame:
    """Independent full-data Lloyd's k-means (see
    :func:`_kmeans_centroids` for the determinism contract)."""
    C = _kmeans_centroids(emb, k, iterations, num_partitions)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    return pd.DataFrame({"vec_id": emb["vec_id"].to_numpy(np.int64),
                         "cluster": _assign_of(X, C).astype(np.int64)})


def semdedup_embeddings(emb: pd.DataFrame, k: int = 8,
                        iterations: int = 5, tau: float = 0.45,
                        num_partitions: int = 64) -> pd.DataFrame:
    """Independent SemDeDup twin: k-means assign, then per cluster a
    greedy farthest-from-centroid-first scan (ascending cosine to the
    normalized centroid, ties by ascending id) keeping a vector iff
    its max cosine against the kept set is < tau — identical
    fixed-order float64 arithmetic to the engine kernel."""
    C = _kmeans_centroids(emb, k, iterations, num_partitions)
    ids_all = emb["vec_id"].to_numpy(np.int64)
    X_all = np.stack([np.asarray(v, dtype=np.float64)
                      for v in emb["embedding"]])
    cl_all = _assign_of(X_all, C).astype(np.int64)
    order_base = np.argsort(ids_all, kind="mergesort")
    outs = []
    for c in np.unique(cl_all):
        m = order_base[cl_all[order_base] == c]
        ids = ids_all[m]
        X = X_all[m]
        nrm = np.sqrt((X ** 2).sum(1))
        nrm[nrm == 0.0] = 1.0
        Xn = X / nrm[:, None]
        cc = C[int(c)]
        cn = np.sqrt((cc ** 2).sum())
        ccn = cc / (cn if cn > 0 else 1.0)
        cosc = Xn @ ccn
        order = np.lexsort((ids, cosc))
        keep = np.zeros(len(ids), dtype=bool)
        kept: list = []
        for i in order:
            if kept and float((Xn[kept] @ Xn[i]).max()) >= tau:
                continue
            keep[i] = True
            kept.append(i)
        outs.append(pd.DataFrame({
            "vec_id": ids, "cluster": np.full(len(ids), np.int64(c)),
            "keep": keep.astype(np.int64)}))
    return pd.concat(outs, ignore_index=True)


def pq_topk_embeddings(emb: pd.DataFrame, m: int = 8, ks: int = 16,
                       iterations: int = 3, num_partitions: int = 64,
                       k: int = 10) -> pd.DataFrame:
    """Independent PQ train/encode/ADC replicating the engine's
    determinism contract (fixed hash partitions, id-sorted sums,
    (sub, cluster, dim, pid)-sorted merge, argmin tie to smaller
    code, half-away rounding of adc_d2)."""
    ids = emb["vec_id"].to_numpy(np.int64)
    X_all = np.stack([np.asarray(v, dtype=np.float64)
                      for v in emb["embedding"]])
    d = X_all.shape[1]
    sub_d = d // m
    seed = emb[emb["vec_id"] < ks].sort_values("vec_id")
    seeds = np.stack([np.asarray(v, dtype=np.float64)
                      for v in seed["embedding"]])
    C = np.stack([seeds[:, j * sub_d:(j + 1) * sub_d]
                  for j in range(m)])
    pid_all = (pd.util.hash_array(ids, categorize=False)
               % np.uint64(num_partitions)).astype(np.int64)

    for _ in range(iterations):
        frames = []
        for pid in np.unique(pid_all):
            sel = pid_all == pid
            sub = emb[sel].sort_values("vec_id", kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in sub["embedding"]])
            for j in range(m):
                Xj = X[:, j * sub_d:(j + 1) * sub_d]
                Cj = C[j]
                d2 = (Xj ** 2).sum(1)[:, None] - 2.0 * (Xj @ Cj.T) \
                    + (Cj ** 2).sum(1)[None, :]
                a = np.argmin(d2, axis=1)
                acc = np.zeros((ks, sub_d), dtype=np.float64)
                np.add.at(acc, a, Xj)
                cnt = np.bincount(a, minlength=ks).astype(np.int64)
                f = pd.DataFrame({
                    "pid": np.repeat(np.int64(pid), ks * sub_d),
                    "sub": np.repeat(np.int64(j), ks * sub_d),
                    "cluster": np.repeat(
                        np.arange(ks, dtype=np.int64), sub_d),
                    "dim": np.tile(np.arange(sub_d, dtype=np.int64),
                                   ks),
                    "s": acc.ravel(),
                    "n": np.repeat(cnt, sub_d),
                })
                frames.append(f[f["n"] > 0])
        partials = pd.concat(frames, ignore_index=True).sort_values(
            ["sub", "cluster", "dim", "pid"], kind="mergesort")
        g = partials.groupby(["sub", "cluster", "dim"], sort=True)
        s = g["s"].sum()
        n = g["n"].sum()
        C_new = C.copy()
        for (j, ci, di), sv in s.items():
            nv = n[(j, ci, di)]
            if nv > 0:
                C_new[j, ci, di] = sv / float(nv)
        C = C_new

    codes = np.empty((len(emb), m), dtype=np.int64)
    for j in range(m):
        Xj = X_all[:, j * sub_d:(j + 1) * sub_d]
        Cj = C[j]
        d2 = (Xj ** 2).sum(1)[:, None] - 2.0 * (Xj @ Cj.T) \
            + (Cj ** 2).sum(1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1)

    q_df = emb[emb["vec_id"] < 3].sort_values("vec_id")
    rows = []
    for r in q_df.itertuples(index=False):
        q = np.asarray(r.embedding, dtype=np.float64)
        tab = np.stack([((q[j * sub_d:(j + 1) * sub_d][None, :]
                          - C[j]) ** 2).sum(1) for j in range(m)])
        d2 = tab[np.arange(m)[None, :], codes].sum(1)
        d2r = d2 * 1e6
        d2r = np.copysign(np.floor(np.abs(d2r) + 0.5), d2r) / 1e6
        order = np.lexsort((ids, d2r))[:k]
        rows.append(pd.DataFrame({
            "query_id": np.repeat(np.int64(r.vec_id), len(order)),
            "vec_id": ids[order],
            "adc_d2": d2r[order],
        }))
    return pd.concat(rows, ignore_index=True)


def bpe_merges_documents(docs: pd.DataFrame, n_merges: int = 30,
                         min_count: int = 1,
                         max_vocab: int | None = None) -> pd.DataFrame:
    """Independent BPE merge training: exact word frequencies via a
    pandas value_counts, then greedy merges with the same
    deterministic rule (count DESC, pair lexicographic ASC). Integer
    counts ⇒ order of accumulation is irrelevant. The prune mirrors
    the engine's bounded-collect contract: drop words below
    ``min_count``, then keep the top ``max_vocab`` by
    (count DESC, token ASC)."""
    toks: list = []
    for t in docs["text"]:
        toks.extend((t or "").lower().split(" "))
    vc = pd.Series(toks).value_counts()
    vcf = vc[vc >= min_count].reset_index()
    vcf.columns = ["token", "n"]
    vcf = vcf.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort")
    if max_vocab is not None:
        vcf = vcf.head(max_vocab)
    words = {w: [tuple(w), int(f)]
             for w, f in zip(vcf["token"], vcf["n"])}

    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for sym, f in words.values():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, cnt))
        joined = left + right
        for w, (sym, f) in words.items():
            if left not in sym:
                continue
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w][0] = tuple(out)
    out = pd.DataFrame(merges,
                       columns=["rank", "left", "right", "count"])
    out["rank"] = out["rank"].astype(np.int64)
    out["count"] = out["count"].astype(np.int64)
    return out


def bpe_encode_documents(docs: pd.DataFrame, n_merges: int = 30
                         ) -> pd.DataFrame:
    """Independent BPE tokenizer application: train merges with the
    independent trainer above, then encode every document word by
    greedy lowest-rank merging (leftmost occurrence first on rank
    ties) and count units. Sequential reference for the engine's
    broadcast-merges actor pool."""
    merges = bpe_merges_documents(docs, n_merges=n_merges,
                                  min_count=2, max_vocab=24)
    ranks = {(l, r): int(k) for k, l, r in
             zip(merges["rank"], merges["left"], merges["right"])}
    memo: dict = {}

    def units(w: str) -> int:
        if w in memo:
            return memo[w]
        sym = list(w)
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        memo[w] = len(sym)
        return len(sym)

    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = (t or "").lower().split(" ")
        rows.append((int(did), len(ws), sum(units(w) for w in ws)))
    out = pd.DataFrame(rows, columns=["doc_id", "n_words", "n_units"])
    return out.astype({"doc_id": np.int64, "n_words": np.int64,
                       "n_units": np.int64})


def skew_report_crawl(obs: pd.DataFrame) -> pd.DataFrame:
    """Independent per-bucket skew stats (rows, distinct urls, head-url
    share) using the shared SipHash bucket assignment."""
    df = obs.assign(url_bucket=_url_bucket(obs["url"]).astype(np.int64))
    per_url = (df.groupby(["url_bucket", "url"], sort=False)
               .size().rename("n").reset_index())
    g = per_url.groupby("url_bucket", sort=False)
    out = pd.DataFrame({
        "url_bucket": g.size().index.to_numpy(np.int64),
        "n_rows": g["n"].sum().to_numpy(np.int64),
        "n_urls": g.size().to_numpy(np.int64),
        "head_rows": g["n"].max().to_numpy(np.int64),
    })
    hs = (out["head_rows"].to_numpy(np.float64)
          / out["n_rows"].to_numpy(np.float64)) * 1e6
    out["head_share"] = np.copysign(np.floor(np.abs(hs) + 0.5), hs) / 1e6
    return out


def corpus_prep_documents(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent composed corpus prep: Gopher-style quality filter
    (≥25 tokens, stopword_ratio ≤ 0.08, dup-2gram frac ≤ 0.05), exact
    dedup keeping the min doc_id per distinct text, SipHash source
    mixture, then 64-token/48-stride chunking."""
    stop = {"the", "and", "of", "to", "in", "is", "that", "it", "was",
            "for", "on", "are", "with", "as"}
    keep_rows = []
    for r in docs.itertuples(index=False):
        toks = (r.text or "").split(" ")
        n = len(toks)
        if n < 25:
            continue
        sw = sum(1 for w in (r.text or "").lower().split(" ")
                 if w in stop) / n
        if sw > 0.08:
            continue
        bg = [toks[i] + " " + toks[i + 1] for i in range(n - 1)]
        dup = 0.0 if not bg else 1.0 - len(set(bg)) / len(bg)
        if dup > 0.05:
            continue
        keep_rows.append(r)
    kept = pd.DataFrame(keep_rows)
    kept = kept.sort_values("doc_id").drop_duplicates("text")
    # mixture (same weights/threshold rule as source_mixture_documents)
    weights = {**{f"src{i}": 1.0 for i in range(5)},
               **{f"src{i}": 0.5 for i in range(5, 10)},
               **{f"src{i}": 0.1 for i in range(10, 15)}}
    h = pd.util.hash_pandas_object(kept["doc_id"], index=False,
                                   categorize=False).to_numpy()
    frac = h.astype(np.float64) / float(2**64)
    thr = kept["source"].map(weights).fillna(0.0) \
        .to_numpy(dtype=np.float64)
    kept = kept[frac < thr]
    ids, cids, texts, ntoks = [], [], [], []
    for r in kept.itertuples(index=False):
        toks = (r.text or "").split(" ")
        n = len(toks)
        for ci, s in enumerate(range(0, n, 48)):
            ids.append(int(r.doc_id))
            cids.append(ci)
            texts.append(" ".join(toks[s:s + 64]))
            ntoks.append(min(64, n - s))
    return pd.DataFrame({"doc_id": np.array(ids, np.int64),
                         "chunk_id": np.array(cids, np.int64),
                         "chunk_text": texts,
                         "n_tokens": np.array(ntoks, np.int64)})


def cluster_top_terms(emb: pd.DataFrame, docs: pd.DataFrame
                      ) -> pd.DataFrame:
    """Independent cluster labeling: the kmeans_embeddings assignment
    joined to document text, token counts per cluster, top-3 by
    (count DESC, token ASC)."""
    assign = kmeans_embeddings(emb).set_index("vec_id")["cluster"]
    rows_c, rows_t = [], []
    for r in docs.itertuples(index=False):
        if r.doc_id not in assign.index:
            continue
        c = int(assign[r.doc_id])
        for w in (r.text or "").lower().split(" "):
            rows_c.append(c)
            rows_t.append(w)
    g = (pd.DataFrame({"cluster": np.array(rows_c, np.int64),
                       "token": rows_t})
         .groupby(["cluster", "token"], sort=False).size()
         .rename("n").reset_index())
    g["n"] = g["n"].astype(np.int64)
    g = g.sort_values(["cluster", "n", "token"],
                      ascending=[True, False, True], kind="mergesort")
    out = g.groupby("cluster", sort=False).head(3).reset_index(drop=True)
    return out


def _pq_train(emb: pd.DataFrame, m: int, ks: int, iterations: int,
              num_partitions: int = 64) -> np.ndarray:
    """Shared PQ codebook training twin (see pq_topk_embeddings)."""
    ids = emb["vec_id"].to_numpy(np.int64)
    seed = emb[emb["vec_id"] < ks].sort_values("vec_id")
    seeds = np.stack([np.asarray(v, dtype=np.float64)
                      for v in seed["embedding"]])
    d = seeds.shape[1]
    sub_d = d // m
    C = np.stack([seeds[:, j * sub_d:(j + 1) * sub_d]
                  for j in range(m)])
    pid_all = (pd.util.hash_array(ids, categorize=False)
               % np.uint64(num_partitions)).astype(np.int64)
    for _ in range(iterations):
        frames = []
        for pid in np.unique(pid_all):
            sub = emb[pid_all == pid].sort_values("vec_id",
                                                  kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in sub["embedding"]])
            for j in range(m):
                Xj = X[:, j * sub_d:(j + 1) * sub_d]
                Cj = C[j]
                d2 = (Xj ** 2).sum(1)[:, None] - 2.0 * (Xj @ Cj.T) \
                    + (Cj ** 2).sum(1)[None, :]
                a = np.argmin(d2, axis=1)
                acc = np.zeros((ks, sub_d), dtype=np.float64)
                np.add.at(acc, a, Xj)
                cnt = np.bincount(a, minlength=ks).astype(np.int64)
                f = pd.DataFrame({
                    "pid": np.repeat(np.int64(pid), ks * sub_d),
                    "sub": np.repeat(np.int64(j), ks * sub_d),
                    "cluster": np.repeat(
                        np.arange(ks, dtype=np.int64), sub_d),
                    "dim": np.tile(np.arange(sub_d, dtype=np.int64),
                                   ks),
                    "s": acc.ravel(),
                    "n": np.repeat(cnt, sub_d),
                })
                frames.append(f[f["n"] > 0])
        partials = pd.concat(frames, ignore_index=True).sort_values(
            ["sub", "cluster", "dim", "pid"], kind="mergesort")
        g = partials.groupby(["sub", "cluster", "dim"], sort=True)
        s = g["s"].sum()
        n = g["n"].sum()
        C_new = C.copy()
        for (j, ci, di), sv in s.items():
            nv = n[(j, ci, di)]
            if nv > 0:
                C_new[j, ci, di] = sv / float(nv)
        C = C_new
    return C


def ivfpq_topk_embeddings(emb: pd.DataFrame, n_lists: int = 8,
                          n_probe: int = 3, m: int = 8, ks: int = 16,
                          iterations: int = 3, k: int = 10
                          ) -> pd.DataFrame:
    """Independent IVF-PQ: coarse sampled-kmeans centroids (cosine
    space, identical to the ivf_topk twin), raw-vector PQ codebooks,
    ADC scan restricted to each query's probed lists."""
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    mat = X / nrm
    rng = np.random.default_rng(0)
    cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)),
                          replace=False)]
    for _ in range(5):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            msk = assign == c
            if msk.any():
                v = mat[msk].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    lists = np.argmax(mat @ cent.T, axis=1)

    C = _pq_train(emb, m, ks, iterations)
    sub_d = C.shape[2]
    codes = np.empty((len(emb), m), dtype=np.int64)
    for j in range(m):
        Xj = X[:, j * sub_d:(j + 1) * sub_d]
        Cj = C[j]
        d2 = (Xj ** 2).sum(1)[:, None] - 2.0 * (Xj @ Cj.T) \
            + (Cj ** 2).sum(1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1)

    q_df = emb[emb["vec_id"] < 3].sort_values("vec_id")
    q_mat = np.stack([np.asarray(v, dtype=np.float64)
                      for v in q_df["embedding"]])
    qn = np.linalg.norm(q_mat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    probe = np.argsort(-((q_mat / qn) @ cent.T), axis=1)[:, :n_probe]
    rows = []
    for qi, r in enumerate(q_df.itertuples(index=False)):
        q = np.asarray(r.embedding, dtype=np.float64)
        tab = np.stack([((q[j * sub_d:(j + 1) * sub_d][None, :]
                          - C[j]) ** 2).sum(1) for j in range(m)])
        mask = np.isin(lists, probe[qi])
        d2 = tab[np.arange(m)[None, :], codes[mask]].sum(1)
        d2r = d2 * 1e6
        d2r = np.copysign(np.floor(np.abs(d2r) + 0.5), d2r) / 1e6
        cand_ids = ids[mask]
        order = np.lexsort((cand_ids, d2r))[:k]
        rows.append(pd.DataFrame({
            "query_id": np.repeat(np.int64(r.vec_id), len(order)),
            "vec_id": cand_ids[order],
            "adc_d2": d2r[order],
        }))
    return pd.concat(rows, ignore_index=True)


# --- training driver (reference Trainer.fit lifecycle) --------------------

def _sql_round_arr(x, nd: int = 6):
    x = np.asarray(x, dtype=np.float64)
    s = x * (10.0 ** nd)
    return np.copysign(np.floor(np.abs(s) + 0.5), s) / (10.0 ** nd)


def _fit_linear_golden(emb: pd.DataFrame, epochs: int = 20,
                       learning_rate: float = 0.5,
                       weight_decay: float = 0.0,
                       valid_mod: int | None = 5,
                       valid_every_n_epochs: int = 1,
                       smooth_period: int = 5, patience: int = 6,
                       use_class_weights: bool = False,
                       P: int = 16):
    """Independent softmax-regression fit replicating the trainer's
    determinism spec: fixed hash partitions (pandas SipHash % P),
    id-sorted rows per partition, partial gradients merged in
    ascending-pid order, full-batch weighted-mean cross-entropy GD,
    reference valid/early-stop cadence. Returns (log_df, W, b)."""
    ids = emb["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    y = emb["label"].to_numpy(np.int64)
    order = np.argsort(ids, kind="mergesort")
    ids, X, y = ids[order], X[order], y[order]
    pid = (pd.util.hash_array(np.ascontiguousarray(ids),
                              categorize=False)
           % np.uint64(P)).astype(np.int64)
    is_valid = ((ids % valid_mod) == 0) if valid_mod else (
        np.zeros(len(ids), dtype=bool))

    k = int(y.max()) + 1
    d = X.shape[1]
    W = np.zeros((k, d))
    b = np.zeros(k)

    if use_class_weights:
        counts = np.bincount(y[~is_valid], minlength=k).astype(np.float64)
        cw = np.zeros(k)
        present = counts > 0
        cw[present] = 1.0 / counts[present]
        cw[present] = cw[present] / cw[present].sum() * present.sum()
    else:
        cw = np.ones(k)

    def merged_pass(mask: np.ndarray, want_grad: bool) -> np.ndarray:
        total = np.zeros(k * d + k + 4)
        for p in np.unique(pid[mask]):
            sel = mask & (pid == p)
            Xp, yp = X[sel], y[sel]
            logits = Xp @ W.T + b
            z = logits - logits.max(axis=1, keepdims=True)
            e = np.exp(z)
            prob = e / e.sum(axis=1, keepdims=True)
            n = len(yp)
            rows = np.arange(n)
            w = cw[yp]
            wloss = float((w * -np.log(prob[rows, yp])).sum())
            correct = float((prob.argmax(axis=1) == yp).sum())
            if want_grad:
                delta = prob
                delta[rows, yp] -= 1.0
                delta *= w[:, None]
                G = delta.T @ Xp
                gb = delta.sum(axis=0)
            else:
                G = np.zeros((k, d))
                gb = np.zeros(k)
            total += np.concatenate(
                [G.ravel(), gb,
                 [wloss, float(w.sum()), float(n), correct]])
        return total

    log_rows: list[dict] = []
    not_improved = 0
    epoch = 0
    while epoch < epochs:
        epoch += 1
        vec = merged_pass(~is_valid, True)
        G = vec[:k * d].reshape(k, d)
        gb = vec[k * d:k * d + k]
        wloss, wsum, n, correct = vec[k * d + k:]
        W -= learning_rate * (G / wsum + weight_decay * W)
        b -= learning_rate * (gb / wsum)
        log_rows.append({"epoch": epoch, "mode": "train",
                         "loss": wloss / wsum, "accuracy": correct / n})
        if valid_mod:
            if epoch % valid_every_n_epochs == 0 or epoch == 1:
                vv = merged_pass(is_valid, False)
                vloss, vwsum, vn, vcorrect = vv[k * d + k:]
                log_rows.append({"epoch": epoch, "mode": "valid",
                                 "loss": vloss / vwsum,
                                 "accuracy": vcorrect / vn})
            if epoch > smooth_period:
                valid_losses = [r["loss"] for r in log_rows
                                if r["mode"] == "valid"]
                diffs = np.diff(np.asarray(valid_losses))[-smooth_period:]
                if len(diffs) and diffs.mean() > 0:
                    not_improved += 1
                    if not_improved >= patience:
                        break
                else:
                    not_improved = 0
    log = pd.DataFrame(log_rows)
    return log, W, b


def train_linear_fit(emb: pd.DataFrame, **kw) -> pd.DataFrame:
    log, _, _ = _fit_linear_golden(emb, **kw)
    log["epoch"] = log["epoch"].astype(np.int64)
    log["loss"] = _sql_round_arr(log["loss"])
    log["accuracy"] = _sql_round_arr(log["accuracy"])
    return log


def train_linear_weights(emb: pd.DataFrame, **kw) -> pd.DataFrame:
    _, W, b = _fit_linear_golden(emb, **kw)
    k, d = W.shape
    return pd.DataFrame({
        "class": np.concatenate([np.repeat(np.arange(k), d),
                                 np.arange(k)]).astype(np.int64),
        "dim": np.concatenate([np.tile(np.arange(d), k),
                               np.full(k, -1)]).astype(np.int64),
        "weight": _sql_round_arr(np.concatenate([W.ravel(), b])),
    })


def tune_trials(emb: pd.DataFrame, n_trials: int = 5, seed: int = 7,
                epochs: int = 6) -> pd.DataFrame:
    """Independent seeded random search over the same log-uniform
    (learning_rate, weight_decay) space, re-running the golden fit per
    trial; direction = maximize best valid accuracy."""
    rng = np.random.RandomState(seed)
    space = {"learning_rate": (0.05, 2.0), "weight_decay": (1e-5, 1e-3)}
    rows = []
    for t in range(n_trials):
        params = {}
        for name in sorted(space):
            lo, hi = space[name]
            params[name] = float(np.exp(rng.uniform(np.log(lo),
                                                    np.log(hi))))
        log, _, _ = _fit_linear_golden(emb, epochs=epochs, **params)
        valid = log[log["mode"] == "valid"]
        rows.append({
            "trial": np.int64(t),
            "learning_rate": float(_sql_round_arr(
                params["learning_rate"])),
            "weight_decay": float(_sql_round_arr(
                params["weight_decay"])),
            "best_valid_accuracy": float(_sql_round_arr(
                valid["accuracy"].max())),
            "final_valid_loss": float(_sql_round_arr(
                valid["loss"].iloc[-1])),
            "epochs_run": np.int64(log["epoch"].max()),
        })
    out = pd.DataFrame(rows)
    order = out.sort_values(
        ["best_valid_accuracy", "final_valid_loss", "trial"],
        ascending=[False, True, True], kind="mergesort")
    out["rank"] = pd.Series(
        np.arange(1, len(out) + 1, dtype=np.int64), index=order.index)
    return out


def _parse_size_independent(d: bytes):
    """Independent image-header parse (struct offsets straight from
    the PNG/GIF/BMP/JPEG format specs — deliberately NOT the engine's
    parser)."""
    import struct as _st
    if d[:8] == b"\x89PNG\r\n\x1a\n" and len(d) >= 24:
        return _st.unpack(">I", d[16:20])[0], _st.unpack(">I", d[20:24])[0]
    if d[:6] in (b"GIF87a", b"GIF89a") and len(d) >= 10:
        return _st.unpack("<H", d[6:8])[0], _st.unpack("<H", d[8:10])[0]
    if d[:2] == b"BM" and len(d) >= 26:
        w = _st.unpack("<i", d[18:22])[0]
        h = _st.unpack("<i", d[22:26])[0]
        return w, abs(h)
    if d[:3] == b"\xff\xd8\xff":
        pos = 2
        while pos + 4 <= len(d):
            if d[pos] != 0xFF:
                pos += 1
                continue
            m = d[pos + 1]
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            ln = _st.unpack(">H", d[pos + 2:pos + 4])[0]
            if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                hh = _st.unpack(">H", d[pos + 5:pos + 7])[0]
                ww = _st.unpack(">H", d[pos + 7:pos + 9])[0]
                return ww, hh
            pos += 2 + ln
    return None


def _sniff_independent(d: bytes) -> str:
    if not d:
        return "application/x-empty"
    if d[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if d[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if d[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if d[:2] == b"BM":
        return "image/bmp"
    head = d[:256].lstrip()
    if head[:1] == b"<" and (head[:9].lower() == b"<!doctype"
                             or head[:5].lower() == b"<html"
                             or b">" in head):
        return "text/html"
    try:
        d[:256].decode("utf-8")
        return "text/plain"
    except UnicodeDecodeError:
        return "application/octet-stream"


def sniffed_assets_crawl(crawl: pd.DataFrame) -> pd.DataFrame:
    """Input synthesis is SHARED with the query (the container builder
    defines the test input, like the parquet files do elsewhere); the
    sniff + header parse under test are re-derived independently."""
    from sits_classification_ray.stages.multimodal import \
        make_image_container

    kinds = ["png", "gif", "bmp", "jpeg", None]
    ctypes, ws, hs, lens = [], [], [], []
    for h in crawl["html"]:
        h = h or b""
        n = len(h)
        kind = kinds[n % 5]
        blob = h if kind is None else make_image_container(
            h, kind, 1 + n % 317, 1 + n % 211)
        ctypes.append(_sniff_independent(blob))
        size = _parse_size_independent(blob)
        ws.append(size[0] if size else -1)
        hs.append(size[1] if size else -1)
        lens.append(len(blob))
    return pd.DataFrame({"url": crawl["url"], "warc_ts": crawl["warc_ts"],
                         "content_type": ctypes,
                         "width": np.array(ws, np.int64),
                         "height": np.array(hs, np.int64),
                         "byte_len": np.array(lens, np.int64)})


def _srp_augment(emb: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic planted near-dups (part of the operator spec):
    every vec_id % 10 == 0 vector gets a copy with even coordinates
    scaled by 1.05 under id + 1_000_000 (cos vs original ~0.9997)."""
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    sel = ids % 10 == 0
    Xp = X[sel].copy()
    Xp[:, ::2] *= 1.05
    return (np.concatenate([X, Xp]),
            np.concatenate([ids, ids[sel] + 1_000_000]))


def srp_near_dup_embeddings(emb: pd.DataFrame, dim: int = 64,
                            threshold: float = 0.98, bits: int = 128,
                            bands: int = 8, seed: int = 13
                            ) -> pd.DataFrame:
    """Independent SRP-LSH near-dup model: the seeded Gaussian
    projection and the planted-copy augmentation are part of the
    operator spec; candidate generation and the exact-cosine verify
    are re-derived here with plain numpy/dict buckets (no engine
    code)."""
    import collections

    X, ids = _srp_augment(emb)
    R = np.random.default_rng(seed).standard_normal((dim, bits))
    sign = (X @ R) > 0
    width = bits // bands
    weights = 1 << np.arange(width, dtype=np.int64)

    pairs = set()
    for b in range(bands):
        bh = sign[:, b * width:(b + 1) * width] @ weights
        buckets = collections.defaultdict(list)
        for i, h in zip(ids, bh):
            buckets[int(h)].append(int(i))
        for members in buckets.values():
            members.sort()
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((members[i], members[j]))

    pos = {int(v): k for k, v in enumerate(ids)}
    norms = np.linalg.norm(X, axis=1)
    rows = []
    for a, b in sorted(pairs):
        ia, ib = pos[a], pos[b]
        cos = float((X[ia] * X[ib]).sum()
                    / max(norms[ia] * norms[ib], 1e-30))
        cos = round(cos, 6)
        if cos >= threshold:
            rows.append((a, b, cos))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cos_sim"]) \
        .astype({"id_a": np.int64, "id_b": np.int64})


def weighted_sample_documents(docs: pd.DataFrame, k: int = 5
                              ) -> pd.DataFrame:
    """Independent Efraimidis–Spirakis A-ES model: u from the
    fixed-key pandas SipHash of doc_id, keep the k smallest
    ``-ln(u)/n_chars`` per lang (the hash-derived u is the operator's
    determinism contract, as in reservoir_sample_events)."""
    h = pd.util.hash_pandas_object(
        docs["doc_id"], index=False, categorize=False
    ).to_numpy().astype(np.uint64)
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
    w = docs["n_chars"].to_numpy(np.float64)
    key = -np.log(u) / np.maximum(w, 1e-300)
    df = docs.assign(_key=key).sort_values(
        ["lang", "_key", "doc_id"], kind="mergesort")
    out = df.groupby("lang", sort=False).head(k)
    return out[["doc_id", "lang", "n_chars"]].reset_index(drop=True)


def hll_weekly_from_daily(obs: pd.DataFrame, p: int = 12) -> pd.DataFrame:
    """Independent weekly-from-daily HLL merge: per-day registers
    (same sha1/FD spec as hll_distinct_urls_daily) max-merged into ISO
    weeks, then estimated — validates that the engine's stored-sketch
    rollup equals a sequential merge."""
    m = 1 << p
    day = pd.to_datetime(obs["warc_ts"]).dt.floor("1D")
    week_regs: dict = {}
    for d, g in obs.groupby(day, sort=True):
        reg = np.zeros(m, dtype=np.uint8)
        for url in set(g["url"]):
            h = int.from_bytes(hashlib.sha1(str(url).encode()).digest()[:8],
                               "big")
            idx = h >> (64 - p)
            rest = h & ((1 << (64 - p)) - 1)
            rho = (64 - p + 1) if rest == 0 else \
                (64 - p) - int(np.floor(np.log2(float(rest))))
            reg[idx] = max(reg[idx], rho)
        wk = d.to_period("W-SUN").start_time
        if wk in week_regs:
            np.maximum(week_regs[wk], reg, out=week_regs[wk])
        else:
            week_regs[wk] = reg
    rows = []
    for wk in sorted(week_regs):
        reg = week_regs[wk]
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -reg.astype(np.float64)).sum()
        zeros = int((reg == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        rows.append((wk, round(float(est), 6)))
    return pd.DataFrame(rows, columns=["bucket_ts", "hll_estimate"])


def resized_thumbnails_crawl(crawl: pd.DataFrame) -> pd.DataFrame:
    """Independent PGM synth + nearest-neighbor 16×16 resize: pixels =
    html tiled to (8 + n%40) × (8 + n%30); src index =
    floor(dst · src/dst_size); crc32 over the resized raster."""
    import zlib as _z

    rows = []
    for r in crawl.itertuples():
        h = r.html or b"\x00"
        n = len(h)
        w, ht = 8 + n % 40, 8 + n % 30
        need = w * ht
        px = (h * (need // n + 1))[:need]
        img = np.frombuffer(px, np.uint8).reshape(ht, w)
        ys = (np.arange(16) * ht) // 16
        xs = (np.arange(16) * w) // 16
        small = img[np.ix_(ys, xs)]
        raw = small.tobytes()
        rows.append((r.url, r.warc_ts, np.int64(_z.crc32(raw)),
                     int(small.sum()), int((small < 64).sum())))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "thumb_crc32",
                                       "pixel_sum", "n_dark"])


def png_thumbnails_crawl(crawl: pd.DataFrame) -> pd.DataFrame:
    """Expected output of the PNG decode+thumbnail query computed
    WITHOUT any PNG code: the query's synth tiles html bytes into a
    (8 + n%40) × (8 + n%30) raster (RGB when n is odd), so the
    expected 16×16 thumbnail is derivable straight from the raw
    bytes — luma (r + 2g + b) // 4 for RGB, nearest-neighbor src =
    floor(dst · src/dst). A match therefore proves the engine's
    deflate+unfilter decode reproduces the original pixels exactly."""
    import zlib as _z

    rows = []
    for r in crawl.itertuples():
        h = r.html or b"\x00"
        n = len(h)
        w, ht = 8 + n % 40, 8 + n % 30
        if n % 5 == 0:
            need = w * ht
            idx = np.frombuffer((h * (need // n + 1))[:need],
                                np.uint8).reshape(ht, w)
            pal = np.frombuffer((h * (768 // n + 2))[:768],
                                np.uint8).reshape(256, 3)
            p = pal[idx].astype(np.int64)
            gray = ((p[:, :, 0] + 2 * p[:, :, 1] + p[:, :, 2]) // 4
                    ).astype(np.uint8)
        else:
            rgb = n % 2 == 1
            need = w * ht * (3 if rgb else 1)
            px = np.frombuffer((h * (need // n + 1))[:need], np.uint8)
            if rgb:
                p = px.reshape(ht, w, 3).astype(np.int64)
                gray = ((p[:, :, 0] + 2 * p[:, :, 1] + p[:, :, 2]) // 4
                        ).astype(np.uint8)
            else:
                gray = px.reshape(ht, w)
        ys = (np.arange(16) * ht) // 16
        xs = (np.arange(16) * w) // 16
        small = gray[np.ix_(ys, xs)]
        raw = small.tobytes()
        rows.append((r.url, r.warc_ts, w, ht, np.int64(_z.crc32(raw)),
                     int(small.sum()), int((small < 64).sum())))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "width",
                                       "height", "thumb_crc32",
                                       "pixel_sum", "n_dark"])


def gif_thumbnails_crawl(crawl: pd.DataFrame) -> pd.DataFrame:
    """Expected output of the GIF decode+thumbnail query computed
    WITHOUT any GIF/LZW code: palette and index raster are both
    derivable from the raw html bytes (GIF is lossless), so expected =
    integer luma of palette[index], nearest-neighbor 16×16."""
    import zlib as _z

    rows = []
    for r in crawl.itertuples():
        h = r.html or b"\x00"
        n = len(h)
        w, ht = 8 + n % 37, 8 + n % 23
        need = w * ht
        idx = np.frombuffer((h * (need // n + 1))[:need],
                            np.uint8).reshape(ht, w)
        pal = np.frombuffer((h * (768 // n + 2))[:768],
                            np.uint8).reshape(256, 3)
        p = pal[idx].astype(np.int64)
        gray = ((p[:, :, 0] + 2 * p[:, :, 1] + p[:, :, 2]) // 4
                ).astype(np.uint8)
        ys = (np.arange(16) * ht) // 16
        xs = (np.arange(16) * w) // 16
        small = gray[np.ix_(ys, xs)]
        rows.append((r.url, r.warc_ts, w, ht,
                     np.int64(_z.crc32(small.tobytes())),
                     int(small.sum()), int((small < 64).sum())))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "width",
                                       "height", "thumb_crc32",
                                       "pixel_sum", "n_dark"])


def jpeg_thumbnails_crawl(crawl: pd.DataFrame) -> pd.DataFrame:
    """Expected output of the JPEG decode+thumbnail query computed
    WITHOUT any bitstream code: the same published lossy core (8×8
    orthonormal DCT-II, Annex-K luminance quantization, half-to-even
    rounding, dequantize, IDCT, clip) applied straight to the synth
    raster — a match proves the engine's marker + Huffman layer is
    exactly lossless around the quantization. The einsum contraction
    subscripts match the engine's on purpose: bit-identity requires
    the identical contraction order."""
    import zlib as _z

    Q = np.array([
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)
    k = np.arange(8)
    # operation ORDER matches the engine (row-0 scale, then global
    # half) — IEEE products are sequence-sensitive in the last ulp
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0] *= 1.0 / np.sqrt(2.0)
    C *= 0.5

    def core(img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        H, W = -(-h // 8) * 8, -(-w // 8) * 8
        pad = np.empty((H, W), np.float64)
        pad[:h, :w] = img
        if W > w:
            pad[:h, w:] = img[:, -1:]
        if H > h:
            pad[h:, :] = pad[h - 1:h, :]
        bl = (pad - 128.0).reshape(H // 8, 8, W // 8, 8) \
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        qc = np.round(np.einsum("ij,bjk,lk->bil", C, bl, C)
                      / Q[None, :, :])
        pix = np.einsum("ji,bjk,kl->bil", C, qc * Q[None, :, :],
                        C) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        return pix.reshape(H // 8, W // 8, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(H, W)[:h, :w]

    rows = []
    for r in crawl.itertuples():
        hb = bytes(r.html) if r.html else b"\x00"
        n = len(hb)
        w, ht = 8 + n % 40, 8 + n % 30
        need = w * ht
        px = np.frombuffer((hb * (need // n + 1))[:need],
                           np.uint8).reshape(ht, w)
        gray = core(px.astype(np.float64))
        ys = (np.arange(16) * ht) // 16
        xs = (np.arange(16) * w) // 16
        small = gray[np.ix_(ys, xs)]
        raw = small.tobytes()
        rows.append((r.url, r.warc_ts, w, ht, np.int64(_z.crc32(raw)),
                     int(small.sum()), int((small < 64).sum())))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "width",
                                       "height", "thumb_crc32",
                                       "pixel_sum", "n_dark"])


def jpeg_color_thumbnails_crawl(crawl: pd.DataFrame) -> pd.DataFrame:
    """Expected output of the COLOR JPEG decode+thumbnail query
    computed WITHOUT any bitstream code: JFIF RGB→YCbCr with the same
    fixed literals, 2×2 box-mean 4:2:0 subsample (even html lengths)
    or none (odd), the published lossy core per plane with the
    luminance/chrominance Annex-K tables, replication chroma upsample
    and the inverse JFIF matrix — a hash match proves the engine's
    color marker + interleaved-MCU Huffman layer is exactly lossless
    around the quantization."""
    import zlib as _z

    Ql = np.array([
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)
    Qc = np.array([
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.float64)
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0] *= 1.0 / np.sqrt(2.0)
    C *= 0.5

    def core(img: np.ndarray, Q: np.ndarray) -> np.ndarray:
        h, w = img.shape
        H, W = -(-h // 8) * 8, -(-w // 8) * 8
        pad = np.empty((H, W), np.float64)
        pad[:h, :w] = img
        if W > w:
            pad[:h, w:] = pad[:h, w - 1:w]
        if H > h:
            pad[h:, :] = pad[h - 1:h, :]
        bl = (pad - 128.0).reshape(H // 8, 8, W // 8, 8) \
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        qc = np.round(np.einsum("ij,bjk,lk->bil", C, bl, C)
                      / Q[None, :, :])
        pix = np.einsum("ji,bjk,kl->bil", C, qc * Q[None, :, :],
                        C) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        return pix.reshape(H // 8, W // 8, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(H, W)[:h, :w]

    def sub420(p: np.ndarray) -> np.ndarray:
        h, w = p.shape
        H, W = h + (h & 1), w + (w & 1)
        pad = np.empty((H, W), np.float64)
        pad[:h, :w] = p
        if W > w:
            pad[:h, w:] = p[:, -1:]
        if H > h:
            pad[h:, :] = pad[h - 1:h, :]
        m = (pad[0::2, 0::2] + pad[0::2, 1::2]
             + pad[1::2, 0::2] + pad[1::2, 1::2]) / 4.0
        return np.clip(np.round(m), 0, 255).astype(np.uint8)

    rows = []
    for r in crawl.itertuples():
        hb = bytes(r.html) if r.html else b"\x00"
        n = len(hb)
        w, ht = 8 + n % 25, 8 + n % 17
        need = w * ht * 3
        rgb = np.frombuffer((hb * (need // n + 1))[:need],
                            np.uint8).reshape(ht, w, 3)
        rf = rgb[..., 0].astype(np.float64)
        gf = rgb[..., 1].astype(np.float64)
        bf = rgb[..., 2].astype(np.float64)
        y = np.clip(np.round(0.299 * rf + 0.587 * gf + 0.114 * bf),
                    0, 255).astype(np.uint8)
        cb = np.clip(np.round(128.0 - 0.168736 * rf - 0.331264 * gf
                              + 0.5 * bf), 0, 255).astype(np.uint8)
        cr = np.clip(np.round(128.0 + 0.5 * rf - 0.418688 * gf
                              - 0.081312 * bf), 0, 255).astype(np.uint8)
        if n % 2 == 0:                          # 4:2:0
            y2 = core(y.astype(np.float64), Ql)
            cb2 = np.repeat(np.repeat(
                core(sub420(cb).astype(np.float64), Qc), 2, axis=0),
                2, axis=1)[:ht, :w]
            cr2 = np.repeat(np.repeat(
                core(sub420(cr).astype(np.float64), Qc), 2, axis=0),
                2, axis=1)[:ht, :w]
        else:                                   # 4:4:4
            y2 = core(y.astype(np.float64), Ql)
            cb2 = core(cb.astype(np.float64), Qc)
            cr2 = core(cr.astype(np.float64), Qc)
        yf = y2.astype(np.float64)
        cbf = cb2.astype(np.float64) - 128.0
        crf = cr2.astype(np.float64) - 128.0
        rr = np.clip(np.round(yf + 1.402 * crf), 0, 255).astype(np.uint8)
        gg = np.clip(np.round(yf - 0.344136 * cbf - 0.714136 * crf),
                     0, 255).astype(np.uint8)
        bb = np.clip(np.round(yf + 1.772 * cbf), 0, 255).astype(np.uint8)
        out = np.stack([rr, gg, bb], axis=-1)
        ys = (np.arange(16) * ht) // 16
        xs = (np.arange(16) * w) // 16
        small = out[np.ix_(ys, xs)]
        rows.append((r.url, r.warc_ts, w, ht,
                     np.int64(_z.crc32(small.tobytes())),
                     int(small.sum()),
                     int((small.astype(np.int64).sum(axis=2) // 3
                          < 64).sum())))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "width",
                                       "height", "thumb_crc32",
                                       "pixel_sum", "n_dark"])


def wav_features_crawl(crawl: pd.DataFrame, frame: int = 256
                       ) -> pd.DataFrame:
    """Independent WAV feature model: samples = html byte pairs as
    little-endian int16; energy Σs², zero crossings via sign products,
    peak frame = argmax of 256-sample frame energies (first max)."""
    rows = []
    for r in crawl.itertuples():
        h = r.html or b"\x00\x00"
        h = h[:len(h) - len(h) % 2]
        x = np.frombuffer(h, np.int16).astype(np.int64)
        energy = int((x * x).sum())
        zc = int(((x[:-1] * x[1:]) < 0).sum()) if len(x) > 1 else 0
        if len(x):
            nf = -(-len(x) // frame)
            pad = np.zeros(nf * frame, np.int64)
            pad[:len(x)] = x
            fe = (pad * pad).reshape(nf, frame).sum(axis=1)
            peak = int(np.argmax(fe))
        else:
            peak = -1
        rows.append((r.url, r.warc_ts, len(x), energy, zc, peak))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "n_samples",
                                       "energy", "zero_crossings",
                                       "peak_frame"])


def y4m_scene_stats_crawl(crawl: pd.DataFrame, cut_threshold: int = 48
                          ) -> pd.DataFrame:
    """Independent Y4M scene-stat model: 4 luma frames per doc
    (tiled html bytes; rolls by 7/14; inverted last frame), per-frame
    luma sum + L1 distance to previous, cut when mean abs change >
    threshold."""
    W = H = 16
    rows = []
    for r in crawl.itertuples():
        h = r.html or b"\x00"
        need = W * H
        px = (h * (need // len(h) + 1))[:need]
        arr = np.frombuffer(px, np.uint8)
        frames = [arr, np.roll(arr, 7), np.roll(arr, 14), 255 - arr]
        prev = None
        for i, f in enumerate(frames):
            fi = f.astype(np.int64)
            l1 = int(np.abs(fi - prev).sum()) if prev is not None else 0
            cut = i > 0 and l1 > cut_threshold * W * H
            rows.append((r.url, r.warc_ts, i, int(fi.sum()), l1,
                         bool(cut)))
            prev = fi
    return pd.DataFrame(rows, columns=["url", "warc_ts", "frame_idx",
                                       "luma_sum", "l1_prev", "is_cut"])


def ams_f2_urls(obs: pd.DataFrame, rows: int = 5, buckets: int = 256
                ) -> pd.DataFrame:
    """Independent AMS F2 model: same sha1-derived bucket/sign spec,
    sequential counter fill, median of per-row Σc², exact F2 from
    value_counts."""
    counts = obs["url"].value_counts()
    C = np.zeros((rows, buckets), dtype=np.int64)
    for url, n in counts.items():
        for j in range(rows):
            h = int.from_bytes(
                hashlib.sha1(f"{j}:{url}".encode()).digest()[:8], "big")
            s = 1 - 2 * ((h >> 8) & 1)
            C[j, h % buckets] += s * int(n)
    per_row = (C.astype(np.int64) ** 2).sum(axis=1)
    est = int(np.median(per_row))
    exact = int((counts.to_numpy(np.int64) ** 2).sum())
    rel = round(abs(est - exact) / max(1, exact), 6)
    return pd.DataFrame([{"f2_estimate": est, "exact_f2": exact,
                          "rel_error": rel}])


# --- frequency sketches (Count-Min / CountSketch) --------------------------

_SM_A = np.uint64(0x9E3779B97F4A7C15)
_SM_B = np.uint64(0xBF58476D1CE4E5B9)
_SM_C = np.uint64(0x94D049BB133111EB)


def _sm_mix(h: np.ndarray, seed: int) -> np.ndarray:
    off = np.uint64(((seed + 1) * 0x9E3779B97F4A7C15) % (1 << 64))
    z = h + off
    z = (z ^ (z >> np.uint64(30))) * _SM_B
    z = (z ^ (z >> np.uint64(27))) * _SM_C
    return z ^ (z >> np.uint64(31))


def _sha1_u64_arr(keys) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = int.from_bytes(
            hashlib.sha1(str(k).encode()).digest()[:8], "big")
    return out


def cms_heavy_domains_crawl(obs: pd.DataFrame, k: int = 60,
                            depth: int = 4, width: int = 2048
                            ) -> pd.DataFrame:
    """Sequential Count-Min + CountSketch twin: tables built from the
    exact global (domain, count) pairs (integer sums are batching-
    independent, so this equals any distributed construction); probe
    set = exact φ-heavy domains (count·(k+1) > N)."""
    dom = obs["url"].astype(str).str.split("/").str[2]
    vc = dom.value_counts()
    n_total = int(len(dom))
    heavy = vc[vc * (k + 1) > n_total]

    cms = np.zeros((depth, width), dtype=np.int64)
    csk = np.zeros((depth, width), dtype=np.int64)
    h_all = _sha1_u64_arr(vc.index.tolist())
    cnt = vc.to_numpy(np.int64)
    for d in range(depth):
        idx = (_sm_mix(h_all, d) % np.uint64(width)).astype(np.int64)
        np.add.at(cms[d], idx, cnt)
        sgn = np.where(_sm_mix(h_all, depth + d) >> np.uint64(63),
                       np.int64(1), np.int64(-1))
        np.add.at(csk[d], idx, cnt * sgn)

    keys = heavy.index.tolist()
    h = _sha1_u64_arr(keys)
    ests = np.empty((depth, len(keys)), dtype=np.int64)
    cests = np.empty((depth, len(keys)), dtype=np.int64)
    for d in range(depth):
        idx = (_sm_mix(h, d) % np.uint64(width)).astype(np.int64)
        ests[d] = cms[d][idx]
        sgn = np.where(_sm_mix(h, depth + d) >> np.uint64(63),
                       np.int64(1), np.int64(-1))
        cests[d] = csk[d][idx] * sgn
    out = pd.DataFrame({
        "key": keys,
        "n": heavy.to_numpy(np.int64),
        "cms_est": ests.min(axis=0),
        "csk_est": np.median(cests, axis=0).astype(np.int64),
    })
    return out.sort_values(["n", "key"], ascending=[False, True]
                           ).reset_index(drop=True)


def kmv_overlap_weeks(obs: pd.DataFrame, k: int = 256) -> pd.DataFrame:
    """Sequential KMV set-operation twin: per-week bottom-k url-hash
    signatures (order-free), adjacent-week union/jaccard/intersection
    estimates — same estimator spec as functions/sketches.kmv_overlap."""
    week = (pd.to_datetime(obs["warc_ts"]).dt.to_period("W-SUN")
            .dt.start_time)
    sigs = {}
    for w, g in obs.groupby(week, sort=True):
        h = np.unique(_sha1_u64_arr(sorted(set(g["url"]))))
        sigs[w] = h[:k]

    def est_distinct(h: np.ndarray) -> float:
        if len(h) < k:
            return float(len(h))
        u_k = (float(h[k - 1]) + 1.0) / 18446744073709551616.0
        return (k - 1) / u_k

    weeks = sorted(sigs)
    rows = []
    for i in range(len(weeks) - 1):
        a, b = sigs[weeks[i]], sigs[weeks[i + 1]]
        union = np.unique(np.concatenate([a, b]))[:k]
        in_both = np.isin(union, a) & np.isin(union, b)
        jac = float(in_both.sum()) / max(1, len(union))
        d_union = est_distinct(union)
        rows.append((weeks[i], weeks[i + 1], round(jac, 6),
                     round(jac * d_union, 6), round(d_union, 6)))
    return pd.DataFrame(rows, columns=[
        "bucket_a", "bucket_b", "jaccard_est", "intersection_est",
        "union_est"])


def cox_hazard_events(ev: pd.DataFrame, n_iters: int = 3,
                      num_blocks: int = 8) -> pd.DataFrame:
    """Independent Cox twin: same subject construction, same
    rank-derived blocking ((rank−1)·B // n over the (−T, x, uid)
    order) and the same per-block exp-sum / carry / cumsum float
    sequence, so the Newton trajectory matches bit-for-bit."""
    rows = []
    for uid, g in ev.groupby("user_id", sort=True):
        ts = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        t0 = int(ts.min())
        purch = ts[(g["event_type"] == "purchase").to_numpy()]
        if len(purch):
            t_end, d = int(purch.min()), 1
        else:
            t_end, d = int(ts.max()), 0
        rows.append((int(uid), (t_end - t0) / 3_600_000_000.0, d,
                     float(np.log1p(float(len(g))))))
    subj = pd.DataFrame(rows, columns=["uid", "t", "d", "x"])
    subj["_tneg"] = -subj["t"].to_numpy(np.float64)
    subj = subj.sort_values(["_tneg", "x", "uid"],
                            kind="mergesort", ignore_index=True)
    n = len(subj)
    blk = (np.arange(n, dtype=np.int64) * num_blocks) // max(1, n)
    x_all = subj["x"].to_numpy(np.float64)
    d_all = subj["d"].to_numpy(np.float64)

    beta = 0.0
    loglik = 0.0
    n_events = 0
    for _ in range(n_iters):
        U = info = L = ne = 0.0
        acc = (0.0, 0.0, 0.0)
        for b_id in range(num_blocks):
            m = blk == b_id
            if not m.any():
                continue
            x = x_all[m]
            d = d_all[m]
            e = np.exp(x * beta)
            S0 = acc[0] + np.cumsum(e)
            S1 = acc[1] + np.cumsum(x * e)
            S2 = acc[2] + np.cumsum(x * x * e)
            r1 = S1 / S0
            U += float((d * (x - r1)).sum())
            info += float((d * (S2 / S0 - r1 * r1)).sum())
            L += float((d * (x * beta - np.log(S0))).sum())
            ne += float(d.sum())
            acc = (acc[0] + float(e.sum()),
                   acc[1] + float((x * e).sum()),
                   acc[2] + float((x * x * e).sum()))
        loglik, n_events = L, int(ne)
        beta = beta + U / info
    return pd.DataFrame({
        "n_subjects": [np.int64(n)], "n_events": [np.int64(n_events)],
        "beta": _sql_round_arr(np.array([beta])) + 0.0,
        "loglik": _sql_round_arr(np.array([loglik])) + 0.0})


def shapley_attribution_events(ev: pd.DataFrame) -> pd.DataFrame:
    """Independent Shapley-attribution twin: same coalition-value
    definition (v(T) = converted users with pre-purchase channel set
    ⊆ T over all users) and exact factorial-weight lattice."""
    import math

    channels = ("click", "error", "signup", "view")
    idx = {c: i for i, c in enumerate(channels)}
    k = len(channels)
    ev = ev.sort_values(["user_id", "ts", "event_type"],
                        kind="mergesort")
    masks, convs = [], []
    for _, g in ev.groupby("user_id", sort=True):
        types = list(g["event_type"])
        conv = "purchase" in types
        m = 0
        for ty in types:
            if ty == "purchase":
                break
            if ty in idx:
                m |= 1 << idx[ty]
        masks.append(m)
        convs.append(conv)
    total = float(len(masks))
    conv_by_mask = np.zeros(1 << k, np.int64)
    for m, c in zip(masks, convs):
        if c:
            conv_by_mask[m] += 1

    def v(T: int) -> float:
        c = 0
        for m in range(1 << k):
            if (m & ~T) == 0:
                c += int(conv_by_mask[m])
        return c / total

    phi = np.zeros(k)
    for c in range(k):
        for T in range(1 << k):
            if T & (1 << c):
                continue
            t = bin(T).count("1")
            wgt = (math.factorial(t) * math.factorial(k - t - 1)
                   / math.factorial(k))
            phi[c] += wgt * (v(T | (1 << c)) - v(T))
    return pd.DataFrame({"channel": list(channels),
                         "shapley": _sql_round_arr(phi) + 0.0})


def cdc_dedup_ratio_crawl(crawl: pd.DataFrame, mask: int = 0x3F,
                          min_size: int = 16, max_size: int = 256
                          ) -> pd.DataFrame:
    """Independent CDC twin: scalar-recurrence gear hash
    (h = 2h + gear[b] mod 2⁶⁴), same boundary rule (≥ min_size,
    masked low bits zero, force at max_size), 61-bit polynomial chunk
    hashes, min-multiset shared bytes vs the previous snapshot."""

    def smix1(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    gear = [smix1(b) for b in range(256)]
    M64 = 0xFFFFFFFFFFFFFFFF

    def chunks(data: bytes) -> dict:
        n = len(data)
        h = 0
        ends = []
        start = 0
        # candidate cut positions from the rolling hash
        cands = []
        for i, b in enumerate(data):
            h = ((h << 1) + gear[b]) & M64
            if (h & mask) == 0:
                cands.append(i)
        ci = 0
        import bisect
        while start < n:
            ci = bisect.bisect_left(cands, start + min_size - 1)
            if ci < len(cands) and cands[ci] < start + max_size:
                end = cands[ci] + 1
            else:
                end = min(start + max_size, n)
            ends.append(end)
            start = end
        out: dict = {}
        s = 0
        for e in ends:
            hv = 0
            for b in data[s:e]:
                hv = (hv * 1099511628211 + b) & M64
            hv &= (1 << 61) - 1
            c, tot = out.get(hv, (0, 0))
            out[hv] = (c + 1, tot + (e - s))
            s = e
        return out, sum(e2 - s2 for s2, e2 in
                        zip([0] + ends[:-1], ends)), len(ends)

    crawl = crawl.assign(html=[bytes(h) if h is not None else b""
                               for h in crawl["html"]])
    df = crawl.sort_values(["url", "warc_ts", "html"],
                           kind="mergesort") \
        .drop_duplicates(["url", "warc_ts"], keep="first")
    rows = []
    for url, g in df.groupby("url", sort=True):
        prev = None
        for ts, payload in zip(g["warc_ts"], g["html"]):
            cur, total, nch = chunks(payload or b"")
            if prev is not None:
                shared = 0
                for hv, (c, tot) in cur.items():
                    if hv in prev:
                        pc, _ = prev[hv]
                        shared += min(c, pc) * (tot // c)
                rows.append((url, ts, nch, total, shared,
                             shared / total if total else 0.0))
            prev = cur
    out = pd.DataFrame(rows, columns=["url", "warc_ts", "n_chunks",
                                      "total_bytes", "shared_bytes",
                                      "dedup_ratio"])
    out["dedup_ratio"] = _sql_round_arr(
        out["dedup_ratio"].to_numpy(np.float64)) + 0.0
    for c in ("n_chunks", "total_bytes", "shared_bytes"):
        out[c] = out[c].astype(np.int64)
    out["warc_ts"] = out["warc_ts"].astype("datetime64[us]")
    return out


def dp_counts_domains(obs: pd.DataFrame, epsilon: float = 1.0
                      ) -> pd.DataFrame:
    """Independent Laplace-mechanism twin: same derandomized
    inverse-CDF draw from independently-written splitmix64."""

    def smix(x: np.ndarray) -> np.ndarray:
        z = (x + np.uint64(0x9E3779B97F4A7C15)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(30)))
             * np.uint64(0xBF58476D1CE4E5B9)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(27)))
             * np.uint64(0x94D049BB133111EB)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))

    dom = obs["url"].str.extract(r"^[a-z]+://([^/]+)", expand=False)
    cnt = dom.value_counts().sort_index()
    doms = cnt.index.to_numpy(object)
    with np.errstate(over="ignore"):
        h = smix(pd.util.hash_array(np.asarray(doms, dtype=object)))
    u = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53 - 0.5
    u = np.clip(u, -0.5 + 1e-12, 0.5 - 1e-12)
    lap = -np.sign(u) * np.log(1.0 - 2.0 * np.abs(u)) / epsilon
    return pd.DataFrame({
        "domain": doms,
        "noisy_n": _sql_round_arr(
            cnt.to_numpy(np.float64) + lap) + 0.0})


def wasserstein_weekly_crawl(obs_long: pd.DataFrame) -> pd.DataFrame:
    """Independent W₁ twin: same (metric, epoch-week, value) counts
    and exact merged-support CDF walk."""
    df = obs_long.copy()
    ts = df["warc_ts"].to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    df["week"] = ((ts // (7 * 86_400_000_000))
                  * (7 * 86_400_000_000)).astype("datetime64[us]")
    df["value"] = df["value"].to_numpy(np.int64)
    counts = (df.groupby(["metric", "week", "value"]).size()
              .rename("n").reset_index())
    rows = []
    for metric, g in counts.groupby("metric", sort=True):
        weeks = np.sort(g["week"].unique())
        for i in range(1, len(weeks)):
            a = g[g["week"] == weeks[i - 1]]
            b = g[g["week"] == weeks[i]]
            va = a["value"].to_numpy(np.int64)
            na = a["n"].to_numpy(np.int64)
            vb = b["value"].to_numpy(np.int64)
            nb = b["n"].to_numpy(np.int64)
            support = np.union1d(va, vb)
            ca = np.zeros(len(support), np.int64)
            cb = np.zeros(len(support), np.int64)
            ca[np.searchsorted(support, va)] = na
            cb[np.searchsorted(support, vb)] = nb
            Fa = np.cumsum(ca) / float(na.sum())
            Fb = np.cumsum(cb) / float(nb.sum())
            gaps = np.diff(support).astype(np.float64)
            w1 = float((np.abs(Fa - Fb)[:-1] * gaps).sum())
            rows.append((metric, weeks[i], w1))
    out = pd.DataFrame(rows, columns=["metric", "week", "w1"])
    out["w1"] = _sql_round_arr(out["w1"].to_numpy(np.float64)) + 0.0
    out["week"] = out["week"].astype("datetime64[us]")
    return out


def pelt_changepoints_crawl(obs_long: pd.DataFrame, beta: float = 50.0
                            ) -> pd.DataFrame:
    """Independent PELT twin: identical L2-cost DP with pruning over
    pandas daily means (same prefix-sum cost arithmetic, first-min
    tie-break, prune rule v − β ≤ F(t))."""
    df = obs_long.copy()
    df["day"] = df["warc_ts"].to_numpy().astype("datetime64[D]") \
        .astype("datetime64[us]")
    daily = (df.groupby(["url", "metric", "day"])["value"]
             .agg(["sum", "size"]).reset_index()
             .sort_values(["url", "metric", "day"], kind="mergesort"))
    rows = []
    for (u, m), g in daily.groupby(["url", "metric"], sort=True):
        y = (g["sum"].to_numpy(np.float64)
             / g["size"].to_numpy(np.float64))
        n = len(y)
        cs = np.concatenate(([0.0], np.cumsum(y)))
        cs2 = np.concatenate(([0.0], np.cumsum(y * y)))
        F = np.empty(n + 1)
        F[0] = -beta
        ncp = np.zeros(n + 1, np.int64)
        cands = [0]
        for t in range(1, n + 1):
            vals = []
            for s in cands:
                seg = t - s
                sm = cs[t] - cs[s]
                # parenthesization matches the engine's F[s]+C(..)+β
                vals.append(F[s] + ((cs2[t] - cs2[s])
                                    - sm * sm / seg) + beta)
            j = int(np.argmin(vals))
            F[t] = vals[j]
            ncp[t] = ncp[cands[j]] + 1
            cands = [s for s, v in zip(cands, vals)
                     if v - beta <= F[t]] + [t]
        rows.append((u, m, np.int64(n), np.int64(ncp[n] - 1),
                     float(F[n])))
    out = pd.DataFrame(rows, columns=["url", "metric", "n_days",
                                      "n_changepoints", "total_cost"])
    out["total_cost"] = _sql_round_arr(
        out["total_cost"].to_numpy(np.float64)) + 0.0
    return out


def croston_rate_crawl(obs: pd.DataFrame, alpha: float = 0.3
                       ) -> pd.DataFrame:
    """Independent Croston twin: pandas daily counts per url, the
    same SES recursions over non-zero sizes and inter-arrival gaps."""
    d = obs.assign(day=obs["warc_ts"].to_numpy()
                   .astype("datetime64[D]").astype(np.int64))
    daily = (d.groupby(["url", "day"]).size().rename("c")
             .reset_index().sort_values(["url", "day"],
                                        kind="mergesort"))
    rows = []
    for url, g in daily.groupby("url", sort=True):
        days = g["day"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.float64)
        span = int(days[-1] - days[0]) + 1
        z = c[0]
        q = 1.0
        for i in range(1, len(c)):
            z = alpha * c[i] + (1.0 - alpha) * z
            q = alpha * float(days[i] - days[i - 1]) \
                + (1.0 - alpha) * q
        rows.append((url, np.int64(span), np.int64(len(c)), z, q,
                     z / q))
    out = pd.DataFrame(rows, columns=["url", "n_days", "n_active",
                                      "size_level", "interval_level",
                                      "rate"])
    for col in ("size_level", "interval_level", "rate"):
        out[col] = _sql_round_arr(out[col].to_numpy(np.float64)) + 0.0
    return out


def theta_forecast_crawl(obs_long: pd.DataFrame, alpha: float = 0.5
                         ) -> pd.DataFrame:
    """Independent Theta(0,2) twin: pandas daily means (exact — the
    values are integer-valued doubles), OLS trendline, SES recursion
    over the theta-2 line, ½+½ combination."""
    df = obs_long.copy()
    df["day"] = df["warc_ts"].to_numpy().astype("datetime64[D]") \
        .astype("datetime64[us]")
    daily = (df.groupby(["url", "metric", "day"])["value"]
             .agg(["sum", "size"]).reset_index()
             .sort_values(["url", "metric", "day"], kind="mergesort"))
    rows = []
    for (u, m), g in daily.groupby(["url", "metric"], sort=True):
        y = (g["sum"].to_numpy(np.float64)
             / g["size"].to_numpy(np.float64))
        n = len(y)
        t = np.arange(n, dtype=np.float64)
        if n > 1:
            tb, yb = t.mean(), y.mean()
            b = float(((t - tb) * (y - yb)).sum()
                      / ((t - tb) ** 2).sum())
        else:
            b = 0.0
        a = float(y.mean() - b * (n - 1) / 2.0)
        z = 2.0 * y - (a + b * t)
        s = z[0]
        for i in range(1, n):
            s = alpha * z[i] + (1.0 - alpha) * s
        fc = 0.5 * s + 0.5 * (a + b * n)
        rows.append((u, m, np.int64(n), b, s, fc))
    out = pd.DataFrame(rows, columns=["url", "metric", "n_days",
                                      "slope", "ses_level", "forecast"])
    for c in ("slope", "ses_level", "forecast"):
        out[c] = _sql_round_arr(out[c].to_numpy(np.float64)) + 0.0
    return out


def spectral_residual_crawl(obs_long: pd.DataFrame, q: int = 3
                            ) -> pd.DataFrame:
    """Independent spectral-residual twin: same published pipeline
    (log-amplitude − moving average → saliency via inverse FFT) on
    the pandas daily means."""
    df = obs_long.copy()
    df["day"] = df["warc_ts"].to_numpy().astype("datetime64[D]") \
        .astype("datetime64[us]")
    daily = (df.groupby(["url", "metric", "day"])["value"]
             .agg(["sum", "size"]).reset_index()
             .sort_values(["url", "metric", "day"], kind="mergesort"))
    rows = []
    for (u, m), g in daily.groupby(["url", "metric"], sort=True):
        y = (g["sum"].to_numpy(np.float64)
             / g["size"].to_numpy(np.float64))
        days = g["day"].to_numpy()
        n = len(y)
        if n < 2:
            rows.append((u, m, np.int64(n), days[0], 0.0))
            continue
        F = np.fft.fft(y)
        amp = np.abs(F) + 1e-8
        L = np.log(amp)
        avg = np.convolve(L, np.ones(q) / q, mode="same")
        S = np.abs(np.fft.ifft(np.exp((L - avg) + 1j * np.angle(F))))
        mu = S.mean()
        score = (S - mu) / (mu + 1e-8)
        j = int(np.argmax(score))
        rows.append((u, m, np.int64(n), days[j], float(score[j])))
    out = pd.DataFrame(rows, columns=["url", "metric", "n_days",
                                      "peak_day", "saliency"])
    out["saliency"] = _sql_round_arr(
        out["saliency"].to_numpy(np.float64)) + 0.0
    out["peak_day"] = out["peak_day"].astype("datetime64[us]")
    return out


def wl_colors_crawl(crawl: pd.DataFrame,
                    iterations: int = 3) -> pd.DataFrame:
    """Independent Weisfeiler-Lehman twin: scalar refinement loop
    over the re-synthesized domain graph with the same signature
    hashing (splitmix64 of the pandas SipHash of
    'own|sorted,nbr,colors', masked to 62 bits)."""

    def smix1(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    srcs, dsts = [], []
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            srcs.append(src)
            dsts.append(f"site-{(n + j) % 40}.example.com")
    ep = (pd.DataFrame({"w1": srcs, "w2": dsts}).drop_duplicates())
    adj: dict = {}
    for a, b in ep.sort_values(["w1", "w2"],
                               kind="mergesort").itertuples(index=False):
        adj.setdefault(a, []).append(b)
    nodes = sorted(set(ep["w1"]) | set(ep["w2"]))
    color = {v: 0 for v in nodes}
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            sig = str(color[v]) + "|" + ",".join(
                str(c) for c in sorted(color[w]
                                       for w in adj.get(v, ())))
            h = int(pd.util.hash_array(
                np.asarray([sig], dtype=object))[0])
            nxt[v] = smix1(h) & ((1 << 62) - 1)
        color = nxt
    return pd.DataFrame({"node": nodes,
                         "color": np.asarray([color[v] for v in nodes],
                                             np.int64)})


def deepwalk_visits_crawl(crawl: pd.DataFrame, walks_per_node: int = 4,
                          walk_len: int = 8) -> pd.DataFrame:
    """Independent DeepWalk twin: same derandomized step rule
    (splitmix64 over siphash(start|walk)·φ + step, sorted adjacency)
    in a flat scalar loop over the re-synthesized domain graph."""

    def smix(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    srcs, dsts = [], []
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            srcs.append(src)
            dsts.append(f"site-{(n + j) % 40}.example.com")
    ep = (pd.DataFrame({"w1": srcs, "w2": dsts}).drop_duplicates()
          .sort_values(["w1", "w2"], kind="mergesort"))
    adj: dict = {}
    for a, b in ep.itertuples(index=False):
        adj.setdefault(a, []).append(b)
    nodes = sorted(set(ep["w1"]) | set(ep["w2"]))
    visits: dict = {}
    for start in nodes:
        for w in range(walks_per_node):
            seed = int(pd.util.hash_array(
                np.asarray([f"{start}|{w}"], dtype=object))[0])
            v = start
            visits[v] = visits.get(v, 0) + 1
            for j in range(walk_len - 1):
                nbrs = adj.get(v)
                if not nbrs:
                    break
                h2 = smix((seed * 0x9E3779B97F4A7C15 + j)
                          & 0xFFFFFFFFFFFFFFFF)
                v = nbrs[h2 % len(nbrs)]
                visits[v] = visits.get(v, 0) + 1
    ks = sorted(visits)
    return pd.DataFrame({"node": ks,
                         "visits": np.asarray([visits[k] for k in ks],
                                              np.int64)})


def mondrian_partitions_documents(docs: pd.DataFrame, k: int = 25
                                  ) -> pd.DataFrame:
    """Independent Mondrian twin: same (x1, x2) → count summary and
    the same widest-dimension / weighted-lower-median recursion."""
    cells = (pd.DataFrame({
        "x1": docs["n_chars"].to_numpy(np.int64),
        "x2": docs["text"].str.split(" ").str.len()
        .to_numpy(np.int64)})
        .groupby(["x1", "x2"]).size().rename("n").reset_index())
    pts = cells[["x1", "x2"]].to_numpy(np.int64)
    wts = cells["n"].to_numpy(np.int64)
    leaves: list = []

    def rec(idx: np.ndarray) -> None:
        n = int(wts[idx].sum())
        sub = pts[idx]
        lo = sub.min(axis=0)
        hi = sub.max(axis=0)
        dim = int(np.argmax(hi - lo))
        if hi[dim] == lo[dim]:
            leaves.append((lo[0], hi[0], lo[1], hi[1], n))
            return
        order = np.argsort(sub[:, dim], kind="mergesort")
        cum = np.cumsum(wts[idx][order])
        j = int(np.searchsorted(cum, (n + 1) // 2))
        split = int(sub[order[j], dim])
        if split == hi[dim] and (sub[:, dim] < hi[dim]).any():
            split = int(np.max(sub[sub[:, dim] < hi[dim], dim]))
        left = idx[sub[:, dim] <= split]
        right = idx[sub[:, dim] > split]
        if (len(right) == 0 or wts[left].sum() < k
                or wts[right].sum() < k):
            leaves.append((lo[0], hi[0], lo[1], hi[1], n))
            return
        rec(left)
        rec(right)

    rec(np.arange(len(pts)))
    out = pd.DataFrame(leaves, columns=["x1_min", "x1_max", "x2_min",
                                        "x2_max", "n"])
    return out.sort_values(["x1_min", "x2_min"], kind="mergesort",
                           ignore_index=True).astype(np.int64)


def isotonic_calibration_nchars(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent PAV twin: pandas bucket rates + a backward-scan
    pool-adjacent-violators with exact integer violation tests."""
    d = docs.assign(size_bucket=docs["n_chars"].to_numpy(np.int64)
                    // 100,
                    pos=(docs["lang"] == "en").astype(np.int64))
    g = d.groupby("size_bucket").agg(pos=("pos", "sum"),
                                     n=("pos", "size")).reset_index() \
        .sort_values("size_bucket", ignore_index=True)
    # stack PAV, integer cross-multiplication comparisons
    stack: list[list[int]] = []
    for r in g.itertuples(index=False):
        stack.append([1, int(r.n), int(r.pos)])
        while len(stack) > 1 and \
                stack[-2][2] * stack[-1][1] > stack[-1][2] * stack[-2][1]:
            c2, n2, p2 = stack.pop()
            stack[-1][0] += c2
            stack[-1][1] += n2
            stack[-1][2] += p2
    iso = []
    for c, bn, bp in stack:
        iso.extend([bp / float(bn)] * c)
    return pd.DataFrame({
        "size_bucket": g["size_bucket"].to_numpy(np.int64),
        "n": g["n"].to_numpy(np.int64),
        "rate_raw": _sql_round_arr(
            g["pos"].to_numpy(np.float64)
            / g["n"].to_numpy(np.float64)) + 0.0,
        "rate_iso": _sql_round_arr(np.asarray(iso, np.float64)) + 0.0})


def betweenness_domains_crawl(crawl: pd.DataFrame,
                              max_sources: int = 64) -> pd.DataFrame:
    """Independent Brandes twin over the synthetic domain graph:
    same canonical contract (sorted neighbor lists, FIFO BFS,
    reverse-order dependency accumulation, per-node sum over sources
    in source order) but written as a flat scalar loop."""
    from collections import deque

    srcs, dsts = [], []
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            srcs.append(src)
            dsts.append(f"site-{(n + j) % 40}.example.com")
    ep = (pd.DataFrame({"w1": srcs, "w2": dsts}).drop_duplicates()
          .sort_values(["w1", "w2"], kind="mergesort"))
    adj: dict = {}
    for a, b in ep.itertuples(index=False):
        adj.setdefault(a, []).append(b)
    nodes = sorted(set(ep["w1"]) | set(ep["w2"]))
    deg = {n_: len(adj.get(n_, ())) for n_ in nodes}
    sources = sorted(nodes, key=lambda n_: (-deg[n_], n_))[:max_sources]
    acc: dict = {}
    for s in sources:                        # ascending source order?
        sigma = {s: 1.0}
        dist = {s: 0}
        preds: dict = {}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds.setdefault(w, []).append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds.get(w, ()):
                delta[v] += (sigma[v] / sigma[w]) * (1.0 + delta[w])
            if w != s and delta[w] != 0.0:
                acc.setdefault(w, []).append((s, delta[w]))
    rows = []
    for node in sorted(acc):
        total = 0.0
        for _, d in sorted(acc[node]):       # sum in source order
            total += d
        rows.append((node, total))
    out = pd.DataFrame(rows, columns=["node", "betweenness"])
    out["betweenness"] = _sql_round_arr(
        out["betweenness"].to_numpy(np.float64)) + 0.0
    return out


def ppr_domains_crawl(crawl: pd.DataFrame, damping: float = 0.85,
                      iterations: int = 10,
                      n_seeds: int = 3) -> pd.DataFrame:
    """Independent personalized-PageRank twin: same synthetic domain
    link graph as pagerank_domains_crawl, restart vector concentrated
    on the n_seeds lexicographically smallest domains, init at the
    restart distribution, identical sorted-sum power iteration."""
    srcs, dsts = [], []
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            srcs.append(src)
            dsts.append(f"site-{(n + j) % 40}.example.com")
    edges = (pd.DataFrame({"w1": srcs, "w2": dsts})
             .groupby(["w1", "w2"], sort=False).size()
             .rename("n").reset_index())
    edges["n"] = edges["n"].astype(np.int64)
    nodes = np.unique(np.concatenate([edges["w1"].to_numpy(),
                                      edges["w2"].to_numpy()]))
    seeds = set(np.sort(nodes)[:n_seeds])
    teleport = (1.0 - damping) / float(len(seeds))
    outw = edges.groupby("w1")["n"].sum()
    edges = edges.assign(outw=edges["w1"].map(outw).astype(np.int64))
    ranks = pd.Series(np.where(np.isin(nodes, sorted(seeds)),
                               1.0 / float(len(seeds)), 0.0),
                      index=nodes)
    zeros = pd.DataFrame({"node": nodes, "_src": "", "c": 0.0})
    for _ in range(iterations):
        r = edges["w1"].map(ranks).to_numpy(np.float64)
        w = edges["n"].to_numpy(np.float64)
        ow = edges["outw"].to_numpy(np.float64)
        contribs = pd.DataFrame({"node": edges["w2"].to_numpy(),
                                 "_src": edges["w1"].to_numpy(),
                                 "c": (r * w) / ow})
        allc = pd.concat([contribs, zeros], ignore_index=True) \
            .sort_values(["node", "_src"], kind="mergesort")
        s = allc.groupby("node", sort=False)["c"].sum()
        tel = np.where(s.index.isin(seeds), teleport, 0.0)
        ranks = pd.Series(tel + damping * s.to_numpy(np.float64),
                          index=s.index)
    r = ranks.to_numpy(np.float64) * 1e6
    r = np.copysign(np.floor(np.abs(r) + 0.5), r) / 1e6
    return pd.DataFrame({"node": ranks.index.to_numpy(), "rank": r})


def pagerank_domains_crawl(crawl: pd.DataFrame, damping: float = 0.85,
                           iterations: int = 10) -> pd.DataFrame:
    """Independent PageRank over the synthetic domain link graph:
    anchors re-synthesized from the page bytes exactly as the engine's
    link extraction does, domain edges aggregated, then the same
    deterministic power iteration as pagerank_words_documents."""
    srcs, dsts = [], []
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            srcs.append(src)
            dsts.append(f"site-{(n + j) % 40}.example.com")
    edges = (pd.DataFrame({"w1": srcs, "w2": dsts})
             .groupby(["w1", "w2"], sort=False).size()
             .rename("n").reset_index())
    edges["n"] = edges["n"].astype(np.int64)
    nodes = np.unique(np.concatenate([edges["w1"].to_numpy(),
                                      edges["w2"].to_numpy()]))
    n_nodes = len(nodes)
    teleport = (1.0 - damping) / float(n_nodes)
    outw = edges.groupby("w1")["n"].sum()
    edges = edges.assign(outw=edges["w1"].map(outw).astype(np.int64))
    ranks = pd.Series(1.0 / float(n_nodes), index=nodes)
    zeros = pd.DataFrame({"node": nodes, "_src": "", "c": 0.0})
    for _ in range(iterations):
        r = edges["w1"].map(ranks).to_numpy(np.float64)
        w = edges["n"].to_numpy(np.float64)
        ow = edges["outw"].to_numpy(np.float64)
        contribs = pd.DataFrame({"node": edges["w2"].to_numpy(),
                                 "_src": edges["w1"].to_numpy(),
                                 "c": (r * w) / ow})
        allc = pd.concat([contribs, zeros], ignore_index=True) \
            .sort_values(["node", "_src"], kind="mergesort")
        s = allc.groupby("node", sort=False)["c"].sum()
        ranks = pd.Series(teleport + damping * s.to_numpy(np.float64),
                          index=s.index)
    r = ranks.to_numpy(np.float64) * 1e6
    r = np.copysign(np.floor(np.abs(r) + 0.5), r) / 1e6
    return pd.DataFrame({"node": ranks.index.to_numpy(), "rank": r})


def hits_domains_crawl(crawl: pd.DataFrame,
                       iterations: int = 8) -> pd.DataFrame:
    """Independent HITS over the synthetic domain link graph — the
    max-normalized variant of stages/graph.py:hits, reproducing its
    per-node summation order (rows sorted by (node, neighbor) before
    each groupby-sum) so every float of every iteration is
    bit-identical."""
    srcs, dsts = [], []
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            srcs.append(src)
            dsts.append(f"site-{(n + j) % 40}.example.com")
    edges = (pd.DataFrame({"w1": srcs, "w2": dsts})
             .groupby(["w1", "w2"], sort=False).size()
             .rename("n").reset_index())
    edges["n"] = edges["n"].astype(np.int64)
    nodes = np.unique(np.concatenate([edges["w1"].to_numpy(),
                                      edges["w2"].to_numpy()]))
    zeros = pd.DataFrame({"node": nodes, "_nb": "", "c": 0.0})

    def push(scores: pd.Series, key: str, other: str) -> pd.Series:
        sc = edges[key].map(scores).to_numpy(np.float64)
        w = edges["n"].to_numpy(np.float64)
        contribs = pd.DataFrame({"node": edges[other].to_numpy(),
                                 "_nb": edges[key].to_numpy(),
                                 "c": sc * w})
        allc = pd.concat([contribs, zeros], ignore_index=True) \
            .sort_values(["node", "_nb"], kind="mergesort")
        s = allc.groupby("node", sort=False)["c"].sum()
        m = s.max()
        return s / m if m > 0.0 else s

    hub = pd.Series(1.0, index=nodes)
    auth = None
    for _ in range(iterations):
        auth = push(hub, "w1", "w2")
        hub = push(auth, "w2", "w1")

    def rnd(v: np.ndarray) -> np.ndarray:
        v = v * 1e6
        return np.copysign(np.floor(np.abs(v) + 0.5), v) / 1e6

    nodes_sorted = np.sort(nodes)
    return pd.DataFrame({
        "node": nodes_sorted,
        "hub": rnd(hub.reindex(nodes_sorted).fillna(0.0)
                   .to_numpy(np.float64)),
        "authority": rnd(auth.reindex(nodes_sorted).fillna(0.0)
                         .to_numpy(np.float64))})


def quality_classifier_documents(docs: pd.DataFrame, epochs: int = 8,
                                 learning_rate: float = 0.5
                                 ) -> pd.DataFrame:
    """Independent twin of the composed quality-classifier pipeline
    (train on lang=='en' labels over 4 deterministic text features,
    score every document). Features per the documented spec:
    n_tokens/100, stopword fraction, n_chars/1000, digit fraction."""
    stop = {"a", "and", "for", "in", "is", "of", "on", "the",
            "to", "with"}
    ids = docs["doc_id"].to_numpy(np.int64)
    feats = []
    for text in docs["text"]:
        t = (text or "")
        toks = t.lower().split(" ")
        n_tok = len(toks)
        hits = sum(1 for w in toks if w in stop)
        nchars = len(t)
        ndig = sum(1 for ch in t if "0" <= ch <= "9")
        feats.append(np.array([
            n_tok / 100.0,
            hits / n_tok,
            nchars / 1000.0,
            ndig / max(nchars, 1),
        ], dtype=np.float64))
    label = (docs["lang"] == "en").to_numpy().astype(np.int64)
    emb_like = pd.DataFrame({"vec_id": ids, "embedding": feats,
                             "label": label})
    _, W, b = _fit_linear_golden(emb_like, epochs=epochs,
                                 learning_rate=learning_rate,
                                 use_class_weights=True)
    X = np.stack(feats)
    logits = X @ W.T + b
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    p = e / e.sum(axis=1, keepdims=True)
    return pd.DataFrame({
        "doc_id": ids,
        "label": label,
        "p_quality": _sql_round_arr(p[:, 1]),
        "pred": p.argmax(axis=1).astype(np.int64),
    })


def binseg_changepoints_crawl(obs_long: pd.DataFrame,
                              min_size: int = 5,
                              penalty_mult: float = 2.0
                              ) -> pd.DataFrame:
    """Independent twin of the binary-segmentation changepoint
    detector: daily means per (url, metric), deterministic binseg
    (first-index tie-break, FIFO segment queue), penalty
    penalty_mult * median(|dv|)^2 * ln n."""
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"}))
    rows = []
    for (u, m), g in daily.sort_values(
            ["url", "metric", "day"]).groupby(["url", "metric"],
                                              sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < 2 * min_size:
            continue
        dmed = float(np.median(np.abs(np.diff(v))))
        penalty = penalty_mult * dmed * dmed * np.log(n)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        cs2 = np.concatenate([[0.0], np.cumsum(v * v)])

        def sse(a, b):
            nn = b - a
            if nn == 0:
                return 0.0
            s = cs[b] - cs[a]
            return float(cs2[b] - cs2[a] - s * s / nn)

        found = []
        segs = [(0, n)]
        while segs:
            a, b = segs.pop(0)
            if b - a < 2 * min_size:
                continue
            total = sse(a, b)
            best_t, best_gain = -1, 0.0
            for t in range(a + min_size, b - min_size + 1):
                gain = total - sse(a, t) - sse(t, b)
                if gain > best_gain + 1e-12:
                    best_t, best_gain = t, gain
            if best_t < 0 or best_gain <= penalty:
                continue
            found.append((best_t, best_gain))
            segs.append((a, best_t))
            segs.append((best_t, b))
        cps = sorted(t for t, _ in found)
        gains = dict(found)
        bounds = [0] + cps + [n]
        days = g["day"].to_numpy()
        for i, t in enumerate(cps):
            lo, hi = bounds[i], bounds[i + 2]
            rows.append({"url": u, "metric": m, "cp_day": days[t],
                         "gain": float(gains[t]),
                         "mean_before": float(v[lo:t].mean()),
                         "mean_after": float(v[t:hi].mean())})
    if not rows:
        return pd.DataFrame(columns=["url", "metric", "cp_day",
                                     "gain", "mean_before",
                                     "mean_after"])
    out = pd.DataFrame(rows)
    for c in ("gain", "mean_before", "mean_after"):
        out[c] = _sql_round_arr(out[c].to_numpy(np.float64)) + 0.0
    return out


def holt_winters_crawl(obs_long: pd.DataFrame, season: int = 7,
                       alpha: float = 0.4, beta: float = 0.1,
                       gamma: float = 0.3, horizon: int = 7
                       ) -> pd.DataFrame:
    """Independent scalar twin of the Holt-Winters additive seasonal
    forecaster: daily means per (url, metric), classic two-season
    init, per-step scalar recursion, h-step forecasts."""
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"}))
    m = season
    rows = []
    for (u, met), g in daily.sort_values(
            ["url", "metric", "day"]).groupby(["url", "metric"],
                                              sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < 2 * m:
            continue
        lvl = v[:m].mean()
        b = (v[m:2 * m].sum() / m - lvl) / m
        s = list(v[:m] - lvl)
        for t in range(m, n):
            sm = s[t - m]
            lnew = alpha * (v[t] - sm) + (1 - alpha) * (lvl + b)
            b = beta * (lnew - lvl) + (1 - beta) * b
            s.append(gamma * (v[t] - lnew) + (1 - gamma) * sm)
            lvl = lnew
        for h in range(1, horizon + 1):
            si = n - m + 1 + ((h - 1) % m) - 1
            rows.append({"url": u, "metric": met,
                         "n_days": np.int64(n), "h": np.int64(h),
                         "forecast": lvl + h * b + s[si]})
    if not rows:
        return pd.DataFrame(columns=["url", "metric", "n_days", "h",
                                     "forecast"])
    out = pd.DataFrame(rows)
    out["forecast"] = _sql_round_arr(
        out["forecast"].to_numpy(np.float64)) + 0.0
    return out


def sax_motifs_crawl(obs_long: pd.DataFrame, window: int = 14,
                     frames: int = 7, alphabet: str = "abcd"
                     ) -> pd.DataFrame:
    """Independent twin of the SAX motif miner: daily means, sliding
    z-normalized windows, PAA over N(0,1) quartile breakpoints, modal
    word with (count DESC, word ASC) tie-break."""
    bp = [-0.6744897501960817, 0.0, 0.6744897501960817]
    seg = window // frames
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"}))
    rows = []
    for (u, m), g in daily.sort_values(
            ["url", "metric", "day"]).groupby(["url", "metric"],
                                              sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < window:
            continue
        counts: dict[str, int] = {}
        for i in range(n - window + 1):
            w = v[i:i + window]
            mu = w.mean()
            sd = np.sqrt(((w - mu) ** 2).mean())
            z = (w - mu) / sd if sd > 0.0 else np.zeros(window)
            word = ""
            for f in range(frames):
                p = z[f * seg:(f + 1) * seg].mean()
                j = 0
                while j < len(bp) and p >= bp[j]:
                    j += 1
                word += alphabet[j]
            counts[word] = counts.get(word, 0) + 1
        best = max(counts.items(), key=lambda kv: (kv[1], [-ord(c) for c
                                                           in kv[0]]))
        rows.append({"url": u, "metric": m, "n_days": np.int64(n),
                     "n_windows": np.int64(n - window + 1),
                     "motif": best[0],
                     "motif_count": np.int64(best[1])})
    cols = ["url", "metric", "n_days", "n_windows", "motif",
            "motif_count"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def matrix_profile_discord_crawl(obs_long: pd.DataFrame,
                                 window: int = 14) -> pd.DataFrame:
    """Independent scalar twin of the matrix-profile discord: per
    window, NN distance to every non-overlapping window (exclusion
    window//2); discord = argmax of the rounded profile."""
    L = window
    excl = L // 2
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"}))
    rows = []
    for (u, m), g in daily.sort_values(
            ["url", "metric", "day"]).groupby(["url", "metric"],
                                              sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < L + excl + 1:
            continue
        nw = n - L + 1
        zs = []
        for i in range(nw):
            w = v[i:i + L]
            mu = w.mean()
            sd = np.sqrt(((w - mu) ** 2).mean())
            zs.append((w - mu) / sd if sd > 0.0 else np.zeros(L))
        prof = []
        for i in range(nw):
            best = np.inf
            for j in range(nw):
                if abs(i - j) < excl:
                    continue
                d2 = float(((zs[i] - zs[j]) ** 2).sum())
                best = min(best, d2)
            prof.append(np.sqrt(max(best, 0.0)))
        prof = _sql_round_arr(np.asarray(prof))
        bi = int(np.argmax(prof))
        days = g["day"].to_numpy()
        rows.append({"url": u, "metric": m, "n_windows": np.int64(nw),
                     "discord_day": days[bi],
                     "discord_dist": float(prof[bi])})
    cols = ["url", "metric", "n_windows", "discord_day", "discord_dist"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def boilerplate_extract_documents(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent twin of the boilerplate extraction over the
    synthesized pages: derives the expected output straight from the
    document text (never parsing HTML) — nav/ad/footer blocks always
    fail the link-density or min-words rule, paragraphs are the
    12-word chunks and survive iff they have ≥5 words."""
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = (text or "").split()
        paras = [" ".join(words[j:j + 12])
                 for j in range(0, len(words), 12)]
        kept = [p for p in paras if len(p.split()) >= 5]
        content = "\n".join(kept)
        rows.append({
            "doc_id": np.int64(doc_id),
            "n_blocks": np.int64(1 + len(paras) + len(paras) // 2 + 1),
            "n_kept": np.int64(len(kept)),
            "content": content,
            "content_len": np.int64(len(content)),
        })
    return pd.DataFrame(rows)[["doc_id", "n_blocks", "n_kept",
                               "content", "content_len"]]


def _ts_feature_frame(obs_long: pd.DataFrame) -> pd.DataFrame:
    """Independent per-series feature vectors (twin of
    ``stm.ts_feature_vectors``): daily means → dimensionless moments
    → rounded features → hashed series id."""
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"}))
    rows = []
    for (u, m), g in daily.sort_values(
            ["url", "metric", "day"]).groupby(["url", "metric"],
                                              sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < 3:
            continue
        mu = v.mean()
        d = v - mu
        m2 = (d * d).mean()
        ss0 = (d * d).sum()
        if m2 <= 0 or ss0 <= 0:
            continue
        feats = np.array([
            (d * d * d).mean() / (m2 * np.sqrt(m2)),
            (d * d * d * d).mean() / (m2 * m2) - 3.0,
            float(d[1:] @ d[:-1]) / ss0,
            float((v > mu).sum()) / n,
            float(((d[1:] * d[:-1]) < 0).sum()) / (n - 1.0),
        ])
        rows.append({"url": u, "metric": m,
                     "features": _sql_round_arr(feats) + 0.0})
    out = pd.DataFrame(rows)
    key = (out["url"].astype(str) + "|"
           + out["metric"].astype(str)).to_numpy(object)
    out["vec_id"] = pd.util.hash_array(
        key, categorize=False).view(np.int64)
    return out


def ts_kmeans_crawl(obs_long: pd.DataFrame, k: int = 5,
                    iterations: int = 4,
                    num_partitions: int = 64) -> pd.DataFrame:
    """Independent twin of the temporal-archetype clustering: same
    fixed-partition Lloyd loop as :func:`_kmeans_centroids`, seeded by
    the k smallest hashed series ids."""
    f = _ts_feature_frame(obs_long)
    ids = f["vec_id"].to_numpy(np.int64)
    seed = f.sort_values("vec_id").head(k)
    C = np.stack([np.asarray(v, dtype=np.float64)
                  for v in seed["features"]])
    d = C.shape[1]
    pid_all = (pd.util.hash_array(ids, categorize=False)
               % np.uint64(num_partitions)).astype(np.int64)
    for _ in range(iterations):
        parts = []
        for pid in np.unique(pid_all):
            sub = f[pid_all == pid].sort_values("vec_id",
                                                kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in sub["features"]])
            a = _assign_of(X, C)
            acc = np.zeros((k, d), dtype=np.float64)
            np.add.at(acc, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            pf = pd.DataFrame({
                "pid": np.repeat(np.int64(pid), k * d),
                "cluster": np.repeat(np.arange(k, dtype=np.int64), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), k),
                "s": acc.ravel(),
                "n": np.repeat(cnt, d),
            })
            parts.append(pf[pf["n"] > 0])
        partials = pd.concat(parts, ignore_index=True).sort_values(
            ["cluster", "dim", "pid"], kind="mergesort")
        g = partials.groupby(["cluster", "dim"], sort=True)
        s = g["s"].sum()
        nn = g["n"].sum()
        C_new = C.copy()
        for (ci, di), sv in s.items():
            nv = nn[(ci, di)]
            if nv > 0:
                C_new[ci, di] = sv / float(nv)
        C = C_new
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in f["features"]])
    return pd.DataFrame({"url": f["url"].to_numpy(),
                         "metric": f["metric"].to_numpy(),
                         "cluster": _assign_of(X, C).astype(np.int64)})


def sdt_downsample_crawl(obs_long: pd.DataFrame,
                         comp_dev: float = 5.0) -> pd.DataFrame:
    """Scalar twin of the swinging-door compressor: per (url, metric)
    series, walk point-by-point keeping the two door slopes from the
    last archived point; archive the previous point when they cross."""
    rows = []
    srt = obs_long.sort_values(["url", "metric", "warc_ts"])
    for (u, m), g in srt.groupby(["url", "metric"], sort=False):
        ts = g["warc_ts"].to_numpy()
        t = ts.astype("datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy(np.float64)
        n = len(t)
        keep = [0] if n else []
        if n > 2:
            a, up, low = 0, np.inf, -np.inf
            for i in range(1, n):
                dt = float(t[i] - t[a])
                if dt <= 0:
                    continue
                up = min(up, (v[i] - v[a] + comp_dev) / dt)
                low = max(low, (v[i] - v[a] - comp_dev) / dt)
                if low > up:
                    a = i - 1
                    keep.append(a)
                    dt = float(t[i] - t[a])
                    up = (v[i] - v[a] + comp_dev) / dt
                    low = (v[i] - v[a] - comp_dev) / dt
        if n >= 2 and keep[-1] != n - 1:
            keep.append(n - 1)
        for p in keep:
            rows.append({"url": u, "metric": m, "warc_ts": ts[p],
                         "value": v[p], "pos": np.int64(p)})
    return pd.DataFrame(rows)[["url", "metric", "warc_ts", "value",
                               "pos"]]


def _dtw_full_matrix(x: np.ndarray, tpl: np.ndarray) -> float:
    """Independent scalar DTW: full (n+1)×(L+1) matrix DP (the
    textbook formulation, vs the engine's rolling-row variant)."""
    n, L = len(x), len(tpl)
    D = np.full((n + 1, L + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, L + 1):
            c = abs(x[i - 1] - tpl[j - 1])
            D[i, j] = c + min(D[i - 1, j], D[i, j - 1],
                              D[i - 1, j - 1])
    return float(D[n, L])


def dtw_classify_crawl(obs_long: pd.DataFrame, min_days: int = 8
                       ) -> pd.DataFrame:
    """Twin of the nearest-template DTW classifier over daily means."""
    from sits_classification_ray.stages.stm import _dtw_templates

    tpls = sorted(_dtw_templates().items())
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"})
             .sort_values(["url", "metric", "day"]))
    rows = []
    for (u, m), g in daily.groupby(["url", "metric"], sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < min_days:
            continue
        mu = v.mean()
        sd = np.sqrt(((v - mu) ** 2).mean())
        if sd <= 0:
            continue
        z = (v - mu) / sd
        best_name, best_d = None, np.inf
        for name, tpl in tpls:
            d = _dtw_full_matrix(z, tpl) / n
            if d < best_d:
                best_name, best_d = name, d
        rows.append({"url": u, "metric": m, "n_days": np.int64(n),
                     "best_template": best_name,
                     "dtw_dist": float(_sql_round_arr(
                         np.array([best_d]))[0]) + 0.0})
    return pd.DataFrame(rows)[["url", "metric", "n_days",
                               "best_template", "dtw_dist"]]


def snapshot_novelty_crawl(obs: pd.DataFrame, shingle_k: int = 8
                           ) -> pd.DataFrame:
    """Twin of the consecutive-snapshot novelty rate: Python-set
    shingle membership over the scalar Horner polynomial hashes."""
    def hset(t: str) -> set:
        data = (t or "").encode()
        if not data:
            return {0}
        span = min(shingle_k, len(data))
        out = set()
        for i in range(max(1, len(data) - shingle_k + 1)):
            h = 0
            for byte in data[i:i + span]:
                h = (h * 1099511628211 + byte) % (1 << 64)
            out.add(h & ((1 << 61) - 1))
        return out

    rows = []
    srt = obs.sort_values(["url", "warc_ts"])
    for u, g in srt.groupby("url", sort=False):
        ts = g["warc_ts"].to_numpy()
        texts = g["text"].tolist()
        prev = None
        for i, t in enumerate(texts):
            cur = hset(t)
            if prev is not None:
                novel = len(cur - prev) / len(cur)
                rows.append({
                    "url": u, "warc_ts": ts[i], "prev_ts": ts[i - 1],
                    "n_shingles": np.int64(len(cur)),
                    "novel_frac": float(_sql_round_arr(
                        np.array([novel]))[0]) + 0.0})
            prev = cur
    return pd.DataFrame(rows)[["url", "warc_ts", "prev_ts",
                               "n_shingles", "novel_frac"]]


def shesd_anomalies_crawl(obs_long: pd.DataFrame, alpha: float = 0.05,
                          max_frac: float = 0.1, min_days: int = 14
                          ) -> pd.DataFrame:
    """Scalar twin of the Seasonal-Hybrid ESD detector (same STL-lite
    seasonal, same Acklam Φ⁻¹ critical values)."""
    from sits_classification_ray.functions.transforms import norm_ppf

    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"})
             .sort_values(["url", "metric", "day"]))
    rows = []
    for (u, m), g in daily.groupby(["url", "metric"], sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < min_days:
            continue
        idx = np.arange(n)
        lo = np.maximum(idx - 3, 0)
        hi = np.minimum(idx + 3, n - 1)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        trend = (cs[hi + 1] - cs[lo]) / (hi - lo + 1)
        det = v - trend
        dow = pd.DatetimeIndex(g["day"]).dayofweek.to_numpy()
        seas = np.zeros(n)
        for d in np.unique(dow):
            msk = dow == d
            seas[msk] = det[msk].mean()
        resid = v - seas
        resid = resid - np.median(resid)
        k_max = max(1, int(np.floor(max_frac * n)))
        remaining = np.ones(n, dtype=bool)
        cand = []
        for k in range(1, k_max + 1):
            r = resid[remaining]
            med = np.median(r)
            mad = 1.4826 * np.median(np.abs(r - med))
            if mad <= 0:
                break
            stat = np.where(remaining,
                            np.abs(resid - med) / mad, -np.inf)
            i_star = int(np.argmax(stat))
            nk = int(remaining.sum())
            z = float(norm_ppf(np.array(
                [1.0 - alpha / (2.0 * nk)]))[0])
            lam = (nk - 1) * z / np.sqrt((nk - 2 + z * z) * nk)
            cand.append((i_star, float(stat[i_star]), float(lam)))
            remaining[i_star] = False
        k_star = 0
        for k, (_, rk, lam) in enumerate(cand, start=1):
            if rk > lam:
                k_star = k
        days = g["day"].to_numpy()
        for rank, (i, rk, _) in enumerate(cand[:k_star], start=1):
            rows.append({"url": u, "metric": m, "day": days[i],
                         "value": float(_sql_round_arr(
                             np.array([v[i]]))[0]) + 0.0,
                         "esd_stat": float(_sql_round_arr(
                             np.array([rk]))[0]) + 0.0,
                         "anom_rank": np.int64(rank)})
    cols = ["url", "metric", "day", "value", "esd_stat", "anom_rank"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def periodogram_peak_crawl(obs_long: pd.DataFrame, min_days: int = 16
                           ) -> pd.DataFrame:
    """Twin of the periodogram cadence detector (same rFFT)."""
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"})
             .sort_values(["url", "metric", "day"]))
    rows = []
    for (u, m), g in daily.groupby(["url", "metric"], sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < min_days:
            continue
        d = v - v.mean()
        if not np.any(d):
            continue
        pw = (np.abs(np.fft.rfft(d)) ** 2)[1:]
        total = pw.sum()
        if total <= 0:
            continue
        k = int(np.argmax(pw)) + 1
        rows.append({"url": u, "metric": m, "n_days": np.int64(n),
                     "dom_period_days": float(_sql_round_arr(
                         np.array([float(n) / k]))[0]) + 0.0,
                     "power_frac": float(_sql_round_arr(
                         np.array([float(pw[k - 1]) / total]))[0])
                     + 0.0})
    cols = ["url", "metric", "n_days", "dom_period_days", "power_frac"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def kleinberg_bursts_crawl(obs: pd.DataFrame, s: float = 2.0,
                           gamma: float = 1.0) -> pd.DataFrame:
    """Scalar twin of the two-state Kleinberg burst detector (list-
    based Viterbi, same start-in-base and tie-to-state-0 contract)."""
    import math

    rows = []
    srt = (obs[["url", "warc_ts"]].drop_duplicates()
           .sort_values(["url", "warc_ts"]))
    for u, g in srt.groupby("url", sort=False):
        ts = g["warc_ts"].to_numpy()
        t = [v / 1000000.0 for v in
             ts.astype("datetime64[us]").astype("int64").tolist()]
        x = [t[i + 1] - t[i] for i in range(len(t) - 1)]
        n = len(x)
        if n < 2 or t[-1] - t[0] <= 0:
            continue
        lam0 = n / (t[-1] - t[0])
        lam1 = s * lam0
        toll = gamma * math.log(n)
        e = [[-math.log(lam0) + lam0 * xi,
              -math.log(lam1) + lam1 * xi] for xi in x]
        c = [e[0][0], math.inf]
        bps = []
        for k in range(1, n):
            b0 = 0 if c[0] <= c[1] else 1
            n0 = min(c[0], c[1])
            f0 = c[0] + toll
            b1 = 0 if f0 <= c[1] else 1
            n1 = min(f0, c[1])
            bps.append((b0, b1))
            c = [n0 + e[k][0], n1 + e[k][1]]
        st = [0] * n
        st[-1] = 0 if c[0] <= c[1] else 1
        for k in range(n - 1, 0, -1):
            st[k - 1] = bps[k - 1][st[k]]
        k = 0
        while k < n:
            if st[k] == 1:
                j = k
                while j + 1 < n and st[j + 1] == 1:
                    j += 1
                rows.append({"url": u, "burst_start": ts[k],
                             "burst_end": ts[j + 1],
                             "n_gaps": np.int64(j - k + 1)})
                k = j + 1
            else:
                k += 1
    cols = ["url", "burst_start", "burst_end", "n_gaps"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def _binseg_cps_scalar(v: np.ndarray, min_size: int,
                       penalty_mult: float) -> list:
    """Scalar binseg breakpoints (same recursion as
    binseg_changepoints_crawl, exposed for the segment twin)."""
    n = len(v)
    dmed = float(np.median(np.abs(np.diff(v))))
    penalty = penalty_mult * dmed * dmed * np.log(n)
    cs = np.concatenate([[0.0], np.cumsum(v)])
    cs2 = np.concatenate([[0.0], np.cumsum(v * v)])

    def sse(a, b):
        nn = b - a
        if nn == 0:
            return 0.0
        s = cs[b] - cs[a]
        return float(cs2[b] - cs2[a] - s * s / nn)

    found = []
    segs = [(0, n)]
    while segs:
        a, b = segs.pop(0)
        if b - a < 2 * min_size:
            continue
        total = sse(a, b)
        best_t, best_gain = -1, 0.0
        for t in range(a + min_size, b - min_size + 1):
            gain = total - sse(a, t) - sse(t, b)
            if gain > best_gain + 1e-12:
                best_t, best_gain = t, gain
        if best_t < 0 or best_gain <= penalty:
            continue
        found.append(best_t)
        segs.append((a, best_t))
        segs.append((best_t, b))
    return sorted(found)


def segment_trends_crawl(obs_long: pd.DataFrame, min_size: int = 5,
                         penalty_mult: float = 2.0) -> pd.DataFrame:
    """Twin of the piecewise trend profile: scalar binseg breakpoints
    + per-segment OLS slope/mean."""
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"})
             .sort_values(["url", "metric", "day"]))
    rows = []
    for (u, m), g in daily.groupby(["url", "metric"], sort=False):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        if n < 2 * min_size:
            continue
        cps = _binseg_cps_scalar(v, min_size, penalty_mult)
        days = g["day"].to_numpy()
        bounds = [0] + cps + [n]
        for sid in range(len(bounds) - 1):
            a, b = bounds[sid], bounds[sid + 1]
            seg = v[a:b]
            k = b - a
            t = np.arange(k, dtype=np.float64)
            tb = t - t.mean()
            den = (tb * tb).sum()
            slope = float((tb * (seg - seg.mean())).sum() / den) \
                if den > 0 else 0.0
            rows.append({
                "url": u, "metric": m, "seg_id": np.int64(sid),
                "seg_start": days[a], "seg_end": days[b - 1],
                "n_days": np.int64(k),
                "seg_mean": float(_sql_round_arr(
                    np.array([seg.mean()]))[0]) + 0.0,
                "seg_slope": float(_sql_round_arr(
                    np.array([slope]))[0]) + 0.0})
    cols = ["url", "metric", "seg_id", "seg_start", "seg_end",
            "n_days", "seg_mean", "seg_slope"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def xcorr_lag_crawl(obs_long: pd.DataFrame, max_lag: int = 7,
                    min_pairs: int = 8) -> pd.DataFrame:
    """Twin of the cross-metric lead/lag detector: dict-based day
    alignment instead of searchsorted."""
    df = obs_long.copy()
    df["day"] = (df["warc_ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[us]"))
    daily = (df.groupby(["url", "metric", "day"], as_index=False)
             ["value"].mean().rename(columns={"value": "v"})
             .sort_values(["url", "metric", "day"]))
    rows = []
    for u, g in daily.groupby("url", sort=False):
        mets = sorted(g["metric"].unique())
        if len(mets) < 2:
            continue
        ma, mb = mets[0], mets[1]
        ga = g[g["metric"] == ma]
        gb = g[g["metric"] == mb]
        amap = dict(zip(ga["day"].to_numpy("datetime64[D]")
                        .astype(np.int64).tolist(),
                        ga["v"].tolist()))
        dbs = (gb["day"].to_numpy("datetime64[D]")
               .astype(np.int64).tolist())
        vbs = gb["v"].tolist()
        best_lag, best_corr, best_n = None, -np.inf, 0
        for lag in range(-max_lag, max_lag + 1):
            xs, ys = [], []
            for dday, vb in zip(dbs, vbs):
                va = amap.get(dday - lag)
                if va is not None:
                    xs.append(va)
                    ys.append(vb)
            if len(xs) < min_pairs:
                continue
            x = np.array(xs)
            y = np.array(ys)
            xd = x - x.mean()
            yd = y - y.mean()
            den = np.sqrt((xd * xd).sum() * (yd * yd).sum())
            if den <= 0:
                continue
            c = float((xd * yd).sum() / den)
            if c > best_corr:
                best_lag, best_corr, best_n = lag, c, len(xs)
        if best_lag is None:
            continue
        rows.append({"url": u, "metric_a": ma, "metric_b": mb,
                     "best_lag": np.int64(best_lag),
                     "n_pairs": np.int64(best_n),
                     "best_corr": float(_sql_round_arr(
                         np.array([best_corr]))[0]) + 0.0})
    cols = ["url", "metric_a", "metric_b", "best_lag", "n_pairs",
            "best_corr"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def kll_quantile_daily_crawl(obs_long: pd.DataFrame, k: int = 128,
                             quantiles: tuple = (0.5, 0.9, 0.99)
                             ) -> pd.DataFrame:
    """Twin of the per-(metric, day) KLL quantiles: independent
    list-based bulk build — same simplified-KLL spec (fixed per-level
    capacity, full compaction of the offset-parity half, alternating
    offset), pure selection ops so floats match bit-for-bit."""

    def build(vals_sorted: list) -> list:
        levels: list[list] = [[]]
        offsets: list[int] = [0]
        for s in range(0, len(vals_sorted), k):
            levels[0] = sorted(levels[0] + vals_sorted[s:s + k])
            i = 0
            while i < len(levels) and len(levels[i]) > k:
                promoted = levels[i][offsets[i]::2]
                offsets[i] ^= 1
                levels[i] = []
                if i + 1 == len(levels):
                    levels.append(list(promoted))
                    offsets.append(0)
                else:
                    levels[i + 1] = sorted(levels[i + 1]
                                           + list(promoted))
                i += 1
        return levels

    def est(levels: list, q: float) -> float:
        pairs = sorted((v, 1 << i) for i, lv in enumerate(levels)
                       for v in lv)
        W = float(sum(w for _, w in pairs))
        t = q * W
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= t:
                return float(v)
        return float(pairs[-1][0])

    df = obs_long.copy()
    day = df["warc_ts"].to_numpy().astype("datetime64[D]")
    df["bucket"] = (df["metric"].astype(str) + "|"
                    + pd.Series(day).astype(str).to_numpy())
    rows = []
    for bucket, g in df.groupby("bucket", sort=True):
        v = sorted(g["value"].to_numpy(np.float64).tolist())
        levels = build(v)
        row = [bucket, np.int64(len(v)),
               np.int64(sum(len(lv) for lv in levels)),
               np.int64(len(levels))]
        for q in quantiles:
            row.append(float(_sql_round_arr(
                np.array([est(levels, q)]))[0]) + 0.0)
        rows.append(row)
    qcols = [f"q{int(round(q * 100)):02d}" for q in quantiles]
    return pd.DataFrame(rows, columns=["bucket", "n", "n_retained",
                                       "n_levels"] + qcols)


def tdigest_quantile_daily_crawl(obs_long: pd.DataFrame,
                                 delta: float = 100.0) -> pd.DataFrame:
    """Twin of the per-(metric, day) t-digest quantiles: independent
    scalar k1-scale compression and midpoint interpolation."""
    import math

    def compress(vals: list) -> tuple:
        W = float(len(vals))

        def k(q):
            return delta / (2.0 * math.pi) * math.asin(
                min(1.0, max(-1.0, 2.0 * q - 1.0)))

        ms, ws = [], []
        cur_m, cur_w, w_done = float(vals[0]), 1.0, 0.0
        for x in vals[1:]:
            if k((w_done + cur_w + 1.0) / W) - k(w_done / W) <= 1.0:
                cur_w += 1.0
                cur_m += (x - cur_m) * (1.0 / cur_w)
            else:
                ms.append(cur_m)
                ws.append(cur_w)
                w_done += cur_w
                cur_m, cur_w = float(x), 1.0
        ms.append(cur_m)
        ws.append(cur_w)
        return ms, ws

    def quant(ms, ws, q):
        W = sum(ws)
        cum, acc = [], 0.0
        for wi in ws:
            cum.append(acc + wi / 2.0)
            acc += wi
        t = q * W
        if t <= cum[0]:
            return ms[0]
        if t >= cum[-1]:
            return ms[-1]
        # same boundary semantics as the engine: leftmost cum >= t,
        # then interpolate in [j-1, j] (identical IEEE op order)
        j = 0
        while cum[j] < t:
            j += 1
        j -= 1
        frac = (t - cum[j]) / (cum[j + 1] - cum[j])
        return ms[j] + frac * (ms[j + 1] - ms[j])

    df = obs_long.copy()
    day = (df["warc_ts"].to_numpy().astype("datetime64[D]")
           .astype("datetime64[us]"))
    df["bucket"] = (df["metric"].astype(str) + "|"
                    + pd.Series(day).dt.strftime("%Y-%m-%d"))
    rows = []
    for b, g in df.groupby("bucket", sort=False):
        v = sorted(g["value"].to_numpy(np.float64).tolist())
        ms, ws = compress(v)
        row = {"bucket": b, "n": np.int64(len(v)),
               "n_centroids": np.int64(len(ms))}
        for q, c in [(0.5, "q50"), (0.9, "q90"), (0.99, "q99")]:
            row[c] = float(_sql_round_arr(np.array(
                [quant(ms, ws, q)]))[0]) + 0.0
        rows.append(row)
    return pd.DataFrame(rows)[["bucket", "n", "n_centroids",
                               "q50", "q90", "q99"]]


def km_staleness_crawl(obs: pd.DataFrame) -> pd.DataFrame:
    """Scalar twin of the KM staleness curve: text-equality change
    anchors, whole-day durations, sequential product over event
    times."""
    DAY_US = 86_400_000_000
    durs = []
    srt = obs.sort_values(["url", "warc_ts"])
    for u, g in srt.groupby("url", sort=False):
        us = (g["warc_ts"].to_numpy("datetime64[us]")
              .astype(np.int64).tolist())
        texts = g["text"].tolist()
        anchor = us[0]
        for k in range(1, len(us)):
            if texts[k] != texts[k - 1]:
                durs.append(((us[k] - anchor) // DAY_US, 1))
                anchor = us[k]
        if anchor < us[-1]:
            durs.append(((us[-1] - anchor) // DAY_US, 0))
    from collections import defaultdict
    dd = defaultdict(lambda: [0, 0])
    for t, e in durs:
        dd[t][0 if e else 1] += 1
    ts = sorted(dd)
    total = len(durs)
    removed = 0
    surv = 1.0
    rows = []
    for t in ts:
        d, c = dd[t]
        n_risk = total - removed
        surv = surv * (1.0 - d / n_risk)
        removed += d + c
        if d > 0:
            rows.append({"t_days": np.int64(t),
                         "n_risk": np.int64(n_risk),
                         "d_events": np.int64(d),
                         "c_censored": np.int64(c),
                         "survival": float(_sql_round_arr(
                             np.array([surv]))[0]) + 0.0})
    return pd.DataFrame(rows)[["t_days", "n_risk", "d_events",
                               "c_censored", "survival"]]


def _moment_contract(emb: pd.DataFrame, num_partitions: int = 64,
                     chunk: int = 256):
    """Shared moment pass of the engine's PCA/Mahalanobis determinism
    contract (fixed hash partitions, id-sorted chunked np.add.reduce
    sums, (i, j, pid)-sorted merge). Returns (mean, cov, ids)."""
    ids = emb["vec_id"].to_numpy(np.int64)
    pid_all = (pd.util.hash_array(ids, categorize=False)
               % np.uint64(num_partitions)).astype(np.int64)
    d = len(np.asarray(emb["embedding"].iloc[0]))
    parts = []
    for pid in np.unique(pid_all):
        sub = emb[pid_all == pid].sort_values("vec_id", kind="mergesort")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in sub["embedding"]])
        ss = np.zeros((d, d), dtype=np.float64)
        s = np.zeros(d, dtype=np.float64)
        for i0 in range(0, len(X), chunk):
            ch = X[i0:i0 + chunk]
            ss += np.add.reduce(ch[:, :, None] * ch[:, None, :], axis=0)
            s += np.add.reduce(ch, axis=0)
        ii = np.repeat(np.arange(d, dtype=np.int64), d)
        jj = np.tile(np.arange(d, dtype=np.int64), d)
        parts.append(pd.DataFrame({
            "pid": np.int64(pid),
            "i": np.concatenate([ii, np.arange(d, dtype=np.int64),
                                 [np.int64(-1)]]),
            "j": np.concatenate([jj, np.full(d, -1, dtype=np.int64),
                                 [np.int64(-1)]]),
            "v": np.concatenate([ss.ravel(), s, [float(len(X))]])}))
    partials = pd.concat(parts, ignore_index=True).sort_values(
        ["i", "j", "pid"], kind="mergesort")
    agg = partials.groupby(["i", "j"], sort=True)["v"].sum()
    n = float(agg[(-1, -1)])
    s = np.array([agg[(i, -1)] for i in range(d)])
    ss_m = np.array([[agg[(i, j)] for j in range(d)] for i in range(d)])
    mean = s / n
    cov = (ss_m - n * np.outer(mean, mean)) / (n - 1.0)
    return mean, cov, ids


def mahalanobis_embeddings(emb: pd.DataFrame, num_partitions: int = 64,
                           chunk: int = 256,
                           round_to: int = 6) -> pd.DataFrame:
    """Independent Mahalanobis D² twin on the same moment contract —
    see ``stages/similarity.py`` mahalanobis_scores."""
    mean, cov, ids = _moment_contract(emb, num_partitions, chunk)
    inv = np.linalg.inv(cov)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]]) - mean
    y = (X[:, :, None] * inv[None, :, :]).sum(axis=1)
    d2 = (y * X).sum(axis=1)
    return pd.DataFrame({"vec_id": ids,
                         "d2": _sql_round_arr(d2, round_to) + 0.0})


def _logreg_newton_w(emb: pd.DataFrame, positive: int = 0,
                     n_iters: int = 4, reg: float = 1e-3,
                     num_partitions: int = 16
                     ) -> tuple[np.ndarray, float]:
    """Raw (unrounded) Newton/IRLS weights + final loss — shared core
    of the logreg twin and the margin-prune twin."""
    ids = emb["vec_id"].to_numpy(np.int64)
    pids = (pd.util.hash_array(np.ascontiguousarray(ids),
                               categorize=False)
            % np.uint64(num_partitions)).astype(np.int64)
    d = len(np.asarray(emb["embedding"].iloc[0])) + 1
    w = np.zeros(d)
    loss_final = 0.0
    for _ in range(n_iters):
        total = np.zeros(d * d + d + 2)
        for pid in sorted(np.unique(pids)):
            g_ = emb[pids == pid].sort_values("vec_id", kind="mergesort")
            X = np.concatenate(
                [np.stack([np.asarray(v, dtype=np.float64)
                           for v in g_["embedding"]]),
                 np.ones((len(g_), 1))], axis=1)
            y = (g_["label"].to_numpy(np.int64) == positive
                 ).astype(np.float64)
            z = X @ w
            p = 1.0 / (1.0 + np.exp(-z))
            s = p * (1.0 - p)
            H = (X * s[:, None]).T @ X
            grad = X.T @ (p - y)
            loss = float(np.logaddexp(0.0, z).sum() - (y * z).sum())
            total += np.concatenate(
                [H.ravel(), grad, [loss, float(len(y))]])
        H = total[:d * d].reshape(d, d) + reg * np.eye(d)
        grad = total[d * d:d * d + d] + reg * w
        loss_final = total[d * d + d] / total[d * d + d + 1]
        w = w - np.linalg.solve(H, grad)
    return w, float(loss_final)


def logreg_fit_embeddings(emb: pd.DataFrame, positive: int = 0,
                          n_iters: int = 4, reg: float = 1e-3,
                          num_partitions: int = 16) -> pd.DataFrame:
    """Independent Newton/IRLS twin under the engine's determinism
    contract: rows hash-partitioned into pids (pandas SipHash), each
    pid's [H|g|loss] partial computed over id-sorted rows, partials
    summed in ascending-pid order, exact solve per iteration."""
    w, loss_final = _logreg_newton_w(emb, positive, n_iters, reg,
                                     num_partitions)
    d = len(w)
    dims = np.concatenate([np.arange(d - 1), [-1, -2]]).astype(np.int64)
    vals = np.concatenate([w[:d - 1], [w[d - 1], loss_final]])
    return pd.DataFrame({"dim": dims,
                         "weight": _sql_round_arr(vals) + 0.0})


def rff_kernel_embeddings(emb: pd.DataFrame, D: int = 64,
                          gamma: float = 0.5) -> pd.DataFrame:
    """Independent RFF twin: independently-written splitmix64 +
    Box-Muller draw of (W, b), same probe pairs and error stats."""

    def smix(x: np.ndarray) -> np.ndarray:
        z = (x + np.uint64(0x9E3779B97F4A7C15)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(30)))
             * np.uint64(0xBF58476D1CE4E5B9)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(27)))
             * np.uint64(0x94D049BB133111EB)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))

    sub = emb[emb["vec_id"] <= 15].sort_values("vec_id")
    X = np.stack([np.asarray(v, np.float64)
                  for v in sub["embedding"]])
    d = X.shape[1]
    with np.errstate(over="ignore"):
        idx = np.arange(d * D, dtype=np.uint64)
        u1 = (smix(idx) >> np.uint64(11)).astype(np.float64) \
            * 2.0 ** -53
        u2 = (smix(idx + np.uint64(10_000_019))
              >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
        bb = (smix(np.arange(D, dtype=np.uint64)
                   + np.uint64(77_003))
              >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
    u1 = np.maximum(u1, 1e-300)
    W = (np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
         * np.sqrt(2.0 * gamma)).reshape(d, D)
    b = 2.0 * np.pi * bb
    Z = np.sqrt(2.0 / D) * np.cos(X @ W + b)
    approx = Z @ Z.T
    sq = (X * X).sum(axis=1)
    exact = np.exp(-gamma * (sq[:, None] + sq[None, :]
                             - 2.0 * (X @ X.T)))
    iu = np.triu_indices(len(X), 1)
    err = approx[iu] - exact[iu]
    return pd.DataFrame({
        "n_pairs": [np.int64(len(err))],
        "mse": _sql_round_arr(
            np.array([float((err * err).mean())])) + 0.0,
        "max_abs_err": _sql_round_arr(
            np.array([float(np.abs(err).max())])) + 0.0,
        "mean_exact": _sql_round_arr(
            np.array([float(exact[iu].mean())])) + 0.0})


def fd_sketch_embeddings(emb: pd.DataFrame, ell: int = 8,
                         num_partitions: int = 16) -> pd.DataFrame:
    """Independent Frequent-Directions twin: same pid partitioning,
    same per-partition ell-batch insert/shrink loop and pid-ascending
    concat+shrink merge (identical SVD inputs ⇒ identical outputs)."""

    def shrink(B: np.ndarray) -> np.ndarray:
        _, s, Vt = np.linalg.svd(B, full_matrices=False)
        if len(s) <= ell:
            return s[:, None] * Vt
        delta = s[ell - 1] ** 2
        s2 = np.sqrt(np.maximum(s[:ell] ** 2 - delta, 0.0))
        return s2[:, None] * Vt[:ell]

    ids = emb["vec_id"].to_numpy(np.int64)
    pids = (pd.util.hash_array(np.ascontiguousarray(ids),
                               categorize=False)
            % np.uint64(num_partitions)).astype(np.int64)
    d = len(np.asarray(emb["embedding"].iloc[0]))
    B_all = None
    f2 = 0.0
    for pid in sorted(np.unique(pids)):
        g = emb[pids == pid].sort_values("vec_id", kind="mergesort")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g["embedding"]])
        B = np.zeros((0, d))
        for start in range(0, len(X), ell):
            B = np.concatenate([B, X[start:start + ell]])
            if len(B) > ell:
                B = shrink(B)
        if len(B) < ell:
            B = np.concatenate([B, np.zeros((ell - len(B), d))])
        f2 += float((X * X).sum())
        B_all = B if B_all is None else shrink(
            np.concatenate([B_all, B]))
    s = np.linalg.svd(B_all, compute_uv=False)
    return pd.DataFrame({
        "rank_idx": np.arange(len(s), dtype=np.int64),
        "sigma": _sql_round_arr(s, 4) + 0.0,
        "fro_mass_frac": _sql_round_arr(
            np.full(len(s), float((s * s).sum()) / f2), 4) + 0.0})


def ledoit_wolf_embeddings(emb: pd.DataFrame,
                           num_partitions: int = 16) -> pd.DataFrame:
    """Independent Ledoit-Wolf twin: same pid partial structure
    (SipHash pids, id-sorted rows within pid, ascending-pid merge),
    same two-pass moments and shrinkage formula."""
    ids = emb["vec_id"].to_numpy(np.int64)
    pids = (pd.util.hash_array(np.ascontiguousarray(ids),
                               categorize=False)
            % np.uint64(num_partitions)).astype(np.int64)
    d = len(np.asarray(emb["embedding"].iloc[0]))
    tot = np.zeros(d + d * d + 1)
    for pid in sorted(np.unique(pids)):
        g = emb[pids == pid].sort_values("vec_id", kind="mergesort")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g["embedding"]])
        tot += np.concatenate([X.sum(axis=0), (X.T @ X).ravel(),
                               [float(len(X))]])
    n = tot[-1]
    mean = tot[:d] / n
    S = tot[d:d + d * d].reshape(d, d) / n - np.outer(mean, mean)
    tot2 = np.zeros(2)
    for pid in sorted(np.unique(pids)):
        g = emb[pids == pid].sort_values("vec_id", kind="mergesort")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g["embedding"]]) - mean
        sq = (X * X).sum(axis=1)
        tot2 += np.array([float((sq * sq).sum()),
                          float((X * (X @ S)).sum())])
    sum_norm4, sum_xSx = tot2
    m = float(np.trace(S)) / d
    d2 = float(((S - m * np.eye(d)) ** 2).sum()) / d
    s2 = float((S * S).sum())
    b2 = (sum_norm4 - 2.0 * sum_xSx + n * s2) / (n * n * d)
    b2 = min(b2, d2)
    lam = b2 / d2 if d2 > 0 else 0.0
    return pd.DataFrame({
        "n": [np.int64(n)], "dim": [np.int64(d)],
        "mu": _sql_round_arr(np.array([m])) + 0.0,
        "d2": _sql_round_arr(np.array([d2])) + 0.0,
        "b2": _sql_round_arr(np.array([b2])) + 0.0,
        "shrinkage": _sql_round_arr(np.array([lam])) + 0.0})


def margin_prune_embeddings(emb: pd.DataFrame, keep_frac: float = 0.2
                            ) -> pd.DataFrame:
    """Margin-prune twin: raw weights from the shared Newton core,
    rounded margins, keep the smallest (|margin|, vec_id) fraction."""
    w, _ = _logreg_newton_w(emb)
    emb = emb.sort_values("vec_id", kind="mergesort")
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    z = _sql_round_arr(X @ w[:-1] + w[-1])
    df = pd.DataFrame({"vec_id": emb["vec_id"].to_numpy(np.int64),
                       "margin": z + 0.0, "absm": np.abs(z)})
    k = max(1, int(len(df) * keep_frac))
    kept = df.sort_values(["absm", "vec_id"],
                          kind="mergesort").head(k)
    return kept[["vec_id", "margin"]].reset_index(drop=True)


def priority_sample_documents(docs: pd.DataFrame, k: int = 100
                              ) -> pd.DataFrame:
    """Priority-sampling twin: independent splitmix64 (published
    public-domain constants), q = w/u, top-k with τ = (k+1)-th."""

    def smix(x: np.ndarray) -> np.ndarray:
        z = (x + np.uint64(0x9E3779B97F4A7C15)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(30)))
             * np.uint64(0xBF58476D1CE4E5B9)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(27)))
             * np.uint64(0x94D049BB133111EB)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))

    ids = docs["doc_id"].to_numpy(np.int64)
    w = docs["n_chars"].to_numpy(np.float64)
    with np.errstate(over="ignore"):
        h = smix(ids.astype(np.uint64))
    u = np.maximum((h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53,
                   2.0 ** -53)
    df = pd.DataFrame({"doc_id": ids, "w": w, "priority": w / u})
    df = df.sort_values(["priority", "doc_id"],
                        ascending=[False, True], kind="mergesort")
    tau = float(df["priority"].iloc[k]) if len(df) > k else 0.0
    kept = df.head(k)
    return pd.DataFrame({
        "doc_id": kept["doc_id"].to_numpy(np.int64),
        "w": kept["w"].to_numpy(np.float64),
        "w_hat": _sql_round_arr(
            np.maximum(kept["w"].to_numpy(np.float64), tau)) + 0.0})


def pca_projection_embeddings(emb: pd.DataFrame, n_components: int = 2,
                              num_partitions: int = 64,
                              chunk: int = 256,
                              round_to: int = 6) -> pd.DataFrame:
    """Independent single-process PCA projection implementing the
    engine's determinism contract bit-for-bit (fixed hash partitions,
    id-sorted chunked ``np.add.reduce`` moment sums, (i, j, pid)-sorted
    merge, largest-|loading|-positive sign, ufunc-contraction
    projection) — see ``stages/similarity.py`` pca_basis."""
    mean, cov, ids = _moment_contract(emb, num_partitions, chunk)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w, kind="stable")[::-1][:n_components]
    comps = v[:, order].copy()
    for c in range(comps.shape[1]):
        jmax = int(np.argmax(np.abs(comps[:, c])))
        if comps[jmax, c] < 0:
            comps[:, c] = -comps[:, c]
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]]) - mean
    p = (X[:, :, None] * comps[None, :, :]).sum(axis=1)
    out = {"vec_id": ids}
    for c in range(comps.shape[1]):
        out[f"pc{c + 1}"] = _sql_round_arr(p[:, c], round_to) + 0.0
    return pd.DataFrame(out)


def forecast_backtest_crawl(obs_long: pd.DataFrame, alpha: float = 0.5,
                            beta: float = 0.3,
                            ndigits: int = 6) -> pd.DataFrame:
    """Independent per-series rolling-origin Holt backtest twin — see
    ``stages/windows.py`` forecast_backtest."""
    rows = []
    for (url, metric), g in obs_long.groupby(["url", "metric"],
                                             sort=True):
        g = g.sort_values("warc_ts", kind="mergesort")
        y = g["value"].to_numpy(np.float64)
        n = len(y)
        if n < 3:
            continue
        lvl = y[0]
        b = y[1] - y[0]
        ae = se = nd = 0.0
        cnt = 0
        for t in range(1, n):
            nd += abs(y[t] - y[t - 1])
            if t >= 2:
                e = y[t] - (lvl + b)
                ae += abs(e)
                se += e * e
                cnt += 1
            ln = alpha * y[t] + (1.0 - alpha) * (lvl + b)
            b = beta * (ln - lvl) + (1.0 - beta) * b
            lvl = ln
        if nd <= 0:
            continue
        naive = nd / (n - 1)
        rows.append({
            "url": url, "metric": metric, "n": np.int64(n),
            "mae": np.round(ae / cnt, ndigits),
            "rmse": np.round(np.sqrt(se / cnt), ndigits),
            "mase": np.round((ae / cnt) / naive, ndigits)})
    return pd.DataFrame(rows, columns=["url", "metric", "n", "mae",
                                       "rmse", "mase"])


def kcenter_select_embeddings(emb: pd.DataFrame, k: int = 16,
                              round_to: int = 6) -> pd.DataFrame:
    """Independent single-process Gonzalez farthest-point twin — see
    ``stages/curation.py`` kcenter_select."""
    ids = emb["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    start = int(np.argmin(ids))
    d2 = np.add.reduce((X - X[start]) ** 2, axis=1)
    rows = [(np.int64(0), np.int64(ids[start]), -1.0)]
    for r in range(1, k):
        i = int(np.lexsort((ids, -d2))[0])
        rows.append((np.int64(r), np.int64(ids[i]),
                     float(_sql_round_arr(
                         np.array([np.sqrt(d2[i])]), round_to)[0])))
        d2 = np.minimum(d2, np.add.reduce((X - X[i]) ** 2, axis=1))
    return pd.DataFrame(rows, columns=["sel_rank", "vec_id", "radius"])


def gbdt_fit_embeddings(emb: pd.DataFrame, n_rounds: int = 8,
                        n_bins: int = 16, learning_rate: float = 0.5,
                        round_to: int = 6) -> pd.DataFrame:
    """Independent single-process histogram-GBDT twin — see
    ``stages/gbdt.py`` gbdt_fit (same integer micro-unit quantization,
    same global-edge binning, same first-max split rule)."""
    MICRO = 1_000_000
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    y = emb["label"].to_numpy(np.float64)
    n, dim = X.shape
    mins, maxs = X.min(axis=0), X.max(axis=0)
    widths = maxs - mins
    w = np.where(widths > 0, widths, 1.0)
    bins = np.floor((X - mins[None, :]) / w[None, :] * n_bins) \
        .astype(np.int64)
    bins[:, widths <= 0] = 0
    bins = np.clip(bins, 0, n_bins - 1)
    base = int(np.round(y * MICRO).astype(np.int64).sum()) / MICRO / n
    F = np.full(n, base)
    stumps = []
    for rnd in range(n_rounds):
        r = np.round((y - F) * MICRO).astype(np.int64)
        C = np.zeros((dim, n_bins), dtype=np.int64)
        S = np.zeros((dim, n_bins), dtype=np.int64)
        for j in range(dim):
            C[j] = np.bincount(bins[:, j], minlength=n_bins)
            S[j] = np.round(np.bincount(
                bins[:, j], weights=r.astype(np.float64),
                minlength=n_bins)).astype(np.int64)
        cl = C.cumsum(axis=1)[:, :-1]
        sl = S.cumsum(axis=1)[:, :-1]
        ct = C.sum(axis=1, keepdims=True)
        st = S.sum(axis=1, keepdims=True)
        cr, sr = ct - cl, st - sl
        valid = (cl >= 1) & (cr >= 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            gain = (np.where(valid, sl.astype(np.float64) ** 2 / cl, 0.0)
                    + np.where(valid, sr.astype(np.float64) ** 2 / cr, 0.0)
                    - st.astype(np.float64) ** 2 / ct) / (MICRO ** 2)
        gain = np.where(valid, gain, -np.inf)
        flat = np.argmax(gain)
        j, b = divmod(int(flat), n_bins - 1)
        if not np.isfinite(gain[j, b]) or gain[j, b] <= 0:
            break
        lv = learning_rate * (int(sl[j, b]) / MICRO) / int(cl[j, b])
        rv = learning_rate * (int(sr[j, b]) / MICRO) / int(cr[j, b])
        thr = float(mins[j] + widths[j] * (b + 1) / n_bins)
        right = X[:, j] > thr
        F = F + np.where(right, rv, lv)
        stumps.append((np.int64(rnd), np.int64(j),
                       round(thr, round_to), round(lv, round_to),
                       round(rv, round_to),
                       round(float(gain[j, b]), round_to)))
    return pd.DataFrame(stumps, columns=["round", "feature", "threshold",
                                         "left_value", "right_value",
                                         "gain"])


def kcore_domains_crawl(crawl: pd.DataFrame) -> pd.DataFrame:
    """Independent EXACT k-core oracle: domain edges re-synthesized
    from the page bytes exactly as the engine's link extraction
    (see pagerank_domains_crawl), then classic Batagelj-Zaversnik
    min-degree peeling — validates that the engine's h-index fixpoint
    (stages/graph.py coreness) lands on the true core numbers, not
    just that two copies of one algorithm agree."""
    srcs, dsts = [], []
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            srcs.append(src)
            dsts.append(f"site-{(n + j) % 40}.example.com")
    adj: dict[str, set] = {}
    for a, b in zip(srcs, dsts):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(nb) for v, nb in adj.items()}
    core: dict[str, int] = {}
    k = 0
    alive = set(adj)
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    nodes = sorted(core)
    return pd.DataFrame({"node": nodes,
                         "core": np.array([core[v] for v in nodes],
                                          dtype=np.int64)})


def als_recommend_events(events: pd.DataFrame, d: int = 8,
                         n_iters: int = 3, reg: float = 0.1,
                         seed: int = 7) -> pd.DataFrame:
    """Independent single-process ALS twin: same determinism contract
    as stages/als.py (splitmix64 init, (key, other)-sorted per-group
    normal-equation accumulation, item step over (item, user) order)
    but run as one flat pandas pass — no exchanges, no partitions.
    The leaf numeric kernels (init_factors, solve_side) are imported
    so both sides share one float-accumulation order; the pipeline
    structure under test (tag-union factor exchange, broadcast item
    matrix, per-partition group solves) is exercised only on the
    engine side."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.als import init_factors, solve_side

    ev = events[events["event_type"].isin(["click", "view", "purchase"])]
    k = ev["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
    ok = k.notna()
    rt = (pd.DataFrame({
        "user": ev["user_id"].to_numpy(np.int64)[ok.to_numpy()],
        "item": k[ok].astype(np.int64).to_numpy(),
        "cents": np.rint(ev["value"].to_numpy(np.float64)[ok.to_numpy()]
                         * 100.0).astype(np.int64)})
        .groupby(["user", "item"], as_index=False)["cents"].sum()
        .sort_values(["user", "item"], kind="mergesort",
                     ignore_index=True))
    users = rt["user"].to_numpy(np.int64)
    items = rt["item"].to_numpy(np.int64)
    r = np.log1p(rt["cents"].to_numpy(np.float64) / 100.0)
    item_ids = np.unique(items)
    Y = init_factors(item_ids, d, seed)
    pos = np.searchsorted(item_ids, items)
    order = np.lexsort((users, items))
    for _ in range(n_iters):
        uk, X = solve_side(users, Y[pos], r, d, reg)
        xrow = np.searchsorted(uk, users)
        _, Y = solve_side(items[order], X[xrow][order], r[order], d, reg)
    uk, X = solve_side(users, Y[pos], r, d, reg)
    scores = X @ Y.T
    first = np.searchsorted(users, uk)
    counts = np.diff(np.append(first, len(users)))
    urow = np.repeat(np.arange(len(uk)), counts)
    scores[urow, pos] = -np.inf
    best = scores.argmax(axis=1)
    return pd.DataFrame({
        "user_id": uk, "rec_item": item_ids[best],
        "score": sql_round(scores[np.arange(len(uk)), best], 6) + 0.0})


def ann_recall_embeddings(emb: pd.DataFrame,
                          query_ids=(0, 1, 2, 3, 4), k: int = 10,
                          n_lists: int = 8, iters: int = 5,
                          seed: int = 0, n_probe: int = 2
                          ) -> pd.DataFrame:
    """Independent recall@k twin: exact cosine top-k per probe query
    (rounded-score desc, vec_id asc — the engine's published ranking
    contract) intersected with the reused :func:`ivf_topk` result."""
    from sits_classification_ray.functions.transforms import sql_round

    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    mat = mat / n
    ids = emb["vec_id"].to_numpy(np.int64)
    approx = ivf_topk(emb, query_ids=query_ids, n_lists=n_lists,
                      iters=iters, seed=seed, k=k, n_probe=n_probe)
    rows = []
    for q in sorted(query_ids):
        qv = mat[int(np.flatnonzero(ids == q)[0])]
        scores = np.round(qv @ mat.T, 6)
        order = np.lexsort((ids, -scores))[:k]
        e = set(ids[order])
        a = set(approx.loc[approx["query_id"] == q, "vec_id"])
        hits = len(e & a)
        rows.append((q, hits, float(sql_round(hits / float(k), 6)) + 0.0))
    return pd.DataFrame(rows, columns=["query_id", "n_hits", "recall"]) \
        .astype({"query_id": np.int64, "n_hits": np.int64,
                 "recall": np.float64})


def removal_attribution_events(events: pd.DataFrame,
                               conv_type: str = "purchase",
                               round_to: int = 6) -> pd.DataFrame:
    """Independent Markov removal-effect twin: journeys rebuilt with a
    plain per-user loop (exact integer transition counts make the
    construction order-free), then its own absorbing-chain solve."""
    from sits_classification_ray.functions.transforms import sql_round

    ev = events.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
    cnt: dict = {}

    def bump(a: str, b: str) -> None:
        cnt[(a, b)] = cnt.get((a, b), 0) + 1

    for _, g in ev.groupby("user_id", sort=True):
        prev = "START"
        for t in g["event_type"]:
            if t == conv_type:
                bump(prev, "CONV")
                prev = "START"
            else:
                bump(prev, t)
                prev = t
        if prev != "START":
            bump(prev, "NULL")

    states = sorted({a for a, _ in cnt} - {"CONV", "NULL"})
    channels = [s for s in states if s != "START"]
    idx = {s: i for i, s in enumerate(states)}

    def absorb(skip):
        Q = np.zeros((len(states), len(states)))
        r = np.zeros(len(states))
        for s in states:
            if s == skip:
                continue
            outs = sorted((b, n) for (a, b), n in cnt.items() if a == s)
            tot = float(sum(n for _, n in outs))
            if tot == 0.0:
                continue
            for b, n in outs:
                p = float(n) / tot
                if b == "CONV":
                    r[idx[s]] += p
                elif b == "NULL" or b == skip:
                    pass
                elif b in idx:
                    Q[idx[s], idx[b]] += p
        return float(np.linalg.solve(np.eye(len(states)) - Q,
                                     r)[idx["START"]])

    base = absorb(None)
    re = np.array([1.0 - absorb(c) / base for c in channels])
    tot = re.sum()
    share = re / tot if tot > 0 else np.zeros_like(re)
    return pd.DataFrame({
        "channel": channels,
        "removal_effect": sql_round(re, round_to) + 0.0,
        "attribution": sql_round(share, round_to) + 0.0})


def hard_negatives_embeddings(emb: pd.DataFrame, n_anchors: int = 32,
                              k: int = 1, round_to: int = 6
                              ) -> pd.DataFrame:
    """Independent hard-negative twin: full cosine matrix, same-label
    and self candidates masked, global (rounded desc, vec_id asc)
    ranking."""
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    mat = mat / n
    ids = emb["vec_id"].to_numpy(np.int64)
    lab = emb["label"].to_numpy(np.int64)
    a = np.flatnonzero(ids < n_anchors)
    a = a[np.argsort(ids[a], kind="mergesort")]
    sims = mat[a] @ mat.T
    sims[lab[a][:, None] == lab[None, :]] = -np.inf
    sims[ids[a][:, None] == ids[None, :]] = -np.inf
    outs = []
    for i, ai in enumerate(a):
        ok = np.isfinite(sims[i])
        s = np.round(sims[i][ok], round_to)
        cid = ids[ok]
        order = np.lexsort((cid, -s))[:k]
        outs.append(pd.DataFrame({"anchor_id": ids[ai],
                                  "negative_id": cid[order],
                                  "score": s[order]}))
    return pd.concat(outs, ignore_index=True).astype(
        {"anchor_id": np.int64, "negative_id": np.int64,
         "score": np.float64})


def lpa_communities_crawl(crawl: pd.DataFrame,
                          iterations: int = 4) -> pd.DataFrame:
    """Independent synchronous weighted label-propagation twin over
    the re-synthesized domain graph (same edge derivation as
    :func:`kcore_domains_crawl`, self-loops kept, weights counted):
    integer votes and a total (weight desc, label asc) tie-order make
    the fixed-iteration result exactly reproducible."""
    from collections import defaultdict

    w: dict = defaultdict(int)
    for url, h in zip(crawl["url"], crawl["html"]):
        s = (h or b"").decode("utf-8", "replace")
        n = len(s)
        src = str(url).split("/")[2]
        for j in range(n % 4):
            dst = f"site-{(n + j) % 40}.example.com"
            w[(src, dst)] += 1
            w[(dst, src)] += 1
    nodes = sorted({a for a, _ in w} | {b for _, b in w})
    labels = {v: v for v in nodes}
    for _ in range(iterations):
        votes: dict = defaultdict(int)
        for (a, b), wt in w.items():
            votes[(b, labels[a])] += wt
        new = {}
        for v in nodes:
            cand = sorted(((lab, wt) for (node, lab), wt
                           in votes.items() if node == v),
                          key=lambda x: (-x[1], x[0]))
            new[v] = cand[0][0] if cand else labels[v]
        labels = new
    return pd.DataFrame({"node": nodes,
                         "community": [labels[v] for v in nodes]})


def bloom_prune_crawl(obs: pd.DataFrame, n_buckets: int = 64,
                      m_bits: int = 4096, k: int = 4) -> pd.DataFrame:
    """Independent Bloom-sidecar twin: sha1-prefix double hashing and
    the pandas SipHash bucket mapping re-derived flat — set every
    probe bit per distinct url into its bucket's bit array, then test
    the six probes."""
    import hashlib

    probes = [f"https://site-{u % 40}.example.com/u/{u}"
              for u in range(5)] + ["https://site-9.example.com/u/99999"]

    def h64(vals):
        return np.array([int.from_bytes(
            hashlib.sha1(str(v).encode()).digest()[:8], "big")
            for v in vals], dtype=np.uint64)

    def positions(h):
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
        i = np.arange(k, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(m_bits)).astype(np.int64)

    urls = np.unique(obs["url"].to_numpy(object))
    buckets = (pd.util.hash_array(urls, categorize=False)
               % np.uint64(n_buckets)).astype(np.int64)
    pos = positions(h64(urls))
    bits = np.zeros((n_buckets, m_bits), dtype=bool)
    for b in range(n_buckets):
        p = pos[buckets == b].ravel()
        bits[b, p] = True

    pu = np.asarray(probes, dtype=object)
    true_b = (pd.util.hash_array(pu, categorize=False)
              % np.uint64(n_buckets)).astype(np.int64)
    ppos = positions(h64(pu))
    n_cand = np.array([int(bits[:, ppos[i]].all(axis=1).sum())
                       for i in range(len(pu))], dtype=np.int64)
    hit = np.array([int(bits[true_b[i], ppos[i]].all())
                    for i in range(len(pu))], dtype=np.int64)
    return pd.DataFrame({"url": pu, "true_bucket": true_b,
                         "n_candidates": n_cand, "hit": hit})


def huber_fit_crawl(obs: pd.DataFrame, delta: float = 50.0,
                    n_iters: int = 3, num_partitions: int = 64,
                    round_to: int = 6) -> pd.DataFrame:
    """Independent flat Huber IRLS twin on the shared
    fixed-partition contract: same pid hash, per-pid partials via the
    shared leaf kernel, ascending-pid merge."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.robust import huber_wls_partials

    x = obs["word_count"].to_numpy(np.int64)
    y = obs["text_len"].to_numpy(np.int64)
    n = float(len(x))
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    den = n * sxx - sx * sx
    b = (n * sxy - sx * sy) / den
    a = (sy - b * sx) / n

    df = obs.copy()
    df["_pid"] = (pd.util.hash_array(
        df["url"].to_numpy(object), categorize=False)
        % np.uint64(num_partitions)).astype(np.int64)
    outliers = 0.0
    for _ in range(n_iters):
        parts = [huber_wls_partials(sub, a, b, delta, "word_count",
                                    "text_len", ["url", "warc_ts"])
                 for _, sub in df.groupby("_pid", sort=True)]
        m = np.stack(parts)
        sw, swx, swy, swxx, swxy, outliers = (
            float(np.sum(m[:, j])) for j in range(6))
        den = sw * swxx - swx * swx
        b = (sw * swxy - swx * swy) / den
        a = (swy - b * swx) / sw
    return pd.DataFrame({
        "param": ["intercept", "slope", "n_outliers"],
        "value": [float(sql_round(np.float64(a), round_to)) + 0.0,
                  float(sql_round(np.float64(b), round_to)) + 0.0,
                  outliers]})


def iforest_outliers_embeddings(emb: pd.DataFrame, n_trees: int = 8,
                                seed: int = 7, k: int = 20,
                                round_to: int = 6) -> pd.DataFrame:
    """Independent flat isolation-forest twin on the shared
    deterministic contract: same subsample-by-hash selection, same
    per-node splitmix randomness (leaf kernels imported), scoring run
    over the whole corpus in one pass."""
    from sits_classification_ray.stages.iforest import (
        PSI, _c, build_tree_arrays, path_lengths, sample_hash)

    ids = emb["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    h = sample_hash(ids, seed)
    order = np.argsort(h, kind="mergesort")[:n_trees * PSI]
    Xs = X[order]
    trees = [build_tree_arrays(Xs[t * PSI:(t + 1) * PSI], t)
             for t in range(n_trees)]
    acc = np.zeros(len(X))
    for t in trees:
        acc += path_lengths(t, X)
    score = np.round(np.exp2(-(acc / n_trees) / _c(float(PSI))),
                     round_to)
    keep = np.lexsort((ids, -score))[:k]
    return pd.DataFrame({"vec_id": ids[keep], "score": score[keep]}) \
        .astype({"vec_id": np.int64, "score": np.float64})


def jl_distortion_embeddings(emb: pd.DataFrame, k: int = 8,
                             seed: int = 11) -> pd.DataFrame:
    """Independent flat JL-distortion twin: same splitmix Achlioptas
    matrix, pairs (2m, 2m+1), identical vectorized float shapes."""
    from sits_classification_ray.stages.als import _splitmix64

    d_in = 64
    idx = np.arange(k * d_in, dtype=np.uint64) \
        + np.uint64((seed * 0xD1B54A32D192ED03) % (1 << 64))
    u = (_splitmix64(idx) >> np.uint64(11)).astype(np.float64) \
        * 2.0 ** -53
    R = np.where(u < 1 / 6, 1.0,
                 np.where(u > 5 / 6, -1.0, 0.0)).reshape(k, d_in)

    df = emb.sort_values("vec_id", kind="mergesort",
                         ignore_index=True)
    vid = df["vec_id"].to_numpy(np.int64)
    pid = vid // 2
    sizes = pd.Series(pid).groupby(pid).transform("size").to_numpy()
    df = df[sizes == 2]
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in df["embedding"]])
    diff = X[0::2] - X[1::2]
    den = (diff * diff).sum(axis=1)
    proj = diff @ R.T
    num = (proj * proj).sum(axis=1) * (3.0 / k)
    ok = den > 0
    ratio = num[ok] / den[ok]
    bucket = np.clip((ratio * 10.0).astype(np.int64), 0, 29)
    g = pd.Series(bucket).value_counts().sort_index()
    return pd.DataFrame({"bucket": g.index.to_numpy(np.int64),
                         "n_pairs": g.to_numpy(np.int64)})


def lsa_top_terms_documents(docs: pd.DataFrame, n_iters: int = 4,
                            k: int = 20, num_partitions: int = 32,
                            round_to: int = 6) -> pd.DataFrame:
    """Independent flat LSA power-iteration twin on the shared
    determinism contract: same tf table, same sha1 init, per-doc /
    per-token reductions over identically sorted segments via the
    shared segment_sums leaf kernel, norm under the fixed-partition
    ascending-pid merge."""
    from collections import Counter

    from sits_classification_ray.stages.lsa import (segment_sums,
                                                    token_init)

    cnt: Counter = Counter()
    for did, text in zip(docs["doc_id"], docs["text"]):
        for t in str(text).lower().split(" "):
            cnt[(int(did), t)] += 1
    tfd = pd.DataFrame(
        {"doc": [a for a, _ in cnt], "token": [b for _, b in cnt],
         "tf": np.array(list(cnt.values()), dtype=np.int64)})

    toks = np.unique(tfd["token"].to_numpy(object))
    v = token_init(toks)

    by_dt = tfd.sort_values(["doc", "token"], kind="mergesort",
                            ignore_index=True)
    by_td = tfd.sort_values(["token", "doc"], kind="mergesort",
                            ignore_index=True)
    for _ in range(n_iters):
        pos = np.searchsorted(toks, by_dt["token"].to_numpy(object))
        docs_k, y = segment_sums(
            by_dt["doc"].to_numpy(np.int64),
            by_dt["tf"].to_numpy(np.float64) * v[pos])
        ypos = np.searchsorted(docs_k, by_td["doc"].to_numpy(np.int64))
        toks_k, w = segment_sums(
            by_td["token"].to_numpy(object),
            by_td["tf"].to_numpy(np.float64) * y[ypos])
        # toks_k == toks (every token appears each round)
        pid = (pd.util.hash_array(toks_k, categorize=False)
               % np.uint64(num_partitions)).astype(np.int64)
        order = np.argsort(pid, kind="mergesort")
        pk, ss = segment_sums(pid[order], (w ** 2)[order])
        norm = float(np.sqrt(np.sum(ss)))
        v = w / norm
    loading = np.round(v, round_to) + 0.0
    absl = np.round(np.abs(v), round_to)
    order = np.lexsort((toks, -absl))[:k]
    return pd.DataFrame({"token": toks[order],
                         "loading": loading[order]})


def mi_feature_rank_embeddings(emb: pd.DataFrame, n_bins: int = 8,
                               round_to: int = 6) -> pd.DataFrame:
    """Independent flat MI twin: same global per-dim min/max bins,
    exact integer (dim, bin, label) counts, per-dim terms summed in
    (bin, label) sorted order."""
    from sits_classification_ray.functions.transforms import sql_round

    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    lab = emb["label"].to_numpy(np.int64)
    lo, hi = X.min(axis=0), X.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    b = np.clip(((X - lo) / span * n_bins).astype(np.int64),
                0, n_bins - 1)
    n_rows, d = X.shape
    flat = pd.DataFrame({
        "dim": np.tile(np.arange(d, dtype=np.int64), n_rows),
        "bin": b.ravel(), "label": np.repeat(lab, d)})
    g = (flat.groupby(["dim", "bin", "label"], sort=False)
         .size().rename("n").reset_index())
    dims, vals = [], []
    for dim, sub in g.groupby("dim", sort=True):
        sub = sub.sort_values(["bin", "label"], kind="mergesort")
        n = sub["n"].to_numpy(np.int64)
        N = int(n.sum())
        nb = sub.groupby("bin")["n"].transform("sum") \
            .to_numpy(np.int64)
        nl = sub.groupby("label")["n"].transform("sum") \
            .to_numpy(np.int64)
        terms = (n.astype(np.float64) / float(N)) * np.log(
            (n.astype(np.float64) * float(N))
            / (nb.astype(np.float64) * nl.astype(np.float64)))
        dims.append(int(dim))
        vals.append(float(terms.sum()))
    return pd.DataFrame({"dim": np.array(dims, dtype=np.int64),
                         "mi": sql_round(np.array(vals), round_to)
                         + 0.0})


def rake_keywords_documents(docs: pd.DataFrame, k: int = 20,
                            round_to: int = 6) -> pd.DataFrame:
    """Independent flat RAKE twin: same stopword set, same integer
    degree/frequency stats, per-phrase sums via the shared
    segment_sums kernel over (phrase, pos)-sorted rows."""
    from sits_classification_ray.stages.lsa import segment_sums
    from sits_classification_ray.stages.textstats import (
        QUALITY_STOPWORDS)

    stop = set(QUALITY_STOPWORDS)

    def phrases_of(text):
        out, cur = [], []
        for t in str(text).lower().split(" "):
            if t == "" or t in stop:
                if cur:
                    out.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            out.append(cur)
        return out

    deg: dict = {}
    freq: dict = {}
    distinct = set()
    for text in docs["text"]:
        for ph in phrases_of(text):
            p = " ".join(ph)
            for i, w in enumerate(ph):
                deg[w] = deg.get(w, 0) + len(ph)
                freq[w] = freq.get(w, 0) + 1
                distinct.add((p, i, w))
    rows = sorted(distinct)
    phr = np.array([r[0] for r in rows], dtype=object)
    wsc = np.array([float(deg[r[2]]) / float(freq[r[2]])
                    for r in rows])
    uk, s = segment_sums(phr, wsc)
    score = np.round(s, round_to) + 0.0
    order = np.lexsort((uk, -score))[:k]
    return pd.DataFrame({"phrase": uk[order], "score": score[order]})


def haar_energy_crawl(obs: pd.DataFrame, T: int = 32) -> pd.DataFrame:
    """Independent flat Haar twin: same 32-day zero-padded window
    from each url's first crawl day, same exact dyadic transform."""
    day_us = 86_400_000_000
    us = obs["warc_ts"].to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    df = pd.DataFrame({"url": obs["url"], "day": us // day_us,
                       "x": obs["text_len"].astype(np.int64)})
    daily = (df.groupby(["url", "day"], as_index=False)["x"].sum()
             .sort_values(["url", "day"], kind="mergesort"))
    urls, lvls, ens = [], [], []
    for u, sub in daily.groupby("url", sort=True):
        d = sub["day"].to_numpy(np.int64)
        x = sub["x"].to_numpy(np.float64)
        series = np.zeros(T)
        off = d - d[0]
        m = off < T
        series[off[m]] = x[m]
        cur = series
        for lvl in range(1, 6):
            detail = (cur[0::2] - cur[1::2]) / 2.0
            cur = (cur[0::2] + cur[1::2]) / 2.0
            urls.append(u)
            lvls.append(lvl)
            ens.append(float((detail * detail).sum()))
    return pd.DataFrame({"url": np.array(urls, dtype=object),
                         "level": np.array(lvls, dtype=np.int64),
                         "energy": np.array(ens, dtype=np.float64)})
