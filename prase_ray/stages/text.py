"""Text-analysis operators over a documents table (training-data
pipeline components): token counting, quality scoring, language ID,
fingerprinting.  All vectorized map_batches stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from prase_ray.functions.hashing import rolling_fingerprint, splitmix64

# Tiny per-language marker profiles for the n-gram/stopword heuristic
# language ID (no external models in this environment).
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "une", "que"},
    "es": {"el", "la", "los", "y", "es", "no", "por", "una", "que", "de"},
    "zh": set(),  # CJK detected by codepoint range instead
}

_STOPWORDS = _LANG_MARKERS["en"]


# GPT-2-style pretokenizer, restricted to constructs RE2 also supports
# (no lookarounds, ASCII classes) so the DuckDB oracle can count the
# SAME segmentation: contraction suffixes, space-prefixed letter/digit
# runs, space-prefixed symbol runs, whitespace runs.
_BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc token/char statistics.  Token = single-space split
    segment (including empties), matching DuckDB
    ``len(string_split(text, ' '))`` for oracle parity; n_bpe_tokens =
    GPT-2-ish pretokenizer segment count (one compiled-regex pass)."""
    text = batch["text"]
    n_chars = text.str.len().astype(np.int64)
    n_tokens = (text.str.count(" ", flags=0) + 1).astype(np.int64)
    n_ws_tokens = text.str.split().str.len().fillna(0).astype(np.int64)
    n_bpe = text.str.count(_BPE_RE).astype(np.int64)
    digits = text.str.count(r"[0-9]").astype(np.int64)
    punct = text.str.count(r"[.,;:!?]").astype(np.int64)
    denom = n_chars.replace(0, 1)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars_text": n_chars,
            "n_tokens": n_tokens,
            "n_ws_tokens": n_ws_tokens,
            "n_bpe_tokens": n_bpe,
            "digit_ratio": digits / denom,
            "punct_ratio": punct / denom,
        }
    )


def token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(token_stats_batch, batch_format="pandas")


# Token-exact membership count as ONE compiled regex pass: a "token" is
# a maximal \S+ run, so word W counts iff delimited by whitespace or the
# string boundary on both sides — no per-row Python loop (this stage
# runs per document and must stay vectorized at corpus scale).
def _token_count_pattern(words) -> str:
    alt = "|".join(sorted(words))
    return rf"(?:(?<=\s)|^)(?:{alt})(?=\s|$)"


_STOPWORD_RE = _token_count_pattern(_STOPWORDS)


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    low symbol noise (the usual web-text quality fingerprints).
    Fully vectorized: compiled-alternation str.count, no Python loop."""
    text = batch["text"]
    n = text.str.count(r"\S+").astype(np.int64)
    stop = text.str.lower().str.count(_STOPWORD_RE).astype(np.int64)
    stop_ratio = stop / n.replace(0, 1)
    n_chars = text.str.len().astype(np.int64)
    sym = text.str.count(r"[^A-Za-z0-9\s]").astype(np.int64)
    sym_ratio = sym / n_chars.replace(0, 1)
    len_score = np.clip(n / 50.0, 0, 1) * np.clip((5000 - n) / 5000.0, 0, 1)
    score = 0.4 * len_score + 0.3 * np.clip(stop_ratio * 4, 0, 1) + 0.3 * (
        1 - np.clip(sym_ratio * 5, 0, 1)
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "stopword_ratio": stop_ratio,
            "symbol_ratio": sym_ratio,
            "quality": score,
        }
    )


def quality_score(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(quality_score_batch, batch_format="pandas")


class LangIdModel:
    """Actor-pool language-ID stage: per-language token-count regexes
    compiled once per actor in __init__ (the pattern a real
    fasttext-style model would use), scored per batch with ONE
    vectorized str.count pass per language — no per-row Python."""

    # tokens (maximal \S+ runs) containing a CJK codepoint
    _CJK_RE = r"(?:(?<=\s)|^)\S*[一-鿿]\S*(?=\s|$)"

    def __init__(self):
        import re

        # alphabetical language order fixes the argmax tie-break
        # (ties → alphabetically-first language)
        self.langs = sorted(l for l, w in _LANG_MARKERS.items() if w)
        self.patterns = {
            l: re.compile(_token_count_pattern(_LANG_MARKERS[l]))
            for l in self.langs
        }
        self.cjk_re = re.compile(self._CJK_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        low = text.str.lower()
        n = text.str.count(r"\S+").to_numpy(np.int64)
        denom = np.maximum(n, 1)
        cjk_ratio = low.str.count(self.cjk_re).to_numpy(np.int64) / denom
        scores = np.stack(
            [low.str.count(self.patterns[l]).to_numpy(np.int64) for l in self.langs],
            axis=1,
        ) / denom[:, None]
        best = np.argmax(scores, axis=1)  # first max → alphabetical tie-break
        best_score = scores[np.arange(len(n)), best]
        lang = np.array(self.langs, dtype=object)[best]
        conf = best_score
        und = (n == 0) | ((best_score <= 0.0) & (cjk_ratio <= 0.2))
        is_zh = (cjk_ratio > 0.2) & (n > 0)
        lang = np.where(is_zh, "zh", np.where(und, "und", lang))
        conf = np.where(is_zh, cjk_ratio, np.where(und, 0.0, conf))
        out = batch[["doc_id"]].copy()
        out["lang_pred"] = lang
        out["lang_conf"] = conf
        return out


def lang_id(docs: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    return docs.map_batches(
        LangIdModel, batch_format="pandas", concurrency=concurrency
    )


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    fp = rolling_fingerprint(batch["text"])
    return pd.DataFrame(
        {"doc_id": batch["doc_id"], "fingerprint": fp.astype(np.uint64)}
    )


def fingerprint(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(fingerprint_batch, batch_format="pandas")


# PII patterns, restricted to RE2 constructs shared by pyarrow and
# DuckDB so the oracle applies the IDENTICAL automaton: emails, then
# international-format phone runs (emails first — local parts may
# contain digits the phone pattern would otherwise eat).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"


def pii_scrub_batch(t) -> "pa.Table":
    """Redact emails → <EMAIL> and phone runs → <PHONE>, with per-doc
    redaction counts.  Arrow-native RE2 kernels (count + replace), one
    pass per pattern, zero Python per row."""
    import pyarrow as pa
    import pyarrow.compute as pc

    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n_email = pc.count_substring_regex(txt, PII_EMAIL_RE).cast(pa.int64())
    clean = pc.replace_substring_regex(txt, PII_EMAIL_RE, "<EMAIL>")
    n_phone = pc.count_substring_regex(clean, PII_PHONE_RE).cast(pa.int64())
    clean = pc.replace_substring_regex(clean, PII_PHONE_RE, "<PHONE>")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "clean_text": clean,
            "n_emails": n_email,
            "n_phones": n_phone,
        }
    )


def pii_scrub(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(pii_scrub_batch, batch_format="pyarrow")


# whitespace/control normalization (the CCNet-style cleanup pass):
# every run of whitespace or C0/DEL control bytes collapses to one
# space, then boundary spaces drop.  RE2-only constructs so pyarrow
# and DuckDB run the IDENTICAL automaton (\s in RE2 = [\t\n\f\r ]).
WS_NORM_RE = r"[\s\x00-\x1f\x7f]+"
WS_TRIM_RE = r"^ | $"


def normalize_ws_batch(t) -> "pa.Table":
    """(doc_id, clean_text, n_chars_clean): whitespace-normalized text.
    Two Arrow RE2 kernels, zero Python per row, no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    clean = pc.replace_substring_regex(txt, WS_NORM_RE, " ")
    clean = pc.replace_substring_regex(clean, WS_TRIM_RE, "")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "clean_text": clean,
            "n_chars_clean": pc.utf8_length(clean).cast(pa.int64()),
        }
    )


def normalize_ws(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(normalize_ws_batch, batch_format="pyarrow")


def repetition_stats_batch(b: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition fingerprints per doc: token count,
    distinct-token count, and the most frequent token's count (integer
    outputs so the oracle compare is exact; dup_ratio = 1 - distinct/n
    and top_frac = top/n are derived).  Tokens = ASCII \\S+ runs via
    re.ASCII — DuckDB's RE2 \\S is ASCII-only, while pandas str.split
    (and Python's default \\S) split on Unicode whitespace like U+00A0,
    which would silently break oracle parity on scraped web text."""
    import re

    toks = b["text"].str.findall(r"\S+", flags=re.ASCII)
    n = toks.str.len().fillna(0).astype(np.int64)
    e = b[["doc_id"]].copy()
    e["tok"] = toks
    ex = e.explode("tok").dropna(subset=["tok"])
    if len(ex):
        grp = ex.groupby(["doc_id", "tok"], as_index=False).size()
        agg = grp.groupby("doc_id").agg(
            n_distinct=("tok", "size"), top_cnt=("size", "max")
        )
    else:
        agg = pd.DataFrame(columns=["n_distinct", "top_cnt"])
    out = b[["doc_id"]].copy()
    out["n_tokens"] = n.to_numpy()
    j = out.join(agg, on="doc_id")
    out["n_distinct"] = j["n_distinct"].fillna(0).astype(np.int64).to_numpy()
    out["top_cnt"] = j["top_cnt"].fillna(0).astype(np.int64).to_numpy()
    return out


def repetition_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(repetition_stats_batch, batch_format="pandas")


def tfidf_topk(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Top-k TF-IDF terms per document (score = tf * ln(N/df)), the
    classic corpus-weighted keyword extractor.

    Shape: TWO shuffles, NO join.  (1) doc-term counts hash-partition by
    term, so each partition holds every row of its terms and computes df
    locally (a (doc, term) pair occurs once globally — each doc lives in
    one input block — so df = row count per term); scored rows are
    pre-truncated to the per-(partition, doc) top-k, bounding the second
    exchange at k x docs x partitions.  (2) regroup by doc for the final
    top-k.  N is a broadcast scalar.  Tokenization matches the
    token_stats whitespace split (SQL-reproducible)."""
    n_docs = docs.count()

    def doc_terms(b: pd.DataFrame) -> pd.DataFrame:
        import re

        s = b[[id_col, text_col]].copy()
        # ASCII \S+ (re.ASCII): DuckDB's RE2 split is ASCII-only, while
        # pandas str.split would also break on Unicode whitespace
        s["term"] = s[text_col].str.findall(r"\S+", flags=re.ASCII)
        e = s[[id_col, "term"]].explode("term").dropna(subset=["term"])
        if e.empty:
            return pd.DataFrame(
                {"part": pd.Series([], dtype=np.int32),
                 id_col: pd.Series([], dtype=np.int64),
                 "term": pd.Series([], dtype=object),
                 "tf": pd.Series([], dtype=np.int64)}
            )
        tf = e.groupby([id_col, "term"], as_index=False).size().rename(
            columns={"size": "tf"}
        )
        part = (
            pd.util.hash_array(tf["term"].to_numpy(dtype=object))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        tf.insert(0, "part", part)
        return tf

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("term", as_index=False).size().rename(
            columns={"size": "df"}
        )
        g = g.drop(columns=["part"]).merge(df, on="term")
        g["score"] = g["tf"].to_numpy(np.float64) * np.log(
            float(n_docs) / g["df"].to_numpy(np.float64)
        )
        # per-(partition, doc) pre-truncation: the global top-k per doc
        # is a subset of the union of per-partition top-ks
        g = g.sort_values(
            ["score", "term"], ascending=[False, True], kind="stable"
        )
        return g.groupby(id_col, as_index=False).head(k)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(
            ["score", "term"], ascending=[False, True], kind="stable"
        ).head(k).reset_index(drop=True)
        s["rank"] = np.arange(1, len(s) + 1, dtype=np.int64)
        return s

    # stays a Dataset: output is O(k x docs) rows — consumers write or
    # aggregate it; only tests/oracle queries pull it local
    return (
        docs.map_batches(doc_terms, batch_format="pandas")
        .groupby("part")
        .map_groups(score_part, batch_format="pandas")
        .groupby(id_col)
        .map_groups(final_topk, batch_format="pandas")
        .select_columns([id_col, "rank", "term", "tf", "df", "score"])
    )


# --------------------------------------------------------------------------
# document chunking (fixed-token windows with overlap)
# --------------------------------------------------------------------------

def chunk_documents_batch(
    batch: pd.DataFrame, chunk_tokens: int, overlap: int
) -> pd.DataFrame:
    """Split each doc into chunk_tokens-token windows advancing by
    (chunk_tokens - overlap): chunk c covers tokens
    [c*stride, min(c*stride + chunk_tokens, n)) under single-space
    tokenization (DuckDB ``string_split(text, ' ')`` parity, empties
    included).  Token boundaries are found as 0x20 bytes in the UTF-8
    blob of the whole batch (a space byte can never occur inside a
    multi-byte sequence), so the per-doc work is numpy; the only
    per-chunk step is a C-level bytes slice + decode."""
    stride = chunk_tokens - overlap
    assert stride > 0, "overlap must be smaller than chunk_tokens"
    enc = [t.encode("utf-8") for t in batch["text"].tolist()]
    blen = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    bounds = np.zeros(len(enc) + 1, np.int64)
    np.cumsum(blen, out=bounds[1:])
    blob = b"".join(enc)
    arr = np.frombuffer(blob, np.uint8)
    space_pos = np.flatnonzero(arr == 0x20).astype(np.int64)
    sp_off = np.searchsorted(space_pos, bounds)      # spaces before each doc
    n_tok = np.diff(sp_off) + 1                      # tokens per doc
    n_chunks = np.where(
        n_tok <= chunk_tokens,
        1,
        (n_tok - chunk_tokens + stride - 1) // stride + 1,
    ).astype(np.int64)

    rep = np.repeat(np.arange(len(enc), dtype=np.int64), n_chunks)
    coff = np.zeros(len(enc) + 1, np.int64)
    np.cumsum(n_chunks, out=coff[1:])
    cid = np.arange(int(n_chunks.sum()), dtype=np.int64) - coff[rep]
    tok_s = cid * stride
    tok_e = np.minimum(tok_s + chunk_tokens, n_tok[rep])

    # byte range of token span [tok_s, tok_e) within doc rep[j]; clip the
    # space-array indexes because np.where evaluates both branches
    base = sp_off[rep]
    sp_safe = space_pos if len(space_pos) else np.zeros(1, np.int64)
    hi = len(sp_safe) - 1
    byte_s = np.where(
        tok_s == 0,
        bounds[rep],
        sp_safe[np.clip(base + tok_s - 1, 0, hi)] + 1,
    )
    byte_e = np.where(
        tok_e == n_tok[rep],
        bounds[rep + 1],
        sp_safe[np.clip(base + tok_e - 1, 0, hi)],
    )
    texts = [blob[s:e].decode("utf-8") for s, e in zip(byte_s, byte_e)]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(np.int64)[rep],
            "chunk_id": cid,
            "chunk_text": texts,
            "n_chunk_tokens": (tok_e - tok_s).astype(np.int64),
        }
    )


def chunk_documents(
    docs: ray.data.Dataset, chunk_tokens: int = 128, overlap: int = 16
) -> ray.data.Dataset:
    """Embarrassingly parallel (no shuffle): each batch expands to its
    chunks independently; downstream block sizes grow by roughly
    n_tokens/stride, so feed smaller ``batch_size`` for long docs."""
    import functools

    return docs.map_batches(
        functools.partial(
            chunk_documents_batch, chunk_tokens=chunk_tokens, overlap=overlap
        ),
        batch_format="pandas",
    )


def build_vocab(
    docs: ray.data.Dataset,
    *,
    min_count: int = 2,
    text_col: str = "text",
    num_partitions: int = 32,
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Frequency-ordered dense vocabulary over whitespace tokens:
    (token, cnt, token_id) with token_id = 0-based rank by (cnt DESC,
    token ASC) — the tokenizer-training / embedding-table primitive.
    Same dense-intern semantics as the KG node interner
    (kg_build.py intern; reference objects/KG.py:95-143 assigns dense
    ids on first sight — here the order is global frequency instead).

    Shape: per-batch exact token-count partials (the exchange carries
    distinct-tokens-per-batch rows, never token instances) → one
    part-hash combine → min_count filter → global rank over the
    vocab-sized relation via the ordered-prefix-sum primitive (key =
    -cnt so ascending rank == descending count; UTF-8 byte order ==
    codepoint order, so the pandas string tiebreak matches SQL binary
    collation).  Count skew makes the rank's range bins uneven (zipf),
    which affects balance only — order, and therefore ids, are exact."""
    import re

    from prase_ray.stages.packing import ordered_rank

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        e = (
            b[text_col]
            .str.findall(r"\S+", flags=re.ASCII)
            .explode()
            .dropna()
        )
        if e.empty:
            return pd.DataFrame(
                {
                    "part": pd.Series([], dtype=np.int32),
                    "token": pd.Series([], dtype=object),
                    "cnt": pd.Series([], dtype=np.int64),
                }
            )
        vc = e.groupby(e).size()
        out = pd.DataFrame(
            {"token": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)}
        )
        part = (
            pd.util.hash_array(out["token"].to_numpy(dtype=object))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        out.insert(0, "part", part)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["cnt"].sum()
        s = s[s["cnt"] >= min_count].copy()
        s["negcnt"] = -s["cnt"].to_numpy(np.int64)
        return s

    counts = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )
    ranked = ordered_rank(
        counts, "negcnt", tiebreak_col="token", num_parts=num_parts
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "token": b["token"].to_numpy(object),
                "cnt": b["cnt"].to_numpy(np.int64),
                "token_id": b["pos"].to_numpy(np.int64),
            }
        )

    return ranked.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# unigram LM surprise score (corpus-level quality signal)
# --------------------------------------------------------------------------

UNIGRAM_SCALE = 10**12


def unigram_surprise(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-document unigram-LM surprisal: documents dominated by rare
    tokens score high, boilerplate built from the corpus's most common
    tokens scores low — the classic model-free quality/novelty signal
    a pretraining curation pipeline thresholds on.

    Per doc: ``n_tokens`` = token count and
    ``surprise_fp = Σ_tokens (UNIGRAM_SCALE // corpus_count(token))``
    — a fixed-point INTEGER surprisal proxy (1/p up to the constant
    total-token factor, which cancels in any ranking/threshold use).
    Deliberately integer: int64 sums are associative, so the score is
    bit-identical regardless of partitioning AND restates exactly in
    SQL (``//`` both sides), unlike a float Σ -log p whose summation
    order differs per plan.  A deployment wanting true log-probs maps
    cnt → -log2(cnt/total) in the same vectorized kernel; the dataflow
    below is unchanged.

    Shape (the tfidf_topk shape, ONE term-hash exchange + one slim
    regroup, NO join): (1) per-batch (doc, term, tf) counts
    hash-partition by term — every row of a term lands in its
    partition, so the partition's Σtf IS the global corpus count; each
    partition pre-aggregates to ONE (doc, partial_tokens,
    partial_surprise) row per doc it saw, (2) regroup by doc sums the
    ≤ num_partitions integer partials.  The second exchange is bounded
    by docs × num_partitions slim rows; raw tokens never shuffle twice.
    """

    def doc_terms(b: pd.DataFrame) -> pd.DataFrame:
        import re

        s = b[[id_col, text_col]].copy()
        # ASCII \S+ to match DuckDB's RE2 split (see tfidf_topk)
        s["term"] = s[text_col].str.findall(r"\S+", flags=re.ASCII)
        e = s[[id_col, "term"]].explode("term").dropna(subset=["term"])
        if e.empty:
            return pd.DataFrame(
                {"part": pd.Series([], dtype=np.int32),
                 id_col: pd.Series([], dtype=np.int64),
                 "term": pd.Series([], dtype=object),
                 "tf": pd.Series([], dtype=np.int64)}
            )
        tf = e.groupby([id_col, "term"], as_index=False).size().rename(
            columns={"size": "tf"}
        )
        part = (
            pd.util.hash_array(tf["term"].to_numpy(dtype=object))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        tf.insert(0, "part", part)
        return tf

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        cnt = (
            g.groupby("term", as_index=False)["tf"].sum()
            .rename(columns={"tf": "cnt"})
        )
        g = g.merge(cnt, on="term")
        tf = g["tf"].to_numpy(np.int64)
        per = UNIGRAM_SCALE // g["cnt"].to_numpy(np.int64)
        g["surprise_fp"] = tf * per
        out = g.groupby(id_col, as_index=False).agg(
            n_tokens=("tf", "sum"), surprise_fp=("surprise_fp", "sum")
        )
        out["n_tokens"] = out["n_tokens"].astype(np.int64)
        out["surprise_fp"] = out["surprise_fp"].astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(id_col, as_index=False).agg(
            n_tokens=("n_tokens", "sum"), surprise_fp=("surprise_fp", "sum")
        )

    return (
        docs.map_batches(doc_terms, batch_format="pandas")
        .groupby("part")
        .map_groups(score_part, batch_format="pandas")
        .groupby(id_col)
        .map_groups(combine, batch_format="pandas")
    )


# script profiling: RE2 unicode script classes, shared verbatim with
# the DuckDB oracle (both engines are RE2, so the per-script char
# counts are byte-identical).  Alphabetical order IS the tiebreak
# order for the dominant script (numpy argmax picks the first max).
SCRIPT_CLASSES = (
    ("arabic", r"\p{Arabic}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("greek", r"\p{Greek}"),
    ("han", r"\p{Han}"),
    ("latin", r"\p{Latin}"),
)


def script_profile_batch(t) -> "pa.Table":
    """(doc_id, n_<script>... , main_script): per-doc char counts for
    the five major scripts + the dominant one (ties to the
    alphabetically-first script; all-zero rows → 'none').  One Arrow
    RE2 count kernel per script, zero Python per row, no shuffle —
    the language/script routing gate of a multilingual pipeline."""
    import pyarrow as pa
    import pyarrow.compute as pc

    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    counts = [
        pc.count_substring_regex(txt, pat).cast(pa.int64()).to_numpy()
        for _, pat in SCRIPT_CLASSES
    ]
    M = np.stack(counts, axis=1)
    names = np.array([n for n, _ in SCRIPT_CLASSES], dtype=object)
    main = names[np.argmax(M, axis=1)]
    main = np.where(M.max(axis=1) == 0, "none", main)
    cols = {"doc_id": t["doc_id"]}
    for (name, _), c in zip(SCRIPT_CLASSES, counts):
        cols[f"n_{name}"] = pa.array(c)
    cols["main_script"] = pa.array(main.astype(object))
    return pa.table(cols)


def script_profile(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(script_profile_batch, batch_format="pyarrow")


_VOCAB_CACHE: dict = {}


def encode_tokens(
    docs: ray.data.Dataset,
    vocab: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
    broadcast_max_vocab: int = 5_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Encode the corpus against a ``build_vocab`` vocabulary →
    long-form (doc_id, pos, token_id) with 0-based in-doc positions and
    ``oov_id`` for out-of-vocabulary tokens — the corpus→ids step in
    front of packing/loader stages (consumers reshape a doc's ids
    locally; long form keeps the operator's exchange honest).

    Below ``broadcast_max_vocab`` the vocabulary ships ONCE via
    ray.put (token→id map, worker-cached) and encoding is an
    embarrassingly-parallel pass — zero shuffle.  Above it, token rows
    hash-join the vocab on the token (one exchange of the token-volume
    relation, the unavoidable cost of a vocabulary that fits no
    node)."""
    import re

    # the vocab is consumed twice (gate count + broadcast pull or join);
    # materialize so an unmaterialized build_vocab pipeline runs once
    vocab = vocab.materialize()
    n_vocab = vocab.count()

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # fillna first: findall propagates NaN and len(NaN) raises in
        # the flatten below (null docs must encode to zero rows)
        s = b[text_col].fillna("").str.findall(r"\S+", flags=re.ASCII)
        counts = s.str.len().to_numpy(np.int64)
        ids = np.repeat(b[id_col].to_numpy(np.int64), counts)
        flat = (
            np.concatenate([np.asarray(t, dtype=object) for t in s if len(t)])
            if counts.sum()
            else np.empty(0, dtype=object)
        )
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        return pd.DataFrame({id_col: ids, "pos": pos, "token": flat})

    toks = docs.map_batches(explode, batch_format="pandas")

    if n_vocab <= broadcast_max_vocab:
        vdf = vocab.to_pandas()
        ref = ray.put(
            pd.Series(
                vdf["token_id"].to_numpy(np.int64),
                index=vdf["token"].to_numpy(object),
            )
        )

        def enc(b: pd.DataFrame) -> pd.DataFrame:
            key = ref.hex()
            vmap = _VOCAB_CACHE.get(key)
            if vmap is None:
                _VOCAB_CACHE.clear()
                vmap = _VOCAB_CACHE[key] = ray.get(ref)
            tid = (
                b["token"].map(vmap).fillna(oov_id).to_numpy(np.int64)
            )
            return pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(np.int64),
                    "pos": b["pos"].to_numpy(np.int64),
                    "token_id": tid,
                }
            )

        return toks.map_batches(enc, batch_format="pandas")

    # the vocab comes out of grouped/ranked stages whose empty
    # partitions are zero-column blocks — rebuild from non-empty blocks
    # or Dataset.join rejects the right side (see dedup._drop_empty_blocks)
    import pyarrow as pa

    from prase_ray.stages.dedup import _drop_empty_blocks

    vslim = _drop_empty_blocks(
        vocab.select_columns(["token", "token_id"]),
        pa.schema([("token", pa.string()), ("token_id", pa.int64())]),
    )
    joined = toks.join(
        vslim, join_type="left_outer", num_partitions=num_partitions,
        on=("token",),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "pos": b["pos"].to_numpy(np.int64),
                "token_id": b["token_id"]
                .fillna(oov_id)
                .to_numpy(np.int64),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def bigram_surprise(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Phrase-level sibling of ``unigram_surprise``: per-doc bigram-LM
    surprisal ``surprise_fp = Σ_bigram_instances (UNIGRAM_SCALE //
    corpus_count(bigram))`` plus ``n_bigrams``.  Documents built from
    corpus-common PHRASES (templates, boilerplate, SEO spam) score low
    even when their individual words are unremarkable — the signal
    word-level X45 cannot see.  Same fixed-point-integer contract
    (associative int64 sums → partition-order invariant, `//` restates
    in SQL) and the same one-exchange shape, keyed on the bigram:
    the partition's Σtf IS the corpus bigram count, each partition
    pre-aggregates one slim row per doc, a doc-keyed regroup sums ≤
    num_partitions partials."""

    def doc_bigrams(b: pd.DataFrame) -> pd.DataFrame:
        import re

        s = b[[id_col, text_col]].copy()
        s["tok"] = s[text_col].str.findall(r"\S+", flags=re.ASCII)
        e = s[[id_col, "tok"]].explode("tok").dropna(subset=["tok"])
        empty = pd.DataFrame(
            {
                "part": pd.Series([], dtype=np.int32),
                id_col: pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int64),
            }
        )
        if e.empty:
            return empty
        ids = e[id_col].to_numpy(np.int64)
        tok = e["tok"].reset_index(drop=True)
        # consecutive-token pairs, masked at doc boundaries
        same = ids[1:] == ids[:-1]
        if not same.any():
            return empty
        big = (tok.iloc[:-1].reset_index(drop=True) + " "
               + tok.iloc[1:].reset_index(drop=True))[same]
        tf = pd.DataFrame(
            {id_col: ids[:-1][same], "term": big.to_numpy(object)}
        ).groupby([id_col, "term"], as_index=False).size().rename(
            columns={"size": "tf"}
        )
        tf["tf"] = tf["tf"].astype(np.int64)
        part = (
            pd.util.hash_array(tf["term"].to_numpy(dtype=object))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        tf.insert(0, "part", part)
        return tf

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        cnt = (
            g.groupby("term", as_index=False)["tf"].sum()
            .rename(columns={"tf": "cnt"})
        )
        g = g.merge(cnt, on="term")
        tf = g["tf"].to_numpy(np.int64)
        per = UNIGRAM_SCALE // g["cnt"].to_numpy(np.int64)
        g["surprise_fp"] = tf * per
        out = g.groupby(id_col, as_index=False).agg(
            n_bigrams=("tf", "sum"), surprise_fp=("surprise_fp", "sum")
        )
        out["n_bigrams"] = out["n_bigrams"].astype(np.int64)
        out["surprise_fp"] = out["surprise_fp"].astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(id_col, as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"),
            surprise_fp=("surprise_fp", "sum"),
        )

    return (
        docs.map_batches(doc_bigrams, batch_format="pandas")
        .groupby("part")
        .map_groups(score_part, batch_format="pandas")
        .groupby(id_col)
        .map_groups(combine, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# inverted index build through the resumable partitioned sink
# --------------------------------------------------------------------------

def build_inverted_index(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    num_partitions: int = 32,
    skip_finished: bool = True,
) -> dict:
    """Materialize a term → postings inverted index as term-hash-
    partitioned Parquet (rows ``term, term_hash, doc_id, tf``) through
    the X42 resumable sink: one writer task per partition committing
    via tmp-dir rename, reruns skip finished partitions.  A term's
    postings live entirely inside one partition (hash-partitioned on
    the term), so per-term readers touch exactly one directory.

    Scale shape: per-batch (doc, term, tf) reduction is exact (a doc's
    rows come from one batch), the only exchange is the sink's
    partition shuffle; partition count bounds file count and fan-in."""
    from prase_ray.functions.hashing import hash_bytes_array
    from prase_ray.io.sink import write_partitioned

    def posting_rows(b: pd.DataFrame) -> pd.DataFrame:
        tok_lists = b["text"].str.split()
        counts = tok_lists.str.len().fillna(0).to_numpy(np.int64)
        flat = (
            np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists if len(t)]
            )
            if counts.sum()
            else np.empty(0, dtype=object)
        )
        g = (
            pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        b["doc_id"].to_numpy(np.int64), counts
                    ),
                    "term": flat,
                }
            )
            .groupby(["doc_id", "term"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        g["tf"] = g["tf"].astype(np.int64)
        g["term_hash"] = hash_bytes_array(g["term"], seed=3).view(np.int64)
        return g[["term", "term_hash", "doc_id", "tf"]]

    rows = docs.map_batches(posting_rows, batch_format="pandas")
    return write_partitioned(
        rows, out_dir, "term_hash",
        num_partitions=num_partitions, skip_finished=skip_finished,
    )


def unchunk_documents(
    chunks: ray.data.Dataset,
    *,
    overlap: int = 16,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact inverse of ``chunk_documents`` — the export/detokenization
    stage that reassembles per-chunk model outputs (or the chunks
    themselves) back into whole documents: Dataset(doc_id, chunk_id,
    chunk_text) → Dataset(doc_id, text) with
    ``text == the original document`` byte-for-byte.

    Why the fixed strip width is exact: every chunk except a doc's
    last spans exactly ``chunk_tokens`` tokens (the chunker clips only
    the final window), so each chunk_id ≥ 1 repeats precisely
    ``overlap`` tokens of its predecessor — reassembly keeps chunk 0
    whole and drops the first ``overlap`` tokens of every later chunk.

    Scale shape: ONE part-hash shuffle on doc_id (each doc's chunks
    co-locate), per-partition sort by (doc_id, chunk_id); the overlap
    strip finds each chunk's ``overlap``-th space as 0x20 bytes in the
    partition's single UTF-8 blob (the X39 trick in reverse), and the
    per-doc finish is one C-level ``b' '.join`` over the stripped
    byte slices."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_id", "chunk_id", "chunk_text"]].copy()
        b["part"] = (
            splitmix64(b["doc_id"].to_numpy(np.int64).view(np.uint64))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return b

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "chunk_id"], kind="stable")
        doc = g["doc_id"].to_numpy(np.int64)
        cid = g["chunk_id"].to_numpy(np.int64)
        enc = [t.encode("utf-8") for t in g["chunk_text"].tolist()]
        blen = np.fromiter((len(e) for e in enc), np.int64, len(enc))
        bounds = np.zeros(len(enc) + 1, np.int64)
        np.cumsum(blen, out=bounds[1:])
        blob = b"".join(enc)
        arr = np.frombuffer(blob, np.uint8)
        space_pos = np.flatnonzero(arr == 0x20).astype(np.int64)
        sp_off = np.searchsorted(space_pos, bounds[:-1])
        # start byte of each piece: chunk 0 keeps all; chunk_id>0 drops
        # its first `overlap` tokens → start after the overlap-th space
        sp_safe = space_pos if len(space_pos) else np.zeros(1, np.int64)
        hi = len(sp_safe) - 1
        strip_start = sp_safe[np.clip(sp_off + overlap - 1, 0, hi)] + 1
        starts = np.where(cid == 0, bounds[:-1], strip_start)
        pieces = [blob[s:e] for s, e in zip(starts, bounds[1:])]
        change = np.flatnonzero(np.diff(doc)) + 1
        seg_s = np.concatenate([[0], change])
        seg_e = np.concatenate([change, [len(doc)]])
        return pd.DataFrame(
            {
                "doc_id": doc[seg_s],
                "text": [
                    b" ".join(pieces[s:e]).decode("utf-8")
                    for s, e in zip(seg_s, seg_e)
                ],
            }
        )

    return (
        chunks.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(assemble, batch_format="pandas")
    )
