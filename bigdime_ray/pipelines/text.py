"""Text-analysis stages for large-scale training-data pipelines.

Engine-new operators (not in the reference — required additions for a
100 TB training-data pipeline): language-ID (stopword heuristic),
quality scoring, token counting (whitespace + word/punct regex),
document fingerprinting. All are vectorized Arrow kernels
(``pc.count_substring_regex`` / ``pc.utf8_length`` — no Python loop over
rows); the stateful variant (``TextAnalyzer``) is an actor-pool callable
class whose regex/stopword tables are built once per actor in
``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bigdime_ray.functions.hashing import (hash_string_column, mix64,
                                           u64_to_i64)

# whitespace tokenization — SQL parity:
#   array_length(string_split_regex(trim(text), '\s+'))
WS_TOKEN_RE = r"\S+"
# BPE-ish word/punctuation tokenization
WORD_TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

# tiny per-language stopword marker sets (heuristic lang-id)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def count_tokens(text: pa.ChunkedArray | pa.Array,
                 pattern: str = WS_TOKEN_RE) -> pa.Array:
    """Vectorized token count (number of regex matches per row)."""
    return pc.count_substring_regex(text, pattern)


def add_token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    t = batch[col]
    batch = batch.append_column("n_ws_tokens",
                                pc.cast(count_tokens(t, WS_TOKEN_RE), pa.int64()))
    return batch.append_column("n_word_tokens",
                               pc.cast(count_tokens(t, WORD_TOKEN_RE), pa.int64()))


def add_fingerprint(batch: pa.Table, col: str = "text") -> pa.Table:
    """64-bit content fingerprint of the normalized text (case-folded,
    whitespace-collapsed) — exact-dup key for dedup pipelines."""
    norm = pc.replace_substring_regex(pc.utf8_lower(batch[col]), r"\s+", " ")
    fp = u64_to_i64(hash_string_column(norm))
    return batch.append_column("fingerprint", pa.array(fp))


_RB = np.uint64(1099511628211)  # odd → invertible mod 2^64
_RB_INV = np.uint64(pow(int(_RB), -1, 1 << 64))


def rolling_hashes(text: pa.Array | pa.ChunkedArray, k: int = 16
                   ) -> tuple[np.ndarray, np.ndarray]:
    """All char-``k``-gram polynomial rolling hashes of every row,
    computed in ONE vectorized pass over the column's flat UTF-8 buffer.

    H(i) = Σ_j byte[i+j]·B^(k-1-j)  (mod 2^64), realized through prefix
    sums of byte[j]·B^(−j) so each window hash is a subtraction + two
    multiplies — no per-row or per-window Python. Returns (flat hashes,
    row offsets into them); rows shorter than k contribute one
    whole-row hash."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    bufs = text.buffers()
    str_off = np.frombuffer(bufs[1], dtype=np.int32)[
        text.offset:text.offset + len(text) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    n_rows = len(text)
    total = int(str_off[-1] - str_off[0])
    b = data[str_off[0]:str_off[-1]].astype(np.uint64)
    with np.errstate(over="ignore"):
        inv_pows = np.empty(total + 1, dtype=np.uint64)
        inv_pows[0] = np.uint64(1)
        np.cumprod(np.full(total, _RB_INV, dtype=np.uint64),
                   out=inv_pows[1:])
        pows = np.empty(total + 1, dtype=np.uint64)
        pows[0] = np.uint64(1)
        np.cumprod(np.full(total, _RB, dtype=np.uint64), out=pows[1:])
        prefix = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(b * inv_pows[:total], out=prefix[1:])
        # H(i) = (prefix[i+k] - prefix[i]) · B^i · B^(k-1)
        row_len = str_off[1:] - str_off[:-1]
        counts = np.maximum(row_len - k + 1, 1)
        out_off = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=out_off[1:])
        base = str_off[:-1] - str_off[0]
        pos_in_row = (np.arange(int(out_off[-1]), dtype=np.int64)
                      - np.repeat(out_off[:-1], counts))
        i = np.repeat(base, counts) + pos_in_row
        klen = np.minimum(np.repeat(row_len, counts), k)
        h = ((prefix[i + klen] - prefix[i]) * pows[i]
             * pows[np.maximum(klen - 1, 0)])
        h = mix64(h)
    return h, out_off


def winnow_fingerprints(text: pa.Array | pa.ChunkedArray, k: int = 16,
                        window: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing (Schleimer et al., MOSS): per row, keep the MINIMUM
    rolling hash of every ``window`` consecutive k-gram hashes — a
    position-robust fingerprint set whose overlap detects shared
    substrings ≥ k+window−1 chars. Returns (per-row sorted unique
    fingerprints flat, row offsets). Fully vectorized: ONE global
    sliding-window minimum over the flat hash array with row-boundary
    masking, plus a reduceat row-min fallback for rows with fewer than
    ``window`` hashes; per-row dedupe is one lexsort."""
    from numpy.lib.stride_tricks import sliding_window_view

    h, off = rolling_hashes(text, k)
    n_rows = len(off) - 1
    if len(h) == 0 or n_rows == 0:
        return h, off * 0
    if len(h) >= window:
        sw = sliding_window_view(h, window).min(axis=1)
        i = np.arange(len(sw), dtype=np.int64)
        row = np.searchsorted(off, i, side="right") - 1
        valid = (i + window) <= off[row + 1]
        vrow, vh = row[valid], sw[valid]
    else:
        vrow = np.empty(0, dtype=np.int64)
        vh = np.empty(0, dtype=np.uint64)
    # rows too short for any full window: whole-row minimum (offsets are
    # strictly increasing — every row has ≥1 hash — so reduceat is safe)
    nh = off[1:] - off[:-1]
    small = np.nonzero(nh < window)[0]
    if len(small):
        row_mins = np.minimum.reduceat(h, off[:-1])
        vrow = np.concatenate([vrow, small])
        vh = np.concatenate([vh, row_mins[small]])
    order = np.lexsort((vh, vrow))
    r, v = vrow[order], vh[order]
    first = np.r_[True, (r[1:] != r[:-1]) | (v[1:] != v[:-1])]
    r, v = r[first], v[first]
    out_off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(r, minlength=n_rows), out=out_off[1:])
    return v, out_off


def add_rolling_fingerprints(ds, text_col: str = "text", k: int = 16,
                             window: int = 8):
    """Dataset stage: append per-document winnowing fingerprints
    (``fingerprints`` list<int64>, ``n_fingerprints``) — the
    rolling-hash document fingerprint for copy/overlap detection."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, off = winnow_fingerprints(batch[text_col], k, window)
        arr = pa.ListArray.from_arrays(
            pa.array(off, type=pa.int32()),
            pa.array(flat.view(np.int64)))
        batch = batch.append_column("fingerprints", arr)
        return batch.append_column(
            "n_fingerprints",
            pa.array((off[1:] - off[:-1]).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def document_frequency(ds, text_col: str = "text", min_df: int = 1,
                       lowercase: bool = True):
    """Per-word document frequency over a documents table — the vocab /
    stopword-discovery statistic: df(w) = number of documents containing
    w at least once.

    Each block contributes ONE partial per word: the count of its docs
    containing the word (each doc lives in exactly one block, so the
    per-block partials SUM to the exact global df). Block-local work is
    vectorized Arrow (split → flatten → per-(doc,word) dedupe via one
    lexsort); the final aggregate is a small shuffle over (word, cnt)
    partials. Returns a Dataset (word, df) with df ≥ ``min_df``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if lowercase:
            text = pc.utf8_lower(text)
        words = pc.split_pattern_regex(text, r"\s+")
        n_words = (pc.fill_null(pc.list_value_length(words), 0)
                   .to_numpy(zero_copy_only=False).astype(np.int64))
        flat = pc.list_flatten(words)
        doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64),
                            n_words)
        wh = hash_string_column(flat).view(np.int64)
        # distinct (doc, word) pairs via one lexsort over the block
        order = np.lexsort((wh, doc_idx))
        d, w = doc_idx[order], wh[order]
        first = np.r_[True, (d[1:] != d[:-1]) | (w[1:] != w[:-1])]
        keep_idx = order[first]
        # empty-string tokens from leading/trailing whitespace are noise
        nonempty = (pc.utf8_length(flat)
                    .to_numpy(zero_copy_only=False)[keep_idx] > 0)
        keep_idx = keep_idx[nonempty]
        uniq_words = flat.take(pa.array(keep_idx))
        g = (pa.table({"word": uniq_words})
             .group_by(["word"]).aggregate([([], "count_all")]))
        return g.rename_columns(["word", "cnt"])

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("word").aggregate(Sum("cnt", alias_name="df")))
    if min_df > 1:
        out = out.filter(expr=f"df >= {min_df}")
    return out


def tf_idf(ds, text_col: str = "text", id_col: str = "doc_id",
           min_df: int = 1, score_scale: int = 1_000_000,
           lowercase: bool = True, total_docs: int | None = None):
    """Per-(document, word) TF-IDF scores: ``score = tf · ln(N/df)``
    with the exact same tokenizer as ``document_frequency`` (lowercase,
    ``\\s+`` split, empty tokens dropped) so the two statistics compose.

    Two passes, both scale-shaped:

    1. ``document_frequency`` (block-exact partials, small (word, df)
       shuffle) is COLLECTED to the driver and broadcast once via
       ``ray.put`` as (sorted word-hash array, df array, N) — the
       referential-validator broadcast pattern. The vocabulary is the
       broadcast bound: ~16 B/word, fine to ~10⁸ distinct words;
       ``min_df ≥ 2`` is the scale lever (hapax legomena dominate a
       web-scale vocabulary and carry no reusable signal). Above that,
       replace the broadcast with a (word, df) hash join — documented
       alternative, same verify discipline as ``pipelines/join.py``.
    2. A pure map over the documents: per-block lexsort over
       (doc, word-hash) yields every (doc, word) term frequency as run
       lengths; df lookup is a binary search into the broadcast arrays.
       Word-hash equality stands in for string equality here — a 64-bit
       collision needs ~10⁹ distinct words for even-odds (birthday
       bound), and miscounts df only, never pairs the wrong strings
       (the word column always carries the block's own token).

    ``total_docs`` overrides the ``ds.count()`` used for N — pass it
    when ``ds`` is not read-rooted (a derived dataset would execute its
    plan twice; the _auto_buckets caveat). Output: (doc_id, word, tf,
    df, score_s) with ``score_s = floor(score · score_scale + 0.5)``
    int64 — the repo-wide fixed-point compare discipline (ln is
    transcendental, so a .5-boundary collision is measure-zero)."""
    import ray

    n_docs = int(total_docs if total_docs is not None else ds.count())
    # the df Dataset comes through a groupby: Ray's hash shuffle emits
    # ZERO-COLUMN empty blocks (stages/shuffle.py::drop_empty_blocks
    # doc) — drop them driver-side, we are pulling the table anyway
    tabs = [t for t in ray.get(
        document_frequency(ds, text_col=text_col, min_df=min_df,
                           lowercase=lowercase).to_arrow_refs())
        if t.num_rows > 0]
    df_tab = pa.concat_tables(tabs) if tabs else pa.table(
        {"word": pa.array([], type=pa.string()),
         "df": pa.array([], type=pa.int64())})
    wh = hash_string_column(df_tab["word"].combine_chunks()) \
        .view(np.int64)
    order = np.argsort(wh, kind="stable")
    h_sorted = np.ascontiguousarray(wh[order])
    df_sorted = np.ascontiguousarray(
        df_tab["df"].to_numpy(zero_copy_only=False)[order])
    bc = ray.put((h_sorted, df_sorted, n_docs))

    sch = ds.schema()   # ray.data.Schema: parallel .names / .types lists
    id_type = sch.types[sch.names.index(id_col)]
    empty = pa.table({
        id_col: pa.array([], type=id_type),
        "word": pa.array([], type=pa.string()),
        "tf": pa.array([], type=pa.int64()),
        "df": pa.array([], type=pa.int64()),
        "score_s": pa.array([], type=pa.int64())})

    def score(batch: pa.Table) -> pa.Table:
        hs, dfv, n = ray.get(bc)
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if lowercase:
            text = pc.utf8_lower(text)
        words = pc.split_pattern_regex(text, r"\s+")
        n_words = (pc.fill_null(pc.list_value_length(words), 0)
                   .to_numpy(zero_copy_only=False).astype(np.int64))
        flat = pc.list_flatten(words)
        doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64),
                            n_words)
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        flat = flat.filter(pa.array(nonempty))
        doc_idx = doc_idx[nonempty]
        # whole batch tokenized to nothing, or vocabulary empty after
        # min_df — keep the schema stable (no zero-column blocks)
        if len(doc_idx) == 0 or len(hs) == 0:
            return empty
        h = hash_string_column(flat).view(np.int64)
        order = np.lexsort((h, doc_idx))
        d, w = doc_idx[order], h[order]
        first = np.nonzero(np.r_[True, (d[1:] != d[:-1]) |
                                 (w[1:] != w[:-1])])[0]
        tf = np.diff(np.r_[first, len(d)]).astype(np.int64)
        pos = np.searchsorted(hs, w[first])
        pos_c = np.minimum(pos, max(len(hs) - 1, 0))
        hit = (len(hs) > 0) & (hs[pos_c] == w[first])
        keep = np.nonzero(hit)[0]
        tf = tf[keep]
        dfk = dfv[pos_c[keep]]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sc = tf.astype(np.float64) * np.log(float(n) / dfk)
        return pa.table({
            id_col: pa.array(ids[d[first[keep]]]),
            "word": flat.take(pa.array(order[first[keep]])),
            "tf": pa.array(tf),
            "df": pa.array(dfk.astype(np.int64)),
            "score_s": pa.array(np.floor(sc * score_scale + 0.5)
                                .astype(np.int64))})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


class TextAnalyzer:
    """Actor-pool stage: language-ID + quality score per batch.

    ``__init__`` (once per actor) precompiles the per-language marker
    regexes; ``__call__`` (per batch) is pure vectorized Arrow compute.
    """

    def __init__(self, langs: dict[str, list[str]] | None = None):
        langs = langs or LANG_MARKERS
        self.lang_patterns = {
            lang: r"(?i)\b(" + "|".join(words) + r")\b" if lang != "zh"
            else "(" + "|".join(words) + ")"
            for lang, words in langs.items()}
        self.lang_names = list(self.lang_patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n = batch.num_rows
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        n_ws = count_tokens(text, WS_TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.float64)
        n_punct = (pc.count_substring_regex(text, r"[^\w\s]")
                   .to_numpy(zero_copy_only=False).astype(np.float64))
        n_digit = (pc.count_substring_regex(text, r"\d")
                   .to_numpy(zero_copy_only=False).astype(np.float64))

        # language id: argmax of per-language marker hit-rate
        scores = np.zeros((len(self.lang_names), n))
        for i, lang in enumerate(self.lang_names):
            hits = pc.count_substring_regex(text, self.lang_patterns[lang])
            scores[i] = hits.to_numpy(zero_copy_only=False)
        scores = scores / np.maximum(n_ws, 1.0)
        best = scores.argmax(axis=0)
        confident = scores.max(axis=0) > 0.0
        langs = np.where(confident,
                         np.asarray(self.lang_names, dtype=object)[best],
                         "unknown")

        # quality: penalize extreme length, high punct/digit ratios,
        # very short average words
        safe_chars = np.maximum(n_chars, 1.0)
        punct_ratio = n_punct / safe_chars
        digit_ratio = n_digit / safe_chars
        mean_word_len = safe_chars / np.maximum(n_ws, 1.0)
        length_score = np.clip(n_ws / 20.0, 0.0, 1.0) * np.clip(
            2.0 - n_ws / 20000.0, 0.0, 1.0).clip(0, 1)
        quality = np.clip(
            length_score
            * (1.0 - np.clip(punct_ratio * 3.0, 0.0, 0.8))
            * (1.0 - np.clip(digit_ratio * 2.0, 0.0, 0.8))
            * np.clip(mean_word_len / 3.0, 0.2, 1.0), 0.0, 1.0)

        batch = batch.append_column("lang_pred",
                                    pa.array(langs, type=pa.string()))
        batch = batch.append_column("lang_score",
                                    pa.array(scores.max(axis=0)))
        return batch.append_column("quality", pa.array(quality))


def analyze_text(ds, concurrency: int | None = 4, batch_size: int = 4096):
    """documents-style Dataset → + lang_pred/lang_score/quality columns."""
    if concurrency:
        return ds.map_batches(TextAnalyzer, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              num_cpus=1)
    return ds.map_batches(TextAnalyzer(), batch_format="pyarrow",
                          batch_size=batch_size)


# PII-scrub defaults: RE2 syntax (Arrow's regex engine; DuckDB uses RE2
# too, so the oracle evaluates the IDENTICAL pattern semantics).
REDACT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_text(ds, patterns: dict[str, str] | None = None,
                text_col: str = "text",
                replacement: str = "[REDACTED]"):
    """Regex redaction (PII-scrub shape) over a text column — the
    mandatory pre-training scrub pass. Patterns apply in sorted-name
    order; adds ``n_redactions`` (total matches removed per document).

    Pure vectorized Arrow kernels (``replace_substring_regex`` /
    ``count_substring_regex`` — RE2, compiled once per pattern per
    batch, no Python row loop), stateless map — streams at any scale
    with zero shuffle."""
    pats = patterns if patterns is not None else REDACT_PATTERNS

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # counts are taken over the ORIGINAL text for every pattern
        # (replacements must not create or hide later-pattern matches in
        # the tally); replacements then apply sequentially
        total = np.zeros(len(text), dtype=np.int64)
        for name in sorted(pats):
            total += (pc.count_substring_regex(text, pats[name])
                      .to_numpy(zero_copy_only=False).astype(np.int64))
        for name in sorted(pats):
            text = pc.replace_substring_regex(text, pats[name],
                                              replacement)
        idx = batch.schema.get_field_index(text_col)
        out = batch.set_column(idx, text_col, text)
        return out.append_column("n_redactions",
                                 pa.array(total, type=pa.int64()))

    return ds.map_batches(scrub, batch_format="pyarrow",
                          zero_copy_batch=True)


def extract_int_field(ds, col: str, pattern: str, out_col: str = "val"):
    """Semi-structured scalar extraction: pull one integer field out of
    a JSON-ish string column (e.g. ``props = '{"k": 69}'``) with ONE
    vectorized RE2 pass per block (``pc.extract_regex``) — never a
    per-row json.loads loop. ``pattern`` must have a single named
    capture group ``(?P<v>...)``; non-matching rows yield null, so the
    output is a plain nullable int64 column any aggregate consumes.
    Stateless map, zero shuffle."""
    import pyarrow.compute as _pc

    def ext(batch: pa.Table) -> pa.Table:
        m = _pc.extract_regex(batch[col], pattern=pattern)
        v = _pc.cast(_pc.struct_field(m, "v"), pa.int64())
        return batch.append_column(out_col, v)

    return ds.map_batches(ext, batch_format="pyarrow",
                          zero_copy_batch=True)


def _split_words(text, lowercase: bool = True):
    """Shared whitespace tokenizer (document_frequency parity): returns
    (flat words Array, doc_idx int64[n_words]) with empty tokens
    REMOVED — identical to the SQL
    ``unnest(string_split_regex(lower(text), '\\s+')) ... WHERE w <> ''``
    including the adjacency that removal induces."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if lowercase:
        text = pc.utf8_lower(text)
    words = pc.split_pattern_regex(text, r"\s+")
    n_words = (pc.fill_null(pc.list_value_length(words), 0)
               .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(words)
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_words)
    nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    keep = np.nonzero(nonempty)[0]
    return flat.take(pa.array(keep)), doc_idx[keep]


def word_bigram_counts(ds, text_col: str = "text", min_count: int = 1,
                       lowercase: bool = True):
    """Corpus-wide word-BIGRAM frequency — the n-gram language-model /
    boilerplate-detection statistic. Bigrams never cross a document
    boundary. Each block contributes one (w1, w2, cnt) partial per
    distinct in-block bigram (Arrow C++ group_by — no Python loop);
    the global shuffle moves only those partials, bounded by the
    block's distinct-bigram count, never by words. ``min_count`` is the
    web-scale vocabulary lever (filter AFTER the global sum, exact)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _split_words(batch[text_col], lowercase)
        if len(doc_idx) < 2:
            return pa.table({"w1": pa.array([], type=pa.string()),
                             "w2": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        same_doc = doc_idx[1:] == doc_idx[:-1]
        idx = np.nonzero(same_doc)[0]
        g = (pa.table({"w1": flat.take(pa.array(idx)),
                       "w2": flat.take(pa.array(idx + 1))})
             .group_by(["w1", "w2"]).aggregate([([], "count_all")]))
        g = g.rename_columns(["w1", "w2", "c"])
        return pa.table({"w1": g["w1"], "w2": g["w2"],
                         "cnt": pc.cast(g["c"], pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["w1", "w2"]).aggregate(Sum("cnt", alias_name="cnt")))
    if min_count > 1:
        out = out.filter(expr=f"cnt >= {min_count}")
    return out


def repetition_scores(ds, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      lowercase: bool = True):
    """Per-document n-gram repetition score (Gopher-style quality
    rule): rep_ppm = (n_grams − distinct_n_grams) · 10⁶ // n_grams.
    Pure map — each doc lives in one block, so the whole statistic is
    block-local (one Arrow group_by over (doc, gram) strings: exact
    string distinct, no hash-collision risk) and NOTHING shuffles.
    Documents with fewer than ``n`` words emit no row (SQL parity:
    their window n-grams are all NULL)."""
    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, doc_idx = _split_words(batch[text_col], lowercase)
        empty = pa.table({id_col: pa.array([], type=ids.type),
                          "n_grams": pa.array([], type=pa.int64()),
                          "n_distinct": pa.array([], type=pa.int64()),
                          "rep_ppm": pa.array([], type=pa.int64())})
        if len(doc_idx) < n:
            return empty
        # gram start positions: all n tokens inside the same doc
        ok = doc_idx[n - 1:] == doc_idx[:len(doc_idx) - n + 1]
        idx = np.nonzero(ok)[0]
        if len(idx) == 0:
            return empty
        parts = [flat.take(pa.array(idx + k)) for k in range(n)]
        gram = pc.binary_join_element_wise(
            *parts, pa.scalar(" "))
        d = pa.array(doc_idx[idx])
        pair = (pa.table({"d": d, "g": gram})
                .group_by(["d", "g"]).aggregate([([], "count_all")]))
        dd = pair["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = pair["count_all"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(dd, return_inverse=True)
        n_tg = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n_tg, inv, cc)
        n_dist = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            id_col: ids.take(pa.array(uniq)),
            "n_grams": pa.array(n_tg),
            "n_distinct": pa.array(n_dist),
            "rep_ppm": pa.array((n_tg - n_dist) * 1_000_000 // n_tg)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def vocabulary_jaccard(ds, group_col: str = "source",
                       text_col: str = "text",
                       lowercase: bool = True) -> pa.Table:
    """SET-SIMILARITY JOIN between groups' vocabularies: exact Jaccard
    of distinct-word sets for every group pair that shares ≥1 word —
    the corpus-diversity / source-overlap diagnostic.

    Distributed part: per-block distinct (group, word) pairs (one
    lexsort-free Arrow group_by per block) → global pair dedupe via
    groupby — the shuffle carries vocabulary-bounded (group, word)
    rows, never documents. The pairwise intersection then runs on the
    ≤ Σ|vocab_g| driver table (sorted-merge per group pair) — bounded
    by vocabulary size × groups, not by corpus rows; for >10⁶-word
    vocabularies move the pair count onto a (word → group list)
    self-join, same narrow rows. Zero-intersection pairs are omitted.
    jaccard_ppm = inter·10⁶ // union (exact integer division)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _split_words(batch[text_col], lowercase)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        grp = g.take(pa.array(doc_idx))
        t = (pa.table({"g": grp, "w": flat})
             .group_by(["g", "w"]).aggregate([([], "count_all")]))
        return t.select(["g", "w"])

    pairs = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["g", "w"]).count().to_pandas())
    # driver side: EXACT string sets per group (not hashes — the oracle
    # compares exact intersections, and a 64-bit collision, however
    # unlikely, would silently inflate one cell). Empty Datasets lose
    # their schema through to_pandas(), so guard before the groupby.
    sets = ({} if len(pairs) == 0 or "g" not in pairs.columns
            else {gname: set(sub["w"])
                  for gname, sub in pairs.groupby("g")})
    names = sorted(sets)
    ga, gb, inter, uni = [], [], [], []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = sets[names[i]], sets[names[j]]
            ix = len(a & b)
            if ix == 0:
                continue
            ga.append(names[i])
            gb.append(names[j])
            inter.append(ix)
            uni.append(len(a) + len(b) - ix)
    inter = np.asarray(inter, dtype=np.int64)
    uni = np.asarray(uni, dtype=np.int64)
    return pa.table({
        "source_a": pa.array(ga, type=pa.string()),
        "source_b": pa.array(gb, type=pa.string()),
        "inter": pa.array(inter),
        "uni": pa.array(uni),
        "jaccard_ppm": pa.array(inter * 1_000_000 // uni)})


def bigram_lm_scores(ds, text_col: str = "text",
                     id_col: str = "doc_id", lowercase: bool = True):
    """Corpus-bigram LANGUAGE-MODEL score per document — the KenLM-
    style quality filter: logprob = Σ ln P(w_i | w_{i-1}) with ML
    probabilities from the corpus's own bigram counts (every in-doc
    bigram contributes ≥1 to the counts, so no OOV smoothing is
    needed; boilerplate/repetitive docs score HIGH, line-noise docs
    LOW). Tokenizer shared with document_frequency / word_bigram_counts.

    Two passes: (1) ``word_bigram_counts`` collected + broadcast once
    as (sorted bigram-hash, count, sorted left-hash, left-total) —
    vocabulary-bounded like tf_idf's broadcast, same ≥10⁸-vocab join
    alternative; (2) pure map over documents: per-block adjacency,
    binary-search lookups, per-TERM fixed-point ln (both engines ln
    the identical exact-int ratio → identical double → identical
    int64), per-doc integer sums — order-independent, the repo-wide
    oracle discipline. Docs with < 2 words emit no row (their window
    bigrams are all NULL in the SQL mirror). Output: (id, n_bigrams,
    logprob_micro)."""
    import ray

    tabs = [t for t in ray.get(
        word_bigram_counts(ds, text_col=text_col, min_count=1,
                           lowercase=lowercase).to_arrow_refs())
        if t.num_rows > 0]
    bg = pa.concat_tables(tabs) if tabs else pa.table(
        {"w1": pa.array([], type=pa.string()),
         "w2": pa.array([], type=pa.string()),
         "cnt": pa.array([], type=pa.int64())})
    key = pc.binary_join_element_wise(bg["w1"], bg["w2"],
                                      pa.scalar(" "))
    kh = hash_string_column(key.combine_chunks()
                            if isinstance(key, pa.ChunkedArray)
                            else key).view(np.int64)
    cnt = bg["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(kh, kind="stable")
    kh_s, cnt_s = np.ascontiguousarray(kh[o]), \
        np.ascontiguousarray(cnt[o])
    # left-context totals c1(w1) = Σ over w2 of c(w1, w2)
    lh = hash_string_column(bg["w1"].combine_chunks()).view(np.int64)
    lo = np.argsort(lh, kind="stable")
    lh_sorted = lh[lo]
    bounds = np.nonzero(np.r_[True, lh_sorted[1:] != lh_sorted[:-1]])[0]
    lh_u = lh_sorted[bounds]
    c1_u = np.add.reduceat(cnt[lo], bounds) if len(lo) else \
        np.empty(0, dtype=np.int64)
    bc = ray.put((kh_s, cnt_s, lh_u, c1_u))

    sch = ds.schema()
    id_type = sch.types[sch.names.index(id_col)]
    empty = pa.table({id_col: pa.array([], type=id_type),
                      "n_bigrams": pa.array([], type=pa.int64()),
                      "logprob_micro": pa.array([], type=pa.int64())})

    def score(batch: pa.Table) -> pa.Table:
        khs, cnts, lhu, c1u = ray.get(bc)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, doc_idx = _split_words(batch[text_col], lowercase)
        if len(doc_idx) < 2:
            return empty
        adj = np.nonzero(doc_idx[1:] == doc_idx[:-1])[0]
        if len(adj) == 0:
            return empty
        w1 = flat.take(pa.array(adj))
        w2 = flat.take(pa.array(adj + 1))
        bkey = pc.binary_join_element_wise(w1, w2, pa.scalar(" "))
        bh = hash_string_column(bkey).view(np.int64)
        i = np.minimum(np.searchsorted(khs, bh), max(len(khs) - 1, 0))
        # membership guard: a miss (hash drift, future min_count>1) or a
        # 64-bit collision would otherwise silently read a NEIGHBOR's
        # count and corrupt every score downstream
        if len(khs) == 0 or not bool(np.all(khs[i] == bh)):
            raise RuntimeError(
                "bigram_lm_scores: bigram absent from the broadcast "
                "count table (hash miss) — counts would be corrupted")
        c = cnts[i]                      # every in-doc bigram is counted
        h1 = hash_string_column(w1).view(np.int64)
        j = np.minimum(np.searchsorted(lhu, h1), max(len(lhu) - 1, 0))
        if len(lhu) == 0 or not bool(np.all(lhu[j] == h1)):
            raise RuntimeError(
                "bigram_lm_scores: left-context word absent from the "
                "broadcast table (hash miss)")
        c1 = c1u[j]
        term = np.floor(np.log(c / c1) * 1_000_000 + 0.5) \
            .astype(np.int64)
        d = doc_idx[adj]
        uniq, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, term)
        return pa.table({
            id_col: ids.take(pa.array(uniq)),
            "n_bigrams": pa.array(np.bincount(
                inv, minlength=len(uniq)).astype(np.int64)),
            "logprob_micro": pa.array(s)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _doc_ngrams(batch: pa.Table, text_col: str, n: int,
                lowercase: bool) -> tuple[pa.Array, np.ndarray]:
    """Flat word n-gram strings ("w1 w2 ... wn") + their doc indices,
    never crossing a document boundary. Fully vectorized: n shifted
    takes of the flat word array + one binary_join_element_wise."""
    flat, doc_idx = _split_words(batch[text_col], lowercase)
    if len(doc_idx) < n:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    starts = np.nonzero(doc_idx[: len(doc_idx) - n + 1]
                        == doc_idx[n - 1:])[0]
    if len(starts) == 0:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    parts = [flat.take(pa.array(starts + j)) for j in range(n)]
    ng = pc.binary_join_element_wise(*parts, pa.scalar(" "))
    return ng, doc_idx[starts]


def ngram_decontaminate(train_ds, eval_ds, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 8,
                        lowercase: bool = True):
    """Benchmark decontamination: per TRAIN document, how many of its
    word ``n``-grams appear anywhere in the EVAL set (the
    GPT-3/PaLM-style n-gram-overlap rule — a train doc sharing a long
    n-gram with an eval benchmark leaks the benchmark).

    Scale shape: the eval side is a BENCHMARK (small by definition —
    thousands of docs, not billions): each eval block contributes its
    DISTINCT n-gram hashes only, the driver unions them into one sorted
    uint64 array broadcast via ``ray.put``, and the train pass is a
    zero-shuffle map_batches doing a searchsorted membership probe per
    batch — the 100 TB side streams, nothing all-to-all. Membership is
    equality-checked after searchsorted (no neighbor reads); the only
    residual error is a true 64-bit hash collision across the two sides
    (P ≈ |eval|·|train| / 2⁶⁴ — ~1e-8 at 1e5 × 1e7 grams), which can
    only over-flag. Docs with fewer than ``n`` words carry no n-grams
    and are absent from the output (SQL parity: their LEAD window is
    all-NULL).

    Returns a Dataset of ``(id_col, n_grams, n_hits)`` — int64 counts;
    ``n_hits > 0`` is the contamination flag.
    """
    import ray

    def eval_partial(batch: pa.Table) -> pa.Table:
        ng, _ = _doc_ngrams(batch, text_col, n, lowercase)
        h = np.unique(hash_string_column(ng))
        return pa.table({"h": pa.array(h.view(np.int64),
                                       type=pa.int64())})

    # bounded driver materialization: distinct eval n-gram hashes only
    blocks = (eval_ds.map_batches(eval_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
              .take_all())
    ev = (np.unique(np.asarray([r["h"] for r in blocks],
                               dtype=np.int64).view(np.uint64))
          if blocks else np.empty(0, dtype=np.uint64))
    ev_ref = ray.put(ev)

    sch = train_ds.schema()
    id_type = sch.types[sch.names.index(id_col)]
    empty = pa.table({id_col: pa.array([], type=id_type),
                      "n_grams": pa.array([], type=pa.int64()),
                      "n_hits": pa.array([], type=pa.int64())})

    def probe(batch: pa.Table) -> pa.Table:
        evh = ray.get(ev_ref)
        ng, d = _doc_ngrams(batch, text_col, n, lowercase)
        if len(d) == 0:
            return empty
        h = hash_string_column(ng)
        if len(evh):
            i = np.minimum(np.searchsorted(evh, h), len(evh) - 1)
            hit = (evh[i] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), dtype=np.int64)
        uniq, inv = np.unique(d, return_inverse=True)
        hits = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(hits, inv, hit)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(uniq)),
            "n_grams": pa.array(np.bincount(
                inv, minlength=len(uniq)).astype(np.int64)),
            "n_hits": pa.array(hits)})

    return train_ds.map_batches(probe, batch_format="pyarrow",
                                zero_copy_batch=True)


# ------------------------------------------------- paragraph-level dedup

def _split_lines(batch: pa.Table, text_col: str, id_col: str, sep: str
                 ) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """(flat lines, line hashes i64, per-line doc ids, per-doc counts).
    One vectorized split per block; hashes via the SipHash kernel."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lst = pc.split_pattern(text, pattern=sep)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()
    offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = u64_to_i64(hash_string_column(flat))
    docidx = np.repeat(np.arange(len(ids)), counts)
    return flat, h, ids[docidx], counts


def repeated_line_stats(ds, text_col: str = "text",
                        id_col: str = "doc_id", sep: str = "\n",
                        min_count: int = 2,
                        num_buckets: int | None = None
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Corpus-wide repeated-line inventory: for every line (by 64-bit
    SipHash fingerprint) occurring ≥ ``min_count`` times, its global
    occurrence count and KEEPER (the minimum ``id_col`` carrying it).
    ONE packed-cell exchange computes both (``ops=["sum","min"]`` —
    stages/shuffle.py); per block only (hash, 1, doc_id) partials move,
    never line text. Returns (hashes sorted, counts, keepers)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    def extract(batch: pa.Table):
        _, h, docs, _ = _split_lines(batch, text_col, id_col, sep)
        return h, [np.ones(len(h), dtype=np.int64), docs]

    keys, (cnts, keepers) = grouped_int_sums_exchange(
        ds, extract, num_values=2, ops=["sum", "min"],
        num_buckets=num_buckets)
    m = cnts >= min_count
    keys, cnts, keepers = keys[m], cnts[m], keepers[m]
    order = np.argsort(keys)
    return keys[order], cnts[order], keepers[order]


def dedup_paragraphs(ds, text_col: str = "text", id_col: str = "doc_id",
                     sep: str = "\n", min_count: int = 2,
                     keep: str = "first",
                     num_buckets: int | None = None):
    """Corpus-level repeated-paragraph removal — the C4/Dolma-style
    boilerplate scrub: lines (``sep``-separated spans) occurring
    ≥ ``min_count`` times across the corpus are dropped from every
    document except (``keep="first"``) the one with the smallest
    ``id_col``, or from ALL documents (``keep="none"``). Documents are
    reassembled with ``sep``; adds ``n_dropped`` per document.

    Two passes, both scale-safe: (1) ``repeated_line_stats`` — one
    packed exchange of (hash, count, min-doc) partials, line text never
    shuffles; (2) a stateless rewrite map against the repeated-set
    broadcast (``ray.put`` once, ``np.searchsorted`` membership, Arrow
    list rebuild + ``pc.binary_join`` — no Python row loop). The
    broadcast holds only lines with count ≥ min_count (boilerplate is
    a small fraction of any real corpus); identity is the 64-bit
    fingerprint, so two distinct lines collide with probability
    ~n²/2⁶⁴ (the same ε every fingerprint dedup in pipelines/dedup.py
    documents). ``id_col`` must be integer-typed; hash string ids
    first (keeper = smallest hash, still deterministic)."""
    if keep not in ("first", "none"):
        raise ValueError("keep must be 'first' or 'none'")
    import ray as _ray

    rep_h, _, rep_keep = repeated_line_stats(
        ds, text_col, id_col, sep, min_count, num_buckets)
    handle = _ray.put((rep_h, rep_keep))

    def rewrite(batch: pa.Table) -> pa.Table:
        hashes, keepers = _ray.get(handle)
        flat, h, docs, counts = _split_lines(batch, text_col, id_col,
                                             sep)
        if len(hashes):
            pos = np.searchsorted(hashes, h)
            pos_c = np.minimum(pos, len(hashes) - 1)
            found = hashes[pos_c] == h
            drop = found if keep == "none" else \
                found & (keepers[pos_c] != docs)
        else:
            drop = np.zeros(len(h), dtype=bool)
        keep_mask = ~drop
        # per-doc kept counts: every split yields ≥ 1 line, so no empty
        # reduceat segments (the np.add.reduceat hazard in CLAUDE.md)
        new_counts = (np.add.reduceat(keep_mask, np.cumsum(
            np.r_[0, counts[:-1]])) if len(counts)
            else np.zeros(0, np.int64)).astype(np.int64)
        new_offs = np.zeros(len(counts) + 1, dtype=np.int32)
        new_offs[1:] = np.cumsum(new_counts)
        new_list = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()),
            flat.filter(pa.array(keep_mask)))
        joined = pc.binary_join(new_list, sep)
        out = batch
        idx = out.schema.get_field_index(text_col)
        out = out.set_column(idx, text_col, joined)
        return out.append_column(
            "n_dropped", pa.array(counts - new_counts,
                                  type=pa.int64()))

    return ds.map_batches(rewrite, batch_format="pyarrow",
                          zero_copy_batch=True)


def compression_signals(ds, text_col: str = "text", level: int = 6):
    """Per-document zlib compression ratio — the classic
    entropy-family curation signal (repetitive boilerplate and
    template spam compress far below ~300‰; random gibberish sits
    near/above 1000‰; natural prose in between). Appends ``raw_len``
    (UTF-8 bytes), ``zlib_len`` and ``compress_pm`` (per-mille
    fixed-point, 1000·zlib/raw; 0-length docs → 1000 = "incompressible"
    sentinel, documented).

    DEFLATE cannot be vectorized, so this is the one text stage with a
    per-row loop — each iteration is one C call (same stance as the
    actor-pool media decoders); state-free, zero shuffle. Determinism
    holds for a fixed zlib build (in-container tests pin it against
    direct zlib calls); there is deliberately no SQL oracle — DuckDB
    cannot deflate — so this is a rows-only (○) operator."""
    import zlib

    def sig(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        raw = np.asarray(
            pc.binary_length(pc.cast(text, pa.binary()))
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        zl = np.fromiter(
            (len(zlib.compress(s.encode(), level))
             for s in text.to_pylist()),
            dtype=np.int64, count=len(text))
        pm = np.where(raw > 0, (1000 * zl) // np.maximum(raw, 1), 1000)
        out = batch.append_column("raw_len",
                                  pa.array(raw, type=pa.int64()))
        out = out.append_column("zlib_len",
                                pa.array(zl, type=pa.int64()))
        return out.append_column(
            "compress_pm", pa.array(pm.astype(np.int64),
                                    type=pa.int64()))

    return ds.map_batches(sig, batch_format="pyarrow",
                          zero_copy_batch=True)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_quality(ds, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000):
    """The Gopher quality-filter rule set (Rae et al. 2021, App. A1.1)
    over raw document text — the named recipe web-scale curation runs
    before model-based scoring. Emits the per-document counters and the
    combined verdict; every rule is an INTEGER cross-multiplication
    (never a float ratio), so the whole filter is oracle-replayable:

      - word count in [min_words, max_words]
      - mean word length in [3, 10]          (3n ≤ chars ≤ 10n)
      - symbol-to-word ratio ≤ 1/10          ('#', '...', '…')
      - bullet-led lines ≤ 10% of lines      ('- ', '• ', '* ')
      - ellipsis-ended lines ≤ 30% of lines  ('...', '…')
      - ≥ 80% of words contain an alphabetic character
      - ≥ 2 distinct stopwords of the paper's 8 (GOPHER_STOPWORDS)

    One stateless vectorized map: the word pass is one ``\\s+`` split
    (same grammar as top_words_by_source), counters reduce with
    np.add.at / bitmask-popcount; the line pass is one ``\\n`` split.
    Zero shuffle. Appends the counters plus ``gopher_pass``."""
    stop = np.sort(np.asarray(GOPHER_STOPWORDS))

    def flags(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n = len(text)

        words = pc.split_pattern_regex(text, r"\s+")
        lens = (pc.fill_null(pc.list_value_length(words), 0)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        flat = pc.list_flatten(words)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, rows = flat.filter(pa.array(keep)), rows[keep]

        n_words = np.zeros(n, dtype=np.int64)
        np.add.at(n_words, rows, 1)
        n_chars = np.zeros(n, dtype=np.int64)
        np.add.at(n_chars, rows,
                  pc.utf8_length(flat).to_numpy(zero_copy_only=False))
        alpha = pc.match_substring_regex(flat, "[a-zA-Z]") \
            .to_numpy(zero_copy_only=False)
        n_alpha = np.zeros(n, dtype=np.int64)
        np.add.at(n_alpha, rows, alpha.astype(np.int64))

        low = pc.utf8_lower(flat).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(stop, low), len(stop) - 1)
        is_stop = stop[pos] == low
        mask = np.zeros(n, dtype=np.int64)
        np.bitwise_or.at(mask, rows[is_stop],
                         np.int64(1) << pos[is_stop])
        n_stop = np.zeros(n, dtype=np.int64)
        m = mask.copy()
        for _ in range(len(stop)):
            n_stop += m & 1
            m >>= 1

        lines = pc.split_pattern(text, "\n")
        llens = (pc.fill_null(pc.list_value_length(lines), 0)
                 .to_numpy(zero_copy_only=False).astype(np.int64))
        lflat = pc.list_flatten(lines)
        lrows = np.repeat(np.arange(n, dtype=np.int64), llens)
        bullet = np.zeros(len(lflat), dtype=bool)
        for p in ("- ", "• ", "* "):
            bullet |= pc.starts_with(lflat, p) \
                .to_numpy(zero_copy_only=False)
        ell = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
        ell |= pc.ends_with(lflat, "…").to_numpy(zero_copy_only=False)
        n_lines, n_bullet, n_ell = (np.zeros(n, dtype=np.int64)
                                    for _ in range(3))
        np.add.at(n_lines, lrows, 1)
        np.add.at(n_bullet, lrows, bullet.astype(np.int64))
        np.add.at(n_ell, lrows, ell.astype(np.int64))

        n_sym = (pc.count_substring(text, "#")
                 .to_numpy(zero_copy_only=False).astype(np.int64)
                 + pc.count_substring(text, "...")
                 .to_numpy(zero_copy_only=False)
                 + pc.count_substring(text, "…")
                 .to_numpy(zero_copy_only=False))

        ok = ((n_words >= min_words) & (n_words <= max_words)
              & (3 * n_words <= n_chars) & (n_chars <= 10 * n_words)
              & (10 * n_sym <= n_words)
              & (10 * n_bullet <= n_lines)
              & (10 * n_ell <= 3 * n_lines)
              & (10 * n_alpha >= 8 * n_words)
              & (n_stop >= 2))

        out = batch
        for name, col in (("n_words", n_words), ("n_chars", n_chars),
                          ("n_alpha_words", n_alpha),
                          ("n_stopword_types", n_stop),
                          ("n_lines", n_lines),
                          ("n_bullet_lines", n_bullet),
                          ("n_ellipsis_lines", n_ell),
                          ("n_symbols", n_sym)):
            out = out.append_column(name, pa.array(col,
                                                   type=pa.int64()))
        return out.append_column("gopher_pass",
                                 pa.array(ok, type=pa.bool_()))

    return ds.map_batches(flags, batch_format="pyarrow",
                          zero_copy_batch=True)


def c4_filters(ds, text_col: str = "text", min_words_per_line: int = 5,
               min_lines: int = 3):
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) — the other
    canonical pre-training scrub next to :func:`gopher_quality`:

      line-level:  keep a line only if it ends in terminal punctuation
                   (``. ! ? "``), has ≥ ``min_words_per_line`` words,
                   and does not mention 'javascript' (case-insensitive)
      page-level:  drop the page if < ``min_lines`` lines survive, or
                   it contains 'lorem ipsum' (case-insensitive) or a
                   curly brace

    One vectorized pass: line split, per-line word counts via the
    shared ``\\s+`` grammar, Arrow list rebuild + ``binary_join`` —
    no Python row loop, zero shuffle. REWRITES ``text_col`` to the
    kept lines and appends ``n_kept_lines`` / ``n_dropped_lines`` /
    ``c4_keep`` (pages failing page-level rules keep their rewritten
    text but flag False — filtering is the caller's one-liner, so
    the operator stays a pure decorator like gopher_quality)."""

    def flags(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n = len(text)

        lines = pc.split_pattern(text, "\n")
        llens = (pc.fill_null(pc.list_value_length(lines), 0)
                 .to_numpy(zero_copy_only=False).astype(np.int64))
        lflat = pc.list_flatten(lines)
        lrows = np.repeat(np.arange(n, dtype=np.int64), llens)

        term = np.zeros(len(lflat), dtype=bool)
        for p in (".", "!", "?", '"'):
            term |= pc.ends_with(lflat, p) \
                .to_numpy(zero_copy_only=False)
        # word count per line = #non-empty split tokens: count all
        # tokens, subtract empties (same ``\s+`` grammar as everywhere)
        words = pc.split_pattern_regex(lflat, r"\s+")
        wl = (pc.fill_null(pc.list_value_length(words), 0)
              .to_numpy(zero_copy_only=False).astype(np.int64))
        wflat = pc.list_flatten(words)
        wrow = np.repeat(np.arange(len(lflat), dtype=np.int64), wl)
        empt = pc.equal(wflat, "").to_numpy(zero_copy_only=False)
        n_empty = np.zeros(len(lflat), dtype=np.int64)
        np.add.at(n_empty, wrow, empt.astype(np.int64))
        wcount = wl - n_empty
        js = pc.match_substring(lflat, "javascript",
                                ignore_case=True) \
            .to_numpy(zero_copy_only=False)
        keep_line = term & (wcount >= min_words_per_line) & ~js

        n_kept = np.zeros(n, dtype=np.int64)
        np.add.at(n_kept, lrows, keep_line.astype(np.int64))
        new_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_kept, out=new_off[1:])
        new_list = pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), type=pa.int32()),
            lflat.filter(pa.array(keep_line)))
        joined = pc.binary_join(new_list, "\n")

        lorem = pc.match_substring(text, "lorem ipsum",
                                   ignore_case=True) \
            .to_numpy(zero_copy_only=False)
        brace = pc.match_substring(text, "{") \
            .to_numpy(zero_copy_only=False)
        keep_doc = (n_kept >= min_lines) & ~lorem & ~brace

        idx = batch.schema.get_field_index(text_col)
        out = batch.set_column(idx, text_col, joined)
        out = out.append_column("n_kept_lines",
                                pa.array(n_kept, type=pa.int64()))
        out = out.append_column(
            "n_dropped_lines",
            pa.array(llens - n_kept, type=pa.int64()))
        return out.append_column("c4_keep",
                                 pa.array(keep_doc, type=pa.bool_()))

    return ds.map_batches(flags, batch_format="pyarrow",
                          zero_copy_batch=True)


def _word_hash_rows(text: pa.Array | pa.ChunkedArray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 word fingerprints, source row index per word) for
    the lowercase whitespace tokenization shared with
    ``top_words_by_source`` (``\\s+`` split, empty artifacts dropped) —
    one vectorized Arrow pass + one SipHash over the flat word array."""
    from bigdime_ray.functions.hashing import hash_string_column
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    lens = (pc.fill_null(pc.list_value_length(words), 0)
            .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(words)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    return (hash_string_column(flat).view(np.int64), rows[keep])


def dsir_weights(target_ds, raw_ds, text_col: str = "text",
                 scale: int = 1_000_000,
                 num_buckets: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Importance weights for DSIR-style data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): per-word evidence that a document resembles the
    TARGET domain, estimated from word frequencies in a small target
    corpus vs the raw corpus. This variant uses the add-one RATIO
    weight  w = ((c_target+1)·scale) // (c_raw+1)  instead of the
    paper's log-ratio: pure integer arithmetic, so weights and scores
    are bit-reproducible and oracle-replayable (the log variant is one
    ``np.log`` away from the same counts; ranking by Σc·w vs
    Σc·log-ratio differs only in weighting emphasis, documented).

    Scale shape: the TARGET vocabulary is broadcast-bound (a domain
    seed set ≪ the train corpus — the same assumption as
    decontamination); pass 1 is one packed (word-hash, count) exchange
    over the target, pass 2 the same exchange over the RAW corpus
    PRE-FILTERED to target-vocabulary words inside each block (the
    corpus-wide vocabulary never reaches the driver). Words outside
    the target vocabulary carry zero target evidence and weight 0.
    Returns (word hashes sorted int64, weights int64)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    def t_extract(batch: pa.Table):
        h, _ = _word_hash_rows(batch[text_col])
        return h, [np.ones(len(h), dtype=np.int64)]

    t_keys, (t_cnt,) = grouped_int_sums_exchange(
        target_ds, t_extract, num_values=1, num_buckets=num_buckets)
    order = np.argsort(t_keys)
    t_keys, t_cnt = t_keys[order], t_cnt[order]
    import ray as _ray
    vocab = _ray.put(t_keys)

    def r_extract(batch: pa.Table, _v=vocab):
        tv = _ray.get(_v)
        h, _ = _word_hash_rows(batch[text_col])
        if len(tv):
            pos = np.minimum(np.searchsorted(tv, h), len(tv) - 1)
            h = h[tv[pos] == h]
        else:
            h = h[:0]
        return h, [np.ones(len(h), dtype=np.int64)]

    r_keys, (r_cnt,) = grouped_int_sums_exchange(
        raw_ds, r_extract, num_values=1, num_buckets=num_buckets)
    raw_map = dict(zip(r_keys.tolist(), r_cnt.tolist()))
    weights = np.asarray(
        [((int(ct) + 1) * scale) // (raw_map.get(int(hh), 0) + 1)
         for hh, ct in zip(t_keys, t_cnt)], dtype=np.int64)
    return t_keys, weights


def dsir_scores(ds, hashes: np.ndarray, weights: np.ndarray,
                text_col: str = "text",
                score_col: str = "dsir_score_fp"):
    """Score every document with the broadcast importance table:
    score = Σ over word OCCURRENCES of weight[word] (fixed-point int64,
    occurrences outside the target vocabulary contribute 0). One
    stateless map — searchsorted membership + one np.add.at per batch,
    zero shuffle. Select the head of the score ranking (or sample ∝
    score) downstream to realize the DSIR selection."""
    import ray as _ray

    handle = _ray.put((hashes, weights))

    def score(batch: pa.Table) -> pa.Table:
        hs, ws = _ray.get(handle)
        h, rows = _word_hash_rows(batch[text_col])
        s = np.zeros(batch.num_rows, dtype=np.int64)
        if len(hs) and len(h):
            pos = np.minimum(np.searchsorted(hs, h), len(hs) - 1)
            m = hs[pos] == h
            np.add.at(s, rows[m], ws[pos[m]])
        return batch.append_column(score_col,
                                   pa.array(s, type=pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _window_geometry(text: pa.Array, k: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray, np.ndarray]:
    """Stride-1 byte-window geometry matching ``rolling_hashes(text,
    k)`` exactly: (hashes as int64, per-row window counts, window start
    byte offset within its row, window byte length, row byte lengths).
    Rows shorter than ``k`` bytes contribute ONE whole-row window (the
    same convention rolling_hashes uses)."""
    h, offs = rolling_hashes(text, k)
    counts = np.diff(offs)
    text_f = pc.fill_null(text, "")
    bufs = text_f.buffers()
    str_off = np.frombuffer(bufs[1], dtype=np.int32)[
        text_f.offset:text_f.offset + len(text_f) + 1].astype(np.int64)
    row_len = str_off[1:] - str_off[:-1]
    pos_in_row = (np.arange(len(h), dtype=np.int64)
                  - np.repeat(offs[:-1], counts))
    wlen = np.minimum(np.repeat(row_len, counts), k)
    return h.view(np.int64), counts, pos_in_row, wlen, row_len


def repeated_window_stats(ds, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 32,
                          min_count: int = 2,
                          num_buckets: int | None = None
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Corpus-wide repeated k-byte-window inventory (the discovery pass
    of :func:`dedup_substrings`): for every stride-1 byte window (by
    64-bit rolling-hash fingerprint) occurring ≥ ``min_count`` times
    across the corpus — within-document repeats count — its global
    occurrence count and KEEPER (minimum ``id_col`` carrying it). ONE
    packed exchange (``ops=["sum","min"]``); per block only
    (hash, 1, doc_id) partials move, never text. Returns (hashes
    sorted as int64, counts, keepers)."""
    from bigdime_ray.stages.shuffle import grouped_int_sums_exchange

    def extract(batch: pa.Table):
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hi, counts, _, _, _ = _window_geometry(text, k)
        docs = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return hi, [np.ones(len(hi), dtype=np.int64),
                    np.repeat(docs, counts)]

    keys, (cnts, keepers) = grouped_int_sums_exchange(
        ds, extract, num_values=2, ops=["sum", "min"],
        num_buckets=num_buckets)
    m = cnts >= min_count
    keys, cnts, keepers = keys[m], cnts[m], keepers[m]
    order = np.argsort(keys)
    return keys[order], cnts[order], keepers[order]


def dedup_substrings(ds, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 32, min_count: int = 2,
                     num_buckets: int | None = None):
    """ExactSubstr-style repeated-substring removal (the Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"
    recipe, windowed): every stride-1 ``k``-BYTE window whose content
    occurs ≥ ``min_count`` times across the corpus is cut from every
    document except the keeper (minimum ``id_col``, which keeps ALL its
    occurrences); overlapping flagged windows merge into one span
    (interval union over a per-row diff array — one cumsum, no span
    loop). Appends ``n_dup_windows`` / ``n_masked_chars`` per document.
    Windowed k-grams instead of the paper's suffix array: any repeated
    run of length ≥ k is a repeated k-window at each offset, so the
    union of flagged windows covers exactly the repeated runs, over- or
    under-shooting by < k bytes at run edges — the standard
    distributed-friendly approximation.

    Scale shape = :func:`dedup_paragraphs`: discovery is ONE packed
    (hash, count, min-doc) exchange (text never shuffles); the rewrite
    is a stateless map against the repeated-set broadcast (boilerplate
    ≪ corpus, the documented assumption), rebuilt via flat-buffer
    gather — no Python row loop. Identity is the 64-bit rolling
    fingerprint (collision ε ~ n²/2⁶⁴, as everywhere). Windows are
    BYTE-grid (UTF-8): a cut can split a multi-byte codepoint —
    acceptable for dedup corpora, documented. Rows shorter than k are
    single whole-row units (exact-duplicate short docs empty out,
    keeper survives)."""
    import ray as _ray

    rep_h, _, rep_keep = repeated_window_stats(
        ds, text_col, id_col, k, min_count, num_buckets)
    handle = _ray.put((rep_h, rep_keep))

    def rewrite(batch: pa.Table) -> pa.Table:
        hashes, keepers = _ray.get(handle)
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hi, counts, pos_in_row, wlen, row_len = _window_geometry(text, k)
        docs_row = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        docs = np.repeat(docs_row, counts)
        if len(hashes):
            pos = np.searchsorted(hashes, hi)
            pos_c = np.minimum(pos, len(hashes) - 1)
            found = hashes[pos_c] == hi
            flag = found & (keepers[pos_c] != docs)
        else:
            flag = np.zeros(len(hi), dtype=bool)

        # interval union over the concatenated byte buffer: +1 at each
        # flagged start, -1 past its end, cumsum > 0 = masked
        row_start = np.zeros(len(row_len), dtype=np.int64)
        np.cumsum(row_len[:-1], out=row_start[1:])
        total = int(row_len.sum())
        starts = np.repeat(row_start, counts) + pos_in_row
        diff = np.zeros(total + 1, dtype=np.int64)
        sf = starts[flag]
        np.add.at(diff, sf, 1)
        np.add.at(diff, sf + wlen[flag], -1)
        masked = np.cumsum(diff[:total]) > 0

        text_f = pc.fill_null(text, "")
        bufs = text_f.buffers()
        str_off = np.frombuffer(bufs[1], dtype=np.int32)[
            text_f.offset:text_f.offset + len(text_f) + 1] \
            .astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, dtype=np.uint8)
        flat = data[str_off[0]:str_off[-1]]
        # per-row kept-byte counts via cumsum (no reduceat — its
        # empty-segment hazard, CLAUDE.md)
        ckeep = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(~masked, out=ckeep[1:])
        bounds = np.zeros(len(row_len) + 1, dtype=np.int64)
        np.cumsum(row_len, out=bounds[1:])
        kept_per_row = ckeep[bounds[1:]] - ckeep[bounds[:-1]]
        new_off = np.zeros(len(row_len) + 1, dtype=np.int64)
        np.cumsum(kept_per_row, out=new_off[1:])
        new_text = pa.Array.from_buffers(
            pa.utf8(), len(row_len),
            [None, pa.py_buffer(new_off.astype(np.int32).tobytes()),
             pa.py_buffer(flat[~masked].tobytes())])

        # per-row flagged-window and masked-byte counts, same cumsum
        cflag = np.zeros(len(flag) + 1, dtype=np.int64)
        np.cumsum(flag, out=cflag[1:])
        wb = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=wb[1:])
        n_dup = cflag[wb[1:]] - cflag[wb[:-1]]

        out = batch.set_column(
            batch.schema.get_field_index(text_col), text_col, new_text)
        out = out.append_column("n_dup_windows",
                                pa.array(n_dup, type=pa.int64()))
        return out.append_column(
            "n_masked_chars",
            pa.array(row_len - kept_per_row, type=pa.int64()))

    return ds.map_batches(rewrite, batch_format="pyarrow",
                          zero_copy_batch=True)
