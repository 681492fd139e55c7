"""Text-analysis stages over the driver documents table + synthetic rows."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from bigdime_ray.pipelines.text import (TextAnalyzer, add_fingerprint,
                                        add_token_counts, analyze_text,
                                        count_tokens)


def test_token_counts_match_python_split():
    texts = ["a b  c", "", "one", "x y z w", "  lead trail  "]
    arr = pa.array(texts)
    got = count_tokens(arr).to_pylist()
    assert got == [len(t.split()) for t in texts]


def test_add_token_counts_and_fingerprint():
    t = pa.table({"text": pa.array(["Hello World", "hello   world", "bye"])})
    out = add_token_counts(t)
    assert out["n_ws_tokens"].to_pylist() == [2, 2, 1]
    fp = add_fingerprint(t)["fingerprint"].to_pylist()
    # normalization: case + whitespace collapse → same fingerprint
    assert fp[0] == fp[1] and fp[0] != fp[2]


def test_analyzer_lang_and_quality():
    an = TextAnalyzer()
    t = pa.table({"text": pa.array([
        "the cat and the dog sat in the house with the mouse and the bird",
        "el perro y el gato que viven en la casa por los campos de una villa",
        "zz qq xx",
    ])})
    out = an(t)
    langs = out["lang_pred"].to_pylist()
    assert langs[0] == "en" and langs[1] == "es"
    q = out["quality"].to_pylist()
    assert all(0.0 <= x <= 1.0 for x in q)
    assert q[0] > q[2]  # real-ish sentence beats 3-token junk


def test_analyze_text_on_documents(sf001_dir):
    ds = ray.data.read_parquet(f"{sf001_dir}/documents.parquet")
    out = analyze_text(ds, concurrency=2).to_pandas()
    assert len(out) == 500
    assert {"lang_pred", "lang_score", "quality"} <= set(out.columns)
    assert out.quality.between(0, 1).all()


def test_curate_documents_composition():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.curate import curate_documents
    texts = ["short", "x" * 60, "x" * 60, "y" * 80, "z" * 200_000]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array(texts)}))
    kept = curate_documents(ds, min_chars=50, max_chars=100_000).to_pandas()
    # 0 too short, 2 is a dup of 1, 4 too long → keep 1 and 3
    assert sorted(kept.doc_id) == [1, 3]
    # quality gate composes (heuristic — just assert it subsets)
    kept_q = curate_documents(ds, min_chars=50, max_chars=100_000,
                              min_quality=0.0).to_pandas()
    assert set(kept_q.doc_id) <= {1, 3}


def test_stratified_sample_deterministic():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.curate import (SAMPLE_MOD, SAMPLE_MUL,
                                              stratified_sample)
    ids = np.arange(2000, dtype=np.int64)
    strata = np.where(ids % 2 == 0, "a", "b")
    tbl = pa.table({"doc_id": pa.array(ids),
                    "source": pa.array(strata.tolist())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out1 = stratified_sample(ds, "source", {"a": 0.5}, default_rate=0.1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    out2 = stratified_sample(ds, "source", {"a": 0.5}, default_rate=0.1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out1.equals(out2)  # deterministic
    bucket = ((ids * SAMPLE_MUL) % SAMPLE_MOD) % 1000
    expect = ids[np.where(strata == "a", bucket < 500, bucket < 100)]
    assert out1.doc_id.tolist() == expect.tolist()
    share_a = (out1.source == "a").mean()
    assert share_a > 0.7  # a sampled 5x more than b


def test_temperature_mix_rates_math():
    import math
    from bigdime_ray.pipelines.curate import temperature_mix_rates
    counts = {"en": 900, "fr": 100, "sw": 25}
    # τ=1: natural distribution — every stratum sampled at the SAME
    # rate budget/total (w_s ∝ c_s cancels)
    r1 = temperature_mix_rates(counts, budget_docs=205, temperature=1.0)
    assert r1 == {"en": 200, "fr": 200, "sw": 200}
    # τ=2: sqrt-tempered — hand-replay the integer recurrence
    w = {k: math.floor(math.sqrt(c) * (1 << 20))
         for k, c in counts.items()}
    total = sum(w.values())
    expect = {k: min(1000, (1000 * 205 * w[k]) // (total * counts[k]))
              for k in counts}
    r2 = temperature_mix_rates(counts, budget_docs=205, temperature=2.0)
    assert r2 == expect
    # low-resource strata upweighted, high-resource down
    assert r2["sw"] > r1["sw"] and r2["en"] < r1["en"]
    # big budget caps the small stratum at keep-everything
    r3 = temperature_mix_rates(counts, budget_docs=2000, temperature=2.0)
    assert r3["sw"] == 1000
    # degenerate inputs
    assert temperature_mix_rates({"a": 0}, 100) == {"a": 0}
    assert temperature_mix_rates({}, 100) == {}


def test_temperature_mix_end_to_end_block_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.curate import (strata_counts,
                                              temperature_mix,
                                              temperature_mix_rates)
    rng = np.random.default_rng(7)
    strata = np.repeat(["en", "fr", "sw"], [3000, 400, 80])
    ids = rng.permutation(len(strata)).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "source": pa.array(strata.tolist())})
    budget = 700
    kept = {}
    for nblocks in (1, 6):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        assert strata_counts(ds, "source") == \
            {"en": 3000, "fr": 400, "sw": 80}
        out = temperature_mix(ds, budget_docs=budget) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        kept[nblocks] = out
    # identical rows kept at any block count (hash-derived, retry-safe)
    assert kept[1].equals(kept[6])
    out = kept[1]
    # total lands near the budget; tempered shares beat natural ones
    assert abs(len(out) - budget) < 0.15 * budget
    rates = temperature_mix_rates(
        {"en": 3000, "fr": 400, "sw": 80}, budget)
    assert (out.source == "sw").sum() <= 80
    assert rates["sw"] > rates["en"]
    sw_share = (out.source == "sw").mean()
    assert sw_share > 80 / 3480  # upweighted vs natural share


def test_compression_signals():
    import zlib
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.text import compression_signals
    rng = np.random.default_rng(2)
    rand = "".join(chr(c) for c in rng.integers(33, 127, 4000))
    words = ("data pipeline batch stream shuffle block arrow schema "
             "quality filter corpus token model train sample merge "
             "exact oracle graph rank weight count window line page "
             "the a of and to with for from into over").split()
    prose = " ".join(rng.choice(words, 700))      # varied prose-like
    texts = ["spam " * 800,                       # hyper-repetitive
             rand,                                 # incompressible
             prose,
             ""]
    tbl = pa.table({"doc_id": pa.array(np.arange(4), type=pa.int64()),
                    "text": pa.array(texts)})
    out = compression_signals(ray.data.from_arrow(tbl)
                              .repartition(2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # exact against direct zlib calls (fixed in-container build)
    for i, t in enumerate(texts):
        b = t.encode()
        assert out.raw_len[i] == len(b)
        assert out.zlib_len[i] == len(zlib.compress(b, 6))
        assert out.compress_pm[i] == \
            ((1000 * out.zlib_len[i]) // max(len(b), 1)
             if b else 1000)
    # the signal separates the three regimes
    assert out.compress_pm[0] < 50          # boilerplate crushes
    assert out.compress_pm[1] > 700         # gibberish doesn't
    assert 50 < out.compress_pm[2] < 700    # prose in between


def _c4_brute(texts, min_wpl=5, min_lines=3):
    import re
    out = []
    for t in texts:
        lines = t.split("\n")
        kept = [x for x in lines
                if x.endswith((".", "!", "?", '"'))
                and len([w for w in re.split(r"\s+", x) if w]) >= min_wpl
                and "javascript" not in x.lower()]
        keep = (len(kept) >= min_lines
                and "lorem ipsum" not in t.lower() and "{" not in t)
        out.append(("\n".join(kept), len(kept), len(lines) - len(kept),
                    keep))
    return out


def test_c4_filters_match_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.text import c4_filters
    texts = [
        "A good first sentence here today.\nshort one.\n"
        "Another full sentence with plenty of words!\n"
        "Is this a well formed question with words?\n"
        "no terminal punctuation on this line at all",
        "Enable JavaScript to view this page now.\n"
        "A fine sentence that should survive the filter.\n"
        "Second fine sentence that should also survive now.\n"
        "Third fine sentence rounding out the page total.",  # no punct? ends '.', survives
        "This page contains lorem ipsum filler content sadly.\n"
        "Sentence two is perfectly reasonable and long enough.\n"
        "Sentence three is perfectly reasonable and long enough.\n"
        "Sentence four is perfectly reasonable and long enough.",
        "A curly brace { lives on this page somewhere.\n"
        "Sentence two is perfectly reasonable and long enough.\n"
        "Sentence three is perfectly reasonable and long enough.\n"
        "Sentence four is perfectly reasonable and long enough.",
        "",
        'He said "stop right there" and then "fine."\n'
        "Quoted line endings also count as terminal marks he said.\"\n"
        "Sentence three is perfectly reasonable and long enough.\n"
        "Sentence four is perfectly reasonable and long enough.",
    ]
    ref = _c4_brute(texts)
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts)})
    for nblocks in (1, 3):
        out = c4_filters(ray.data.from_arrow(tbl)
                         .repartition(nblocks)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        got = [(r.text, int(r.n_kept_lines), int(r.n_dropped_lines),
                bool(r.c4_keep)) for r in out.itertuples()]
        assert got == ref, f"nblocks={nblocks}"
    keeps = [r[-1] for r in ref]
    # doc 0 survives; javascript line dropped but page 1 survives;
    # lorem-ipsum and curly-brace pages die; empty dies; quotes count
    assert keeps == [True, True, False, False, False, True]


def _gopher_brute(texts, min_words=50, max_words=100_000):
    import re
    out = []
    for t in texts:
        words = [w for w in re.split(r"\s+", t) if w]
        nw, nc = len(words), sum(len(w) for w in words)
        na = sum(1 for w in words if re.search("[a-zA-Z]", w))
        ns = len({w.lower() for w in words}
                 & {"the", "be", "to", "of", "and", "that", "have",
                    "with"})
        lines = t.split("\n")
        nl = len(lines)
        nb = sum(1 for x in lines
                 if x.startswith(("- ", "• ", "* ")))
        ne = sum(1 for x in lines if x.endswith(("...", "…")))
        nsym = t.count("#") + t.count("...") + t.count("…")
        ok = (min_words <= nw <= max_words and 3 * nw <= nc <= 10 * nw
              and 10 * nsym <= nw and 10 * nb <= nl
              and 10 * ne <= 3 * nl and 10 * na >= 8 * nw and ns >= 2)
        out.append((nw, nc, na, ns, nl, nb, ne, nsym, ok))
    return out


def test_gopher_quality_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.text import gopher_quality
    rng = np.random.default_rng(3)
    vocab = ["the", "analysis", "of", "data", "quality", "and",
             "robust", "filtering", "12345", "#tag"]
    texts = []
    for i in range(30):
        body_words = rng.choice(vocab, 60).tolist()
        lines = [" ".join(body_words[j:j + 12]) for j in range(0, 60, 12)]
        if i % 3 == 0:
            lines.insert(0, "- a bullet item heads this doc")
        if i % 4 == 0:
            lines.append("trailing teaser line...")
        if i % 5 == 0:
            lines.append("#" * 10 + " symbol wall " + "..." * 8)
        texts.append("\n".join(lines))
    texts += ["too short", "", "• b\n• c\n• d",
              "the be to of and that have with " * 10,   # stop-rich
              ("zq9 " * 80).strip()]                      # no alpha≥80%? alpha yes but no stopwords
    ref = _gopher_brute(texts)
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts)})
    for nblocks in (1, 3):
        out = gopher_quality(ray.data.from_arrow(tbl)
                             .repartition(nblocks)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        got = list(zip(out.n_words, out.n_chars, out.n_alpha_words,
                       out.n_stopword_types, out.n_lines,
                       out.n_bullet_lines, out.n_ellipsis_lines,
                       out.n_symbols, out.gopher_pass))
        assert [tuple(map(lambda v: v if isinstance(v, bool)
                          else int(v), g)) for g in
                [tuple(x) for x in got]] == \
            [tuple(list(map(int, r[:-1])) + [r[-1]]) for r in ref], \
            f"nblocks={nblocks}"
    # at least one passing and one failing doc in the fixture
    passes = [r[-1] for r in ref]
    assert any(passes) and not all(passes)


def _dsir_brute(target_texts, raw_texts, scale=1_000_000):
    """Reference: word counts by CONTENT, add-one ratio weights over
    the target vocabulary, per-doc occurrence-weighted sums."""
    import re
    from collections import Counter

    def toks(t):
        return [w for w in re.split(r"\s+", t.lower()) if w]

    tc = Counter(w for t in target_texts for w in toks(t))
    rc = Counter(w for t in raw_texts for w in toks(t) if w in tc)
    wt = {w: ((c + 1) * scale) // (rc.get(w, 0) + 1)
          for w, c in tc.items()}
    return [sum(wt.get(w, 0) for w in toks(t)) for t in raw_texts]


def test_dsir_scores_match_bruteforce_block_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.text import dsir_scores, dsir_weights
    rng = np.random.default_rng(17)
    domain = ["tensor", "gradient", "attention", "layer"]
    generic = ["the", "a", "of", "and", "to", "in", "report", "sales"]
    target_texts = [" ".join(rng.choice(domain + generic[:2], 20))
                    for _ in range(6)]
    raw_texts = [" ".join(rng.choice(
        domain + generic, 30,
        p=[.02] * 4 + [.115] * 8)) for _ in range(50)]
    raw_texts += ["", "   ", "UNSEEN words only here"]
    ref = _dsir_brute(target_texts, raw_texts)
    t_tbl = pa.table({"text": pa.array(target_texts)})
    r_tbl = pa.table({"doc_id": pa.array(np.arange(len(raw_texts)),
                                         type=pa.int64()),
                      "text": pa.array(raw_texts)})
    for nblocks in (1, 4):
        t_ds = ray.data.from_arrow(t_tbl).repartition(nblocks)
        r_ds = ray.data.from_arrow(r_tbl).repartition(nblocks)
        h, w = dsir_weights(t_ds, r_ds)
        out = dsir_scores(r_ds, h, w).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.dsir_score_fp.tolist() == ref, f"nblocks={nblocks}"
    # semantics: domain-dense docs outscore generic ones, no-overlap
    # and empty docs score exactly 0
    dom_share = np.array([sum(t.count(d) for d in domain)
                          for t in raw_texts[:50]])
    hi, lo = dom_share.argmax(), dom_share.argmin()
    assert ref[hi] > ref[lo]
    assert ref[50] == ref[51] == ref[52] == 0


def _substring_dedup_brute(texts, k, min_count=2):
    """Byte-level reference: enumerate stride-1 k-byte windows (short
    docs = one whole-doc window), count content occurrences, keeper =
    min doc id, mask the union of flagged windows in non-keeper docs."""
    from collections import defaultdict
    occ = defaultdict(list)  # content -> [(doc, pos, length)]
    for doc, t in enumerate(texts):
        b = t.encode()
        wins = [(i, k) for i in range(len(b) - k + 1)] if len(b) >= k \
            else [(0, len(b))]
        for i, ln in wins:
            occ[bytes(b[i:i + ln])].append((doc, i, ln))
    out = []
    for doc, t in enumerate(texts):
        b = bytearray(t.encode())
        mask = [False] * len(b)
        n_dup = 0
        wins = [(i, k) for i in range(len(b) - k + 1)] if len(b) >= k \
            else [(0, len(b))]
        for i, ln in wins:
            lst = occ[bytes(b[i:i + ln])]
            if len(lst) >= min_count and min(d for d, _, _ in lst) != doc:
                n_dup += 1
                for j in range(i, i + ln):
                    mask[j] = True
        kept = bytes(c for c, m in zip(b, mask) if not m)
        out.append((kept.decode(errors="surrogateescape"), n_dup,
                    sum(mask)))
    return out


def test_dedup_substrings_matches_bruteforce_block_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.text import dedup_substrings
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    boiler = "SUBSCRIBE TO OUR NEWSLETTER TODAY FOR MORE! "
    texts = []
    for i in range(40):
        body = " ".join(rng.choice(words, 12))
        if i % 3 == 0:
            body = boiler + body          # planted repeated prefix
        if i % 7 == 0:
            body = body + " " + boiler    # and as a suffix elsewhere
        texts.append(body)
    texts += ["tiny", "tiny", "tiny"]     # short-doc whole-unit dedup
    texts += [""]                          # empty doc survives
    k = 16
    ref = _substring_dedup_brute(texts, k)
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts)})
    for nblocks in (1, 4):
        out = dedup_substrings(ray.data.from_arrow(tbl)
                               .repartition(nblocks), k=k) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        got = list(zip(out.text, out.n_dup_windows.astype(int),
                       out.n_masked_chars.astype(int)))
        assert got == ref, f"nblocks={nblocks}"
    # semantics spot checks: keeper (doc 0) keeps its boilerplate,
    # later carriers lose it, short-doc keeper survives, dups empty out
    assert boiler in out.text[0]
    assert boiler not in out.text[3] and out.n_masked_chars[3] > 0
    assert out.text[40] == "tiny" and out.text[41] == ""
    assert out.text[43] == ""  # empty doc passes through


def test_dedup_substrings_multibyte_utf8_bytes_semantics():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.text import dedup_substrings
    # repeated content containing multi-byte codepoints: byte-grid
    # windows still line up because the repeat is byte-identical
    chunk = "naïve café résumé — déjà vu! "
    texts = [chunk * 3 + "unique tail one",
             chunk * 3 + "different ending two",
             "completely unrelated text body"]
    tbl = pa.table({"doc_id": pa.array(np.arange(3), type=pa.int64()),
                    "text": pa.array(texts)})
    out = dedup_substrings(ray.data.from_arrow(tbl), k=12) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = _substring_dedup_brute(texts, 12)
    got = list(zip(out.text, out.n_dup_windows.astype(int),
                   out.n_masked_chars.astype(int)))
    assert got == ref
    assert chunk in out.text[0]          # keeper intact
    assert chunk not in out.text[1]      # repeat cut from doc 1
    assert out.n_masked_chars[2] == 0    # unrelated doc untouched


def test_rolling_hash_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    from bigdime_ray.functions.hashing import mix64
    from bigdime_ray.pipelines.text import rolling_hashes

    def brute(s, k):
        B = 1099511628211
        bs = s.encode()
        rng = [(0, len(bs))] if len(bs) < k \
            else [(i, i + k) for i in range(len(bs) - k + 1)]
        out = []
        for i, j in rng:
            h = 0
            for c in bs[i:j]:
                h = (h * B + c) % (1 << 64)
            out.append(h)
        return out

    texts = ["hello world this is a doc", "short", "",
             "日本語テキストのテスト入り"]
    h, off = rolling_hashes(pa.array(texts), k=8)
    for r, t in enumerate(texts):
        if not t:
            continue
        exp = np.array([int(mix64(np.asarray([x], dtype=np.uint64))[0])
                        for x in brute(t, 8)], dtype=np.uint64)
        assert np.array_equal(h[off[r]:off[r + 1]], exp), r


def test_winnow_fingerprints_shift_invariant():
    import pyarrow as pa
    from bigdime_ray.pipelines.text import winnow_fingerprints
    a = ("the quick brown fox jumps over the lazy dog "
         "in the warm summer sun")
    shifted = "PREFIX " + a + " SUFFIX"
    other = "completely different words entirely"
    f, fo = winnow_fingerprints(pa.array([a, shifted, other]),
                                k=8, window=4)
    fa = set(f[fo[0]:fo[1]].tolist())
    fb = set(f[fo[1]:fo[2]].tolist())
    fc = set(f[fo[2]:fo[3]].tolist())
    assert len(fa & fb) / len(fa) > 0.6  # shared substring survives shift
    assert not (fa & fc)


def test_add_rolling_fingerprints_stage():
    import pyarrow as pa
    import ray.data
    from bigdime_ray.pipelines.text import add_rolling_fingerprints
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["a b c d e f g h i j k l m n", "zz"])}))
    out = add_rolling_fingerprints(ds).to_pandas()
    assert (out.n_fingerprints >= 1).all()
    assert len(out.fingerprints.iloc[0]) == out.n_fingerprints.iloc[0]


def test_redact_text_matches_python_re():
    import re
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.text import redact_text
    docs = [
        "contact me at bob.smith+x@example.co.uk or 415-555-0199 now",
        "ssn 123-45-6789 twice 123-45-6789",
        "no pii here at all",
        "",
        "edge key123 and plain key hash words",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs, type=pa.string())})
    pats = {"keyish": r"\b(key|hash)\b", "digits": r"\d{3,}"}
    out = (redact_text(rd.from_arrow(t), patterns=pats)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, s in enumerate(docs):
        n = sum(len(re.findall(p, s)) for p in pats.values())
        red = s
        for name in sorted(pats):
            red = re.sub(pats[name], "[REDACTED]", red)
        assert out.loc[i, "n_redactions"] == n
        assert out.loc[i, "text"] == red
    assert out.n_redactions.sum() > 0


def test_redact_default_patterns():
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.text import redact_text
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": pa.array(
                      ["mail a@b.io phone +1 (415) 555-0199 ssn "
                       "123-45-6789"], type=pa.string())})
    out = redact_text(rd.from_arrow(t)).to_pandas()
    assert out.loc[0, "n_redactions"] >= 3
    assert "a@b.io" not in out.loc[0, "text"]
    assert "555-0199" not in out.loc[0, "text"]


def test_tf_idf_matches_brute_force():
    """tf_idf == per-doc brute force with the same tokenizer: tf counts,
    df counts, ln score, min_df filtering; empty docs contribute no
    rows."""
    import math
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data as rd
    from bigdime_ray.pipelines.text import tf_idf
    docs = {
        0: "the cat sat on the   mat",
        1: "the dog sat",
        2: "  ",                       # whitespace-only → no tokens
        3: "cat cat cat unique",
        4: "The Mat and the Dog",      # case folding
    }
    df_in = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (tf_idf(rd.from_pandas(df_in).repartition(3), min_df=2)
           .to_pandas().sort_values(["doc_id", "word"])
           .reset_index(drop=True))

    toks = {i: [w for w in t.lower().split() if w] for i, t in docs.items()}
    n_docs = len(docs)
    dfc = Counter()
    for ws in toks.values():
        dfc.update(set(ws))
    expect = []
    for i, ws in toks.items():
        for w, tf in sorted(Counter(ws).items()):
            if dfc[w] < 2:
                continue
            score = tf * math.log(n_docs / dfc[w])
            expect.append((i, w, tf, dfc[w],
                           int(math.floor(score * 1_000_000 + 0.5))))
    exp = pd.DataFrame(expect, columns=["doc_id", "word", "tf", "df",
                                        "score_s"])
    assert got.values.tolist() == exp.values.tolist()
    assert 2 not in set(got.doc_id)          # empty doc → no rows
    assert "unique" not in set(got.word)     # min_df=2 filtered


def test_extract_int_field_matches_python_re():
    import re
    from bigdime_ray.pipelines.text import extract_int_field
    props = ['{"k": 69}', '{"k":-7}', "not json", '{"j": 4}',
             '{"k": 123456}', ""]
    ds = ray.data.from_arrow(pa.table({"props": props})).repartition(2)
    out = (extract_int_field(ds, "props", r'"k":\s*(?P<v>-?\d+)')
           .take_all())
    rx = re.compile(r'"k":\s*(-?\d+)')
    expect = {p: (int(m.group(1)) if (m := rx.search(p)) else None)
              for p in props}
    assert len(out) == len(props)
    for row in out:
        v = row["val"]
        assert (None if v is None else int(v)) == expect[row["props"]], \
            row["props"]


def test_word_bigram_counts_matches_brute_force():
    """Bigram counts == python brute force; bigrams never cross doc
    boundaries; empty tokens from odd whitespace are skipped (the
    removal-induced adjacency matches the SQL's WHERE w <> '')."""
    from collections import Counter
    from bigdime_ray.pipelines.text import word_bigram_counts
    texts = ["a b c a b", "b  c\tb c", "  a b  ", "x", "", "c a b"]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(3)
    got = {(r["w1"], r["w2"]): r["cnt"]
           for r in word_bigram_counts(ds).take_all()}
    want = Counter()
    for t in texts:
        w = t.lower().split()
        for i in range(len(w) - 1):
            want[(w[i], w[i + 1])] += 1
    assert got == dict(want)
    # min_count filter
    got2 = {(r["w1"], r["w2"]): r["cnt"]
            for r in word_bigram_counts(ds, min_count=2).take_all()}
    assert got2 == {k: v for k, v in want.items() if v >= 2}


def test_repetition_scores_matches_brute_force():
    from bigdime_ray.pipelines.text import repetition_scores
    texts = {
        1: "a b c a b c a b c",          # heavy repetition
        2: "w x y z q r s",              # all distinct
        3: "a a a a a",                  # one distinct trigram
        4: "p q",                        # < 3 words → no row
        5: "",                           # empty → no row
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), type=pa.int64()),
        "text": pa.array(list(texts.values()))})).repartition(2)
    rows = {r["doc_id"]: r for r in repetition_scores(ds, n=3).take_all()}
    assert set(rows) == {1, 2, 3}
    for did, row in rows.items():
        w = texts[did].lower().split()
        grams = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]
        assert row["n_grams"] == len(grams)
        assert row["n_distinct"] == len(set(grams))
        assert row["rep_ppm"] == \
            (len(grams) - len(set(grams))) * 1_000_000 // len(grams)
    assert rows[3]["rep_ppm"] == 2 * 1_000_000 // 3
    assert rows[2]["rep_ppm"] == 0


def test_vocabulary_jaccard_matches_brute_force():
    from bigdime_ray.pipelines.text import vocabulary_jaccard
    docs = [("s1", "a b c d"), ("s1", "c d e"), ("s2", "c d x"),
            ("s2", "y z"), ("s3", "q r"), ("s3", "a  q")]
    ds = ray.data.from_arrow(pa.table({
        "source": pa.array([d[0] for d in docs]),
        "text": pa.array([d[1] for d in docs])})).repartition(3)
    t = vocabulary_jaccard(ds).to_pandas()
    vocab = {}
    for s, txt in docs:
        vocab.setdefault(s, set()).update(txt.split())
    got = {(r.source_a, r.source_b): (r.inter, r.uni, r.jaccard_ppm)
           for r in t.itertuples()}
    names = sorted(vocab)
    want = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = vocab[names[i]], vocab[names[j]]
            ix = len(a & b)
            if ix:
                u = len(a | b)
                want[(names[i], names[j])] = (ix, u, ix * 10**6 // u)
    assert got == want
    assert ("s2", "s3") not in got  # disjoint vocabularies → omitted


def test_bigram_lm_scores_matches_brute_force():
    """LM scores == python brute force (corpus ML bigram probs,
    per-term fixed-point ln); short docs emit no row; repetitive text
    scores higher (closer to 0) than unique text."""
    import math
    from collections import Counter
    from bigdime_ray.pipelines.text import bigram_lm_scores
    texts = {1: "a b a b a b a b", 2: "q w e r t y u i",
             3: "a b c a b", 4: "solo", 5: ""}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), type=pa.int64()),
        "text": pa.array(list(texts.values()))})).repartition(2)
    got = {r["doc_id"]: r for r in bigram_lm_scores(ds).take_all()}
    bg = Counter()
    for t in texts.values():
        w = t.split()
        for i in range(len(w) - 1):
            bg[(w[i], w[i + 1])] += 1
    c1 = Counter()
    for (w1, _), c in bg.items():
        c1[w1] += c
    want = {}
    for did, t in texts.items():
        w = t.split()
        if len(w) < 2:
            continue
        terms = [math.floor(math.log(bg[(w[i], w[i + 1])]
                                     / c1[w[i]]) * 1_000_000 + 0.5)
                 for i in range(len(w) - 1)]
        want[did] = (len(terms), sum(terms))
    assert set(got) == set(want)
    for did, (n, s) in want.items():
        assert got[did]["n_bigrams"] == n and \
            got[did]["logprob_micro"] == s, did
    # all-unique-bigram docs have deterministic continuations → P=1
    # per term → logprob exactly 0 (a useful sanity anchor)
    assert got[2]["logprob_micro"] == 0


def _ref_bpe(texts, k, min_count=2):
    """Independent sequential byte-BPE reference (greedy left-to-right
    apply, ties to smallest packed key)."""
    from collections import Counter

    def apply(seq, a, b, nid):
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(nid)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    seqs = [list(t.encode()) for t in texts]
    merges, nid = [], 256
    for _ in range(k):
        c = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += 1
        if not c or max(c.values()) < min_count:
            break
        best_n = max(c.values())
        best = min(((a << 32) | b) for (a, b), n in c.items()
                   if n == best_n)
        a, b = best >> 32, best & 0xFFFFFFFF
        merges.append((a, b, nid))
        seqs = [apply(s, a, b, nid) for s in seqs]
        nid += 1
    return merges, seqs


def test_bpe_train_matches_sequential_reference():
    """Distributed BPE == the sequential reference: identical merge
    sequence (incl. deterministic tie-breaks and the overlapping
    equal-symbol run case) and identical encodings."""
    from bigdime_ray.pipelines.tokenize import (bpe_encode_texts,
                                                bpe_train)
    texts = ["the cat sat on the mat", "the bat and the rat",
             "aaaaaa b aaaa", "banana bandana", "", "xy"]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(3)
    got = bpe_train(ds, num_merges=12)
    want_merges, want_seqs = _ref_bpe(texts, 12)
    assert got == want_merges
    enc = bpe_encode_texts(texts, got)
    assert enc == want_seqs
    # merges actually compress
    assert sum(len(s) for s in want_seqs) < sum(len(t.encode())
                                                for t in texts)


def test_ngram_decontaminate_matches_brute_force():
    """Distributed searchsorted membership == per-doc Python-set brute
    force, including boundary cases: docs shorter than n (absent from
    output), empty eval set, multi-space whitespace, case folding."""
    from bigdime_ray.pipelines.text import ngram_decontaminate
    train = ["the cat sat on the mat today",
             "an unrelated document entirely here",
             "THE CAT SAT somewhere else",   # case-folds into overlap
             "tiny doc",                      # < n words → no n-grams
             "the  cat   sat on nothing"]     # multi-space splitting
    evals = ["we saw the cat sat on a wall", "other eval text here"]
    n = 3

    def grams(t):
        ws = [w for w in t.lower().split() if w]
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]

    ev = set()
    for t in evals:
        ev.update(grams(t))
    expect = {}
    for i, t in enumerate(train):
        g = grams(t)
        if g:
            expect[f"d{i}"] = (len(g), sum(x in ev for x in g))

    tr_ds = ray.data.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(train))],
        "text": train})).repartition(2)
    ev_ds = ray.data.from_arrow(pa.table({
        "doc_id": ["e0", "e1"], "text": evals}))
    out = ngram_decontaminate(tr_ds, ev_ds, n=n).to_pandas()
    got = {r.doc_id: (r.n_grams, r.n_hits) for r in out.itertuples()}
    assert got == expect
    assert got["d0"][1] > 0          # real overlap planted
    assert got["d2"][1] > 0          # via lowercasing
    assert "d3" not in got           # shorter than n

    # empty eval side → zero hits everywhere, same n_grams
    empty_ev = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string())}))
    out0 = ngram_decontaminate(tr_ds, empty_ev, n=n).to_pandas()
    assert (out0.n_hits == 0).all()
    assert dict(zip(out0.doc_id, out0.n_grams)) == \
        {k: v[0] for k, v in expect.items()}


def test_bpe_encode_distributed_matches_driver_helper():
    """bpe_encode (distributed streaming map, merges broadcast once)
    must produce exactly bpe_encode_texts' sequences for every row at
    any block count, and tokenization must shorten merged sequences."""
    import ray.data as rd
    from bigdime_ray.pipelines.tokenize import (bpe_encode,
                                                bpe_encode_texts,
                                                bpe_train)
    texts = ["the cat sat on the mat", "the bat and the rat",
             "aaaa aaaa aaaa", "", "one-off row with punct!?",
             "the the the the the"] * 3
    tbl = pa.table({"doc_id": pa.array([f"d{i:03d}"
                                        for i in range(len(texts))]),
                    "text": pa.array(texts)})
    merges = bpe_train(rd.from_arrow(tbl).repartition(3), num_merges=12)
    assert len(merges) > 0
    want = bpe_encode_texts(texts, merges)
    for nblocks in (1, 4):
        got = bpe_encode(rd.from_arrow(tbl).repartition(nblocks),
                         merges).to_pandas().sort_values("doc_id")
        got_tok = [list(v) for v in got["tokens"]]
        assert got_tok == want
    # merges actually compress: total tokens < total bytes
    assert sum(map(len, want)) < sum(len(t.encode()) for t in texts)


# ---------------------------------------------- paragraph-level dedup

def _para_docs():
    import pyarrow as _pa
    import ray.data as _rd
    docs = [
        (0, "boiler\nalpha unique zero\nfooter"),
        (1, "boiler\nbeta unique one\nfooter"),
        (2, "boiler\ngamma unique two"),
        (3, "solo document three"),
        (4, "boiler"),                    # fully boilerplate doc
    ]
    return _rd.from_arrow(_pa.table({
        "doc_id": _pa.array([d for d, _ in docs], type=_pa.int64()),
        "text": _pa.array([t for _, t in docs]),
    }))


def test_dedup_paragraphs_keep_first():
    from bigdime_ray.pipelines.text import dedup_paragraphs
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(_para_docs()).take_all()}
    # doc 0 is the keeper of both "boiler" and "footer"
    assert out[0]["text"] == "boiler\nalpha unique zero\nfooter"
    assert out[0]["n_dropped"] == 0
    assert out[1]["text"] == "beta unique one"
    assert out[1]["n_dropped"] == 2
    assert out[2]["text"] == "gamma unique two"
    assert out[3]["text"] == "solo document three"
    assert out[4]["text"] == "" and out[4]["n_dropped"] == 1


def test_dedup_paragraphs_keep_none_and_min_count():
    from bigdime_ray.pipelines.text import dedup_paragraphs
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(_para_docs(), keep="none").take_all()}
    assert out[0]["text"] == "alpha unique zero"  # keeper loses too
    assert out[0]["n_dropped"] == 2
    # min_count=4: only "boiler" (4 occurrences) qualifies
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(_para_docs(), min_count=4).take_all()}
    assert out[1]["text"] == "beta unique one\nfooter"
    assert out[0]["n_dropped"] == 0  # keeper keeps everything


def test_dedup_paragraphs_block_invariant():
    import pyarrow as _pa
    import ray.data as _rd
    from bigdime_ray.pipelines.text import dedup_paragraphs
    rng = np.random.default_rng(7)
    words = np.array(["aa", "bb", "cc", "dd", "ee"])
    texts = ["\n".join(" ".join(rng.choice(words, 3))
                       for _ in range(rng.integers(1, 6)))
             for _ in range(60)]
    t = _pa.table({"doc_id": _pa.array(range(60), type=_pa.int64()),
                   "text": _pa.array(texts)})

    def run(nblocks):
        ds = _rd.from_arrow(t).repartition(nblocks)
        rows = dedup_paragraphs(ds).take_all()
        return sorted((r["doc_id"], r["text"], r["n_dropped"])
                      for r in rows)

    assert run(1) == run(4)
