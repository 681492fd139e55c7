"""HTML → text extraction kernels (the web-pipeline front door).

Training-data curation over web scrapes starts by reducing raw HTML to
visible text. This module implements that reduction with PURE VECTORIZED
Arrow kernels — ``pc.replace_substring_regex`` / ``pc.count_substring_regex``
are RE2 compiled once per pattern per batch, so the stage is a stateless
zero-shuffle map that streams at any scale (same discipline as
``pipelines/text.py::redact_text``).

The extraction contract (applied in this exact order — order is load-bearing
and oracle-checked against an independent DuckDB RE2 implementation in
``__ray_entry__.py::documents_html_extracted``):

1. remove ``<script>…</script>`` and ``<style>…</style>`` blocks wholesale
   (their character data is code, not text);
2. remove HTML comments ``<!-- … -->``;
3. replace every remaining tag ``<…>`` with a single space (block-level
   separation: ``</h1><p>`` must not weld the neighbouring words);
4. decode the common character entities, ``&amp;`` LAST (decoding it first
   would double-decode ``&amp;lt;`` — the classic ordering bug). Entities
   are decoded AFTER tag-stripping so literal ``&lt;end&gt;`` text can
   never be re-interpreted as markup;
5. collapse every whitespace run to one space and trim.

Known (documented) limitation of the regex approach: a literal ``>``
inside a quoted attribute value terminates the tag early. Real-world
extractors accept this; the alternative is a per-character state machine,
which would put a Python row loop on the hot path.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Block-content patterns removed wholesale (RE2: inline (?is) = dotall +
# case-insensitive; non-greedy body so adjacent blocks don't merge).
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
COMMENT_RE = r"(?s)<!--.*?-->"
TAG_RE = r"<[^>]*>"
WS_RE = r"\s+"

# Decoded in this order; & last (see module docstring).
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def strip_html(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized HTML→text over a string array (contract above)."""
    t = _as_array(col)
    t = pc.replace_substring_regex(t, SCRIPT_RE, " ")
    t = pc.replace_substring_regex(t, STYLE_RE, " ")
    t = pc.replace_substring_regex(t, COMMENT_RE, " ")
    t = pc.replace_substring_regex(t, TAG_RE, " ")
    for ent, ch in ENTITIES:
        t = pc.replace_substring(t, ent, ch)
    t = pc.replace_substring_regex(t, WS_RE, " ")
    return pc.utf8_trim_whitespace(t)


def html_stats(col: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Per-document markup statistics for boilerplate/quality scoring:
    tag count, anchor count, and link density (anchor tags per 1000
    chars of EXTRACTED text — the standard boilerplate signal: nav/footer
    pages are link-dense, content pages are not). One RE2 pass per
    statistic, no row loop."""
    t = _as_array(col)
    n_tags = pc.count_substring_regex(t, r"(?i)<[a-z/!][^>]*>")
    n_links = pc.count_substring_regex(t, r"(?i)<a\b")
    text_len = pc.utf8_length(strip_html(t))
    dens = pc.divide(
        pc.multiply(pc.cast(n_links, pa.float64()), 1000.0),
        pc.cast(pc.max_element_wise(text_len, 1), pa.float64()))
    return pa.table({
        "n_tags": pc.cast(n_tags, pa.int64()),
        "n_links": pc.cast(n_links, pa.int64()),
        "text_len": pc.cast(text_len, pa.int64()),
        "link_density": dens,
    })


def synthesize_html(doc_id: pa.Array | pa.ChunkedArray,
                    text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Deterministic HTML page per (doc_id, text) — the fixture/oracle
    generator. Exercises every extraction rule: head title (kept),
    style + script blocks (dropped, incl. a raw ``<`` and ``&`` inside
    the script), a comment, bold emphasis inside the body text, a
    footer link with ``&amp;``/``&nbsp;`` and a literal ``&lt;end&gt;``
    that must survive as text. Mirrored token-for-token by the DuckDB
    SQL in ``__ray_entry__.py`` so Ray and the oracle build and reduce
    the identical page independently."""
    ids = pc.cast(_as_array(doc_id), pa.string())
    bold = pc.replace_substring(_as_array(text), "table", "<b>table</b>")
    return pc.binary_join_element_wise(
        pa.scalar("<html><head><title>Doc "), ids,
        pa.scalar("</title><style>body { color: #222; }</style>"
                  '<script type="text/javascript">'
                  'if (1 < 2) { alert("x&y"); }</script>'
                  "</head><body><!-- header boilerplate --><h1>Doc "),
        ids,
        pa.scalar("</h1><p>"), bold,
        pa.scalar('</p><div class="footer"><a href="/d/'), ids,
        pa.scalar('">next &amp; prev</a>&nbsp;&lt;end&gt;'
                  "</div></body></html>"),
        pa.scalar(""))


def extract_html(ds, html_col: str = "html", out_col: str = "text",
                 with_stats: bool = False):
    """Dataset stage: add the extracted-text column (and optionally the
    markup statistics) next to the raw HTML column. Stateless
    ``map_batches`` over zero-copy Arrow — no shuffle, no state."""
    def fn(batch: pa.Table) -> pa.Table:
        out = batch
        txt = strip_html(batch[html_col])
        if out_col in out.schema.names:
            idx = out.schema.get_field_index(out_col)
            out = out.set_column(idx, out_col, txt)
        else:
            out = out.append_column(out_col, txt)
        if with_stats:
            st = html_stats(batch[html_col])
            for name in st.schema.names:
                out = out.append_column(name, st[name])
        return out

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------- URL kernels

# RFC 3986 generic-URI split (scheme://authority path ?query) — one RE2
# pass; DuckDB runs the identical pattern so both engines parse the
# same grammar (oracle: documents_url_components).
URL_RE = (r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#]*)"
          r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?")


def parse_url_components(col: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Vectorized URL decomposition: scheme, host (authority), path,
    query (absent → empty string, so downstream group-bys never mix
    null semantics), plus the effective second-level domain
    (``host_sld`` — last two dot-labels of the host, the standard
    per-site aggregation key for crawl curation). Non-URL rows yield
    empty strings throughout."""
    t = _as_array(col)
    m = pc.extract_regex(t, URL_RE)
    valid = pc.is_valid(m)

    def part(name: str) -> pa.Array:
        v = pc.struct_field(m, name)
        return pc.if_else(valid, pc.fill_null(v, ""),
                          pa.scalar("", type=pa.string()))

    host = part("host")
    sld = pc.extract_regex(host, r"(?P<sld>[^.]+\.[^.]+)$")
    sld = pc.if_else(pc.is_valid(sld),
                     pc.fill_null(pc.struct_field(sld, "sld"), ""),
                     host)
    return pa.table({
        "scheme": part("scheme"),
        "host": host,
        "path": part("path"),
        "query": part("query"),
        "host_sld": sld,
    })


_CANON_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
                 r"(?P<host>[^/?#]*)(?P<path>[^?#]*)"
                 r"(?:\?(?P<query>[^#]*))?")
_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def canonicalize_urls(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical URL form for crawl-level dedup/frontier keys — the
    normalization step before URLs become partition or dedup keys:

      - scheme and host lowercased (case-insensitive per RFC 3986)
      - fragment dropped (never reaches the server)
      - default port stripped (``:443`` for https, ``:80`` for http)
      - tracking query parameters removed (``utm_*``, ``fbclid``,
        ``gclid``); an emptied query drops its ``?``
      - empty path normalized to ``/``

    One case-tolerant RE2 decomposition + vectorized piecewise rebuild
    (query params via the flatten/mask/ListArray-rebuild pattern, no
    row loop). Non-URL rows yield ``''`` (the parse_url_components
    convention). Oracle-mirrored token for token by
    ``documents_url_canonical``."""
    import numpy as np
    t = _as_array(col)
    m = pc.extract_regex(t, _CANON_URL_RE)
    valid = pc.is_valid(m)

    def part(name: str) -> pa.Array:
        v = pc.struct_field(m, name)
        return pc.if_else(valid, pc.fill_null(v, ""),
                          pa.scalar("", type=pa.string()))

    scheme = pc.utf8_lower(part("scheme"))
    host = pc.utf8_lower(part("host"))
    host = pc.if_else(pc.equal(scheme, "https"),
                      pc.replace_substring_regex(host, r":443$", ""),
                      host)
    host = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(host, r":80$", ""),
                      host)
    path = part("path")
    path = pc.if_else(pc.and_(valid, pc.equal(path, "")),
                      pa.scalar("/", type=pa.string()), path)

    params = pc.split_pattern(part("query"), "&")
    lens = (pc.fill_null(pc.list_value_length(params), 0)
            .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(params)
    rows = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    keep = pc.and_(
        pc.not_equal(flat, ""),
        pc.invert(pc.match_substring_regex(flat, _TRACKING_PARAM_RE))
    ).to_numpy(zero_copy_only=False)
    n_kept = np.zeros(len(t), dtype=np.int64)
    np.add.at(n_kept, rows, keep.astype(np.int64))
    offs = np.zeros(len(t) + 1, dtype=np.int64)
    np.cumsum(n_kept, out=offs[1:])
    qlist = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), type=pa.int32()),
        flat.filter(pa.array(keep)))
    query = pc.binary_join(qlist, "&")
    qmark = pc.if_else(pc.not_equal(query, ""),
                       pa.scalar("?", type=pa.string()),
                       pa.scalar("", type=pa.string()))

    canon = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, path, qmark, query,
        pa.scalar(""))
    return pc.if_else(valid, canon, pa.scalar("", type=pa.string()))


def filter_urls_by_host(ds, url_col: str, blocked_slds: set[str],
                        keep_non_urls: bool = False):
    """Curation gate: drop rows whose URL's second-level domain is on
    the blocklist. The blocklist is captured in the stage closure (it
    is a policy artifact, small by construction — thousands of
    domains, not millions); matching is one vectorized ``is_in``
    against the parsed ``host_sld``. Zero shuffle."""
    blocked = pa.array(sorted(blocked_slds), type=pa.string())

    def gate(batch: pa.Table) -> pa.Table:
        comps = parse_url_components(batch[url_col])
        is_url = pc.not_equal(comps["scheme"], "")
        hit = pc.is_in(comps["host_sld"], value_set=blocked)
        keep = pc.and_(pc.invert(hit),
                       is_url if not keep_non_urls
                       else pa.array([True] * len(batch)))
        return batch.filter(keep)

    return ds.map_batches(gate, batch_format="pyarrow",
                          zero_copy_batch=True)
