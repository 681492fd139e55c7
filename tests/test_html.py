"""HTML → text extraction (functions/html.py)."""
from __future__ import annotations

import pyarrow as pa
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdime_ray.functions.html import (extract_html, html_stats,
                                        strip_html, synthesize_html)


def _one(s: str) -> str:
    return strip_html(pa.array([s]))[0].as_py()


def test_script_style_comment_removed():
    assert _one("a<script>if(1<2){x()}</script>b") == "a b"
    assert _one("a<SCRIPT type='t'>var x;</SCRIPT>b") == "a b"
    assert _one("a<style>p { color: red }</style>b") == "a b"
    assert _one("a<!-- hidden\nlines -->b") == "a b"


def test_tags_become_separators():
    # </h1><p> must not weld the neighbouring words
    assert _one("<h1>Title</h1><p>body</p>") == "Title body"
    assert _one('<a href="/x">link</a>') == "link"


def test_entity_order():
    # &amp;lt; decodes to the literal text "&lt;" — never to "<"
    assert _one("a&amp;lt;b") == "a&lt;b"
    # literal &lt;end&gt; survives as text because entities decode
    # AFTER tag-stripping
    assert _one("&lt;end&gt;") == "<end>"
    assert _one("x&nbsp;&#39;q&apos;&quot;") == "x 'q'\""


def test_whitespace_collapse_and_trim():
    assert _one("  a \t\n b  ") == "a b"
    assert _one("") == ""
    assert _one("<p></p>") == ""


def test_html_stats_counts():
    st_ = html_stats(pa.array(
        ['<p><a href="/x">one</a> <A>two</A></p>', "plain"]))
    assert st_["n_links"].to_pylist() == [2, 0]
    assert st_["n_tags"].to_pylist()[1] == 0
    assert st_["text_len"].to_pylist() == [len("one two"), len("plain")]


def test_synthesize_round_trip():
    ids = pa.array([3], type=pa.int64())
    out = strip_html(synthesize_html(ids, pa.array(["alpha table beta"])))
    assert out[0].as_py() == ("Doc 3 Doc 3 alpha table beta "
                              "next & prev <end>")


def test_extract_html_dataset_stage():
    ids = pa.array(range(20), type=pa.int64())
    txt = pa.array([f"word{i} table tail" for i in range(20)])
    html = synthesize_html(ids, txt)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "html": html}))
    out = extract_html(ds, html_col="html", out_col="text",
                       with_stats=True).take_all()
    assert len(out) == 20
    for r in out:
        assert r["text"].startswith(f"Doc {r['doc_id']} ")
        assert "<" not in r["text"].replace("<end>", "")
        assert r["n_links"] == 1 and r["n_tags"] > 5


@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
    min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_no_markup_survives_property(texts):
    """Whatever the input, the output never contains a script/style
    body, an intact tag, or a raw newline/tab, and never crashes."""
    out = strip_html(pa.array(
        [f"<script>S{t}S</script><p>{t}</p><style>Y</style>"
         for t in texts]))
    for v in out.to_pylist():
        assert "script>" not in v and "style>" not in v
        assert "\n" not in v and "\t" not in v
        assert v == v.strip()


# ------------------------------------------------------------ URL kernels

def test_parse_url_components():
    from bigdime_ray.functions.html import parse_url_components
    t = parse_url_components(pa.array([
        "https://sub.site.example.org/a/b?x=1&y=2",
        "http://example.com",
        "ftp://files.host.net/pub",
        "not a url",
        "",
    ]))
    assert t["scheme"].to_pylist() == ["https", "http", "ftp", "", ""]
    assert t["host"].to_pylist() == ["sub.site.example.org",
                                     "example.com", "files.host.net",
                                     "", ""]
    assert t["path"].to_pylist() == ["/a/b", "", "/pub", "", ""]
    assert t["query"].to_pylist() == ["x=1&y=2", "", "", "", ""]
    assert t["host_sld"].to_pylist() == ["example.org", "example.com",
                                         "host.net", "", ""]


def test_filter_urls_by_host():
    from bigdime_ray.functions.html import filter_urls_by_host
    ds = ray.data.from_arrow(pa.table({
        "url": ["https://a.spam.com/x", "https://ok.org/y",
                "https://b.spam.com/z", "junk"],
        "v": [1, 2, 3, 4],
    }))
    kept = filter_urls_by_host(ds, "url", {"spam.com"}).take_all()
    assert [r["v"] for r in kept] == [2]  # non-URLs dropped by default
    kept = filter_urls_by_host(ds, "url", {"spam.com"},
                               keep_non_urls=True).take_all()
    assert sorted(r["v"] for r in kept) == [2, 4]


def test_canonicalize_urls():
    import pyarrow as pa
    from bigdime_ray.functions.html import canonicalize_urls
    urls = [
        "HTTPS://WWW.Example.ORG:443/Path/One?utm_source=feed&id=7#frag",
        "http://site.com:80",
        "http://site.com:8080/x",                    # non-default port kept
        "https://a.b/p?utm_campaign=x&fbclid=abc&gclid=1",  # all tracking
        "https://a.b/p?gclid",                       # bare tracking key
        "https://a.b/p?id=1&utm_x=2&z=3",
        "not a url",
        "",
        "ftp://Host.Net/File",
    ]
    got = canonicalize_urls(pa.array(urls)).to_pylist()
    assert got == [
        "https://www.example.org/Path/One?id=7",
        "http://site.com/",
        "http://site.com:8080/x",
        "https://a.b/p",
        "https://a.b/p",
        "https://a.b/p?id=1&z=3",
        "",
        "",
        "ftp://host.net/File",
    ]
    # canonical forms of equivalent URLs collide (the dedup property)
    pair = canonicalize_urls(pa.array(
        ["HTTP://X.com:80/a?utm_source=1&q=2#f",
         "http://x.COM/a?q=2"])).to_pylist()
    assert pair[0] == pair[1] == "http://x.com/a?q=2"
