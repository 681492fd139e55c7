"""WARC container source (sources/warc.py)."""
from __future__ import annotations

import gzip
import os

import pyarrow as pa
import pytest
import ray.data

from bigdime_ray.sources.warc import (build_warc_record, parse_warc_bytes,
                                      read_warc, strip_http_headers,
                                      warc_text_documents,
                                      wrap_http_response, write_warc,
                                      write_warc_dataset)


def _recs(n=4):
    return [build_warc_record(
        wrap_http_response(f"<p>doc {i}</p>".encode()),
        target_uri=f"https://x/d/{i}") for i in range(n)]


def test_record_round_trip(tmp_path):
    p = str(tmp_path / "a.warc")
    write_warc(p, _recs())
    with open(p, "rb") as f:
        out = parse_warc_bytes(f.read(), p)
    assert [r["target_uri"] for r in out] == [f"https://x/d/{i}"
                                              for i in range(4)]
    assert out[2]["payload"] == wrap_http_response(b"<p>doc 2</p>")
    assert out[0]["warc_type"] == "response"
    assert out[0]["record_id"].startswith("<urn:sha1:")
    assert all(r["payload_len"] == len(r["payload"]) for r in out)


def test_gzip_members_and_whole_file(tmp_path):
    # per-record members (CommonCrawl layout)
    p1 = str(tmp_path / "a.warc.gz")
    write_warc(p1, _recs())
    with open(p1, "rb") as f:
        data = f.read()
    assert data.count(b"\x1f\x8b\x08") >= 4  # several members
    assert len(parse_warc_bytes(data, p1)) == 4
    # one member for the whole file also parses (boundary-agnostic)
    whole = gzip.compress(b"".join(_recs()), mtime=0)
    assert len(parse_warc_bytes(whole)) == 4


def test_deterministic_bytes(tmp_path):
    p1, p2 = str(tmp_path / "x.warc.gz"), str(tmp_path / "y.warc.gz")
    write_warc(p1, _recs())
    write_warc(p2, _recs())
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_malformed_framing_raises():
    with pytest.raises(ValueError, match="expected WARC version"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    rec = _recs(1)[0]
    with pytest.raises(ValueError, match="truncated payload"):
        parse_warc_bytes(rec[:-10])
    bad = rec.replace(b"Content-Length: ", b"Content-Length: x")
    with pytest.raises(ValueError, match="bad Content-Length"):
        parse_warc_bytes(bad)


def test_strip_http_headers_edges():
    payloads = pa.array([
        wrap_http_response(b"body-a"),
        wrap_http_response(b"", status=404, reason="NF"),
        b"no terminator",
        b"NOT-HTTP\r\n\r\ntail",        # CRLF2 but no HTTP prefix
        b"",
        wrap_http_response(b"\x00\xff binary ok"),
    ], type=pa.large_binary())
    st, body = strip_http_headers(payloads)
    assert st.to_pylist() == [200, 404, 0, 0, 0, 200]
    got = [bytes(b) if b is not None else b"" for b in body.to_pylist()]
    assert got[0] == b"body-a" and got[1] == b""
    assert got[2] == b"no terminator"
    assert got[3] == b"NOT-HTTP\r\n\r\ntail"  # kept whole: not HTTP
    assert got[5] == b"\x00\xff binary ok"
    # sliced input (non-zero Arrow offset) must behave identically
    st2, body2 = strip_http_headers(payloads.slice(1, 3))
    assert st2.to_pylist() == [404, 0, 0]


def test_read_warc_distributed(tmp_path):
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc")
    write_warc(p1, _recs(3))
    write_warc(p2, [build_warc_record(b"meta", warc_type="warcinfo")] +
               _recs(2))
    rows = read_warc([p1, p2]).take_all()
    assert len(rows) == 6
    rows = read_warc([p1, p2], warc_type="response").take_all()
    assert len(rows) == 5
    assert {os.path.basename(r["path"]) for r in rows} == \
        {"a.warc.gz", "b.warc"}


def test_write_dataset_and_ingest_round_trip(tmp_path):
    ids = list(range(30))
    ds = ray.data.from_arrow(pa.table({
        "target_uri": [f"https://x/d/{i}" for i in ids],
        "html": [f"<h1>t{i}</h1><p>alpha &amp; beta {i}</p>"
                 for i in ids],
    }))
    out_dir = str(tmp_path / "warcs")
    paths = write_warc_dataset(ds, out_dir, gzip_per_record=True)
    assert paths and all(p.endswith(".warc.gz") for p in paths)
    got = {r["target_uri"]: r
           for r in warc_text_documents(paths).take_all()}
    assert len(got) == 30
    for i in ids:
        r = got[f"https://x/d/{i}"]
        assert r["status"] == 200
        assert r["text"] == f"t{i} alpha & beta {i}"


def test_error_policies(tmp_path):
    good = str(tmp_path / "good.warc")
    bad = str(tmp_path / "bad.warc")
    write_warc(good, _recs(3))
    blob = b"".join(_recs(2))
    with open(bad, "wb") as f:
        f.write(blob[:-25])  # truncate inside the 2nd record's payload
    import pytest as _pt
    with _pt.raises(Exception):
        read_warc([good, bad]).take_all()
    rows = read_warc([good, bad], errors="salvage").take_all()
    assert len(rows) == 4  # 3 good + the salvaged 1st record of bad
    assert all(r["error"] == "" for r in rows)
    rows = read_warc([good, bad], errors="mark").take_all()
    marks = [r for r in rows if r["warc_type"] == "_error"]
    assert len(rows) == 5 and len(marks) == 1
    assert "truncated payload" in marks[0]["error"]
    assert marks[0]["path"].endswith("bad.warc")
    # a file that is neither gzip nor WARC: zero salvage, one mark row
    junk = str(tmp_path / "junk.warc")
    with open(junk, "wb") as f:
        f.write(b"\xff\xffnot a warc at all")
    rows = read_warc([junk], errors="mark").take_all()
    assert len(rows) == 1 and rows[0]["warc_type"] == "_error"
    assert "expected WARC version" in rows[0]["error"]
    # deflate damage mid-member: the valid prefix records survive
    gz = str(tmp_path / "g.warc.gz")
    write_warc(gz, _recs(3))
    with open(gz, "rb") as f:
        data = f.read()
    cut = data.rindex(b"\x1f\x8b\x08")        # drop half the last member
    with open(gz, "wb") as f:
        f.write(data[:cut + 10])
    rows = read_warc([gz], errors="mark").take_all()
    marks = [r for r in rows if r["warc_type"] == "_error"]
    assert len(marks) == 1 and len(rows) - len(marks) == 2
