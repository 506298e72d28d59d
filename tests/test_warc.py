"""WARC source tests: writer/parser round trip, totality on hostile
archives, and the Spark reader's end-to-end shape."""

import pytest

from nreadability_spark.sources.warc import build_warc, build_warc_record, parse_warc

pytestmark = pytest.mark.spark


def test_warc_roundtrip_preserves_records():
    recs = [
        ("http://a.example/1", "<html><body><p>page one</p></body></html>", "r1"),
        ("http://a.example/2", "unicode body: café — ok", "r2"),
        ("http://a.example/3", "", "r3"),
    ]
    parsed = list(parse_warc(build_warc(recs)))
    assert [(r["target_uri"], r["payload"]) for r in parsed] == [
        (u, h) for u, h, _ in recs
    ]
    assert all(r["warc_type"] == "response" for r in parsed)
    assert all(r["http_status"] == 200 for r in parsed)
    assert parsed[0]["content_type"].startswith("text/html")
    assert parsed[1]["record_id"] == "<urn:synth:r2>"


def test_warc_payload_with_embedded_separators():
    """A payload containing WARC/HTTP-looking bytes must not confuse the
    Content-Length-delimited walk."""
    hostile = "WARC/1.0\r\nContent-Length: 999\r\n\r\nHTTP/1.1 500 X\r\n\r\nfake"
    recs = [
        ("http://a.example/h", hostile, "rh"),
        ("http://a.example/after", "clean page after the hostile one", "ra"),
    ]
    parsed = list(parse_warc(build_warc(recs)))
    assert len(parsed) == 2
    assert parsed[0]["payload"] == hostile
    assert parsed[1]["target_uri"] == "http://a.example/after"


def test_warc_parser_total_on_garbage_and_truncation():
    good = build_warc([("http://a.example/1", "<p>x</p>", "r1")])
    for data in (b"", b"not a warc at all", good[: len(good) // 2],
                 good + b"WARC/1.0\r\ntrailing garbage with no blank line",
                 b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\nbody"):
        out = list(parse_warc(data))
        assert isinstance(out, list)
    # a corrupt TAIL still yields the good prefix
    assert len(list(parse_warc(good + b"\xff\xfe garbage"))) == 1


def test_read_warc_spark_reader(spark, tmp_path):
    from nreadability_spark.sources.warc import read_warc

    for i in range(3):
        recs = [
            (f"http://a.example/{i}/{j}", f"<p>doc {i}-{j}</p>", f"r{i}-{j}")
            for j in range(4)
        ]
        (tmp_path / f"part-{i}.warc").write_bytes(build_warc(recs))
    rows = read_warc(spark, str(tmp_path / "*.warc")).collect()
    assert len(rows) == 12
    assert {r["target_uri"] for r in rows} == {
        f"http://a.example/{i}/{j}" for i in range(3) for j in range(4)
    }
    assert all(r["http_status"] == 200 for r in rows)


def test_warc_record_content_length_is_exact_bytes():
    """Content-Length counts the UTF-8 encoded HTTP block, so multibyte
    payloads round-trip exactly."""
    rec = build_warc_record("http://a.example/u", "café × 3", "ru")
    (parsed,) = parse_warc(rec)
    assert parsed["payload"] == "café × 3"


def test_warc_gzip_members_roundtrip(spark, tmp_path):
    """The at-rest form: one gzip member per record must parse to the
    same rows as the uncompressed archive, through the plain parser AND
    the Spark reader; a corrupt member yields the good prefix."""
    from nreadability_spark.sources.warc import _gunzip_members, read_warc

    recs = [
        (f"http://a.example/{j}", f"<p>compressed doc {j} café</p>", f"r{j}")
        for j in range(5)
    ]
    plain = build_warc(recs)
    gz = build_warc(recs, compress=True)
    assert gz[:2] == b"\x1f\x8b" and gz != plain
    assert _gunzip_members(gz) == plain
    assert list(parse_warc(gz)) == list(parse_warc(plain))
    # deterministic output (no wall-clock mtime in the gzip header)
    assert build_warc(recs, compress=True) == gz
    # corrupt SECOND member: first record still parses
    m0 = build_warc(recs[:1], compress=True)
    corrupt = m0 + b"\x1f\x8b" + b"\x00" * 20
    assert len(list(parse_warc(corrupt))) == 1
    # Spark reader handles the compressed file transparently
    (tmp_path / "c.warc.gz").write_bytes(gz)
    rows = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    assert {r["target_uri"] for r in rows} == {u for u, _, _ in recs}
