"""WARC / TAR container source: codec round-trips, stdlib interop,
the skip_errors crawl-grade contract, and corruption behavior.

The catalog surface (corpus_warc_records / corpus_tar_members) is
value-hash-oracled end-to-end; these tests cover what the oracle
can't — malformed bytes, per-file error containment, and
interoperability with an independent implementation (tarfile)."""

from __future__ import annotations

import hashlib
import io
import tarfile

import pytest
from pyspark.sql import functions as F

from opentsdb_aura_spark.operators import containers as C

DOCS = [(0, "hello world"), (7, "x" * 600), (123, ""), (4096, "multi word doc body")]


# ------------------------------------------------------------------ WARC codec


def test_warc_roundtrip_offsets_chain():
    blob = C.encode_warc_file(3, DOCS)
    recs = list(C._parse_warc_bytes(blob))
    assert [r[2] for r in recs] == ["warcinfo"] + ["response"] * len(DOCS)
    assert recs[0][3] == "urn:uuid:warcinfo-3"
    assert recs[1][3] == "urn:uuid:doc-0" and recs[1][4] == "http://example.com/doc/0"
    assert recs[1][5] == 11 and recs[1][6] == hashlib.md5(b"hello world").hexdigest()
    # offsets tile the file exactly: each record starts where the last ended
    off = 0
    for r in recs:
        assert r[0] == off
        off += r[1]
    assert off == len(blob)


def test_warc_zero_length_payload_and_empty_file():
    blob = C.encode_warc_file(0, [(5, "")])
    recs = list(C._parse_warc_bytes(blob))
    assert recs[1][5] == 0 and recs[1][6] == hashlib.md5(b"").hexdigest()
    assert list(C._parse_warc_bytes(b"")) == []


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:-2], "terminated"),  # chop the trailing CRLF
        (lambda b: b"GARBAGE" + b[7:], "version"),  # break the version line
        (lambda b: b.replace(b"Content-Length", b"Content-Oops", 1), "Content-Length"),
        (lambda b: b[: len(b) // 2], "unterminated|terminated"),  # truncate mid-record
    ],
)
def test_warc_malformed_raises(mutate, msg):
    import re

    blob = C.encode_warc_file(0, DOCS[:2])
    with pytest.raises(ValueError, match=msg):
        list(C._parse_warc_bytes(mutate(blob)))


# ------------------------------------------------------------------- TAR codec


def test_tar_roundtrip_and_stdlib_interop_both_ways():
    blob = C.encode_tar_file(DOCS)
    # stdlib reads ours
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    names = [m.name for m in tf.getmembers()]
    assert names == [f"doc/{i}.txt" for i, _ in DOCS]
    assert tf.extractfile("doc/7.txt").read() == b"x" * 600
    # ours reads ours: 512-block offsets, checksums validate
    got = list(C._parse_tar_bytes(blob))
    assert [g[1] for g in got] == names
    assert got[0][:6] == (0, "doc/0.txt", 11, C.TAR_MTIME, "0", hashlib.md5(b"hello world").hexdigest())
    assert got[0][6] == b"hello world"  # payload rides along for pipeline stages
    assert got[1][0] == 1024  # 512 header + 512 (11 bytes padded)
    # ours reads stdlib's
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        ti = tarfile.TarInfo("z.txt")
        ti.size = 3
        w.addfile(ti, io.BytesIO(b"abc"))
    recs = list(C._parse_tar_bytes(buf.getvalue()))
    assert recs[0][1] == "z.txt" and recs[0][5] == hashlib.md5(b"abc").hexdigest()


def test_tar_malformed_raises():
    blob = C.encode_tar_file(DOCS[:2])
    bad = bytearray(blob)
    bad[260] ^= 0xFF  # corrupt the ustar magic
    with pytest.raises(ValueError, match="magic"):
        list(C._parse_tar_bytes(bytes(bad)))
    bad2 = bytearray(blob)
    bad2[0] ^= 0x01  # flip a name byte → checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        list(C._parse_tar_bytes(bytes(bad2)))
    with pytest.raises(ValueError, match="trailer"):
        list(C._parse_tar_bytes(blob[:-1024]))  # strip the zero blocks


# ------------------------------------------------- Spark surface + skip_errors


def _files_df(spark, rows):
    return spark.createDataFrame(rows, "file_id long, content binary")


def test_warc_records_skip_errors_contains_bad_file(spark):
    good = C.encode_warc_file(1, DOCS[:2])
    bad = good[: len(good) - 9]  # truncated download
    df = _files_df(spark, [(1, good), (2, bad)])
    # fail-fast default: the stage dies
    with pytest.raises(Exception):
        C.warc_records(df).collect()
    # crawl-grade: good file fully parsed, bad file = parsed prefix + 1 error row
    rows = C.warc_records(df, skip_errors=True).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file_id"], []).append(r)
    assert len(by_file[1]) == 3 and all(r["error"] is None for r in by_file[1])
    errs = [r for r in by_file[2] if r["error"] is not None]
    assert len(errs) == 1 and "terminated" in errs[0]["error"]
    assert errs[0]["offset"] is None


def test_tar_members_skip_errors_contains_bad_file(spark):
    good = C.encode_tar_file(DOCS[:2])
    bad = bytearray(good)
    bad[0] ^= 0x01  # checksum break in the FIRST header
    df = _files_df(spark, [(1, good), (2, bytes(bad))])
    with pytest.raises(Exception):
        C.tar_members(df).collect()
    rows = C.tar_members(df, skip_errors=True).collect()
    good_rows = [r for r in rows if r["file_id"] == 1]
    assert [r["name"] for r in sorted(good_rows, key=lambda r: r["offset"])] == [
        "doc/0.txt",
        "doc/7.txt",
    ]
    errs = [r for r in rows if r["error"] is not None]
    assert len(errs) == 1 and errs[0]["file_id"] == 2 and "checksum" in errs[0]["error"]


def test_synthesize_partitions_by_file_and_orders_by_doc(spark):
    docs = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(120)], "doc_id long, text string"
    )
    files = C.synthesize_warc(docs, docs_per_file=50).collect()
    assert sorted(r["file_id"] for r in files) == [0, 1, 2]
    recs = C.warc_records(C.synthesize_warc(docs, docs_per_file=50)).collect()
    resp = [r for r in recs if r["warc_type"] == "response"]
    assert len(resp) == 120
    # within a file, records are doc_id-ordered and offsets strictly increase
    f0 = sorted((r for r in resp if r["file_id"] == 0), key=lambda r: r["offset"])
    ids = [int(r["record_id"].rsplit("-", 1)[1]) for r in f0]
    assert ids == sorted(ids) and len(ids) == 50


# --------------------------------------------------------------- WARC gzip


def test_warc_gz_roundtrip_and_stdlib_interop():
    import gzip

    plain = list(C._parse_warc_bytes(C.encode_warc_file(3, DOCS)))
    blob = C.encode_warc_file(3, DOCS, gzip_records=True)
    recs = list(C._parse_warc_gz_bytes(blob))
    # same records (headers/digests) as the plain layout, offsets tile
    # the COMPRESSED file exactly
    assert [r[2:] for r in recs] == [r[2:] for r in plain]
    off = 0
    for r in recs:
        assert r[0] == off
        off += r[1]
    assert off == len(blob)
    # stdlib reads our members; our walker reads stdlib-compressed members
    assert gzip.decompress(blob).startswith(b"WARC/1.0\r\n")
    rec = C.encode_warc_record("response", "urn:uuid:doc-9", b"abc",
                               target_uri="http://example.com/doc/9")
    via_stdlib = gzip.compress(rec, 6)
    got = list(C._parse_warc_gz_bytes(via_stdlib))
    assert len(got) == 1 and got[0][3] == "urn:uuid:doc-9"
    assert got[0][6] == hashlib.md5(b"abc").hexdigest()


def test_warc_gz_malformed(spark):
    blob = C.encode_warc_file(0, DOCS[:2], gzip_records=True)
    with pytest.raises(ValueError, match="truncated|corrupt"):
        list(C._parse_warc_gz_bytes(blob[:-5]))
    bad = b"NOTGZIP" + blob
    with pytest.raises(ValueError, match="boundary"):
        list(C._parse_warc_gz_bytes(bad))
    # a member framing two records is rejected
    import gzip
    two = gzip.compress(
        C.encode_warc_record("response", "urn:uuid:doc-1", b"x")
        + C.encode_warc_record("response", "urn:uuid:doc-2", b"y")
    )
    with pytest.raises(ValueError, match="frames 2 records"):
        list(C._parse_warc_gz_bytes(two))
    # Spark surface: skip_errors contains the bad file, magic sniffing
    # routes gz and plain files in the SAME frame
    df = _files_df(spark, [(1, blob), (2, blob[:-5]), (3, C.encode_warc_file(7, DOCS[:1]))])
    rows = C.warc_records(df, skip_errors=True).collect()
    ok1 = [r for r in rows if r["file_id"] == 1 and r["error"] is None]
    ok3 = [r for r in rows if r["file_id"] == 3 and r["error"] is None]
    errs = [r for r in rows if r["error"] is not None]
    assert len(ok1) == 3 and len(ok3) == 2
    assert len(errs) == 1 and errs[0]["file_id"] == 2


def test_tar_prefix_long_names_stdlib_interop():
    """ustar long names split into the 155-byte prefix field: stdlib
    writes them, our parser must reassemble prefix/name."""
    buf = io.BytesIO()
    long_name = "/".join(["deep"] * 30) + "/leaf.txt"  # > 100 bytes
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        ti = tarfile.TarInfo(long_name)
        ti.size = 4
        w.addfile(ti, io.BytesIO(b"data"))
    recs = list(C._parse_tar_bytes(buf.getvalue()))
    assert recs[0][1] == long_name
    assert recs[0][5] == hashlib.md5(b"data").hexdigest()


# ------------------------------------------------ crawl pipeline composition


def test_warc_to_incremental_dedup_pipeline(spark, tmp_path):
    """The crawl shape end-to-end: WARC batches arrive → 1→many record
    extraction WITH payloads → text → incremental MinHash index →
    cross-batch near-dup candidates.  Batch 2 replants batch 1's docs
    under new ids, so the candidates must pair new ids against OLD
    ids without re-signing the old corpus."""
    from opentsdb_aura_spark.operators.dedup_text import (
        lsh_candidates_from_signatures,
        update_minhash_index,
    )

    path = str(tmp_path / "crawl_mh")
    base = [
        (i, f"crawl document {i} with some shared boilerplate text body {i % 3}")
        for i in range(20)
    ]
    dupes = [(1000 + i, t) for i, t in base[:5]]  # near-exact recrawls

    def ingest(rows):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        files = C.synthesize_warc(docs, docs_per_file=10, gzip_records=True)
        recs = C.warc_records(files, with_payload=True).where(
            F.col("warc_type") == "response"
        )
        texts = recs.select(
            F.split(F.col("record_id"), "-").getItem(1).cast("long").alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
        )
        return update_minhash_index(texts, path)

    ingest(base)
    sig = ingest(dupes)
    assert sig.count() == 25  # 20 + 5, re-appends deduped by the anti-join
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidates_from_signatures(sig, threshold=0.9).collect()
    }
    for i, _ in base[:5]:
        assert (i, 1000 + i) in pairs or (1000 + i, i) in pairs


def test_tar_gz_stream_roundtrip(spark):
    """.tar.gz: whole-stream gzip, magic-sniffed; members and offsets
    equal the plain archive's (decompressed layout), and stdlib
    tarfile reads our stream ('r:gz')."""
    import gzip

    plain = C.encode_tar_file(DOCS)
    gz = C._gzip_member(plain)
    tf = tarfile.open(fileobj=io.BytesIO(gz), mode="r:gz")
    assert [m.name for m in tf.getmembers()] == [f"doc/{i}.txt" for i, _ in DOCS]
    df = _files_df(spark, [(0, gz), (1, plain)])
    rows = C.tar_members(df).collect()
    a = sorted((r["offset"], r["name"], r["payload_md5"]) for r in rows if r["file_id"] == 0)
    b = sorted((r["offset"], r["name"], r["payload_md5"]) for r in rows if r["file_id"] == 1)
    assert a == b and len(a) == len(DOCS)


def test_canonicalize_url_rules(spark):
    """Canonicalization folds scheme/host case, default ports, query
    strings, fragments, and trailing slashes — but preserves path
    case and non-default ports."""
    from opentsdb_aura_spark.operators.containers import canonicalize_url

    rows = [
        ("HTTPS://Example.COM:443/A/b/?q=1#f", "https://example.com/A/b"),
        ("http://example.com:80/", "http://example.com"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # scheme-mismatched "default" ports are DISTINCT resources and
        # must survive canonicalization (ADVICE r7)
        ("https://example.com:80/x", "https://example.com:80/x"),
        ("http://example.com:443/x", "http://example.com:443/x"),
        ("http://example.com/x?utm=1", "http://example.com/x"),
        ("http://example.com/x#only-frag", "http://example.com/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "u string")
    got = [r["c"] for r in df.select(canonicalize_url("u").alias("c")).collect()]
    assert got == [want for _, want in rows]
