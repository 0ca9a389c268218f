"""Unit tests for the vendored Avro OCF codec (carpet_spark/ops/avro.py)
— same discipline as tests/test_codecs.py for the raster decoders: the
codec is hand-written from the public spec, so every encoding rule it
implements gets a direct test, independent of the Spark plumbing (which
tests/test_oracle_parity.py covers through the two registered ops).
"""

from __future__ import annotations

import io
import struct
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from carpet_spark.ops.avro import (  # noqa: E402
    _read_long,
    _write_long,
    read_ocf,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": "boolean"},
        {"name": "e", "type": "bytes"},
    ],
}


def _rows(n):
    return [
        (
            i if i % 2 else -i,               # both zigzag signs
            None if i % 5 == 0 else f"s{i}",  # union null + value branches
            i * 0.5,
            i % 3 == 0,
            struct.pack(">q", i),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("n", [-1, 0, 1, -2, 2, 63, 64, -64, -65,
                               2**31, -(2**31), 2**62, -(2**63), 2**63 - 1])
def test_zigzag_varint_roundtrip(n):
    buf = io.BytesIO()
    _write_long(buf, n)
    got, pos = _read_long(buf.getvalue(), 0)
    assert got == n
    assert pos == len(buf.getvalue())


def test_zigzag_spec_examples():
    """The spec's table: 0->0x00, -1->0x01, 1->0x02, -2->0x03, 2->0x04,
    -64->0x7f, 64->0x80 0x01."""
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                    (64, b"\x80\x01")]:
        buf = io.BytesIO()
        _write_long(buf, n)
        assert buf.getvalue() == want, n


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(tmp_path, codec):
    rows = _rows(3000)
    p = str(tmp_path / f"t_{codec}.avro")
    n = write_ocf(p, SCHEMA, iter(rows), codec=codec, block_rows=257)
    schema, back = read_ocf(p)
    assert n == 3000
    assert schema == SCHEMA
    assert back == rows


def test_ocf_multiblock_boundaries(tmp_path):
    """Row counts that do and don't divide block_rows evenly."""
    for n in (0, 1, 256, 257, 513):
        rows = _rows(n)
        p = str(tmp_path / f"b{n}.avro")
        write_ocf(p, SCHEMA, iter(rows), block_rows=256)
        _, back = read_ocf(p)
        assert back == rows, n


def test_deflate_actually_compresses(tmp_path):
    rows = [(i, "x" * 200, 0.0, False, b"") for i in range(2000)]
    pn = str(tmp_path / "n.avro")
    pd_ = str(tmp_path / "d.avro")
    write_ocf(pn, SCHEMA, iter(rows), codec="null")
    write_ocf(pd_, SCHEMA, iter(rows), codec="deflate")
    import os
    assert os.path.getsize(pd_) < os.path.getsize(pn) / 5
    assert read_ocf(pd_)[1] == read_ocf(pn)[1] == rows


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.avro"
    p.write_bytes(b"PAR1 not avro")
    with pytest.raises(ValueError, match="magic"):
        read_ocf(str(p))


def test_sync_marker_mismatch_rejected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_ocf(p, SCHEMA, iter(_rows(10)))
    data = bytearray(Path(p).read_bytes())
    data[-1] ^= 0xFF  # corrupt the final sync marker
    Path(p).write_bytes(bytes(data))
    with pytest.raises(ValueError, match="sync"):
        read_ocf(p)


def test_unsupported_codec_rejected(tmp_path):
    p = str(tmp_path / "t.avro")
    with pytest.raises(NotImplementedError, match="codec"):
        write_ocf(p, SCHEMA, iter([]), codec="snappy")


def test_unsupported_type_rejected(tmp_path):
    bad = {"type": "record", "name": "t",
           "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}]}
    with pytest.raises(NotImplementedError):
        write_ocf(str(tmp_path / "t.avro"), bad, iter([]))


def test_logical_type_rides_base_type(tmp_path):
    sch = {"type": "record", "name": "t", "fields": [
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}}]}
    rows = [(1_700_000_000_000_000,), (0,), (-62135596800000000,)]
    p = str(tmp_path / "ts.avro")
    write_ocf(p, sch, iter(rows))
    assert read_ocf(p)[1] == rows


# ---------------------------------------------------------------------------
# Interop with the REFERENCE implementation: Spark bundles the core
# avro-1.12.1 Java jars (they back Spark's own internals even without the
# spark-avro DataSource), so the Apache Avro Java reader/writer is
# reachable via py4j — the strongest possible conformance check for a
# hand-written codec: files must round-trip through an independent
# implementation byte-level, both directions, both codecs.
# ---------------------------------------------------------------------------

import json


def _interop_rows(n):
    return [
        (i if i % 2 else -i, None if i % 5 == 0 else f"s{i}", i * 0.5, i % 3 == 0)
        for i in range(n)
    ]


_INTEROP_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": "boolean"},
    ],
}


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_java_avro_reads_vendored_files(spark, tmp_path, codec):
    rows = _interop_rows(500)
    p = str(tmp_path / f"v_{codec}.avro")
    write_ocf(p, _INTEROP_SCHEMA, iter(rows), codec=codec, block_rows=77)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        r = reader.next()
        b = r.get("b")
        got.append((r.get("a"), None if b is None else str(b),
                    r.get("c"), r.get("d")))
    reader.close()
    assert got == rows


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_vendored_reader_reads_java_written_files(spark, tmp_path, codec):
    rows = _interop_rows(300)
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(_INTEROP_SCHEMA))
    p = str(tmp_path / f"j_{codec}.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    if codec == "deflate":
        writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(p))
    for a, b, c, d in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("a", a)
        rec.put("b", b)
        rec.put("c", c)
        rec.put("d", d)
        writer.append(rec)
    writer.close()
    _, back = read_ocf(p)
    assert back == rows


# ---------------------------------------------------------------------------
# Block-level splitting (r8): the OCF is splittable by sync marker — a
# byte-range read [start, end) must decode exactly the blocks whose
# header starts in the range, so consecutive ranges partition the file
# with no duplicates and no gaps, at ANY split size (including splits
# landing mid-block, mid-sync, and inside the header).
# ---------------------------------------------------------------------------

from carpet_spark.ops.avro import read_ocf_range  # noqa: E402


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("split", [1, 7, 64, 333, 4096, 10**9])
def test_range_reads_partition_exactly(tmp_path, codec, split):
    rows = _rows(2000)
    p = str(tmp_path / f"s_{codec}.avro")
    write_ocf(p, SCHEMA, iter(rows), codec=codec, block_rows=111)
    import os
    size = os.path.getsize(p)
    got = []
    for s in range(0, size, split):
        _, it = read_ocf_range(p, s, min(s + split, size))
        got.extend(it)
    assert got == rows, f"split={split}: {len(got)} vs {len(rows)}"


def test_range_read_inside_header_is_empty(tmp_path):
    p = str(tmp_path / "h.avro")
    write_ocf(p, SCHEMA, iter(_rows(10)))
    _, it = read_ocf_range(p, 0, 4)  # magic only
    assert list(it) == []


def test_full_range_equals_read_ocf(tmp_path):
    rows = _rows(500)
    p = str(tmp_path / "f.avro")
    write_ocf(p, SCHEMA, iter(rows), block_rows=37)
    import os
    _, it = read_ocf_range(p, 0, os.path.getsize(p))
    assert list(it) == read_ocf(p)[1] == rows


def test_spark_reads_single_large_file_in_parallel_splits(spark, tmp_path):
    """One big OCF + a small split_bytes must fan out to multiple input
    partitions AND return the exact multiset — the single-multi-GB-file
    shape the r8 SCALE.md trade-off note promised."""
    from carpet_spark.ops.avro import _read_avro_dir

    sch = {"type": "record", "name": "big", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    rows = [(i, f"v{i}" * 10) for i in range(20000)]
    d = tmp_path / "bigdir"
    d.mkdir()
    write_ocf(str(d / "one.avro"), sch, iter(rows), block_rows=100)
    df = _read_avro_dir(spark, str(d), "a long, b string", split_bytes=64 << 10)
    assert df.rdd.getNumPartitions() > 5
    got = sorted((r.a, r.b) for r in df.collect())
    assert got == rows


# ---------------------------------------------------------------------------
# Schema resolution (r8): reader schema vs writer schema per the spec —
# name matching across reordered fields, writer-only fields skipped,
# reader-only fields defaulted.
# ---------------------------------------------------------------------------

from carpet_spark.ops.avro import resolve_reader  # noqa: E402


def test_resolution_reorder_skip_default(tmp_path):
    writer = {"type": "record", "name": "w", "fields": [
        {"name": "b", "type": ["null", "string"]},
        {"name": "extra", "type": "double"},
        {"name": "a", "type": "long"}]}
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": ["null", "long"], "default": None},
        {"name": "d", "type": "string", "default": "dflt"}]}
    rows = [(None if i % 3 == 0 else f"s{i}", i * 1.5, i) for i in range(100)]
    p = str(tmp_path / "w.avro")
    write_ocf(p, writer, iter(rows), block_rows=7)
    _, got = read_ocf(p, reader_schema=reader)
    want = [(i, None if i % 3 == 0 else f"s{i}", None, "dflt") for i in range(100)]
    assert got == want


def test_resolution_missing_field_without_default_rejected():
    writer = {"type": "record", "name": "w",
              "fields": [{"name": "a", "type": "long"}]}
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"}, {"name": "zz", "type": "long"}]}
    with pytest.raises(ValueError, match="zz"):
        resolve_reader(writer, reader)


def test_resolution_composes_with_range_splits(tmp_path):
    writer = {"type": "record", "name": "w", "fields": [
        {"name": "x", "type": "long"}, {"name": "drop", "type": "string"}]}
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "long"},
        {"name": "tag", "type": "string", "default": "t"}]}
    rows = [(i, "junk" * 5) for i in range(1000)]
    p = str(tmp_path / "s.avro")
    write_ocf(p, writer, iter(rows), block_rows=19)
    import os
    size = os.path.getsize(p)
    got = []
    for s in range(0, size, 137):
        _, it = read_ocf_range(p, s, min(s + 137, size), reader_schema=reader)
        got.extend(it)
    assert got == [(i, "t") for i in range(1000)]


# ---------------------------------------------------------------------------
# Hostile binary payloads (r9, r8 VERDICT item 3): bytes fields carrying
# the file's OWN 16-byte sync marker, the OCF magic, NUL/0xFF runs, and
# newline soup.  write_ocf's sync is deterministic per basename
# (uuid5(NAMESPACE_OID, basename)), so the test embeds the real marker
# BEFORE writing.  With deflate the on-disk stream is compressed, so the
# embedded marker does not appear verbatim and ranged reads stay exact at
# every split size; with codec=null the payload IS verbatim on disk —
# the sequential full-file walker is immune by construction (it trusts
# block counts and only VERIFIES the sync at block ends, never
# searches), and mid-file seeks go through _resync's verified search
# (r9), which structurally validates each candidate instead of taking
# the spec's 2^-128 random-marker gamble — write_ocf's marker is
# deterministic per basename, so payload collisions are realistic here.
# ---------------------------------------------------------------------------


def _hostile_battery(sync: bytes):
    # r11: the battery generalized into the shared hostile-bytes helper
    # (tests/hostile_bytes.py) so the image-decoder fuzz reuses it; the
    # entries this regime depends on (marker alone / mid-payload /
    # repeated, OCF magic, NUL+0xFF runs, soup, empty) are all present.
    from hostile_bytes import hostile_battery

    return hostile_battery((sync,))


def _hostile_binary_rows(sync: bytes, n: int = 400):
    battery = _hostile_battery(sync)
    return [
        (
            i,
            None if i % 7 == 0 else f"h{i}",
            i * 0.25,
            i % 2 == 0,
            battery[i % len(battery)],
        )
        for i in range(n)
    ]


def test_deflate_roundtrip_with_sync_collision_payloads(tmp_path):
    import os
    import uuid as _uuid

    name = "hostile_sync.avro"
    p = str(tmp_path / name)
    sync = _uuid.uuid5(_uuid.NAMESPACE_OID, name).bytes
    rows = _hostile_binary_rows(sync)
    write_ocf(p, SCHEMA, iter(rows), codec="deflate", block_rows=53)
    # full sequential read
    assert read_ocf(p)[1] == rows
    # ranged reads partition exactly at every split size — the compressed
    # stream carries no verbatim marker bytes, so seeks cannot mis-hit
    size = os.path.getsize(p)
    for split in (13, 256, 1777, 10**9):
        got = []
        for s in range(0, size, split):
            _, it = read_ocf_range(p, s, min(s + split, size))
            got.extend(it)
        assert got == rows, f"split={split}: {len(got)} vs {len(rows)}"


def test_null_codec_sequential_read_immune_to_collisions(tmp_path):
    import os
    import uuid as _uuid

    name = "hostile_sync_null.avro"
    p = str(tmp_path / name)
    sync = _uuid.uuid5(_uuid.NAMESPACE_OID, name).bytes
    rows = _hostile_binary_rows(sync)
    write_ocf(p, SCHEMA, iter(rows), codec="null", block_rows=53)
    raw = open(p, "rb").read()
    # the hazard is REAL in this file: the marker appears verbatim inside
    # payload bytes, far more often than the 16-byte block delimiters
    # rows cycle through the battery, and 3 of its entries embed the
    # marker (one of them 3x) -> >= 5 verbatim hits per battery cycle,
    # far above the ~len(rows)/53 genuine block delimiters
    assert raw.count(sync) > len(rows) // len(_hostile_battery(sync))
    # ...and the sequential walker reads it back exactly anyway
    assert read_ocf(p)[1] == rows
    # single full-range read takes the pos=body path (no find()) — exact too
    _, it = read_ocf_range(p, 0, os.path.getsize(p))
    assert list(it) == rows


def test_null_codec_ranged_reads_resync_past_payload_collisions(tmp_path):
    """The sharpest case: codec=null puts payload-embedded sync markers
    VERBATIM on disk, and a mid-file split's seek lands among them.  A
    bare find() would mis-frame those splits (the r9 _resync fix); the
    verified search must skip every payload hit — a payload marker is
    never followed by a parseable (count>0, in-bounds size) header whose
    block closes on another marker — and partition the file exactly at
    every split size."""
    import os
    import uuid as _uuid

    name = "hostile_sync_null_ranged.avro"
    p = str(tmp_path / name)
    sync = _uuid.uuid5(_uuid.NAMESPACE_OID, name).bytes
    rows = _hostile_binary_rows(sync)
    write_ocf(p, SCHEMA, iter(rows), codec="null", block_rows=53)
    assert open(p, "rb").read().count(sync) > 8  # collisions present
    size = os.path.getsize(p)
    for split in (13, 64, 256, 1777, 10**9):
        got = []
        for s in range(0, size, split):
            _, it = read_ocf_range(p, s, min(s + split, size))
            got.extend(it)
        assert got == rows, f"split={split}: {len(got)} vs {len(rows)}"


def test_int_converter_refuses_unsafe_floats_of_every_float_type():
    """The long/int converter must refuse floats that cannot round-trip
    (non-integral, or past float64's 2^53 exact range) for BOTH Python
    floats and numpy float scalars — np.float32/float64 do not subclass
    Python float, so an isinstance(v, float) check alone would let a
    memory-downcast float32 column truncate silently (r9 review).
    numpy INTEGER scalars skip the float path: int() on them is exact at
    any magnitude."""
    import numpy as np
    import pytest

    from carpet_spark.ops.avro import _py_converter

    conv = _py_converter("long")
    # exact-integer floats of every flavor convert
    assert conv(3.0) == 3
    assert conv(np.float64(-7.0)) == -7
    assert conv(np.float32(12.0)) == 12
    # non-integral: refused loudly, regardless of float type
    for bad in (2.5, np.float64(2.5), np.float32(2.5), float("nan")):
        with pytest.raises(ValueError, match="cannot round-trip"):
            conv(bad)
    # beyond (or at) 2^53: ambiguous — refused
    for bad in (2.0**53, -(2.0**53), 2.0**60, np.float64(2.0**53)):
        with pytest.raises(ValueError, match="cannot round-trip"):
            conv(bad)
    # integer-typed values are exact at ANY magnitude — no float detour
    assert conv(np.int64(2**62 + 1)) == 2**62 + 1
    assert conv(2**62 + 1) == 2**62 + 1
    # the nullable wrapper still maps NaN/None to None before the guard
    nconv = _py_converter(["null", "long"])
    assert nconv(None) is None
    assert nconv(float("nan")) is None
    assert nconv(9.0) == 9


# ---------------------------------------------------------------------------
# Deflate fuzz regime (r10, r9 VERDICT item 7): the codec branch was the
# only Avro path without a hostile sweep beyond one fixed block size.  Two
# regimes close it:
#
# 1. Seeded fuzz over (block size, payload mix, split size): hostile
#    batteries interleaved with seeded-random bytes, written under deflate
#    at randomized block_rows, then partitioned exactly at randomized
#    split sizes.  Seeds are FIXED so every failure is reproducible.
# 2. The stored-block collision case the fixed-payload test cannot reach:
#    deflate emits STORED (uncompressed) blocks for incompressible input,
#    so a sync marker embedded in high-entropy payload bytes lands
#    VERBATIM in the compressed stream — the one way a deflate file gets
#    payload/marker collisions on disk.  The test constructs that file,
#    proves the verbatim hits exist, and requires ranged reads to
#    partition it exactly anyway (the _resync verified search must skip
#    every payload hit, same contract as the codec=null ranged test).
# ---------------------------------------------------------------------------


def _fuzz_rows(rnd, sync: bytes, n: int):
    """Rows whose bytes field interleaves the hostile battery with
    seeded-random payloads: pure noise (incompressible -> stored deflate
    blocks), noise-wrapped sync markers, and compressible runs, so one
    file exercises stored, fixed-huffman, and dynamic-huffman paths."""
    battery = _hostile_battery(sync)
    out = []
    for i in range(n):
        kind = rnd.randrange(4)
        if kind == 0:
            payload = battery[rnd.randrange(len(battery))]
        elif kind == 1:
            payload = rnd.randbytes(rnd.randrange(64))
        elif kind == 2:
            payload = rnd.randbytes(11) + sync + rnd.randbytes(13)
        else:
            payload = bytes([rnd.randrange(4)]) * rnd.randrange(48)
        out.append(
            (
                i,
                None if i % 7 == 0 else f"f{i}",
                i * 0.125,
                i % 2 == 0,
                payload,
            )
        )
    return out


@pytest.mark.parametrize("seed", [0xA51C, 0xBEEF, 0x5CA1E])
def test_deflate_fuzz_random_blocks_and_splits(tmp_path, seed):
    import os
    import random
    import uuid as _uuid

    rnd = random.Random(seed)
    name = f"fuzz_deflate_{seed}.avro"
    p = str(tmp_path / name)
    sync = _uuid.uuid5(_uuid.NAMESPACE_OID, name).bytes
    rows = _fuzz_rows(rnd, sync, n=rnd.randrange(150, 450))
    block_rows = rnd.randrange(1, 211)
    write_ocf(p, SCHEMA, iter(rows), codec="deflate", block_rows=block_rows)
    # full sequential read is exact
    assert read_ocf(p)[1] == rows
    # ranged reads partition exactly at randomized split sizes (plus the
    # adversarial extremes: 1-byte splits hit EVERY byte offset, and a
    # single full-file split must take the no-seek path)
    size = os.path.getsize(p)
    splits = sorted({1, size, rnd.randrange(2, 37), rnd.randrange(37, 1031)})
    for split in splits:
        got = []
        for s in range(0, size, split):
            _, it = read_ocf_range(p, s, min(s + split, size))
            got.extend(it)
        assert got == rows, (
            f"seed={seed} block_rows={block_rows} split={split}: "
            f"{len(got)} vs {len(rows)}"
        )


def test_deflate_stored_blocks_leak_sync_verbatim_and_resync_survives(tmp_path):
    import os
    import random
    import uuid as _uuid

    name = "fuzz_deflate_stored.avro"
    p = str(tmp_path / name)
    sync = _uuid.uuid5(_uuid.NAMESPACE_OID, name).bytes
    rnd = random.Random(0xD1CE)
    # Getting the marker verbatim into the COMPRESSED stream requires the
    # whole block to be incompressible so zlib picks STORED deflate
    # blocks: EVERY field must be high-entropy (random ids/doubles/bools,
    # null strings, noise payloads) and the marker must appear at most
    # ONCE per Avro block (one marker row per block_rows=29) — sequential
    # s{i} strings / float(i) doubles give LZ matches, and a repeated
    # marker gets back-referenced, either of which tips zlib into huffman
    # blocks that re-encode the marker bytes (verified empirically: with
    # structured fields the blocks compress to ratio ~0.997 and carry 0
    # verbatim markers; with this construction every block is stored and
    # carries exactly 1).
    rows = [
        (
            rnd.getrandbits(50),
            None,
            rnd.random(),
            bool(rnd.getrandbits(1)),
            (rnd.randbytes(500) + sync + rnd.randbytes(500))
            if i % 29 == 13
            else rnd.randbytes(1000),
        )
        for i in range(200)
    ]
    write_ocf(p, SCHEMA, iter(rows), codec="deflate", block_rows=29)
    raw = open(p, "rb").read()
    genuine_delimiters = len(rows) // 29 + 2  # block ends + header
    assert raw.count(sync) > genuine_delimiters, (
        "construction failed: deflate compressed the payload markers away, "
        f"only {raw.count(sync)} occurrences on disk — the stored-block "
        "collision case is not being exercised"
    )
    # sequential read trusts block counts — exact
    assert read_ocf(p)[1] == rows
    # ranged reads must skip every verbatim payload hit via the verified
    # search and still partition exactly
    size = os.path.getsize(p)
    for split in (13, 97, 521, 4099, 10**9):
        got = []
        for s in range(0, size, split):
            _, it = read_ocf_range(p, s, min(s + split, size))
            got.extend(it)
        assert got == rows, f"split={split}: {len(got)} vs {len(rows)}"


# ---------------------------------------------------------------------------
# Seeded whole-file mutation fuzz (r11, extending the r10 STORED-block
# regime): deterministic mutants of valid OCFs (truncations, bit flips,
# overwrites, splices, magic insertions) and noise blobs through read_ocf
# and the mmap read_ocf_range path.  Contract: every input either yields
# well-formed row tuples or raises ValueError/NotImplementedError — never
# a foreign exception, never a hang.  The first probe run found both
# failure kinds: a mutated negative zigzag LENGTH moved the cursor
# backward under a huge mutated metadata COUNT (an effective hang in
# _parse_header), and truncation/garbage escaped as IndexError /
# zlib.error / UnicodeDecodeError / KeyError / struct.error.  All now
# translate to ValueError at the framing layers (avro.py).
# ---------------------------------------------------------------------------

from hostile_bytes import seeded_mutants as _seeded_mutants  # noqa: E402
from hostile_bytes import random_blobs as _random_blobs  # noqa: E402

_FUZZ_SCHEMA = {
    "type": "record", "name": "fz", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "x", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "p", "type": "bytes"},
    ],
}


def _fuzz_valid_ocf(tmp_path, codec: str) -> bytes:
    rows = [
        (i, None if i % 5 == 0 else f"s{i}", i * 0.5, i % 2 == 0,
         bytes([i % 256]) * (i % 20))
        for i in range(120)
    ]
    p = str(tmp_path / f"fuzz_valid_{codec}.avro")
    write_ocf(p, _FUZZ_SCHEMA, rows, codec=codec)
    return open(p, "rb").read()


def _assert_ocf_contract(path: str) -> None:
    import signal

    def _hang(sig, frm):
        raise AssertionError(f"OCF reader hung on {path}")

    old = signal.signal(signal.SIGALRM, _hang)
    signal.alarm(20)  # generous: contract is "terminates", not "fast"
    try:
        try:
            _, rows = read_ocf(path)
        except (ValueError, NotImplementedError):
            return  # documented error path
        for r in rows:
            assert isinstance(r, tuple) and len(r) == 5
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_seeded_mutation_fuzz_read_ocf(tmp_path, codec):
    valid = _fuzz_valid_ocf(tmp_path, codec)
    q = str(tmp_path / "m.avro")
    for m in _seeded_mutants(valid, 0xA11CE, 200):
        open(q, "wb").write(m)
        _assert_ocf_contract(q)


def test_noise_blob_fuzz_read_ocf(tmp_path):
    q = str(tmp_path / "m.avro")
    for blob in _random_blobs(0xA11CE, 100):
        open(q, "wb").write(blob)
        _assert_ocf_contract(q)


def test_seeded_mutation_fuzz_read_ocf_range(tmp_path):
    """The split path: mutants through the mmap + verified-resync reader,
    three ranges each (first half / second half / whole)."""
    valid = _fuzz_valid_ocf(tmp_path, "null")
    q = str(tmp_path / "m.avro")
    for m in _seeded_mutants(valid, 0xBEEF, 100):
        open(q, "wb").write(m)
        L = len(m)
        for a, b in [(0, L // 2), (L // 2, L), (0, L)]:
            try:
                _, it = read_ocf_range(q, a, b)
                for r in it:
                    assert isinstance(r, tuple) and len(r) == 5
            except (ValueError, NotImplementedError):
                pass


def test_negative_length_rewind_rejected(tmp_path):
    """The hang mutant class, pinned directly: a negative zigzag length
    in a metadata entry must raise, not rewind the cursor under a huge
    metadata count."""
    import io as _io

    buf = _io.BytesIO()
    buf.write(b"Obj\x01")
    _write_long(buf, 2**40)  # absurd metadata pair count
    _write_long(buf, -7)     # negative length: the rewind vector
    with pytest.raises(ValueError, match="corrupt avro header"):
        p = str(tmp_path / "rewind.avro")
        open(p, "wb").write(buf.getvalue())
        read_ocf(p)
