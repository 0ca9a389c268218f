"""Unit tests for the vendored pure-Python raster codecs (r7): the decode
tier under mm_image_resize / mm_image_features / mm_image_channel_stats.

The op-level hash oracles prove end-to-end parity on the SYNTHETIC
payloads; these tests pin the codec grammar itself — including branches
the synth encoders never emit (P5 grayscale, top-down BMP, header
comments in odd positions, truncation/garbage error paths) — so the
decoders stay honest general-purpose parsers, not synth-shaped ones.
"""

import struct

import pytest

from carpet_spark.ops.multimodal import (
    _decode_bmp,
    _decode_image_real,
    _decode_ppm,
    _encode_bmp_synth,
    _encode_ppm_synth,
    _synth_dims,
)


def _ramp(seed: int, n: int) -> bytes:
    return bytes((seed + i) % 256 for i in range(n))


@pytest.mark.parametrize("length", [0, 1, 17, 255, 256, 1000, 40000])
def test_synth_roundtrip_both_formats(length):
    payload_src = b"x" * length
    w, h, seed = _synth_dims(length)
    expected = _ramp(seed, w * h * 3)
    for enc in (_encode_ppm_synth, _encode_bmp_synth):
        dw, dh, ch, px = _decode_image_real(enc(payload_src))
        assert (dw, dh, ch) == (w, h, 3)
        assert px == expected


def test_ppm_header_grammar_whitespace_and_comments():
    # arbitrary whitespace runs + comments between EVERY token, CR/LF mix
    px = _ramp(7, 2 * 3 * 3)
    data = b"P6 # c1\n\t 2 # c2 with spaces\n\r\n3 \t# c3\n 255\n" + px
    assert _decode_ppm(data) == (2, 3, 3, px)


def test_pgm_p5_single_channel():
    px = _ramp(3, 4 * 2)
    data = b"P5\n4 2\n255\n" + px
    assert _decode_ppm(data) == (4, 2, 1, px)
    # and via the sniffing front door
    assert _decode_image_real(data) == (4, 2, 1, px)


def test_ppm_rejects_bad_magic_maxval_truncation():
    with pytest.raises(ValueError, match="magic"):
        _decode_ppm(b"P3\n1 1\n255\n abc")  # ASCII PPM is not binary P6
    with pytest.raises(ValueError, match="maxval"):
        _decode_ppm(b"P6\n1 1\n65535\n" + b"\0" * 6)
    with pytest.raises(ValueError, match="truncated"):
        _decode_ppm(b"P6\n4 4\n255\n" + b"\0" * 5)
    with pytest.raises(ValueError, match="truncated PPM header"):
        _decode_ppm(b"P6\n4 4")


def _bmp_bytes(w, h, top_down, pixels_rgb):
    """Hand-rolled BMP with explicit control of row order for the test."""
    stride = ((w * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - w * 3)
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(w):
            r, g, b = pixels_rgb[y][x]
            row += bytes((b, g, r))
        rows.append(bytes(row) + pad)
    pix = b"".join(rows)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
        len(pix), 2835, 2835, 0, 0,
    )
    return hdr + info + pix


def test_bmp_bottom_up_and_top_down_decode_identically():
    w, h = 3, 2  # stride padding exercised: 3*3=9 -> stride 12
    pixels = [[(10 * y + x, 100 + x, 200 - y) for x in range(w)]
              for y in range(h)]
    logical = bytes(v for row in pixels for p in row for v in p)
    for td in (False, True):
        dw, dh, ch, px = _decode_bmp(_bmp_bytes(w, h, td, pixels))
        assert (dw, dh, ch) == (w, h, 3)
        assert px == logical


def test_bmp_rejects_unsupported_depths_and_garbage():
    good = _encode_bmp_synth(b"q")
    with pytest.raises(ValueError, match="magic"):
        _decode_bmp(b"XX" + good[2:])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)  # 8-bit palette BMP
    with pytest.raises(NotImplementedError, match="24-bit"):
        _decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated"):
        _decode_bmp(good[:100])
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_image_real(b"\x89PNG\r\n\x1a\n")


# ---------------------------------------------------------------------------
# Arrow output-batch bounding (r8): payload-amplifying UDFs must cap both
# the Python-side working set (_encode_frames chunks the input BEFORE
# building payloads) and the per-yield Arrow batch bytes (_bounded_slices).
# ---------------------------------------------------------------------------

import pandas as pd  # noqa: E402

from carpet_spark.ops.multimodal import (  # noqa: E402
    _MAX_OUT_BATCH_BYTES,
    _bounded_slices,
    _encode_frames,
)


def test_bounded_slices_respects_byte_cap_and_loses_nothing():
    big = b"x" * (_MAX_OUT_BATCH_BYTES // 3)
    pdf = pd.DataFrame({"doc_id": range(10),
                        "img_data": [big] * 9 + [None]})
    slices = list(_bounded_slices(pdf, "img_data"))
    assert sum(len(s) for s in slices) == 10
    assert pd.concat(slices)["doc_id"].tolist() == list(range(10))
    for s in slices:
        payload = sum(len(v) for v in s["img_data"] if v is not None)
        assert payload <= _MAX_OUT_BATCH_BYTES


def test_bounded_slices_oversized_single_row_still_emits():
    pdf = pd.DataFrame({"doc_id": [1],
                        "img_data": [b"y" * (_MAX_OUT_BATCH_BYTES + 5)]})
    slices = list(_bounded_slices(pdf, "img_data"))
    assert len(slices) == 1 and len(slices[0]) == 1


def test_encode_frames_chunks_and_preserves_order_and_nulls():
    texts = ["a" * (20 + i % 580) for i in range(700)]
    texts[13] = None
    pdf = pd.DataFrame({"doc_id": range(700), "text": texts})
    frames = list(_encode_frames(pdf, lambda b: b"P" + b))
    assert len(frames) >= 3  # 700 rows > 2 chunks of 256
    cat = pd.concat(frames)
    assert cat["doc_id"].tolist() == list(range(700))
    assert cat["img_data"].iloc[13] is None
    assert bytes(cat["img_data"].iloc[0]) == b"P" + texts[0].encode()


# ---------------------------------------------------------------------------
# Seeded hostile-bytes fuzz (r10 VERDICT stretch item): the Avro deflate
# regime's collision generator, generalized (tests/hostile_bytes.py) and
# pointed at the raster decoders.  Contract: any input either decodes to a
# WELL-FORMED (w, h, ch, px) — w,h >= 0, ch in {1,3}, len(px) == w*h*ch —
# or raises the decoders' documented error types.  Never a foreign
# exception (struct.error, OverflowError, MemoryError, ...), never a
# malformed success.  First run found one of the latter: _decode_bmp
# returned width=-5 for a hostile w<0,h=0 header.
# ---------------------------------------------------------------------------

from hostile_bytes import (  # noqa: E402
    hostile_battery,
    random_blobs,
    seeded_mutants,
)

_FUZZ_SEED = 0xCA4B11  # deterministic; bump only with a written reason


def _assert_decoder_contract(decode, data: bytes) -> None:
    try:
        w, h, ch, px = decode(data)
    except (ValueError, NotImplementedError):
        return  # documented error path
    # well-formed success or bust
    assert w >= 0 and h >= 0, f"negative dims ({w}, {h}) for {data[:40]!r}"
    assert ch in (1, 3), f"channels {ch} for {data[:40]!r}"
    assert len(px) == w * h * ch, (
        f"raster length {len(px)} != {w}*{h}*{ch} for {data[:40]!r}"
    )


@pytest.mark.parametrize(
    "valid_sample",
    [
        _encode_ppm_synth(b"q" * 300),           # P6
        b"P5\n# c\n4 2\n255\n" + bytes(8),       # P5 (synth never emits)
        _encode_bmp_synth(b"q" * 300),           # bottom-up BMP
    ],
    ids=["ppm_p6", "pgm_p5", "bmp"],
)
def test_seeded_mutation_fuzz_decoders(valid_sample):
    """400 deterministic mutants per valid sample through the sniffing
    dispatcher: truncations, bit flips, overwrites, splices, and magic
    insertions must hit the contract, not a foreign exception."""
    for mutant in seeded_mutants(valid_sample, _FUZZ_SEED, 400):
        _assert_decoder_contract(_decode_image_real, mutant)


def test_random_blob_and_battery_fuzz_decoders():
    """Noise blobs (half with planted magics) and the structured battery
    through every decoder entry point, including direct (non-sniffed)
    calls where the magic check itself is under test."""
    corpus = random_blobs(_FUZZ_SEED, 300) + hostile_battery()
    for blob in corpus:
        _assert_decoder_contract(_decode_image_real, blob)
        _assert_decoder_contract(_decode_ppm, blob)
        _assert_decoder_contract(_decode_bmp, blob)


def test_fuzz_corpus_is_deterministic():
    """A gate failure must reproduce exactly: same (seed, n) -> same
    corpus, across processes (random.Random, not hash-randomized)."""
    a = seeded_mutants(b"P6\n2 2\n255\n" + bytes(12), _FUZZ_SEED, 50)
    b = seeded_mutants(b"P6\n2 2\n255\n" + bytes(12), _FUZZ_SEED, 50)
    assert a == b
    assert random_blobs(7, 20) == random_blobs(7, 20)


def test_bmp_negative_width_rejected():
    """The r11 fuzz finding, pinned directly: w<0 (signed i32) with h=0
    must raise, not return a malformed (negative-width) success."""
    good = _encode_bmp_synth(b"q" * 50)
    hostile = bytearray(good)
    struct.pack_into("<ii", hostile, 18, -5, 0)  # width=-5, height=0
    with pytest.raises(ValueError, match="negative BMP width"):
        _decode_bmp(bytes(hostile))
