"""Shared hostile-bytes generators for parser/decoder fuzz regimes.

Grown out of the r10 Avro deflate fuzz (r10 VERDICT stretch item): the
STORED-block sync-collision battery that proved the OCF reader immune
to payload-embedded markers generalizes to every binary parser in the
repo.  Two regimes:

- ``hostile_battery(markers)`` — the STRUCTURED battery: each marker
  verbatim / mid-payload / repeated, plus format magics, NUL runs,
  0xFF runs (varint-continuation bait), newline soup, and empty bytes.
  Deterministic, order-stable; callers embed entries as payloads.

- ``seeded_mutants(valid, seed, n)`` and ``random_blobs(seed, n)`` —
  the RANDOMIZED regime: deterministic ``random.Random(seed)`` streams
  of (a) mutations of a VALID sample — truncations, bit flips, byte
  overwrites, splices, and marker insertions, the shapes that find
  header-field parsing bugs — and (b) pure noise blobs with magics
  planted at random offsets.  Deterministic for a given (seed, n), so
  a gate failure reproduces exactly.

The decoder contract the fuzz tests assert: a parser fed any of this
either returns a WELL-FORMED result (caller-checked invariants) or
raises its documented error types (ValueError / NotImplementedError) —
never a foreign exception, never a malformed success.  The r11 seeded
fuzz found one of the latter on its first run: _decode_bmp returned
width=-5 for a w<0,h=0 header (fixed in ops/multimodal.py).
"""

from __future__ import annotations

import random

# magics of every binary format the repo parses or sniffs
FORMAT_MAGICS = (
    b"Obj\x01",            # Avro OCF
    b"BM",                 # BMP
    b"P6", b"P5",          # binary PPM / PGM
    b"\x89PNG\r\n\x1a\n",  # PNG (sniffed, PIL-gated)
    b"\xff\xd8\xff",       # JPEG (sniffed, PIL-gated)
    b"PAR1",               # parquet
)


def hostile_battery(markers: tuple[bytes, ...] = ()) -> list[bytes]:
    """The structured battery: marker collisions + magics + byte runs."""
    out: list[bytes] = []
    for m in markers:
        out += [
            m,                       # the marker alone
            b"x" * 7 + m + b"y" * 9,  # marker mid-payload
            m * 3,                   # repeated marker
        ]
    out += [
        *FORMAT_MAGICS,
        b"\x00" * 32,  # NUL run
        b"\xff" * 32,  # 0xFF run (varint continuation bait)
        b"\n\r\n\t",   # newline soup
        b"",           # empty bytes
    ]
    return out


def seeded_mutants(valid: bytes, seed: int, n: int) -> list[bytes]:
    """n deterministic mutants of a valid sample: truncations, bit
    flips, byte overwrites, splices, and magic/marker insertions."""
    rng = random.Random(seed)
    out: list[bytes] = []
    L = len(valid)
    for _ in range(n):
        kind = rng.randrange(5)
        if kind == 0:  # truncate at a random point (header or raster)
            out.append(valid[: rng.randrange(L + 1)])
        elif kind == 1:  # single bit flip
            b = bytearray(valid)
            i = rng.randrange(L)
            b[i] ^= 1 << rng.randrange(8)
            out.append(bytes(b))
        elif kind == 2:  # overwrite 1-8 bytes at a random offset
            b = bytearray(valid)
            i = rng.randrange(L)
            span = min(rng.randrange(1, 9), L - i)
            b[i : i + span] = rng.randbytes(span)
            out.append(bytes(b))
        elif kind == 3:  # splice: head of one copy + tail from elsewhere
            i, j = rng.randrange(L + 1), rng.randrange(L + 1)
            out.append(valid[:i] + valid[j:])
        else:  # insert a magic at a random offset
            i = rng.randrange(L + 1)
            m = FORMAT_MAGICS[rng.randrange(len(FORMAT_MAGICS))]
            out.append(valid[:i] + m + valid[i:])
    return out


def random_blobs(seed: int, n: int, max_len: int = 512) -> list[bytes]:
    """n deterministic noise blobs; half get a magic planted at a
    random offset so sniffing paths see plausible-but-garbage headers."""
    rng = random.Random(seed)
    out: list[bytes] = []
    for k in range(n):
        blob = bytearray(rng.randbytes(rng.randrange(max_len + 1)))
        if k % 2 == 0 and blob:
            m = FORMAT_MAGICS[rng.randrange(len(FORMAT_MAGICS))]
            i = rng.randrange(len(blob) + 1)
            blob[i:i] = m
        out.append(bytes(blob))
    return out
