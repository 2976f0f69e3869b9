"""Property-based tests (hypothesis) for the pure-Python legs that
anchor cross-engine exactness: container codecs and the portable hash.

These run WITHOUT a SparkSession (fast, no fixtures) — they pin the
byte-level invariants the Spark operators and DuckDB oracles both
build on.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_rs_spark.operators import multimodal as mm

SET = settings(max_examples=40, deadline=None)


@SET
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_round_trip_any_raster(w, h, seed):
    rng = np.random.RandomState(seed % 2**32)
    px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert (mm.decode_png(mm.encode_png(px)) == px).all()


@SET
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_round_trip_any_raster(w, h, seed):
    rng = np.random.RandomState(seed % 2**32)
    px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert (mm.decode_ppm(mm.encode_ppm(px)) == px).all()


@SET
@given(samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=400))
def test_wav_round_trip_any_pcm(samples):
    arr = np.asarray(samples, dtype=np.int16)
    decoded, rate = mm.decode_wav(mm.encode_wav(arr))
    assert rate == 8000
    assert (np.rint(decoded * 32768.0).astype(np.int16) == arr).all()


@SET
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
    sub=st.sampled_from(["444", "420"]),
)
def test_jpeg_q100_error_bound_any_raster(w, h, seed, sub):
    """JPEG is lossy so there is no exact round trip; the invariant is
    the quality-100 bound: all-ones quant tables leave only DCT/round
    noise on luma, and 4:2:0 adds box-averaged chroma. Shape and dtype
    must be exact; per-pixel error bounded (luma-only grey rasters
    stay within a few counts even under 4:2:0)."""
    from etl_rs_spark.operators import jpeg as J

    rng = np.random.RandomState(seed % 2**32)
    grey = rng.randint(0, 256, size=(h, w, 1)).astype(np.uint8)
    px = np.repeat(grey, 3, axis=2)  # zero chroma: bound holds under 420 too
    out = J.decode_jpeg(J.encode_jpeg(px, quality=100, subsampling=sub))
    assert out.shape == px.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.int32) - px.astype(np.int32))
    assert err.max() <= 6


def test_ppm_rejects_zero_dimension_header():
    """'P6\\n0 23\\n255\\n' must be a ValueError, not an empty-raster
    'success' — fabricated data for a frame with no pixels (found by
    fuzzing; PNG/JPEG already reject zero dims)."""
    for hdr in (b"P6\n0 23\n255\n", b"P6\n4 0\n255\n", b"P6\n-3 2\n255\n"):
        with pytest.raises(ValueError):
            mm.decode_ppm(hdr)


def test_raster_decode_ceiling_rejects_absurd_headers():
    """Bit-flipped headers claiming multi-gigapixel frames must be
    clean ValueErrors: the PNG case overflowed the bounded inflate's
    C ssize_t (found by fuzzing), the JPEG case would allocate a ~17GB
    coefficient plane before reading any entropy data."""
    import struct as _struct

    ihdr = _struct.pack(">IIBBBBB", 0x40000000, 0x40000000, 8, 2, 0, 0, 0)
    payload = (
        mm.PNG_MAGIC
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", b"x")
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="decode ceiling"):
        mm.decode_png(payload)
    from etl_rs_spark.operators import jpeg as J

    good = bytearray(J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    sof = bytes(good).find(b"\xff\xc0")
    good[sof + 5 : sof + 9] = (65535).to_bytes(2, "big") * 2  # h=w=65535
    with pytest.raises(ValueError, match="decode ceiling"):
        J.decode_jpeg(bytes(good))


def test_png_decompression_bomb_is_bounded():
    """A few-KB PNG whose IDAT inflates to GBs must fail the length
    check WITHOUT materializing the bomb (bounded decompressobj) — an
    unbounded zlib.decompress would OOM the task before any check."""
    import struct as _struct
    import zlib

    ihdr = _struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)  # 8x8 RGB
    # ~200MB of zeros compresses to ~200KB; expected raw is 8*(24+1)=200B
    bomb = zlib.compress(b"\x00" * (200 * 1024 * 1024), 9)
    payload = (
        mm.PNG_MAGIC
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", bomb)
        + mm._png_chunk(b"IEND", b"")
    )
    assert len(payload) < 1 << 20  # the bomb itself is small on disk
    with pytest.raises(ValueError, match="wrong length"):
        mm.decode_png(payload)


def test_png_truncated_trailer_still_rejected():
    """The bounded inflate must not LOSE plain zlib.decompress's
    completeness check: an IDAT cut at the adler32 trailer yields all
    the scanline bytes with eof=False and must still be a ValueError
    (found by review of the bomb fix)."""
    import zlib

    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    good = mm.encode_png(px)
    idat_at = good.find(b"IDAT")
    import struct as _struct

    (length,) = _struct.unpack_from(">I", good, idat_at - 4)
    body = good[idat_at + 4 : idat_at + 4 + length]
    cut = body[:-4]  # complete deflate data, adler32 trailer gone
    rebuilt = (
        good[: idat_at - 4]
        + mm._png_chunk(b"IDAT", cut)
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="wrong length or truncated"):
        mm.decode_png(rebuilt)
    # and trailing garbage AFTER a complete stream is equally corrupt
    rebuilt2 = (
        good[: idat_at - 4]
        + mm._png_chunk(b"IDAT", body + b"junk")
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        mm.decode_png(rebuilt2)


def test_png_corrupt_idat_is_valueerror():
    """A PNG whose IDAT bytes are corrupted (valid signature + chunks,
    broken deflate stream) must raise ValueError, not leak zlib.error —
    decode_media's non-strict fallback catches exactly ValueError, so a
    leak kills the whole Spark task on one corrupt row. Found by
    tools/fuzz_codecs.py."""
    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    good = bytearray(mm.encode_png(px))
    idat_at = bytes(good).find(b"IDAT")
    good[idat_at + 10] ^= 0xFF  # flip bits inside the deflate stream
    with pytest.raises(ValueError, match="IDAT|PNG"):
        mm.decode_png(bytes(good))


@SET
@given(payload=st.binary(min_size=0, max_size=64))
def test_codecs_never_accept_garbage_silently(payload):
    """Malformed containers raise ValueError (null-on-invalid is the
    CALLER's policy) — they never return fabricated data."""
    from etl_rs_spark.operators.jpeg import decode_jpeg

    for decoder in (mm.decode_png, mm.decode_ppm, mm.decode_wav, decode_jpeg):
        try:
            decoder(payload)
        except ValueError:
            pass  # the contract
        # anything decoded successfully must have round-tripped real
        # structure; with <=64 random bytes that effectively never
        # happens, but if it does it must not crash differently


@SET
@given(word=st.text(min_size=0, max_size=40))
def test_word_hash60_matches_duckdb(word):
    """The engine-portable word hash: Spark computes
    conv(substr(md5(utf8(w)),1,15),16,10); DuckDB computes
    ('0x'||substr(md5(w),1,15))::BIGINT. Both equal the first 60 bits
    of the md5 — pinned here via hashlib, and against DuckDB itself."""
    import duckdb

    expected = int(hashlib.md5(word.encode("utf-8")).hexdigest()[:15], 16)
    got = duckdb.sql(
        "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT AS h", params=[word]
    ).fetchone()[0]
    assert got == expected


@SET
@given(
    tokens=st.lists(st.integers(0, 2**60 - 1), min_size=0, max_size=30),
)
def test_shingle_fold_invariant_under_mod_p(tokens):
    """(acc*B + w) mod p == (acc*B + (w mod p)) mod p — the identity
    that lets 60-bit word ids flow through the mod-p shingle polynomial
    with values unchanged vs the old mod-p ids (and no bigint
    overflow: acc*B + w <= 2^51 + 2^60)."""
    P, B = 2_147_483_647, 1_000_003

    def fold(ws):
        if not ws:
            return None
        acc = ws[0] % P
        for w in ws[1:]:
            acc = (acc * B + w) % P
            assert acc * B + w < 2**63  # the no-overflow claim itself
        return acc

    assert fold(tokens) == fold([t % P for t in tokens])


@SET
@given(
    vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=20),
)
def test_canon_folds_negative_zero(vals):
    """The oracle comparator's float canonicalization: values that
    compare equal must canonicalize equally (incl. -0.0 vs 0.0)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from check_oracle import canon

    for v in vals:
        assert canon(v) == canon(v + 0.0)
    assert canon(-0.0) == canon(0.0)
    assert canon(float("nan")) == "nan"
