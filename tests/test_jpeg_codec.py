"""Baseline JPEG codec tests — operators/jpeg.py.

JPEG is lossy, so unlike WAV/PPM/PNG there is no exact round-trip and no
SQL-replayable oracle: parity is (a) encode→decode error bounds on
smooth and random rasters, (b) EXACT pixel equality between decodes of
equivalent streams (restart markers on/off, 8- vs 16-bit DQT, with/
without COM + fill bytes — same quantized coefficients, so the decoder
must produce identical output), and (c) the Spark mapInPandas path
matching a driver-side decode of the same payloads.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_rs_spark.operators import jpeg as J
from etl_rs_spark.operators import multimodal as mm


def _smooth(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Smooth gradient raster — low high-frequency energy, so a
    quality-90 round trip stays within a few counts per pixel."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (30 + seed * 13 + yy * 2 + xx) % 256
    g = (80 + xx * 2) % 256
    b = (160 + yy) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_jpeg_round_trip_smooth_444():
    px = _smooth(24, 32)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=95, subsampling="444"))
    assert out.shape == px.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.int32) - px.astype(np.int32))
    assert err.max() <= 12 and err.mean() <= 3.0


def test_jpeg_round_trip_quality_100_near_lossless():
    """quality=100 scales every Annex K entry to 1 — the only loss left
    is DCT/rounding noise, which must stay within a couple of counts
    even on a RANDOM raster."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=100, subsampling="444"))
    err = np.abs(out.astype(np.int32) - px.astype(np.int32))
    assert err.max() <= 4


def test_jpeg_420_subsampling():
    px = _smooth(32, 48, seed=3)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=90, subsampling="420"))
    assert out.shape == px.shape
    # chroma is box-averaged 2x2, so the bound is looser than 4:4:4 but
    # a smooth raster must still reconstruct closely
    err = np.abs(out.astype(np.int32) - px.astype(np.int32))
    assert err.mean() <= 4.0 and err.max() <= 24


def test_jpeg_non_multiple_of_8_dims():
    for h, w, sub in [(13, 11, "444"), (17, 9, "420"), (1, 1, "444"), (8, 25, "420")]:
        px = _smooth(h, w, seed=h + w)
        out = J.decode_jpeg(J.encode_jpeg(px, quality=92, subsampling=sub))
        assert out.shape == (h, w, 3), (h, w, sub)


def test_jpeg_restart_markers_decode_identically():
    """DRI/RSTn only re-anchor the DC predictors — the quantized
    coefficients are identical, so the decode must match the
    no-restart stream EXACTLY, and the restart path must actually be
    exercised (markers present in the stream)."""
    px = _smooth(24, 40, seed=5)  # 3x5 MCUs at 4:4:4
    plain = J.encode_jpeg(px, quality=85, subsampling="444")
    with_rst = J.encode_jpeg(px, quality=85, subsampling="444", restart_interval=2)
    assert with_rst != plain and b"\xff\xdd" in with_rst
    assert any(bytes([0xFF, 0xD0 + n]) in with_rst for n in range(8))
    assert (J.decode_jpeg(with_rst) == J.decode_jpeg(plain)).all()
    # 420 MCUs are 16x16: 2x3 MCUs, restart every MCU
    px2 = _smooth(32, 48, seed=6)
    plain2 = J.encode_jpeg(px2, quality=85, subsampling="420")
    rst2 = J.encode_jpeg(px2, quality=85, subsampling="420", restart_interval=1)
    assert (J.decode_jpeg(rst2) == J.decode_jpeg(plain2)).all()


def test_jpeg_grayscale_single_component():
    """1-component scans: build a grayscale JPEG from the module's own
    canonical tables and writer; the decoder must replicate Y to 3
    channels and reconstruct the ramp closely."""
    h, w = 19, 21
    yy, xx = np.mgrid[0:h, 0:w]
    plane = ((yy * 5 + xx * 3) % 256).astype(np.uint8)

    qt = J._quality_scaled(J.QTABLE_LUMA, 95)
    dc = J._huff_encode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._huff_encode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    padded = np.pad(
        plane.astype(np.float64),
        ((0, (-h) % 8), (0, (-w) % 8)),
        mode="edge",
    )
    blocks = J._to_blocks(padded)
    writer = J._BitWriter()
    pred = 0
    for my in range(blocks.shape[0]):
        for mx in range(blocks.shape[1]):
            pred = J._encode_blocks(
                writer, [blocks[my, mx]], qt.reshape(8, 8), dc, ac, pred
            )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(int(qt[z]) for z in J.ZIGZAG))
        + seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + writer.flush()
        + b"\xff\xd9"
    )
    out = J.decode_jpeg(payload)
    assert out.shape == (h, w, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 0] == out[..., 2]).all()
    err = np.abs(out[..., 0].astype(np.int32) - plane.astype(np.int32))
    assert err.max() <= 10 and err.mean() <= 2.5


def _rewrite_dqt_16bit(payload: bytes) -> bytes:
    """Byte-surgery: re-emit every 8-bit DQT segment with Pq=1 (16-bit
    big-endian entries, same values) — the decode must not change."""
    out = bytearray()
    pos = 0
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] == 0xDB:
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            body = payload[pos + 4 : pos + 2 + seglen]
            tq = body[0] & 15
            vals = body[1:65]
            new_body = bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", v) for v in vals
            )
            out += bytes([0xFF, 0xDB]) + struct.pack(">H", len(new_body) + 2) + new_body
            pos += 2 + seglen
            continue
        if payload[pos] == 0xFF and payload[pos + 1] == 0xDA:
            out += payload[pos:]  # entropy data: copy verbatim
            break
        out.append(payload[pos])
        pos += 1
    return bytes(out)


def test_jpeg_16bit_dqt_decodes_identically():
    px = _smooth(16, 24, seed=9)
    plain = J.encode_jpeg(px, quality=80)
    wide = _rewrite_dqt_16bit(plain)
    assert wide != plain
    assert (J.decode_jpeg(wide) == J.decode_jpeg(plain)).all()


def test_jpeg_com_segments_and_fill_bytes_skipped():
    px = _smooth(16, 16, seed=2)
    plain = J.encode_jpeg(px, quality=88)
    com = b"\xff\xfe" + struct.pack(">H", 2 + 11) + b"a comment!!"
    # splice a COM right after SOI and a 0xFF fill byte before SOF0
    spliced = plain[:2] + com + plain[2:]
    spliced = spliced.replace(b"\xff\xc0", b"\xff\xff\xc0", 1)
    assert (J.decode_jpeg(spliced) == J.decode_jpeg(plain)).all()


def test_jpeg_error_paths():
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"payload-123")
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        J.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x00\x00")  # progressive SOF2
    px = _smooth(16, 16)
    good = J.encode_jpeg(px, quality=90)
    # 12-bit precision: patch the SOF0 precision byte
    sof_at = good.find(b"\xff\xc0")
    bad_prec = bytearray(good)
    bad_prec[sof_at + 4] = 12
    with pytest.raises(ValueError, match="only 8-bit"):
        J.decode_jpeg(bytes(bad_prec))
    # entropy stream cut mid-scan (EOI gone too): 2 bytes of entropy
    # cannot hold 12 blocks — must raise, never IndexError past the pad
    with pytest.raises(ValueError):
        J.decode_jpeg(good[: good.find(b"\xff\xda") + 16])
    with pytest.raises(ValueError, match="quality"):
        J.encode_jpeg(px, quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_jpeg(px, subsampling="422")
    with pytest.raises(ValueError, match="RGB"):
        J.encode_jpeg(px[..., 0])
    # restart markers promised by DRI but absent from the stream
    rst = J.encode_jpeg(_smooth(24, 40), quality=85, restart_interval=2)
    stripped = rst
    for n in range(8):
        stripped = stripped.replace(bytes([0xFF, 0xD0 + n]), b"")
    with pytest.raises(ValueError):
        J.decode_jpeg(stripped)


def test_jpeg_malformed_raises_valueerror_only():
    """decode_media's non-strict fallback catches exactly ValueError, so
    a parse failure escaping as struct.error/IndexError/KeyError would
    kill the whole Spark task on one corrupt row. These payloads are
    SOI-valid but malformed at deeper parse stages that used to leak
    low-level exceptions."""
    cases = [
        b"\xff\xd8\xff\xc0\x00\x03\x08",  # SOF body too short for >HH
        b"\xff\xd8\xff\xdd\x00\x02",  # DRI with empty body
    ]
    px = _smooth(16, 16)
    good = J.encode_jpeg(px, quality=90)
    sos_at = good.find(b"\xff\xda")
    # SOS component selector that matches no SOF component id
    bad_sel = bytearray(good)
    bad_sel[sos_at + 5] = 0x7F
    cases.append(bytes(bad_sel))
    # SOS marker whose declared body extends past the payload end
    cases.append(good[: sos_at + 4])
    # consistent seglen but Ns=3 with only one selector pair present:
    # sos[1 + 2*c] indexes past the body (was IndexError)
    cases.append(good[:sos_at] + b"\xff\xda\x00\x05\x03\x01\x00")
    for payload in cases:
        with pytest.raises(ValueError):
            J.decode_jpeg(payload)


def test_jpeg_rejects_hostile_sampling_factors():
    """Hi/Vi outside [1,4] (div-by-zero risk) and spec-legal but
    non-divisible mixes (3 vs 2 → non-integer upsample ratio) must be
    clean ValueErrors, not ZeroDivisionError / numpy broadcast errors."""
    good = J.encode_jpeg(_smooth(16, 16), quality=90, subsampling="420")
    sof_at = good.find(b"\xff\xc0")
    zero_hv = bytearray(good)
    zero_hv[sof_at + 11] = 0x00  # first component H=0 V=0
    with pytest.raises(ValueError, match="sampling factor out of range"):
        J.decode_jpeg(bytes(zero_hv))
    mixed = bytearray(good)
    mixed[sof_at + 11] = 0x33  # Y at 3x3 against 1x1 chroma: 3//2 trap shape
    mixed[sof_at + 14] = 0x22  # Cb at 2x2 -> vmax=3, vi=2 non-divisible
    with pytest.raises(ValueError, match="non-integer upsample"):
        J.decode_jpeg(bytes(mixed))


def test_jpeg_rejects_hostile_dc_category():
    """A hostile DHT can map a Huffman code to any 8-bit symbol, but
    T.81 F.1.2.1.1 caps baseline DC categories at 11. Symbols 12..15
    used to silently read garbage magnitude bits and symbols > 16 only
    failed via Python's negative-shift ValueError inside receive() —
    both must now hit the explicit category check."""
    good = J.encode_jpeg(_smooth(16, 16), quality=90)
    for hostile_sym in (0x0F, 0x1F):
        payload = bytearray(good)
        at = 2
        patched = False
        while at + 4 <= len(payload):
            if payload[at] != 0xFF:
                break
            marker = payload[at + 1]
            (seglen,) = struct.unpack_from(">H", payload, at + 2)
            if marker == 0xDA:
                break
            if marker == 0xC4 and (payload[at + 4] >> 4) == 0:  # Tc=0: DC
                for i in range(at + 4 + 17, at + 2 + seglen):
                    payload[i] = hostile_sym
                patched = True
            at += 2 + seglen
        assert patched, "no DC DHT segment found to patch"
        with pytest.raises(ValueError, match="DC category out of range"):
            J.decode_jpeg(bytes(payload))


def test_jpeg_rejects_hostile_ac_category():
    """The AC twin of the DC check: T.81 F.1.2.2.1 caps baseline AC
    magnitude categories (the symbol's low nibble) at 10 — a hostile
    AC DHT mapping codes to 11..15 must raise, not silently read
    garbage magnitude bits."""
    good = J.encode_jpeg(_smooth(16, 16), quality=90)
    payload = bytearray(good)
    at = 2
    patched = False
    while at + 4 <= len(payload):
        if payload[at] != 0xFF:
            break
        marker = payload[at + 1]
        (seglen,) = struct.unpack_from(">H", payload, at + 2)
        if marker == 0xDA:
            break
        if marker == 0xC4 and (payload[at + 4] >> 4) == 1:  # Tc=1: AC
            for i in range(at + 4 + 17, at + 2 + seglen):
                payload[i] = 0x0F  # run 0, category 15
            patched = True
        at += 2 + seglen
    assert patched, "no AC DHT segment found to patch"
    with pytest.raises(ValueError, match="AC category out of range"):
        J.decode_jpeg(bytes(payload))


def test_jpeg_decode_rejects_missing_tables():
    """A scan referencing a DQT/DHT id that was never defined must be a
    clean ValueError, not an IndexError/KeyError."""
    px = _smooth(8, 8)
    good = J.encode_jpeg(px, quality=90)
    # drop the first DQT segment entirely
    at = good.find(b"\xff\xdb")
    (seglen,) = struct.unpack_from(">H", good, at + 2)
    with pytest.raises(ValueError, match="missing DQT"):
        J.decode_jpeg(good[:at] + good[at + 2 + seglen :])


# -- the Spark path over real JPEG payloads ---------------------------------

def test_synth_media_real_jpeg_stats_match_driver_decode(spark):
    """synth_media(real_jpeg=True) gives image/jpeg rows a genuine
    baseline JFIF container; extract_decoded_stats (strict, never stubs)
    over Spark must equal a driver-side decode_jpeg of the same
    deterministic payloads."""
    media = mm.synth_media(spark, 40, real_jpeg=True)
    jpegs = mm.filter_media_metadata(media, mimes=("image/jpeg",))
    got = {
        r["media_id"]: (r["n_values"], r["sum_values"])
        for r in mm.extract_decoded_stats(jpegs).collect()
    }
    ids = [r["media_id"] for r in jpegs.select("media_id").collect()]
    assert len(got) == len(ids) > 0
    for mid in ids:
        i = int(mid.split("-")[1])
        px = J.decode_jpeg(mm._synth_jpeg(i)).astype(np.int64)
        assert got[mid] == (int(px.size), int(px.sum())), mid
    # strict-mode features over the same rows: real decode, no stub
    feats = mm.extract_features(jpegs, dim=4, strict=True).collect()
    assert len(feats) == len(ids)
    by_id = {r["media_id"]: r["feature"] for r in feats}
    for mid in ids[:5]:
        i = int(mid.split("-")[1])
        local = mm._pool_to_dim(
            J.decode_jpeg(mm._synth_jpeg(i)).astype(np.float64) / 255.0, 4
        )
        assert by_id[mid] == pytest.approx(local)
