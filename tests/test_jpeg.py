"""Baseline JPEG codec tests (operators/jpeg.py).

JPEG is lossy, so the contract is: exactness of the orthogonal transform
pair, validity of the canonical Huffman tables, near-losslessness at
quality 100, PSNR floors on smooth content at common qualities, chroma-
subsampling error bounded by the analytically-ideal 4:2:0 floor, restart-
marker streams, grayscale scans, and the unsupported-profile errors."""

import numpy as np
import pytest

from berkeley_entity_spark.operators.jpeg import (
    HUFF_AC_CHROMA,
    HUFF_AC_LUMA,
    HUFF_DC_CHROMA,
    HUFF_DC_LUMA,
    _canonical_codes,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    decode_jpeg,
    encode_jpeg,
    fdct8,
    idct8,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse > 0 else 99.0


def _gradient(h=48, w=40):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [x * 255 // (w - 1), y * 255 // (h - 1), (x + y) * 255 // (w + h - 2)],
        axis=-1,
    ).astype(np.uint8)


def test_dct_pair_exact():
    b = np.random.default_rng(0).normal(0, 50, (8, 8))
    assert np.allclose(idct8(fdct8(b)), b, atol=1e-10)


def test_huffman_tables_valid_prefix_codes():
    for spec in (HUFF_DC_LUMA, HUFF_DC_CHROMA, HUFF_AC_LUMA, HUFF_AC_CHROMA):
        codes = _canonical_codes(*spec)
        # prefix property: no code is a prefix of another
        as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
        assert len(as_bits) == len(codes)
        for a in as_bits:
            for b in as_bits:
                if a is not b and len(a) < len(b):
                    assert not b.startswith(a)
    # AC tables must cover every (run, size) the encoder can emit
    ac = _canonical_codes(*HUFF_AC_LUMA)
    for run in range(16):
        for size in range(1, 11):
            assert ((run << 4) | size) in ac
    assert 0x00 in ac and 0xF0 in ac


def test_quality_100_near_lossless():
    rng = np.random.default_rng(3)
    img = np.kron(
        rng.integers(0, 256, (4, 4, 3)).astype(float), np.ones((7, 9, 1))
    )[:24, :32].astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsample=False))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


@pytest.mark.parametrize("subsample,quality,floor", [
    (False, 95, 45), (False, 85, 40), (False, 60, 35),
    (True, 95, 38), (True, 85, 36), (True, 60, 33),
])
def test_roundtrip_psnr_floor_gradient(subsample, quality, floor):
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert out.shape == img.shape
    assert _psnr(img, out) >= floor


def test_odd_dimensions():
    img = _gradient(19, 29)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == (19, 29, 3)
    assert _psnr(img, out) >= 30


def test_chroma_hostile_image_within_subsampling_floor():
    """On saturated random color tiles, 4:2:0 loss is dominated by the
    subsampling itself; the codec must land within 2 dB of the
    analytically-ideal subsample->upsample floor."""
    rng = np.random.default_rng(3)
    img = np.kron(
        rng.integers(0, 256, (4, 4, 3)).astype(float), np.ones((7, 9, 1))
    )[:24, :32].astype(np.uint8)
    ycc = _rgb_to_ycbcr(img)
    cb = ycc[..., 1].reshape(12, 2, 16, 2).mean(axis=(1, 3))
    cr = ycc[..., 2].reshape(12, 2, 16, 2).mean(axis=(1, 3))
    ideal = _ycbcr_to_rgb(
        ycc[..., 0],
        np.repeat(np.repeat(cb, 2, 0), 2, 1),
        np.repeat(np.repeat(cr, 2, 0), 2, 1),
    )
    floor = _psnr(img, ideal)
    got = _psnr(img, decode_jpeg(encode_jpeg(img, quality=90, subsample=True)))
    assert got >= floor - 2.0


def test_restart_markers_roundtrip():
    img = _gradient(32, 48)
    plain = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    for interval in (1, 2, 5):
        b = encode_jpeg(img, quality=90, subsample=True, restart_interval=interval)
        assert any(
            b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7 for i in range(len(b) - 1)
        )
        assert np.array_equal(decode_jpeg(b), plain)


def test_grayscale_scan():
    """Hand-build a 1-component scan by re-tagging an encode of a gray
    image; simpler: strip chroma by encoding gray content and checking the
    decode broadcasts — the single-component path is exercised through a
    synthetic SOF/SOS built from the encoder's luma stream."""
    import struct

    from berkeley_entity_spark.operators import jpeg as J

    rng = np.random.default_rng(5)
    g = np.repeat(np.repeat(rng.integers(0, 256, (3, 4)), 8, 0), 8, 1).astype(
        np.uint8
    )
    # luma-only stream: reuse the encoder internals
    qy = J._quality_scale(J.QUANT_LUMA, 95)
    plane = g.astype(np.float64) - 128.0
    blocks = J._plane_blocks(plane, qy)
    dc_y = J._canonical_codes(*J.HUFF_DC_LUMA)
    ac_y = J._canonical_codes(*J.HUFF_AC_LUMA)
    bw = J._BitWriter()
    prev = 0
    for i in range(blocks.shape[0]):
        prev = J._encode_block(bw, blocks[i], prev, dc_y, ac_y)
    scan = bw.flush()

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    buf = bytearray(b"\xff\xd8")
    buf += seg(0xFFDB, bytes([0]) + bytes(qy[J.ZIGZAG].tolist()))
    buf += seg(0xFFC0, struct.pack(">BHHB", 8, 24, 32, 1) + bytes([1, 0x11, 0]))
    buf += seg(0xFFC4, bytes([0x00] + J.HUFF_DC_LUMA[0] + J.HUFF_DC_LUMA[1]))
    buf += seg(0xFFC4, bytes([0x10] + J.HUFF_AC_LUMA[0] + J.HUFF_AC_LUMA[1]))
    buf += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    buf += scan + b"\xff\xd9"
    out = decode_jpeg(bytes(buf))
    assert out.shape == (24, 32, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 6
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_progressive_and_bad_payloads_raise():
    import struct

    img = _gradient(16, 16)
    b = bytearray(encode_jpeg(img, quality=80))
    # flip SOF0 (0xFFC0) to SOF2 (0xFFC2): progressive must raise
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01notajpeg")
    # 16-bit quant table must raise
    hdr = b"\xff\xd8" + struct.pack(">HH", 0xFFDB, 2 + 129) + bytes([0x10] + [0] * 128)
    with pytest.raises(NotImplementedError, match="quant"):
        decode_jpeg(hdr + b"\xff\xd9")


def test_jpeg_distributed_decode_and_resize(spark):
    """JPEG payloads through the real mapInPandas codec path: features
    match the local computation; resize re-encodes decodable JPEG."""
    from berkeley_entity_spark.operators.jpeg import decode_jpeg as dj
    from berkeley_entity_spark.operators.multimodal import (
        _image_features,
        decode_media,
        resize_media,
    )

    img = _gradient(16, 12)
    payload = encode_jpeg(img, quality=92, subsample=False)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), (16, 12, 0, 0))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>",
    )
    got = decode_media(media, dim=16, fake=False).first()
    assert np.allclose(
        np.array(got["features"]), _image_features(dj(payload), 16)
    )
    row = resize_media(media, width=8, height=8, fake=False).first()
    out = dj(bytes(row["payload"]))
    assert out.shape == (8, 8, 3)
