"""GIF codec (operators/gif_codec.py): LZW round-trips, interlace,
malformed-lane quarantine, dispatch routing, and conformance both
directions against the JVM's own GIF implementation (javax.imageio)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_sprint_2_5_spark.operators.gif_codec import gif_decode, gif_encode


def _rand(rng, h, w, ncol):  # noqa: ANN001
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, (h, w), dtype=np.uint8)
    return idx, pal


@pytest.mark.parametrize(
    "h,w,ncol,interlace",
    [
        (16, 16, 256, False),
        (33, 47, 256, True),
        (8, 300, 5, False),
        (64, 64, 2, True),
        (1, 1, 2, False),
        (9, 9, 17, True),
    ],
)
def test_roundtrip(h, w, ncol, interlace):
    idx, pal = _rand(np.random.default_rng(h * 1000 + w), h, w, ncol)
    rgb = gif_decode(gif_encode(idx, pal, interlace=interlace))
    assert rgb.shape == (h, w, 3)
    assert (rgb == pal[idx]).all()


def test_lzw_table_growth_to_12_bits_and_midstream_clear():
    """A large repetitive image drives the code width to 12 bits and
    overflows the 4096-entry table, forcing the encoder's mid-stream
    CLEAR; the decoder must resync."""
    big = np.tile(np.arange(64, dtype=np.uint8).reshape(8, 8), (64, 64))
    pal = np.random.default_rng(1).integers(0, 256, (64, 3), dtype=np.uint8)
    assert (gif_decode(gif_encode(big, pal)) == pal[big]).all()


def test_kwkwk_case():
    """aaaa... immediately exercises the self-referential LZW code
    (decoder receives a code one past its table)."""
    idx = np.zeros((4, 64), dtype=np.uint8)
    pal = np.array([[10, 20, 30], [0, 0, 0]], dtype=np.uint8)
    rgb = gif_decode(gif_encode(idx, pal))
    assert (rgb == np.array([10, 20, 30], dtype=np.uint8)).all()


def test_malformed_quarantine():
    idx, pal = _rand(np.random.default_rng(0), 10, 10, 16)
    data = gif_encode(idx, pal)
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTAGIF" + data[6:])
    with pytest.raises(ValueError):
        gif_decode(data[: len(data) // 2])  # truncated stream
    # trailer with no image
    with pytest.raises(ValueError):
        gif_decode(data[:13] + bytes(pal.size + 3) + b"\x3b")
    with pytest.raises(ValueError, match="palette"):
        gif_encode(np.full((4, 4), 16, dtype=np.uint8), pal)


def test_extension_blocks_are_skipped():
    """A graphic-control extension (0x21 0xF9) before the image
    descriptor must be skipped structurally."""
    idx, pal = _rand(np.random.default_rng(2), 6, 7, 8)
    data = bytearray(gif_encode(idx, pal))
    sep = data.index(0x2C, 13)  # image separator after header+GCT
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = bytes(data[:sep]) + gce + bytes(data[sep:])
    assert (gif_decode(patched) == pal[idx]).all()


def test_dispatch_routes_gif_to_real(spark):
    import pandas as pd

    from etl_sprint_2_5_spark.operators import multimodal as M

    idx, pal = _rand(np.random.default_rng(3), 12, 18, 32)
    blob = gif_encode(idx, pal, interlace=True)
    df = spark.createDataFrame(
        pd.DataFrame({"id": ["g1"], "payload": [blob]})
    )
    row = M.decode_images(df, "id", "payload").collect()[0]
    assert (row.decode_ok, row.width, row.height, row.channels) == (
        "real",
        18,
        12,
        3,
    )


def test_imageio_reads_our_gifs(spark, tmp_path):
    """Conformance: the JVM's independent GIF decoder reproduces our
    pixels exactly, interlaced and not."""
    jvm = spark._jvm
    rng = np.random.default_rng(5)
    for i, (h, w, ncol, inter) in enumerate(
        [(16, 16, 256, False), (21, 13, 7, True), (40, 40, 64, True)]
    ):
        idx, pal = _rand(rng, h, w, ncol)
        p = tmp_path / f"ours{i}.gif"
        p.write_bytes(gif_encode(idx, pal, interlace=inter))
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(str(p)))
        assert (img.getWidth(), img.getHeight()) == (w, h)
        got = np.array(
            img.getRGB(0, 0, w, h, None, 0, w), dtype=np.int64
        ).reshape(h, w)
        exp = pal[idx].astype(np.int64)
        assert ((got >> 16) & 0xFF == exp[:, :, 0]).all()
        assert ((got >> 8) & 0xFF == exp[:, :, 1]).all()
        assert (got & 0xFF == exp[:, :, 2]).all()


def test_we_read_imageio_gifs(spark, tmp_path):
    jvm = spark._jvm
    bi = jvm.java.awt.image.BufferedImage(
        10, 6, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(6):
        for x in range(10):
            bi.setRGB(x, y, (x * 20 << 16) | (y * 40 << 8) | ((x + y) * 9))
    p = tmp_path / "java.gif"
    jvm.javax.imageio.ImageIO.write(bi, "gif", jvm.java.io.File(str(p)))
    ours = gif_decode(p.read_bytes())
    ref = np.array(
        bi.getRGB(0, 0, 10, 6, None, 0, 10), dtype=np.int64
    ).reshape(6, 10)
    exp = np.stack(
        [(ref >> 16) & 0xFF, (ref >> 8) & 0xFF, ref & 0xFF], axis=2
    )
    assert (ours == exp).all()
