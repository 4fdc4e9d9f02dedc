"""Cross-validate the stdlib baseline-JPEG decoder against a fully
independent codec: the JVM's javax.imageio JPEG plugin, which ships
inside the Spark runtime this engine already depends on (no new
dependency, and a codebase that shares zero lines with ours).

Two directions:

* grayscale — Java encodes a single-component baseline JPEG; our
  decode must match Java's own decode of the same bytes to within
  per-sample rounding + IDCT-implementation differences (≤ 3/255).
* color — Java's default for 3-channel images is YCbCr 4:2:0
  (luma 2x2, chroma 1x1; asserted from the SOF so this test FAILS
  LOUDLY if a future JVM changes the default rather than silently
  testing the wrong path). Our decoder returns the luma plane, so it
  is compared against Java's RAW pre-colorconvert Y channel
  (ImageReader.readRaster), which is immune to the YCbCr→RGB
  clipping that makes RGB-recombined luma unrecoverable on
  saturated-chroma images.
"""

from __future__ import annotations

import struct

import numpy as np

from gbif_filter_python_spark.multimodal.binary_ops import (
    decode_jpeg_bytes,
)


def _jvm(spark):
    return spark._jvm


def _jvm_encode(spark, arr: np.ndarray, progressive: bool = False) -> bytes:
    """uint8 (h, w) or (h, w, 3) RGB → JPEG bytes via javax.imageio.

    ``progressive=True`` asks the writer for its default progressive
    scan script (spectral selection + successive approximation — the
    standard libjpeg 10-scan layout)."""
    jvm = _jvm(spark)
    if arr.ndim == 2:
        h, w = arr.shape
        img = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
        data = bytearray(arr.tobytes())
    else:
        h, w, _ = arr.shape
        img = jvm.java.awt.image.BufferedImage(w, h, 5)  # TYPE_3BYTE_BGR
        data = bytearray(arr[:, :, ::-1].copy().tobytes())
    img.getRaster().setDataElements(0, 0, w, h, data)
    bos = jvm.java.io.ByteArrayOutputStream()
    if not progressive:
        assert jvm.javax.imageio.ImageIO.write(img, "jpg", bos)
        return bytes(bos.toByteArray())
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpeg"
    ).next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(
        jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
    )
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    return bytes(bos.toByteArray())


def _jvm_decode_first_band(spark, payload: bytes) -> np.ndarray:
    """Java's own decode of ``payload`` (band 0, converted image)."""
    jvm = _jvm(spark)
    bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    img = jvm.javax.imageio.ImageIO.read(bis)
    w, h = img.getWidth(), img.getHeight()
    obj = img.getRaster().getDataElements(0, 0, w, h, None)
    arr = np.frombuffer(bytes(obj), dtype=np.uint8)
    return arr.reshape(h, w, arr.size // (w * h))[:, :, 0]


def _jvm_raw_luma(spark, payload: bytes) -> np.ndarray:
    """Java's RAW YCbCr raster (no color conversion), Y band."""
    jvm = _jvm(spark)
    bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    iis = jvm.javax.imageio.ImageIO.createImageInputStream(bis)
    reader = jvm.javax.imageio.ImageIO.getImageReadersByFormatName(
        "jpeg"
    ).next()
    reader.setInput(iis)
    raster = reader.readRaster(0, None)
    w, h = raster.getWidth(), raster.getHeight()
    obj = raster.getDataElements(0, 0, w, h, None)
    arr = np.frombuffer(bytes(obj), dtype=np.uint8)
    return arr.reshape(h, w, arr.size // (w * h))[:, :, 0]


def _sof_samplings(payload: bytes) -> list[tuple[int, int, int]]:
    """(component id, h, v) triples from the frame header."""
    pos = 2
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        pos += 2
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if marker in (0xC0, 0xC1, 0xC2):
            ncomp = payload[pos + 7]
            return [
                (
                    payload[pos + 8 + 3 * i],
                    payload[pos + 9 + 3 * i] >> 4,
                    payload[pos + 9 + 3 * i] & 0x0F,
                )
                for i in range(ncomp)
            ]
        pos += seglen
    raise AssertionError("no SOF in payload")


def test_jvm_grayscale_jpeg_decodes_identically(spark):
    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:40, 0:56]
    gray = np.clip(
        (np.sin(x / 7) + np.cos(y / 9)) / 4 + 0.5
        + 0.05 * rng.random((40, 56)),
        0,
        1,
    )
    payload = _jvm_encode(
        spark, np.clip(np.rint(gray * 255), 0, 255).astype(np.uint8)
    )
    assert [(c[1], c[2]) for c in _sof_samplings(payload)] == [(1, 1)]
    mine = decode_jpeg_bytes(payload)
    theirs = _jvm_decode_first_band(spark, payload).astype(np.float64)
    assert mine.shape == (40, 56)
    assert float(np.abs(mine - theirs / 255.0).max()) <= 3.0 / 255


def test_jvm_color_420_jpeg_luma_matches_raw_raster(spark):
    y, x = np.mgrid[0:40, 0:56]
    # deliberately SATURATED chroma: the raw-Y comparison must hold
    # even where YCbCr→RGB clips
    rgb = np.stack(
        [
            np.clip((np.sin(x / 5) + 1) / 2, 0, 1),
            np.clip((np.cos(y / 8) + 1) / 2, 0, 1),
            np.clip((x + y) / 96.0, 0, 1),
        ],
        axis=-1,
    )
    payload = _jvm_encode(
        spark, np.clip(np.rint(rgb * 255), 0, 255).astype(np.uint8)
    )
    samplings = [(c[1], c[2]) for c in _sof_samplings(payload)]
    # Java's default: 4:2:0 — luma 2x2, chroma 1x1. This is the
    # subsampled-MCU decode path (4 interleaved Y blocks per MCU).
    assert samplings == [(2, 2), (1, 1), (1, 1)], samplings
    mine = decode_jpeg_bytes(payload)
    raw_y = _jvm_raw_luma(spark, payload).astype(np.float64)
    assert mine.shape == (40, 56)
    assert float(np.abs(mine - raw_y / 255.0).max()) <= 3.0 / 255


def _assert_sof2(payload: bytes) -> None:
    pos = 2
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        if marker == 0xC2:
            return
        assert marker not in (0xC0, 0xC1), "writer emitted sequential"
        pos += 2 + struct.unpack_from(">H", payload, pos + 2)[0]
    raise AssertionError("no SOF in payload")


def test_jvm_progressive_grayscale_decodes_identically(spark):
    """SOF2 path, single component: spectral-selection bands, DC/AC
    successive-approximation refinement scans and EOB runs, validated
    against Java's own decode of its default progressive output."""
    rng = np.random.default_rng(17)
    y, x = np.mgrid[0:24, 0:40]
    gray = np.clip(
        (np.sin(x / 6) + np.cos(y / 8)) / 4 + 0.5
        + 0.1 * rng.random((24, 40)),
        0,
        1,
    )
    payload = _jvm_encode(
        spark,
        np.clip(np.rint(gray * 255), 0, 255).astype(np.uint8),
        progressive=True,
    )
    _assert_sof2(payload)
    mine = decode_jpeg_bytes(payload)
    theirs = _jvm_decode_first_band(spark, payload).astype(np.float64)
    assert mine.shape == (24, 40)
    assert float(np.abs(mine - theirs / 255.0).max()) <= 3.0 / 255


def test_jvm_progressive_color_420_luma_matches_raw_raster(spark):
    """SOF2 path, 3 components at 4:2:0: the interleaved DC scan
    walks every component's bits; chroma AC scans are skipped whole;
    luma compared against Java's raw pre-colorconvert Y raster."""
    y, x = np.mgrid[0:40, 0:56]
    rgb = np.stack(
        [
            np.clip((np.sin(x / 5) + 1) / 2, 0, 1),
            np.clip((np.cos(y / 8) + 1) / 2, 0, 1),
            np.clip((x + y) / 96.0, 0, 1),
        ],
        axis=-1,
    )
    payload = _jvm_encode(
        spark,
        np.clip(np.rint(rgb * 255), 0, 255).astype(np.uint8),
        progressive=True,
    )
    _assert_sof2(payload)
    samplings = [(c[1], c[2]) for c in _sof_samplings(payload)]
    assert samplings == [(2, 2), (1, 1), (1, 1)], samplings
    mine = decode_jpeg_bytes(payload)
    raw_y = _jvm_raw_luma(spark, payload).astype(np.float64)
    assert mine.shape == (40, 56)
    assert float(np.abs(mine - raw_y / 255.0).max()) <= 3.0 / 255


def test_jvm_odd_dimension_matrix_gray_color_baseline_progressive(spark):
    """Partial-MCU edge cases: non-multiple-of-8 (and at 4:2:0,
    non-multiple-of-16) frame dimensions force padded block grids that
    must be decoded fully and cropped exactly. Matrix of odd shapes x
    {gray, color} x {baseline, progressive}, every cell compared
    against Java's raw Y raster (a 24-cell sweep of this matrix passed
    0-fail during development; this pins a 12-cell core)."""
    rng = np.random.default_rng(5)
    jvm = _jvm(spark)
    for h, w in [(23, 41), (9, 17), (7, 50)]:
        for gray in (True, False):
            for progressive in (False, True):
                y, x = np.mgrid[0:h, 0:w]
                base = np.clip(
                    (np.sin(x / 4.0) + np.cos(y / 5.0)) / 4
                    + 0.5
                    + 0.1 * rng.random((h, w)),
                    0,
                    1,
                )
                u8 = np.clip(np.rint(base * 255), 0, 255).astype(np.uint8)
                arr = (
                    u8
                    if gray
                    else np.stack([u8, np.roll(u8, 3, 1), 255 - u8], -1)
                )
                payload = _jvm_encode(spark, arr, progressive=progressive)
                mine = decode_jpeg_bytes(payload)
                theirs = _jvm_raw_luma(spark, payload).astype(np.float64)
                assert mine.shape == (h, w), (h, w, gray, progressive)
                err = float(np.abs(mine - theirs / 255.0).max())
                assert err <= 3.0 / 255, (h, w, gray, progressive, err)
