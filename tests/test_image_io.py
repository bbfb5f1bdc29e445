"""Image writer tests: BMP/PNG round-trip against independent decoders."""
import struct
import zlib

import numpy as np
import pytest

from fraytracer_tpu.image.io import save_image, write_bmp, write_png


@pytest.fixture
def img(rng):
    return rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)


def test_bmp_roundtrip(tmp_path, img):
    path = str(tmp_path / "x.bmp")
    write_bmp(path, img)
    data = open(path, "rb").read()
    assert data[:2] == b"BM"
    file_size, _, _, offset = struct.unpack("<IHHI", data[2:14])
    assert file_size == len(data)
    hdr = struct.unpack("<IiiHHIIiiII", data[14:54])
    assert (hdr[1], hdr[2], hdr[4]) == (5, 7, 24)
    # decode pixel data: bottom-up BGR rows, stride padded to 4
    stride = (5 * 3 + 3) // 4 * 4
    px = np.frombuffer(data[offset:], np.uint8).reshape(7, stride)
    decoded = px[:, :15].reshape(7, 5, 3)[::-1, :, ::-1]
    np.testing.assert_array_equal(decoded, img)


def test_png_roundtrip(tmp_path, img):
    path = str(tmp_path / "x.png")
    write_png(path, img)
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # parse chunks
    pos, chunks = 8, {}
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        chunks[tag] = data[pos + 8:pos + 8 + ln]
        # crc check
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        assert crc == (zlib.crc32(tag + chunks[tag]) & 0xFFFFFFFF)
        pos += 12 + ln
    w, h, depth, ctype = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    assert (w, h, depth, ctype) == (5, 7, 8, 2)
    raw = zlib.decompress(chunks[b"IDAT"])
    rows = np.frombuffer(raw, np.uint8).reshape(7, 1 + 15)
    assert np.all(rows[:, 0] == 0)  # filter None
    decoded = rows[:, 1:].reshape(7, 5, 3)
    np.testing.assert_array_equal(decoded, img)


def test_save_image_dispatch(tmp_path, img):
    save_image(str(tmp_path / "a.png"), img)
    save_image(str(tmp_path / "b.bmp"), img)
    with pytest.raises(ValueError):
        save_image(str(tmp_path / "c.gif"), img)


def test_rejects_float(tmp_path):
    with pytest.raises(TypeError):
        write_png(str(tmp_path / "f.png"), np.zeros((4, 4, 3), np.float32))


def test_bmp_odd_width_padding(tmp_path, rng):
    """Widths whose row bytes aren't a multiple of 4 exercise stride pad."""
    img = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    path = str(tmp_path / "p.bmp")
    write_bmp(path, img)
    data = open(path, "rb").read()
    stride = 12  # 3*3=9 → padded to 12
    px = np.frombuffer(data[54:], np.uint8).reshape(3, stride)
    decoded = px[:, :9].reshape(3, 3, 3)[::-1, :, ::-1]
    np.testing.assert_array_equal(decoded, img)
