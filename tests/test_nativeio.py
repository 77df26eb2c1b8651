"""Native IO hardening: corrupt inputs, PIL fallback, prefetcher contract.

All tests skip when the C++ library is not built (make -C native).
"""

import os
import struct

import numpy as np
import pytest

from panodepth import io as pio
from panodepth.utils import nativeio

pytestmark = pytest.mark.skipif(not nativeio.available(),
                                reason="native IO library not built")

_PNG_SIG = bytes([137, 80, 78, 71, 13, 10, 26, 10])


def test_corrupt_png_is_clean_error_not_crash(tmp_path):
    """Truncated files and lying IDAT lengths must fail with an IOError,
    never read past the heap buffer."""
    # valid signature + IHDR claiming a huge IDAT that is not there
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">IIBBBBB", 4, 4, 8, 0, 0, 0, 0) + b"\0\0\0\0"
    idat = struct.pack(">I", 0xFFFFFF) + b"IDAT"  # length >> file size
    f = str(tmp_path / "lying.png")
    open(f, "wb").write(_PNG_SIG + ihdr + idat + b"xx")
    with pytest.raises(IOError):
        nativeio.read_image_f32(f)

    # absurd dimensions must be rejected up front, not allocated
    big = struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">IIBBBBB", 1 << 30, 1 << 30, 8, 0, 0, 0, 0) + b"\0\0\0\0"
    f2 = str(tmp_path / "huge.png")
    open(f2, "wb").write(_PNG_SIG + big)
    with pytest.raises(IOError):
        nativeio.read_image_f32(f2)

    # not a PNG at all
    f3 = str(tmp_path / "junk.png")
    open(f3, "wb").write(b"definitely not a png, far beyond 33 bytes....")
    with pytest.raises(IOError):
        nativeio.read_image_f32(f3)


def test_palette_png_falls_back_to_pil(tmp_path):
    """PNG variants the native codec rejects (palette) still load through
    load_image01's PIL fallback instead of aborting the run."""
    from PIL import Image

    img = Image.fromarray(
        (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)).convert("P")
    f = str(tmp_path / "palette.png")
    img.save(f)
    out = pio.load_image01(f)  # must not raise
    assert out.shape[:2] == (8, 8)


def test_pfm_payload_starting_with_whitespace_byte(tmp_path):
    """A first payload float whose low byte is whitespace-class (0x20)
    must survive the header parse (the old '%f\\n' fscanf ate it)."""
    val = np.frombuffer(bytes([0x20, 0x00, 0x80, 0x3F]), "<f4")[0]
    data = np.full((4, 6), val, "<f4")
    f = str(tmp_path / "ws.pfm")
    with open(f, "wb") as fp:
        fp.write(b"Pf\n6 4\n-1.0\n")
        fp.write(data.tobytes())
    out = nativeio.read_image_f32(f)
    np.testing.assert_array_equal(out, data)


def test_prefetch_double_take_errors(tmp_path):
    """The second take of an item must fail (its buffer was handed out
    and cleared), not return uninitialized memory as pixels."""
    f = str(tmp_path / "a.png")
    pio.save_png16(f, (np.arange(48, dtype=np.uint16).reshape(6, 8) * 100))
    pf = nativeio.BatchPrefetcher([f], threads=1)
    try:
        first = pf.get(0)
        assert first is not None and first.shape == (6, 8)
        assert pf.get(0) is None  # consumed
    finally:
        pf.close()


def test_write_png16_level_clamped(tmp_path):
    """Out-of-range deflate levels clamp 0-9 like the PIL fallback."""
    img = (np.arange(48, dtype=np.uint16).reshape(6, 8) * 1000)
    f = str(tmp_path / "lvl.png")
    nativeio.write_png16(f, img, level=42)  # must not raise
    back = (pio.load_image01(f) * 65535 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(back, img)
