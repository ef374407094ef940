"""Decode REAL externally-encoded image files found in this container
through the repo's stdlib decoders — the closest available substitute
for committed independent-codec fixtures (no CharLS/libvorbis/PIL here;
see COVERAGE.md's independent-fixture constraint note).

The PNGs under /root/reference/docs were produced by independent
encoders (matplotlib, screenshot tools); the GIFs under /usr/share come
from Tcl/Tk and libxslt. They exercise palettes, bit depths, filter
mixes and interlacing that spec-built fixtures may miss. PNG carries
internal integrity checks (zlib adler32 over the IDAT stream), so a
byte-level misread fails loudly rather than silently; shape and range
assertions police the reconstruction layer. Files are read in place
(never copied into the repo: they are not ours to redistribute) and
every test skips cleanly when the paths are absent."""

from __future__ import annotations

import glob
import os

import pytest

REF_PNG_DIRS = [
    "/root/reference/docs/source/_static/images",
    "/root/reference",
]
SYS_GIF_DIRS = [
    "/usr/share/tcltk/tk8.6/images",
    "/usr/share/doc/libxslt1-dev/html",
]


def _collect(dirs, pattern):
    out = []
    for d in dirs:
        out += sorted(glob.glob(os.path.join(d, pattern)))
    return out


_pngs = _collect(REF_PNG_DIRS, "*.png")
_gifs = _collect(SYS_GIF_DIRS, "*.gif")


@pytest.mark.slow  # external corpus sweep; PNG bit-exactness covered by unit codec tests
@pytest.mark.skipif(not _pngs, reason="reference docs PNGs absent")
def test_external_pngs_decode():
    import numpy as np

    from intake_spark.llm.multimodal import decode_png

    decoded = 0
    for path in _pngs:
        with open(path, "rb") as fh:
            content = fh.read()
        arr = decode_png(content)
        assert isinstance(arr, np.ndarray) and arr.ndim == 3, path
        h, w, c = arr.shape
        assert 1 <= h <= 10_000 and 1 <= w <= 10_000 and c in (1, 2, 3, 4)
        # dimensions must match the IHDR the file itself declares
        import struct

        iw, ih = struct.unpack(">II", content[16:24])
        assert (w, h) == (iw, ih), path
        decoded += 1
    assert decoded >= 5  # the reference docs tree ships well over five


@pytest.mark.skipif(not _gifs, reason="system GIFs absent")
def test_external_gifs_decode():
    import numpy as np

    from intake_spark.llm.multimodal import decode_gif

    decoded = 0
    for path in _gifs:
        with open(path, "rb") as fh:
            content = fh.read()
        arr = decode_gif(content)
        assert isinstance(arr, np.ndarray) and arr.ndim == 3
        h, w, _ = arr.shape
        # the logical screen descriptor's own numbers
        sw = int.from_bytes(content[6:8], "little")
        sh = int.from_bytes(content[8:10], "little")
        assert w <= sw and h <= sh and w * h > 0, path
        decoded += 1
    assert decoded >= 5


@pytest.mark.skipif(not _pngs, reason="reference docs PNGs absent")
def test_external_pngs_through_decode_image_dispatch():
    """The generic dispatch must route real-world PNGs identically."""
    import numpy as np

    from intake_spark.llm.multimodal import decode_image, decode_png

    path = _pngs[0]
    with open(path, "rb") as fh:
        content = fh.read()
    a, b = decode_image(content), decode_png(content)
    assert np.array_equal(a, b)
