"""Stdlib decoders for container-level compression formats the engine's
readers meet in the wild: LZ4 block format and the Blosc1 frame (the
default zarr v2 compressor — numcodecs' ``{"id": "blosc", "cname":
"lz4"}``), both from their public specs.

Executor-safe: pure functions over bytes, importable worker-side via
``ensure_py_deps``. Blosc's OTHER codecs (blosclz, zstd, snappy) and
bit-shuffle raise named gates; zlib-in-blosc delegates to the stdlib.
"""

from __future__ import annotations

import struct
import zlib


def lz4_block_decompress(src: bytes, dest_size: int) -> bytes:
    """LZ4 BLOCK format (not the frame format): token-driven sequences of
    [literals][offset, match], 15-run length extensions, final sequence
    literals-only — per the public spec at lz4.org."""
    out = bytearray()
    pos = 0
    n = len(src)
    while pos < n and len(out) < dest_size:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += src[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # last sequence: literals only
        (offset,) = struct.unpack_from("<H", src, pos)
        pos += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block (zero match offset)")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block (offset before start)")
        if offset >= match_len:
            # non-overlapping: one slice copy (the hot path — executor-side
            # zarr chunk decode would otherwise run millions of appends)
            out += out[start : start + match_len]
        else:
            # self-overlapping run: repeat the offset-sized period
            chunk = out[start:]
            reps, rem = divmod(match_len, offset)
            out += chunk * reps + chunk[:rem]
    if len(out) != dest_size:
        raise ValueError(f"LZ4 block decoded {len(out)} bytes, wanted {dest_size}")
    return bytes(out)


def byte_unshuffle(data: bytes, typesize: int) -> bytes:
    """Undo Blosc's byte shuffle: stream j of length n/t holds byte j of
    every element; interleave back to element order."""
    if typesize <= 1:
        return data
    n = len(data)
    n_elem = n // typesize
    tail = data[n_elem * typesize :]  # leftover bytes are stored verbatim
    body = data[: n_elem * typesize]
    out = bytearray(n_elem * typesize)
    for j in range(typesize):
        out[j::typesize] = body[j * n_elem : (j + 1) * n_elem]
    return bytes(out) + tail


def blosc_decompress(src: bytes) -> bytes:
    """Blosc1 frame → raw bytes (public header layout, c-blosc blosc.c):
    16-byte header (version, versionlz, flags, typesize, nbytes,
    blocksize, cbytes LE), then either a verbatim payload (memcpy flag)
    or per-block uint32 offsets to [uint32 csize][codec block] chunks.
    Codec from flags bits 5-7: lz4/lz4hc and zlib decode here; blosclz/
    snappy/zstd raise named. Byte shuffle undone per block; bit shuffle
    raises named."""
    if len(src) < 16:
        raise ValueError("truncated blosc frame")
    version, _versionlz, flags, typesize = src[0], src[1], src[2], src[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", src, 4)
    if version < 1 or version > 2:
        raise ValueError(f"unsupported blosc frame version {version}")
    memcpyed = bool(flags & 0x2)
    shuffle = bool(flags & 0x1)
    bitshuffle = bool(flags & 0x4)
    codec = (flags >> 5) & 0x7
    if bitshuffle:
        raise ValueError("blosc bit-shuffle needs the bitshuffle kernel (not stdlib)")
    if memcpyed:
        return src[16 : 16 + nbytes]
    if codec not in (1, 3):  # Blosc1 format codes: 1 = lz4/lz4hc, 3 = zlib
        names = {0: "blosclz", 2: "snappy", 4: "zstd"}
        raise ValueError(
            f"blosc codec {names.get(codec, codec)!r} not supported "
            "(lz4/zlib/memcpy decode stdlib-side)"
        )
    n_blocks = -(-nbytes // blocksize) if blocksize else 1
    starts = struct.unpack_from(f"<{n_blocks}I", src, 16)
    out = bytearray()
    remaining = nbytes
    for j in range(n_blocks):
        want = min(blocksize, remaining)
        off = starts[j]
        (csize,) = struct.unpack_from("<I", src, off)
        payload = src[off + 4 : off + 4 + csize]
        if csize == want:  # stored (incompressible) block
            block = bytes(payload)
        elif codec == 1:
            block = lz4_block_decompress(payload, want)
        else:
            block = zlib.decompress(payload)
        if shuffle:
            block = byte_unshuffle(block, typesize)
        out += block
        remaining -= want
    if len(out) != nbytes:
        raise ValueError(f"blosc frame decoded {len(out)} bytes, wanted {nbytes}")
    return bytes(out)
