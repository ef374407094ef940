"""FLAC audio decoder, stdlib-only, from the public format spec
(xiph.org / RFC 9639): metadata blocks, frame headers with UTF-8-coded
numbers, all four subframe types (CONSTANT / VERBATIM / FIXED order 0-4 /
LPC order 1-32), Rice and Rice2 residual partitions with escape codes,
wasted-bits shifts, and the three stereo decorrelation modes (left/side,
right/side, mid/side).

Parity: the reference reads audio via librosa/soundfile wrappers
(reference readers.py — delegating codec work to libsndfile); here the
bitstream decodes directly so a FLAC column works in the multimodal
pipeline without any audio library. CRC-8/CRC-16 fields are parsed past,
not validated (decode integrity is asserted by the caller's tests, and a
corrupt stream fails structurally long before a checksum would fire).
"""

from __future__ import annotations


class Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos  # absolute bit position

    def u(self, n: int) -> int:
        """Unsigned n-bit big-endian value."""
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(n):
            byte = data[pos >> 3]
            out = (out << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out

    def s(self, n: int) -> int:
        """Signed n-bit two's-complement value."""
        v = self.u(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        c = 0
        pos = self.pos
        data = self.data
        while not (data[pos >> 3] >> (7 - (pos & 7))) & 1:
            c += 1
            pos += 1
        self.pos = pos + 1
        return c

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def at_end(self) -> bool:
        return (self.pos >> 3) >= len(self.data)


def parse_streaminfo(content: bytes) -> dict:
    """'fLaC' magic + metadata walk → the STREAMINFO fields (+ the bit
    offset where audio frames start)."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC magic)")
    br = Bits(content, 32)
    info = None
    while True:
        last = br.u(1)
        btype = br.u(7)
        length = br.u(24)
        if btype == 0:  # STREAMINFO
            b = Bits(content, br.pos)
            info = {
                "min_block": b.u(16),
                "max_block": b.u(16),
                "min_frame": b.u(24),
                "max_frame": b.u(24),
                "sample_rate": b.u(20),
                "channels": b.u(3) + 1,
                "bits_per_sample": b.u(5) + 1,
                "total_samples": b.u(36),
            }
        br.pos += length * 8
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream lacks a STREAMINFO block")
    info["frames_bitpos"] = br.pos
    return info


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _coded_number(br: Bits) -> int:
    """The frame header's UTF-8-style variable-length number (up to 36
    bits / 7 bytes)."""
    first = br.u(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    val = first & (mask - 1)
    for _ in range(n_extra):
        val = (val << 6) | (br.u(8) & 0x3F)
    return val


def _block_size(code: int, br: Bits) -> int:
    if code == 1:
        return 192
    if 2 <= code <= 5:
        return 576 << (code - 2)
    if code == 6:
        return br.u(8) + 1
    if code == 7:
        return br.u(16) + 1
    if 8 <= code <= 15:
        return 256 << (code - 8)
    raise ValueError(f"reserved block-size code {code}")


def _skip_sample_rate(code: int, br: Bits) -> None:
    if code == 12:
        br.u(8)
    elif code in (13, 14):
        br.u(16)


_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _residual(br: Bits, block_size: int, order: int) -> list[int]:
    """Rice/Rice2-partitioned residual → block_size - order values."""
    method = br.u(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.u(4)
    n_parts = 1 << part_order
    part_samples = block_size >> part_order
    if part_samples << part_order != block_size:
        raise ValueError("partition count does not divide block size")
    if part_samples < order:
        raise ValueError("predictor order exceeds the first partition")
    out = []
    for p in range(n_parts):
        count = part_samples - (order if p == 0 else 0)
        param = br.u(plen)
        if param == escape:
            nbits = br.u(5)
            for _ in range(count):
                out.append(br.s(nbits) if nbits else 0)
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | (br.u(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _subframe(br: Bits, block_size: int, bps: int) -> list[int]:
    if br.u(1):
        raise ValueError("subframe padding bit set")
    stype = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.s(eff)
        out = [v] * block_size
    elif stype == 1:  # VERBATIM
        out = [br.s(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.s(eff) for _ in range(order)]
        res = _residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [br.s(eff) for _ in range(order)]
        precision = br.u(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 15")
        shift = br.s(5)
        coefs = [br.s(precision) for _ in range(order)]
        res = _residual(br, block_size, order)
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(r + pred)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(content: bytes):
    """FLAC bytes → (sample_rate, samples ndarray int32 of shape
    (n_samples, n_channels), bits_per_sample)."""
    import numpy as np

    info = parse_streaminfo(content)
    br = Bits(content, info["frames_bitpos"])
    n_ch = info["channels"]
    total = info["total_samples"]
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    got = 0
    while (total == 0 or got < total) and not br.at_end():
        br.align()
        if br.at_end():
            break
        sync = br.u(14)
        if sync != 0b11111111111110:
            raise ValueError(f"lost frame sync at bit {br.pos - 14}")
        br.u(1)  # reserved
        br.u(1)  # blocking strategy
        bs_code = br.u(4)
        sr_code = br.u(4)
        ch_code = br.u(4)
        size_code = br.u(3)
        br.u(1)  # reserved
        _coded_number(br)
        block_size = _block_size(bs_code, br)
        _skip_sample_rate(sr_code, br)
        bps = _SAMPLE_SIZE.get(size_code, info["bits_per_sample"])
        br.u(8)  # CRC-8 (not validated)

        if ch_code <= 7:
            subs = [_subframe(br, block_size, bps) for _ in range(ch_code + 1)]
        elif ch_code == 8:  # left/side
            left = _subframe(br, block_size, bps)
            side = _subframe(br, block_size, bps + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _subframe(br, block_size, bps + 1)
            right = _subframe(br, block_size, bps)
            subs = [[r + s for r, s in zip(right, side)], right]
        elif ch_code == 10:  # mid/side
            mid = _subframe(br, block_size, bps)
            side = _subframe(br, block_size, bps + 1)
            subs = [[], []]
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                subs[0].append((m2 + s) >> 1)
                subs[1].append((m2 - s) >> 1)
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if len(subs) != n_ch:
            raise ValueError(
                f"frame has {len(subs)} channels, STREAMINFO says {n_ch}"
            )
        br.align()
        br.u(16)  # frame CRC-16 (not validated)
        for c in range(n_ch):
            chans[c].extend(subs[c])
        got += block_size
    if total and got > total:  # final frame may pad past total_samples
        chans = [c[:total] for c in chans]
    arr = np.array(chans, dtype=np.int64).T.astype(np.int32)
    return info["sample_rate"], arr, info["bits_per_sample"]
