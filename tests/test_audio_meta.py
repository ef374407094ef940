"""MP3 frame-header/Xing and OGG page-walk metadata vs hand-assembled
spec fixtures — the decode-free typed-metadata path for the audio formats
whose sample codecs are gated."""

from __future__ import annotations

import struct

import pytest

from intake_spark.llm.audio_meta import audio_meta, mp3_meta, ogg_meta


def _mp3_frame_bytes(kbps=128, rate_idx=0, version=3, pad=0, mono=False) -> bytes:
    """One valid MPEG-1/2 Layer III frame (header + zero payload)."""
    from intake_spark.llm.audio_meta import (
        _BITRATES_V1_L3,
        _BITRATES_V2_L3,
        _SAMPLE_RATES,
    )

    table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
    br_idx = table.index(kbps)
    b1 = 0xE0 | (version << 3) | (1 << 1) | 1  # sync, version, layer III
    b2 = (br_idx << 4) | (rate_idx << 2) | (pad << 1)
    b3 = (3 << 6) if mono else 0  # channel mode
    rate = _SAMPLE_RATES[version][rate_idx]
    spf = 1152 if version == 3 else 576
    frame_len = (spf // 8) * kbps * 1000 // rate + pad
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * (frame_len - 4)


def _id3(size: int) -> bytes:
    body = b"\x00" * size
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x04\x00\x00" + ss + body


def test_mp3_cbr_walk_and_id3_skip():
    data = _id3(100) + _mp3_frame_bytes() * 10
    m = mp3_meta(data)
    assert m["format"] == "mp3" and m["sample_rate"] == 44100
    assert m["channels"] == 2 and m["bitrate_kbps"] == 128
    assert m["n_frames"] == 10 and not m["vbr"]
    assert m["duration_s"] == pytest.approx(10 * 1152 / 44100, abs=1e-6)


def test_mp3_xing_header_frame_count():
    # first frame carries a Xing tag after the 32-byte MPEG-1-stereo side info
    frame = bytearray(_mp3_frame_bytes())
    off = 4 + 32
    frame[off : off + 4] = b"Xing"
    frame[off + 4 : off + 8] = struct.pack(">I", 1)  # flags: frames present
    frame[off + 8 : off + 12] = struct.pack(">I", 2500)
    m = mp3_meta(bytes(frame))
    assert m["vbr"] and m["n_frames"] == 2500
    assert m["duration_s"] == pytest.approx(2500 * 1152 / 44100, abs=1e-4)


def test_mp3_mpeg2_mono():
    data = _mp3_frame_bytes(kbps=64, rate_idx=1, version=2, mono=True) * 4
    m = mp3_meta(data)
    assert m["mpeg_version"] == "2" and m["sample_rate"] == 24000
    assert m["channels"] == 1 and m["n_frames"] == 4
    assert m["duration_s"] == pytest.approx(4 * 576 / 24000, abs=1e-6)


def test_mp3_garbage_raises():
    with pytest.raises(ValueError, match="frame sync"):
        mp3_meta(b"\x00" * 512)


def _ogg_page(granule: int, body: bytes, seq: int = 0, htype: int = 0) -> bytes:
    lacing = []
    n = len(body)
    while n >= 255:
        lacing.append(255)
        n -= 255
    lacing.append(n)
    head = (
        b"OggS" + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<I", 1)  # serial
        + struct.pack("<I", seq)
        + struct.pack("<I", 0)  # crc (not validated)
        + bytes([len(lacing)]) + bytes(lacing)
    )
    return head + body


def test_ogg_vorbis_duration():
    ident = b"\x01vorbis" + struct.pack("<I", 0) + bytes([2]) + struct.pack("<I", 22050) + b"\x00" * 16
    data = (
        _ogg_page(0, ident, seq=0, htype=2)
        + _ogg_page(11025, b"\x00" * 64, seq=1)
        + _ogg_page(44100, b"\x00" * 64, seq=2, htype=4)
    )
    m = ogg_meta(data)
    assert m["format"] == "ogg/vorbis" and m["sample_rate"] == 22050
    assert m["channels"] == 2 and m["n_pages"] == 3
    assert m["duration_s"] == pytest.approx(2.0)


def test_ogg_opus_preskip():
    ident = b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312) + struct.pack("<I", 16000) + b"\x00" * 4
    data = _ogg_page(0, ident, htype=2) + _ogg_page(48000 + 312, b"\x00" * 32, seq=1, htype=4)
    m = ogg_meta(data)
    # Opus granules are 48 kHz regardless of the id header's input rate
    assert m["format"] == "ogg/opus" and m["sample_rate"] == 48000
    assert m["duration_s"] == pytest.approx(1.0)


def test_audio_meta_dispatch_and_spark_operator(spark, tmp_path):
    import sys

    sys.path.insert(0, str(__file__).rsplit("/", 2)[0])
    from tests.test_flac import make_flac

    from intake_spark.llm import multimodal
    from intake_spark.llm.audio_meta import audio_meta_features

    (tmp_path / "a.mp3").write_bytes(_mp3_frame_bytes() * 5)
    (tmp_path / "b.flac").write_bytes(make_flac([[1, 2, 3, 4]], bps=16, rate=8000))
    (tmp_path / "c.bin").write_bytes(b"\x00garbage\x00" * 10)

    files = multimodal.read_binary_dir(spark, str(tmp_path), glob="*.*")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in
            audio_meta_features(files, keep_cols=["path"]).collect()}
    assert rows["a.mp3"].format == "mp3" and rows["a.mp3"].err is None
    assert rows["a.mp3"].sample_rate == 44100
    assert rows["b.flac"].format == "flac" and rows["b.flac"].duration_s == pytest.approx(4 / 8000)
    assert rows["c.bin"].format is None and "frame sync" in rows["c.bin"].err

    # direct dispatch parity
    assert audio_meta((tmp_path / "b.flac").read_bytes())["channels"] == 1


def test_recommend_picks_mp3_ogg(tmp_path):
    from intake_spark.datatypes import recommend

    p1 = tmp_path / "x.mp3"
    p1.write_bytes(_id3(10) + _mp3_frame_bytes())
    p2 = tmp_path / "y.ogg"
    ident = b"\x01vorbis" + struct.pack("<I", 0) + bytes([1]) + struct.pack("<I", 8000) + b"\x00" * 16
    p2.write_bytes(_ogg_page(0, ident))
    k1 = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(str(p1))]
    k2 = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(str(p2))]
    assert "MP3" in k1 and "OGG" in k2
