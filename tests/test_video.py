"""MJPEG-in-AVI frame sampling vs a spec-built RIFF fixture: the AVI
container (avih/strh headers, movi chunk list, even-byte padding, an audio
stream preceding the video stream) is assembled here directly from the
public RIFF/AVI format, with each frame a hand-encoded baseline JPEG from
test_jpeg's bit-writer — no PIL, no ffmpeg, pixel-verified end to end."""

from __future__ import annotations

import struct

import pytest

from intake_spark.llm.video import parse_avi, sample_video_frames, video_frame_features
from tests.test_jpeg import BW, make_gray_jpeg


def _gray_frame(value: int) -> bytes:
    bw = BW()
    bw.dc(8 * (value - 128))
    bw.ac_eob()
    return make_gray_jpeg(8, 8, bw.flush())


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def make_avi(frames: list[bytes], w: int, h: int, fps: int = 30,
             with_audio: bool = False) -> bytes:
    def strh(fcc_type: bytes, handler: bytes, scale: int, rate: int, length: int) -> bytes:
        return _chunk(
            b"strh",
            struct.pack("<4s4sIHHIIIIIIII8x", fcc_type, handler, 0, 0, 0, 0,
                        scale, rate, 0, length, 0, 0, 0),
        )

    strls = b""
    if with_audio:  # audio stream FIRST: video frames must be 01dc, not 00dc
        strls += _list(b"strl", strh(b"auds", b"\x01\x00\x00\x00", 1, 8000, 8000)
                       + _chunk(b"strf", b"\x00" * 16))
    strls += _list(b"strl", strh(b"vids", b"MJPG", 1, fps, len(frames))
                   + _chunk(b"strf", struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 20))
    avih = _chunk(
        b"avih",
        struct.pack("<14I", 1_000_000 // fps, 0, 0, 0, len(frames), 0,
                    2 if with_audio else 1, 0, w, h, 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + strls)
    vid = b"01" if with_audio else b"00"
    movi_body = b""
    for i, fr in enumerate(frames):
        if with_audio and i % 2 == 0:  # interleave audio chunks to skip over
            movi_body += _chunk(b"00wb", b"\x11" * 33)  # odd size: tests padding
        movi_body += _chunk(vid + b"dc", fr)
    movi = _list(b"movi", movi_body)
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


GRAYS = [50, 100, 150, 200, 250]


def test_parse_avi_metadata_and_frames():
    avi = make_avi([_gray_frame(g) for g in GRAYS], 8, 8, fps=25)
    meta = parse_avi(avi)
    assert (meta["width"], meta["height"]) == (8, 8)
    assert meta["codec"] == "MJPG"
    assert meta["fps"] == 25.0
    assert meta["n_frames"] == 5
    # each frame range holds a complete JPEG (SOI..EOI)
    for off, size in meta["frames"]:
        assert avi[off : off + 3] == b"\xff\xd8\xff"
        assert avi[off + size - 2 : off + size] == b"\xff\xd9"


def test_parse_avi_audio_stream_offsets():
    """With an 'auds' stream first, video chunks are 01dc and the odd-sized
    interleaved audio chunks (padding byte) must not desync the walk."""
    avi = make_avi([_gray_frame(g) for g in GRAYS], 8, 8, with_audio=True)
    meta = parse_avi(avi)
    assert meta["n_frames"] == 5
    for off, _ in meta["frames"]:
        assert avi[off : off + 3] == b"\xff\xd8\xff"


def test_parse_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="no video"):
        parse_avi(make_avi([], 8, 8)[:12] + _list(b"hdrl", b"") + _list(b"movi", b""))


def test_sample_video_frames_every_n(spark):
    avi = make_avi([_gray_frame(g) for g in GRAYS], 8, 8)
    df = spark.createDataFrame([("v1", bytearray(avi))], "path string, content binary")
    rows = sample_video_frames(df, every_n=2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert all(r.n_frames == 5 and r.codec == "MJPG" for r in rows)
    assert all(bytes(r.frame_bytes)[:3] == b"\xff\xd8\xff" for r in rows)


def test_video_frame_features_pixel_verified(spark):
    """End-to-end: AVI binary rows → sampled frames → REAL JPEG decode;
    an 8x8 constant-gray frame's mean intensity is exactly its gray."""
    avi = make_avi([_gray_frame(g) for g in GRAYS], 8, 8, with_audio=True)
    df = spark.createDataFrame([("v1", bytearray(avi))], "path string, content binary")
    rows = video_frame_features(df, every_n=1).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3, 4]
    assert [(r.width, r.height, r.n_channels) for r in rows] == [(8, 8, 1)] * 5
    assert [r.mean_intensity for r in rows] == [float(g) for g in GRAYS]


def test_avi_reader_and_recommend(spark, tmp_path):
    from intake_spark import datatypes as dt
    from intake_spark.datatypes import recommend
    from intake_spark.readers import AVIFrameReader

    p = tmp_path / "clip.avi"
    p.write_bytes(make_avi([_gray_frame(g) for g in GRAYS], 8, 8))
    kinds = [c.__name__ if isinstance(c, type) else type(c).__name__ for c in recommend(str(p))]
    assert any("AVI" in k for k in kinds)
    df = AVIFrameReader(data=dt.AVI(url=str(p))).read(spark=spark, every_n=2)
    rows = df.orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert all(bytes(r.frame_bytes)[:3] == b"\xff\xd8\xff" for r in rows)


def _box(typ: bytes, payload: bytes) -> bytes:
    import struct as st

    return st.pack(">I", 8 + len(payload)) + typ + payload


def make_mp4(duration_s=2.5, timescale=1000, w=320, h=240, codec=b"avc1",
             audio=True) -> bytes:
    import struct as st

    mvhd = bytes([0, 0, 0, 0]) + b"\x00" * 8 + st.pack(
        ">II", timescale, int(duration_s * timescale)
    ) + b"\x00" * 80
    tkhd_v = bytes([0, 0, 0, 0]) + b"\x00" * 72 + st.pack(">II", w << 16, h << 16)
    hdlr_v = bytes(8) + b"vide" + bytes(12) + b"Video\x00"
    stsd_v = bytes([0, 0, 0, 0]) + st.pack(">I", 1) + _box(codec, b"\x00" * 70)
    trak_v = _box(b"trak", _box(b"tkhd", tkhd_v) + _box(
        b"mdia", _box(b"hdlr", hdlr_v) + _box(b"minf", _box(b"stbl", _box(b"stsd", stsd_v)))
    ))
    moov = _box(b"mvhd", mvhd) + trak_v
    if audio:
        tkhd_a = bytes([0, 0, 0, 0]) + b"\x00" * 72 + st.pack(">II", 0, 0)
        hdlr_a = bytes(8) + b"soun" + bytes(12) + b"Sound\x00"
        stsd_a = bytes([0, 0, 0, 0]) + st.pack(">I", 1) + _box(b"mp4a", b"\x00" * 28)
        moov += _box(b"trak", _box(b"tkhd", tkhd_a) + _box(
            b"mdia", _box(b"hdlr", hdlr_a) + _box(b"minf", _box(b"stbl", _box(b"stsd", stsd_a)))
        ))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(b"moov", moov)


def test_parse_mp4_metadata():
    from intake_spark.llm.video import parse_mp4, video_meta

    m = parse_mp4(make_mp4())
    assert m["format"] == "mp4/isom" and m["duration_s"] == 2.5
    assert (m["width"], m["height"], m["codec"]) == (320, 240, "avc1")
    assert m["n_tracks"] == 2
    kinds = {t["kind"]: t["codec"] for t in m["tracks"]}
    assert kinds == {"vide": "avc1", "soun": "mp4a"}

    # dispatch: MP4 and AVI route through the same video_meta
    v = video_meta(make_mp4(duration_s=1.0, audio=False))
    assert v["duration_s"] == 1.0 and v["n_tracks"] == 1
    # metadata walk never touches frame payloads — dummy bytes suffice
    frames = [b"\x00" * 16] * 3
    a = video_meta(make_avi(frames, w=8, h=8, fps=10))
    assert a["format"] == "avi" and a["n_frames"] == 3
    assert a["duration_s"] == 0.3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="ISO-BMFF"):
        parse_mp4(b"\x00" * 64)


def _ebml(eid_bytes: bytes, payload: bytes) -> bytes:
    # size as a 2-byte cleared varint (0x4000 | n)
    n = len(payload)
    return eid_bytes + bytes([0x40 | (n >> 8), n & 0xFF]) + payload


def make_webm(duration_units=5000.0, timescale=1_000_000, w=640, h=360,
              vcodec=b"V_VP9", with_audio=True) -> bytes:
    import struct as st

    video = _ebml(b"\xe0", _ebml(b"\xb0", w.to_bytes(2, "big"))
                  + _ebml(b"\xba", h.to_bytes(2, "big")))
    track_v = _ebml(b"\xae", _ebml(b"\x83", b"\x01") + _ebml(b"\x86", vcodec) + video)
    tracks = track_v
    if with_audio:
        tracks += _ebml(b"\xae", _ebml(b"\x83", b"\x02") + _ebml(b"\x86", b"A_OPUS"))
    info = _ebml(b"\x2a\xd7\xb1", timescale.to_bytes(3, "big")) + _ebml(
        b"\x44\x89", st.pack(">d", duration_units)
    )
    segment = _ebml(b"\x15\x49\xa9\x66", info) + _ebml(b"\x16\x54\xae\x6b", tracks)
    head = _ebml(b"\x1a\x45\xdf\xa3", b"\x00" * 8)
    return head + _ebml(b"\x18\x53\x80\x67", segment)


def test_parse_webm_metadata():
    from intake_spark.llm.video import parse_webm, video_meta

    m = parse_webm(make_webm())
    assert m["format"] == "webm"
    # 5000 units * 1e6 ns/unit = 5 s
    assert m["duration_s"] == 5.0
    assert (m["width"], m["height"], m["codec"]) == (640, 360, "V_VP9")
    assert m["n_tracks"] == 2
    assert {t["kind"] for t in m["tracks"]} == {"video", "audio"}

    # dispatch through video_meta; non-default timescale scales duration
    v = video_meta(make_webm(duration_units=250.0, timescale=4_000_000, with_audio=False))
    assert v["duration_s"] == 1.0 and v["n_tracks"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="EBML"):
        parse_webm(b"\x00\x01\x02\x03" + b"\x00" * 16)


def _y4m(width, height, frames_yuv, cs="420", fps=b"25:1"):
    hdr = b"YUV4MPEG2 W%d H%d F%s Ip A1:1 C%s\n" % (width, height, fps, cs.encode())
    body = b"".join(b"FRAME\n" + f for f in frames_yuv)
    return hdr + body


def test_parse_y4m_and_meta():
    from intake_spark.llm.video import parse_y4m, video_meta

    w, h = 4, 2
    fsize = w * h + 2 * (w * h // 4)
    data = _y4m(w, h, [bytes(fsize), bytes(fsize), bytes(fsize)])
    m = parse_y4m(data)
    assert (m["width"], m["height"], m["n_frames"], m["codec"]) == (4, 2, 3, "Y4M-C420")
    assert m["fps"] == 25.0
    assert all(s == fsize for _o, s in m["frames"])
    vm = video_meta(data)
    assert vm["format"] == "y4m" and vm["n_frames"] == 3
    assert vm["duration_s"] == round(3 / 25.0, 6)


def test_decode_y4m_frame_bt601_values():
    import numpy as np

    from intake_spark.llm.video import decode_y4m_frame

    # 2x2 C420: single chroma sample shared by all 4 pixels
    y = bytes([16, 235, 81, 145])       # black, white, and two mids
    cb, cr = bytes([128]), bytes([128])  # neutral chroma -> pure gray
    arr = decode_y4m_frame(y + cb + cr, 2, 2, "420")
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [0, 0, 0]        # Y=16 -> 0
    assert arr[0, 1].tolist() == [255, 255, 255]  # Y=235 -> 255
    # neutral chroma: R=G=B
    assert (arr[:, :, 0] == arr[:, :, 1]).all() and (arr[:, :, 1] == arr[:, :, 2]).all()

    # red primary: BT.601 limited-range red is approx (Y,Cb,Cr)=(81,90,240)
    arr2 = decode_y4m_frame(bytes([81] * 4) + bytes([90]) + bytes([240]), 2, 2, "420")
    r, g, b = (int(x) for x in arr2[0, 0])
    assert r > 240 and g < 30 and b < 30

    # mono passthrough
    m = decode_y4m_frame(bytes([7, 200]), 2, 1, "mono")
    assert m.shape == (1, 2, 1) and m[0, :, 0].tolist() == [7, 200]


def test_y4m_sample_and_features_end_to_end(spark):
    import numpy as np

    from intake_spark.llm.video import sample_video_frames, video_frame_features

    w, h = 2, 2
    # frame k: uniform Y = 16 + 10k, neutral chroma
    def frame(k):
        return bytes([16 + 10 * k] * (w * h)) + bytes([128]) + bytes([128])

    data = _y4m(w, h, [frame(k) for k in range(6)])
    df = spark.createDataFrame([("v0", bytearray(data))], "name string, content binary")

    rows = sample_video_frames(df, every_n=3).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 3]
    assert rows[0].codec == "Y4M-C420" and rows[0].frame_w == 2

    feats = video_frame_features(df, every_n=3).orderBy("frame_idx").collect()
    assert len(feats) == 2
    # frame 0: Y=16 everywhere -> intensity 0; frame 3: Y=46 -> (46-16)*255/219
    assert feats[0].mean_intensity == 0.0
    expected = round((46 - 16) * 255.0 / 219.0)
    assert abs(feats[1].mean_intensity - expected) <= 0.5
    assert feats[0].n_channels == 3 and feats[0].width == 2


def test_y4m_extended_colorspaces_and_params():
    """The r11 Y4M gate closures: C411, p10/p12 high bit depth,
    444alpha, interlaced streams (presentation flag only — raster
    unchanged), and per-frame parameter tokens; C410 stays a loud
    named gate."""
    import numpy as np
    import pytest

    from intake_spark.llm.video import decode_y4m_frame, parse_y4m

    # C411: chroma is W/4 x H
    w, h = 8, 2
    fsize = w * h + 2 * ((w // 4) * h)
    m = parse_y4m(_y4m(w, h, [bytes(fsize)], cs="411"))
    assert m["codec"] == "Y4M-C411" and m["frames"][0][1] == fsize
    y = bytes([81] * (w * h))
    cb = bytes([90] * ((w // 4) * h))
    cr = bytes([240] * ((w // 4) * h))
    arr = decode_y4m_frame(y + cb + cr, w, h, "411")
    assert arr.shape == (h, w, 3)
    r, g, b = (int(x) for x in arr[0, 0])
    assert r > 240 and g < 30 and b < 30  # BT.601 red everywhere

    # C420p10: two LE bytes per sample, limited-range codes scale by 4
    w, h = 2, 2
    y10 = np.array([16 * 4, 235 * 4, 81 * 4, 145 * 4], dtype="<u2")
    c10 = np.array([128 * 4], dtype="<u2")
    m = parse_y4m(_y4m(w, h, [y10.tobytes() + c10.tobytes() * 2],
                       cs="420p10"))
    assert m["codec"] == "Y4M-C420p10"
    assert m["frames"][0][1] == (4 + 2) * 2
    arr = decode_y4m_frame(y10.tobytes() + c10.tobytes() * 2, w, h,
                           "420p10")
    assert arr[0, 0].tolist() == [0, 0, 0]
    assert arr[0, 1].tolist() == [255, 255, 255]

    # C444p12 gray ramp
    y12 = np.array([16 << 4, 235 << 4], dtype="<u2")
    c12 = np.array([128 << 4, 128 << 4], dtype="<u2")
    frame = y12.tobytes() + c12.tobytes() + c12.tobytes()
    arr = decode_y4m_frame(frame, 2, 1, "444p12")
    assert arr[0, 0].tolist() == [0, 0, 0]
    assert arr[0, 1].tolist() == [255, 255, 255]

    # 444alpha: 4 full planes; alpha ignored for RGB
    w, h = 2, 1
    planes = bytes([81, 81]) + bytes([90, 90]) + bytes([240, 240]) \
        + bytes([255, 0])
    m = parse_y4m(_y4m(w, h, [planes], cs="444alpha"))
    assert m["frames"][0][1] == 4 * w * h
    arr = decode_y4m_frame(planes, w, h, "444alpha")
    assert int(arr[0, 0, 0]) > 240 and int(arr[0, 0, 1]) < 30

    # interlaced stream: accepted, flagged, frames decode as stored
    data = b"YUV4MPEG2 W2 H2 F25:1 It C420\nFRAME\n" + bytes(6)
    m = parse_y4m(data)
    assert m["interlace"] == "t" and m["n_frames"] == 1

    # per-frame parameter tokens never change the raster
    data = (b"YUV4MPEG2 W2 H2 F25:1 C420\n"
            b"FRAME Xtag=1\n" + bytes(6) + b"FRAME It\n" + bytes(6))
    m = parse_y4m(data)
    assert m["n_frames"] == 2 and all(s == 6 for _o, s in m["frames"])

    with pytest.raises(NotImplementedError, match="C410"):
        parse_y4m(b"YUV4MPEG2 W4 H4 C410\nFRAME\n" + bytes(24))
    with pytest.raises(NotImplementedError, match="bit depth"):
        parse_y4m(b"YUV4MPEG2 W2 H2 C420p11\nFRAME\n" + bytes(12))


def test_y4m_420_siting_variants_normalize():
    """C420jpeg/C420mpeg2/C420paldv (same bytes, different chroma
    SITING — what ffmpeg actually writes) normalize to 420; the p10
    depth suffix survives (r11 review regression)."""
    from intake_spark.llm.video import parse_y4m

    for variant in ("420jpeg", "420mpeg2", "420paldv"):
        m = parse_y4m(
            b"YUV4MPEG2 W2 H2 F25:1 C" + variant.encode() + b"\nFRAME\n"
            + bytes(6)
        )
        assert m["codec"] == "Y4M-C420" and m["frames"][0][1] == 6, variant
    m = parse_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420p10\nFRAME\n" + bytes(12))
    assert m["codec"] == "Y4M-C420p10" and m["frames"][0][1] == 12
