"""Real media decode: BMP/PPM/PNG/WAV round-trips, PNG filter coverage,
sniffing dispatch, and the feature extraction math."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dataintegration_csvprovider_spark.operators.media_codecs import (
    _PNG_MAGIC,
    decode_bmp,
    decode_image_bytes,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    sniff_format,
)
from dataintegration_csvprovider_spark.operators.multimodal import (
    audio_rms_features,
    decode_audio,
    decode_image,
    image_grid_features,
)


def _gradient(h, w):
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    c = np.arange(3, dtype=np.uint8)[None, None, :]
    return ((y * 31 + x * 7 + c * 101) % 256).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (5, 7), (16, 16), (9, 3)])
def test_bmp_roundtrip(h, w):
    img = _gradient(h, w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_roundtrip():
    img = _gradient(6, 11)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_with_comment():
    img = _gradient(2, 3)
    payload = encode_ppm(img)
    # inject a comment line after the magic
    patched = b"P6\n# a comment\n" + payload[3:]
    assert np.array_equal(decode_ppm(patched), img)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    img = _gradient(8, 5)
    if channels == 1:
        src = img[:, :, 0]
        expect = src[:, :, None]
    elif channels == 4:
        src = np.concatenate([img, img[:, :, :1]], axis=2)
        expect = src
    else:
        src = img
        expect = img
    assert np.array_equal(decode_png(encode_png(src)), expect)


def _png_with_filters(img, filter_types):
    """Build a PNG whose row n uses filter_types[n] (forward-filtered
    here, so decode must invert Sub/Up/Average/Paeth correctly)."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, ft in enumerate(filter_types):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    img = _gradient(5, 9)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), img)


def test_wav_roundtrip_16bit():
    t = np.arange(800) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    back, rate = decode_wav(encode_wav(sig))
    assert rate == 16000 and back.shape == (800, 1)
    # 1 LSB truncation + the 32767-encode / 32768-decode scale mismatch
    assert np.max(np.abs(back[:, 0] - sig)) < 2.0 / 32767


def test_sniffing_dispatch():
    img = _gradient(4, 4)
    assert sniff_format(encode_bmp(img)) == "bmp"
    assert sniff_format(encode_ppm(img)) == "ppm"
    assert sniff_format(encode_png(img)) == "png"
    assert sniff_format(encode_wav(np.zeros(16))) == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    for enc in (encode_bmp, encode_ppm, encode_png):
        assert np.array_equal(decode_image_bytes(enc(img))[:, :, :3], img)


def test_jpeg_is_gated_not_silent():
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image_bytes(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_image_grid_features_two_tone():
    # left half gray 40, right half gray 200, 8x8 with a 4x4 grid:
    # cells in grid cols 0-1 average 40, cols 2-3 average 200
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = 40
    img[:, 4:] = 200
    f = image_grid_features(img)
    assert len(f) == 16
    for gy in range(4):
        for gx in range(4):
            expect = 40 if gx < 2 else 200
            assert abs(f[gy * 4 + gx] * 255 - expect) < 1e-9


def test_decode_image_end_to_end_grayscale_png():
    img = np.full((8, 8), 123, np.uint8)
    f = decode_image(encode_png(img))
    assert all(abs(v * 255 - 123) < 1e-4 for v in f)


def test_decode_audio_constant_rms():
    # constant amplitude a quantizes to floor(a*32767)/32768; windowed
    # RMS of a constant is that constant, exactly
    a = 50.0 / 128.0
    payload = encode_wav(np.full(1600, a))
    f = decode_audio(payload)
    expect = np.floor(a * 32767) / 32768.0
    assert len(f) == 16
    assert all(abs(v - expect) < 1e-6 for v in f)


def test_audio_rms_features_two_level():
    # first half silent, second half amplitude 0.25 → windows split 8/8
    sig = np.concatenate([np.zeros(800), np.full(800, 0.25)])
    f = audio_rms_features(sig.reshape(-1, 1))
    assert all(v == 0.0 for v in f[:8])
    assert all(abs(v - 0.25) < 1e-9 for v in f[8:])


def test_split_concatenated_bmps():
    from dataintegration_csvprovider_spark.operators.media_codecs import (
        encode_bmp,
        split_concatenated_bmps,
    )

    frames = [_gradient(4, 4), _gradient(4, 4) + 7, _gradient(4, 4) + 99]
    payload = b"".join(encode_bmp(f.astype(np.uint8)) for f in frames)
    parts = split_concatenated_bmps(payload)
    assert len(parts) == 3
    for part, f in zip(parts, frames):
        assert np.array_equal(
            decode_bmp(part), f.astype(np.uint8)
        )
    with pytest.raises(ValueError, match="bad frame magic"):
        split_concatenated_bmps(payload + b"XX")


def test_extract_frame_features_all_and_sampled(spark):
    from dataintegration_csvprovider_spark.operators.media_codecs import (
        encode_bmp,
    )
    from dataintegration_csvprovider_spark.operators.multimodal import (
        extract_frame_features,
    )

    def video(doc_id, n):
        return b"".join(
            encode_bmp(np.full((4, 4, 3), (doc_id + 10 * f) % 256, np.uint8))
            for f in range(n)
        )

    df = spark.createDataFrame(
        [(1, video(1, 3)), (2, video(2, 2)), (3, None)],
        "doc_id long, payload binary",
    )
    out_all = extract_frame_features(df).collect()
    # doc 3 (null payload) contributes nothing; 3 + 2 frames remain
    assert len(out_all) == 5
    for r in out_all:
        expect = (r.doc_id + 10 * r.frame_idx) % 256
        assert abs(r.feature[0] * 255 - expect) < 1e-3
    out_sampled = extract_frame_features(df, frame_indices=[0, 2]).collect()
    # doc 1 has frames 0 and 2; doc 2 only frame 0 (index 2 out of range)
    assert sorted((r.doc_id, r.frame_idx) for r in out_sampled) == [
        (1, 0), (1, 2), (2, 0),
    ]


# -- ISO-BMFF (mp4) --------------------------------------------------------


def test_mp4_rawvideo_roundtrip():
    import numpy as np

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        decode_mp4_frame,
        encode_mp4_rawvideo,
        parse_mp4,
        sniff_format,
    )

    frames = [
        (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) + 11 * i)
        for i in range(4)
    ]
    payload = encode_mp4_rawvideo(frames, fps=2)
    assert sniff_format(payload) == "mp4"
    track = parse_mp4(payload)
    assert track.codec.strip() == "rgb"
    assert (track.width, track.height) == (8, 8)
    assert track.n_samples == 4
    assert (track.timescale, track.duration) == (2, 4)
    for i, f in enumerate(frames):
        assert (decode_mp4_frame(payload, track, i) == f).all()


def test_mp4_box_walk_handles_largesize_and_to_end():
    import struct

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        iter_mp4_boxes,
    )

    inner = b"hello"
    large = struct.pack(">I4sQ", 1, b"big ", 16 + len(inner)) + inner
    toend = struct.pack(">I4s", 0, b"last") + b"tail"
    boxes = list(iter_mp4_boxes(large + toend))
    assert [(t, buf_end - buf_start) for t, buf_start, buf_end in boxes] == [
        (b"big ", len(inner)),
        (b"last", 4),
    ]


def test_mp4_multi_chunk_sample_table():
    # hand-build a sample table with TWO stsc runs over three chunks —
    # the expansion real demuxers get wrong first
    import struct

    import numpy as np

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        decode_mp4_frame,
        encode_mp4_rawvideo,
        parse_mp4,
    )

    frames = [np.full((4, 4, 3), 10 * i, np.uint8) for i in range(5)]
    payload = bytearray(encode_mp4_rawvideo(frames, fps=5))
    sample = 4 * 4 * 3
    # locate the single-run stsc and single-entry stco the encoder wrote
    stsc_at = bytes(payload).index(b"stsc") - 4
    stco_at = bytes(payload).index(b"stco") - 4
    mdat_off = struct.unpack_from(">I", payload, stco_at + 16)[0]
    # rewrite in place (same byte lengths): stsc 1 run -> keep layout but
    # chunks of 2,2,1: runs (1,2,1),(3,1,1); stco 1 chunk -> 3 chunks.
    # The boxes grow, so rebuild the tail of stbl instead of in-place:
    # easier: construct the new boxes and splice.
    old_stsc = bytes(payload[stsc_at : stsc_at + 8 + 4 + 4 + 12])
    old_stco = bytes(payload[stco_at : stco_at + 8 + 4 + 4 + 4])
    new_stsc = (
        struct.pack(">I4s", 8 + 4 + 4 + 24, b"stsc")
        + b"\x00" * 4
        + struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 3, 1, 1)
    )
    new_stco = (
        struct.pack(">I4s", 8 + 4 + 4 + 12, b"stco")
        + b"\x00" * 4
        + struct.pack(">I", 3)
        + struct.pack(
            ">III", mdat_off, mdat_off + 2 * sample, mdat_off + 4 * sample
        )
    )
    delta = (len(new_stsc) - len(old_stsc)) + (len(new_stco) - len(old_stco))
    body = bytes(payload)
    body = body.replace(old_stsc, new_stsc).replace(old_stco, new_stco)
    # fix enclosing box sizes (stbl, minf, mdia, trak, moov each grew by
    # delta); mdat offset shifts too — repoint the three chunk offsets
    out = bytearray(body)
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = out.index(tag) - 4
        size = struct.unpack_from(">I", out, at)[0]
        struct.pack_into(">I", out, at, size + delta)
    stco_at2 = bytes(out).index(b"stco") - 4
    for i in range(3):
        off = struct.unpack_from(">I", out, stco_at2 + 16 + 4 * i)[0]
        struct.pack_into(">I", out, stco_at2 + 16 + 4 * i, off + delta)
    track = parse_mp4(bytes(out))
    assert track.n_samples == 5
    for i, f in enumerate(frames):
        assert (decode_mp4_frame(bytes(out), track, i) == f).all()


def test_mp4_compressed_codec_gated():
    import numpy as np
    import pytest

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        decode_mp4_frame,
        encode_mp4_rawvideo,
        parse_mp4,
    )

    frames = [np.zeros((4, 4, 3), np.uint8)]
    payload = bytearray(encode_mp4_rawvideo(frames, fps=1))
    at = bytes(payload).index(b"rgb ")
    payload[at : at + 4] = b"avc1"  # pretend it's h264
    track = parse_mp4(bytes(payload))
    assert track.codec == "avc1"
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="external decoder"):
            decode_mp4_frame(bytes(payload), track, 0)


def test_jpeg_decode_requires_pillow_or_works():
    """JPEG through the sniffing dispatch: decodes when pillow exists,
    raises the documented gate otherwise (mirrors the protobuf gate)."""
    import numpy as np
    import pytest

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        decode_image_bytes,
        sniff_format,
    )

    pil = pytest.importorskip("PIL", reason="pillow absent: gate covered below")
    import io

    from PIL import Image

    img = np.full((8, 8, 3), 77, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    payload = buf.getvalue()
    assert sniff_format(payload) == "jpeg"
    out = decode_image_bytes(payload)
    assert out.shape == (8, 8, 3)
    assert abs(int(out.mean()) - 77) <= 3


def test_jpeg_gate_without_pillow():
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("pillow present: decode path covered above")
    except ImportError:
        pass
    from dataintegration_csvprovider_spark.operators.media_codecs import (
        decode_image_bytes,
    )

    fake_jpeg = b"\xff\xd8" + b"\x00" * 16
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image_bytes(fake_jpeg)


def test_mp4_co64_and_mdhd_v1_paths():
    """64-bit chunk offsets (co64) and version-1 mdhd parse identically
    to their 32-bit/version-0 forms — hand-rewrite the encoder output."""
    import struct

    import numpy as np

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        decode_mp4_frame,
        encode_mp4_rawvideo,
        parse_mp4,
    )

    frames = [np.full((4, 4, 3), 7 * i, np.uint8) for i in range(3)]
    payload = bytes(encode_mp4_rawvideo(frames, fps=3))

    # --- co64: replace the stco box with a co64 carrying the same offset
    stco_at = payload.index(b"stco") - 4
    old_stco = payload[stco_at : stco_at + 8 + 4 + 4 + 4]
    offset = struct.unpack_from(">I", old_stco, 16)[0]
    new_co64 = (
        struct.pack(">I4s", 8 + 4 + 4 + 8, b"co64")
        + b"\x00" * 4
        + struct.pack(">I", 1)
        + struct.pack(">Q", offset)
    )
    delta = len(new_co64) - len(old_stco)
    body = payload.replace(old_stco, new_co64)
    out = bytearray(body)
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = out.index(tag) - 4
        struct.pack_into(">I", out, at, struct.unpack_from(">I", out, at)[0] + delta)
    # mdat moved by delta — repoint the chunk offset
    co64_at = bytes(out).index(b"co64") - 4
    struct.pack_into(">Q", out, co64_at + 16, offset + delta)
    track = parse_mp4(bytes(out))
    assert track.n_samples == 3
    for i, f in enumerate(frames):
        assert (decode_mp4_frame(bytes(out), track, i) == f).all()

    # --- mdhd v1: same timescale/duration via 64-bit fields
    mdhd_at = payload.index(b"mdhd") - 4
    old_mdhd = payload[mdhd_at : mdhd_at + 8 + 4 + 4 + 4 + 4 + 4 + 2 + 2]
    new_mdhd = (
        struct.pack(">I4s", 8 + 4 + 8 + 8 + 4 + 8 + 2 + 2, b"mdhd")
        + struct.pack(">B", 1) + b"\x00" * 3
        + struct.pack(">QQIQ", 0, 0, 3, 3)  # creation, mod, timescale, duration
        + struct.pack(">HH", 0x55C4, 0)
    )
    delta2 = len(new_mdhd) - len(old_mdhd)
    out2 = bytearray(payload.replace(old_mdhd, new_mdhd))
    for tag in (b"moov", b"trak", b"mdia"):
        at = out2.index(tag) - 4
        struct.pack_into(">I", out2, at, struct.unpack_from(">I", out2, at)[0] + delta2)
    stco_at2 = bytes(out2).index(b"stco") - 4
    off2 = struct.unpack_from(">I", out2, stco_at2 + 16)[0]
    struct.pack_into(">I", out2, stco_at2 + 16, off2 + delta2)
    track2 = parse_mp4(bytes(out2))
    assert (track2.timescale, track2.duration) == (3, 3)
    assert (decode_mp4_frame(bytes(out2), track2, 2) == frames[2]).all()


def test_mp4_inconsistent_sample_table_rejected():
    import struct

    import numpy as np
    import pytest

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        encode_mp4_rawvideo,
        parse_mp4,
    )

    payload = bytearray(encode_mp4_rawvideo([np.zeros((4, 4, 3), np.uint8)] * 4, fps=2))
    # claim 2 samples per chunk in stsc while stsz still says 4 samples
    # over ONE chunk -> chunk map covers only 2 of 4 samples
    stsc_at = bytes(payload).index(b"stsc") - 4
    struct.pack_into(">I", payload, stsc_at + 8 + 4 + 4 + 4, 2)
    with pytest.raises(ValueError, match="inconsistent"):
        parse_mp4(bytes(payload))


def test_mp4_variable_stsz_samples():
    """encode_mp4_samples with variable-size samples writes a per-sample
    stsz table that parse_mp4 resolves exactly — pillow NOT required
    (demux is native; only pixel decode is gated)."""
    from dataintegration_csvprovider_spark.operators.media_codecs import (
        encode_mp4_samples,
        parse_mp4,
        sniff_format,
    )

    samples = [b"a" * 11, b"bb" * 20, b"c" * 7, b"d" * 300]
    payload = encode_mp4_samples(samples, b"mjpa", 8, 8, fps=2)
    assert sniff_format(payload) == "mp4"
    track = parse_mp4(payload)
    assert track.codec == "mjpa"
    assert track.sample_sizes == [len(s) for s in samples]
    # every resolved (offset, size) range must hold exactly that sample
    for s, off, size in zip(samples, track.sample_offsets, track.sample_sizes):
        assert payload[off : off + size] == s


def test_mp4_samples_uniform_matches_rawvideo():
    """Equal-size samples keep the uniform-stsz layout, byte-identical
    to the historical encode_mp4_rawvideo output."""
    import numpy as np

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        encode_mp4_rawvideo,
        encode_mp4_samples,
    )

    frames = [np.full((4, 4, 3), 9 * i, np.uint8) for i in range(3)]
    via_raw = encode_mp4_rawvideo(frames, fps=5)
    via_samples = encode_mp4_samples(
        [f.tobytes() for f in frames], b"rgb ", 4, 4, fps=5
    )
    assert via_raw == via_samples


def test_mjpeg_in_mp4_decode_or_gated():
    """Motion-JPEG samples in a real mp4: decodes via the PIL branch
    when pillow exists; raises the documented gate otherwise."""
    import io

    import numpy as np
    import pytest

    from dataintegration_csvprovider_spark.operators.media_codecs import (
        decode_mp4_frame,
        encode_mp4_samples,
        parse_mp4,
    )

    try:
        from PIL import Image

        has_pil = True
    except ImportError:
        has_pil = False

    if has_pil:
        grays = [40, 120, 200]
        samples = []
        for g in grays:
            buf = io.BytesIO()
            Image.fromarray(np.full((8, 8, 3), g, np.uint8)).save(
                buf, format="JPEG", quality=95
            )
            samples.append(buf.getvalue())
    else:
        samples = [b"\xff\xd8" + bytes(10 + i) for i in range(3)]

    payload = encode_mp4_samples(samples, b"mjpa", 8, 8, fps=1)
    track = parse_mp4(payload)
    assert track.n_samples == 3
    if has_pil:
        for i, g in enumerate(grays):
            frame = decode_mp4_frame(payload, track, i)
            assert frame.shape == (8, 8, 3)
            assert abs(int(frame.mean()) - g) <= 3
    else:
        with pytest.raises(NotImplementedError, match="external decoder"):
            decode_mp4_frame(payload, track, 0)
