"""Real, dependency-free media codecs for the multimodal column path.

The container has no PIL/torchvision/soundfile, but several production
formats need nothing beyond the stdlib + numpy:

- **BMP** (Windows bitmap, uncompressed 24-bit BI_RGB) — ``struct`` header
  parse + numpy reshape over the padded pixel rows.
- **PPM** (netpbm P6 binary) — header tokens + raw RGB bytes.
- **PNG** (8-bit RGB/RGBA/gray, non-interlaced) — stdlib ``zlib`` inflate
  + vectorized scanline unfiltering (filters 0-4 incl. Paeth).
- **WAV** (PCM 8/16/32-bit) — stdlib ``wave`` + ``numpy.frombuffer``.

``decode_image_bytes`` sniffs magic bytes and dispatches; JPEG and other
compressed formats fall through to a PIL-gated branch that raises a
clear ``NotImplementedError`` when pillow is absent (mirroring the
protobuf-gated streaming test). Everything here is deterministic and
pure-function, so it is safe inside Arrow-batched ``mapInPandas`` workers.

Encoders for the supported formats are included so tests and fixture
queries can synthesize real on-disk bytes and round-trip them — the
decode path is exercised on genuine format payloads, not pseudo-data.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# --------------------------------------------------------------------------
# BMP — uncompressed 24-bit
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit BI_RGB BMP bytes."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    h, w, _ = a.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    image_size = row_size * h
    # pixel data: bottom-up rows, BGR order
    bgr = a[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


# --------------------------------------------------------------------------
# PPM — netpbm P6
# --------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    a = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = 3 whitespace-separated tokens after the magic, each
    # optionally preceded by comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# --------------------------------------------------------------------------
# PNG — 8-bit gray/RGB/RGBA, non-interlaced
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3|4) uint8 array → PNG bytes (filter 0)."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError("encode_png expects gray, RGB, or RGBA")
    h, w, _ = a.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = a.reshape(h, w * channels)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. Row loop is over image height only;
    within a row everything is numpy except the inherently sequential
    filters (Sub/Paeth), which run per-pixel-group over at most `stride`
    bytes — fine for the thumbnail-scale features this engine extracts."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, 1 + stride)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 (gray returns (h, w, 1))."""
    if payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_MAGIC)
    width = height = None
    channels = 0
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = width * channels
    out = _png_unfilter(raw, height, stride, channels)
    return out.reshape(height, width, channels)


# --------------------------------------------------------------------------
# WAV — PCM via stdlib wave
# --------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """float array in [-1, 1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        channels = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        samples = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
        )
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return samples.reshape(-1, channels), rate


# --------------------------------------------------------------------------
# Concatenated-BMP video container
# --------------------------------------------------------------------------


def split_concatenated_bmps(payload: bytes) -> list[bytes]:
    """Split a raw concatenation of BMP frames into per-frame payloads —
    the simplest seekable video container expressible without codec
    libraries (each BMP header carries its own file size at offset 2, so
    frames are walked without an index). Real containers (mp4/mkv) would
    ride the same per-row contract behind a pillow/av gate."""
    frames = []
    pos = 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"BM":
            raise ValueError(f"bad frame magic at offset {pos}")
        size = struct.unpack_from("<I", payload, pos + 2)[0]
        if size < 14 or pos + size > len(payload):
            raise ValueError(f"bad frame size {size} at offset {pos}")
        frames.append(payload[pos : pos + size])
        pos += size
    return frames


# --------------------------------------------------------------------------
# Sniffing dispatch
# --------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str:
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Sniff + decode an image payload to an (h, w, c) uint8 array.
    PNG/BMP/PPM decode natively; JPEG needs pillow (gated)."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "jpeg":
        try:
            from PIL import Image  # noqa: PLC0415
        except ImportError as exc:
            raise NotImplementedError(
                "JPEG decode needs pillow, which is not in this container; "
                "PNG/BMP/PPM decode natively"
            ) from exc
        with Image.open(io.BytesIO(payload)) as img:
            return np.asarray(img.convert("RGB"))
    raise ValueError(f"unrecognized image payload (format={fmt!r})")


# --------------------------------------------------------------------------
# ISO-BMFF (mp4) container — native demux, rawvideo samples
# --------------------------------------------------------------------------
#
# A REAL mp4 container walk, no codec libraries: generic box parsing
# (32/64-bit sizes, nested containers), movie/track headers, and the full
# sample-table resolution a production demuxer performs — stsc chunk runs
# × stco/co64 chunk offsets × stsz sample sizes → absolute per-sample
# byte ranges. Frame PIXELS decode natively when the track's sample
# entry is the engine's uncompressed 'rgb ' format (24-bit RGB, exactly
# what encode_mp4_rawvideo writes); compressed codecs (avc1/hev1/mp4v)
# demux identically but pixel decode is gated behind the PIL/av absence
# like JPEG.

#: container boxes whose payload is a sequence of child boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _mp4_box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), tag) + payload


def _mp4_fullbox(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _mp4_box(tag, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def iter_mp4_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Yield ``(fourcc, payload_start, payload_end)`` for each box in
    ``buf[start:end]`` — 64-bit largesize (size==1) and to-end (size==0)
    handled per ISO/IEC 14496-12 §4.2."""
    end = len(buf) if end is None else end
    pos = start
    while pos + 8 <= end:
        size, tag = struct.unpack_from(">I4s", buf, pos)
        header = 8
        if size == 1:
            largesize = struct.unpack_from(">Q", buf, pos + 8)[0]
            header, size = 16, largesize
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad mp4 box size {size} at offset {pos}")
        yield tag, pos + header, pos + size
        pos += size


def encode_mp4_rawvideo(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Uniform (h, w, 3) uint8 RGB frames → a minimal but spec-shaped
    mp4: ftyp + moov (mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl with real
    stsd/stts/stsc/stsz/stco tables) + mdat of raw RGB24 samples under a
    private 'rgb ' visual sample entry."""
    if not frames:
        raise ValueError("encode_mp4_rawvideo needs at least one frame")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, c = arrs[0].shape
    if c != 3 or any(a.shape != (h, w, 3) for a in arrs):
        raise ValueError("all frames must be identical (h, w, 3) RGB")
    return encode_mp4_samples(
        [a.tobytes() for a in arrs], b"rgb ", w, h, fps=fps
    )


def encode_mp4_samples(
    samples: list[bytes], codec: bytes, w: int, h: int, fps: int = 25
) -> bytes:
    """Pre-encoded video samples → a spec-shaped single-chunk mp4 under
    the given visual sample-entry fourcc (e.g. ``b"mjpa"`` for
    Motion-JPEG samples, ``b"rgb "`` for raw RGB24). Equal-size samples
    write a uniform stsz (byte-identical to the historical raw path);
    variable sizes write the per-sample stsz table — the shape every
    compressed-codec mp4 in the wild uses, and the shape
    :func:`parse_mp4`'s stsc×stco×stsz expansion resolves."""
    if not samples:
        raise ValueError("encode_mp4_samples needs at least one sample")
    if len(codec) != 4:
        raise ValueError("codec must be a 4-byte fourcc")
    n = len(samples)
    sizes = [len(s) for s in samples]
    uniform = sizes[0] if all(s == sizes[0] for s in sizes) else 0
    mdat_payload = b"".join(samples)

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    def build_moov(mdat_data_offset: int) -> bytes:
        mvhd = _mp4_fullbox(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, 1000, n * 1000 // fps)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8 + matrix + b"\x00" * 24 + struct.pack(">I", 2),
        )
        tkhd = _mp4_fullbox(
            b"tkhd", 0, 7,
            struct.pack(">IIIII", 0, 0, 1, 0, n * 1000 // fps)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _mp4_fullbox(
            b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0)
        )
        hdlr = _mp4_fullbox(
            b"hdlr", 0, 0,
            struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"RawVideoHandler\x00",
        )
        entry = (
            b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
            + struct.pack(">HH", 0, 0) + b"\x00" * 12  # predefined/reserved
            + struct.pack(">HH", w, h)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + struct.pack(">I", 0) + struct.pack(">H", 1)  # frame_count
            + b"\x00" * 32  # compressorname
            + struct.pack(">Hh", 24, -1)  # depth, predefined
        )
        stsd = _mp4_fullbox(
            b"stsd", 0, 0, struct.pack(">I", 1) + _mp4_box(codec, entry)
        )
        stts = _mp4_fullbox(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
        stsc = _mp4_fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        if uniform:
            stsz = _mp4_fullbox(
                b"stsz", 0, 0, struct.pack(">III", uniform, n, 0)
            )
        else:
            stsz = _mp4_fullbox(
                b"stsz", 0, 0,
                struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
            )
        stco = _mp4_fullbox(b"stco", 0, 0, struct.pack(">II", 1, mdat_data_offset))
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _mp4_fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _mp4_fullbox(
            b"dref", 0, 0, struct.pack(">I", 1) + _mp4_fullbox(b"url ", 0, 1, b"")
        )
        dinf = _mp4_box(b"dinf", dref)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        return _mp4_box(b"moov", mvhd + trak)

    # stco needs the absolute mdat data offset, which depends on moov's
    # size — but moov's size is offset-independent (stco entries are
    # fixed-width), so build once with a placeholder to measure
    moov_size = len(build_moov(0))
    mdat_data_offset = len(ftyp) + moov_size + 8
    moov = build_moov(mdat_data_offset)
    return ftyp + moov + _mp4_box(b"mdat", mdat_payload)


class Mp4Track:
    """Resolved video track: identity + the fully-expanded sample map."""

    __slots__ = (
        "codec", "width", "height", "timescale", "duration",
        "sample_sizes", "sample_offsets",
    )

    def __init__(self, codec, width, height, timescale, duration,
                 sample_sizes, sample_offsets):
        self.codec = codec
        self.width = width
        self.height = height
        self.timescale = timescale
        self.duration = duration
        self.sample_sizes = sample_sizes
        self.sample_offsets = sample_offsets

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)


def parse_mp4(payload: bytes) -> Mp4Track:
    """Demux the first video track of an ISO-BMFF payload: walk the box
    tree, read the sample tables, and resolve every sample to an
    absolute (offset, size) — the stsc chunk-run × stco chunk-offset ×
    stsz sample-size expansion every real demuxer performs."""
    tops = {t: (s, e) for t, s, e in iter_mp4_boxes(payload)}
    if b"moov" not in tops:
        raise ValueError("no moov box — not an mp4 movie")
    moov_s, moov_e = tops[b"moov"]
    for tag, ts, te in iter_mp4_boxes(payload, moov_s, moov_e):
        if tag != b"trak":
            continue
        track = _parse_trak(payload, ts, te)
        if track is not None:
            return track
    raise ValueError("no video track with a complete sample table")


def _parse_trak(payload: bytes, start: int, end: int) -> Mp4Track | None:
    boxes: dict[bytes, tuple[int, int]] = {}

    def walk(s: int, e: int) -> None:
        for tag, ps, pe in iter_mp4_boxes(payload, s, e):
            boxes[tag] = (ps, pe)
            if tag in _MP4_CONTAINERS:
                walk(ps, pe)

    walk(start, end)
    if b"hdlr" in boxes:
        hs, _ = boxes[b"hdlr"]
        if payload[hs + 8 : hs + 12] != b"vide":
            return None
    needed = (b"stsd", b"stsz", b"stsc")
    if any(t not in boxes for t in needed):
        return None
    if b"stco" not in boxes and b"co64" not in boxes:
        return None

    # stsd: first sample entry carries the codec fourcc and dimensions
    ss, _ = boxes[b"stsd"]
    entry_pos = ss + 8  # fullbox header + entry_count
    _, codec = struct.unpack_from(">I4s", payload, entry_pos)
    width, height = struct.unpack_from(">HH", payload, entry_pos + 8 + 24)

    timescale = duration = 0
    if b"mdhd" in boxes:
        ms, _ = boxes[b"mdhd"]
        version = payload[ms]
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", payload, ms + 4 + 16)
        else:
            timescale, duration = struct.unpack_from(">II", payload, ms + 4 + 8)

    # stsz: uniform sample_size or a per-sample table
    zs, _ = boxes[b"stsz"]
    uniform, count = struct.unpack_from(">II", payload, zs + 4)
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", payload, zs + 12))

    # chunk offsets: stco (32-bit) or co64
    if b"stco" in boxes:
        cs, _ = boxes[b"stco"]
        n_chunks = struct.unpack_from(">I", payload, cs + 4)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", payload, cs + 8))
    else:
        cs, _ = boxes[b"co64"]
        n_chunks = struct.unpack_from(">I", payload, cs + 4)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, cs + 8))

    # stsc runs: (first_chunk, samples_per_chunk, _) — expand to a
    # samples-per-chunk list over the real chunk count
    ks, _ = boxes[b"stsc"]
    n_runs = struct.unpack_from(">I", payload, ks + 4)[0]
    runs = [
        struct.unpack_from(">III", payload, ks + 8 + 12 * i) for i in range(n_runs)
    ]
    per_chunk: list[int] = []
    for i, (first, spc, _) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(chunk_offsets)
        per_chunk.extend([spc] * (last - first + 1))

    # the demux core: absolute offset of every sample
    offsets: list[int] = []
    si = 0
    for ci, chunk_off in enumerate(chunk_offsets):
        pos = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            offsets.append(pos)
            pos += sizes[si]
            si += 1
    if si < len(sizes):
        raise ValueError(
            f"sample table inconsistent: {len(sizes)} samples, "
            f"chunk map covers {si}"
        )
    return Mp4Track(
        codec=codec.decode("ascii", "replace"),
        width=width,
        height=height,
        timescale=timescale,
        duration=duration,
        sample_sizes=sizes,
        sample_offsets=offsets,
    )


def decode_mp4_frame(payload: bytes, track: Mp4Track, index: int) -> np.ndarray:
    """Decode sample ``index`` of a demuxed track to (h, w, 3) uint8 RGB.
    Native for the engine's uncompressed 'rgb ' sample format; compressed
    codecs demux fine but need an external decoder (gated, like JPEG)."""
    if not 0 <= index < track.n_samples:
        raise IndexError(f"frame {index} out of range 0..{track.n_samples - 1}")
    off, size = track.sample_offsets[index], track.sample_sizes[index]
    raw = payload[off : off + size]
    if track.codec.strip() == "rgb":
        expected = track.width * track.height * 3
        if size != expected:
            raise ValueError(f"rgb sample size {size} != w*h*3 {expected}")
        return (
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(track.height, track.width, 3)
            .copy()
        )
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            f"codec {track.codec!r} needs an external decoder "
            "(pillow/av), absent in this container; the 'rgb ' sample "
            "format decodes natively"
        ) from exc
    with Image.open(io.BytesIO(raw)) as img:  # e.g. mjpeg samples
        return np.asarray(img.convert("RGB"))
