"""REAL (dependency-free) media container parsing for the multimodal
path: RIFF/WAVE and BMP headers via ``struct`` — these formats need no
codec library, so unlike the compressed-format decode (which stays a
declared stub, binary.py), this is a production parser running inside
the Arrow-batched ``mapInPandas`` flow.

The synthesizers exist because the sandbox testdata has no media
payloads: they build byte-exact container headers from per-doc
parameters (bodies truncated — header parsing never reads sample
data). The PARSERS are format-faithful: chunk-walking RIFF, offset
reads per the BITMAPINFOHEADER layout; they would accept real files.
"""

from __future__ import annotations

import struct


# ------------------------------------------------------------------ WAV


def synth_wav(n_frames: int, sample_rate: int, n_channels: int, bits: int = 16) -> bytes:
    """Minimal canonical RIFF/WAVE: fmt chunk + data chunk header
    (body truncated to 64 bytes — header fields carry the truth)."""
    data_len = n_frames * n_channels * (bits // 8)
    byte_rate = sample_rate * n_channels * (bits // 8)
    block_align = n_channels * (bits // 8)
    riff = b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block_align, bits
    )
    data = b"data" + struct.pack("<I", data_len) + bytes(min(data_len, 64))
    return riff + fmt + data


def parse_wav(b: bytes) -> dict:
    """Chunk-walking RIFF parser (the real thing — works on actual
    .wav files): finds fmt/data chunks wherever they sit. Truncated or
    malformed headers raise ValueError (never struct.error — callers
    are promised one exception type)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, out = 12, {}
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            if pos + 24 > len(b):
                raise ValueError("truncated fmt chunk")
            _tag, ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", b[pos + 8 : pos + 24]
            )
            out.update(n_channels=ch, sample_rate=sr, bits=bits)
        elif cid == b"data":
            out["data_bytes"] = size
            out["data_offset"] = pos + 8
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if "sample_rate" not in out or "data_bytes" not in out:
        raise ValueError("missing fmt/data chunk")
    if out["n_channels"] == 0 or out["bits"] == 0:
        raise ValueError("malformed fmt chunk (zero channels/bits)")
    out["n_frames"] = out["data_bytes"] // (out["n_channels"] * out["bits"] // 8)
    return out


def synth_wav_pcm(doc_id: int, n_frames: int, sample_rate: int) -> bytes:
    """Mono 16-bit PCM WAV with a FULL deterministic sample body:
    sample i = ((doc_id*31 + i*17) % 256) - 128 — reproducible by pure
    integer arithmetic in any engine, so DSP features extracted from
    the BYTES can be oracle-checked."""
    samples = [((doc_id * 31 + i * 17) % 256) - 128 for i in range(n_frames)]
    body = struct.pack(f"<{n_frames}h", *samples)
    riff = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return riff + fmt + b"data" + struct.pack("<I", len(body)) + body


def extract_pcm_features(b: bytes) -> dict:
    """REAL feature extraction from raw audio bytes: parse the RIFF
    header, locate the data chunk, decode int16 little-endian PCM, and
    compute peak / sum-of-absolute amplitude (numpy-vectorized — the
    shape of any executor-side DSP pass)."""
    import numpy as np

    meta = parse_wav(b)
    if meta["bits"] != 16:
        raise ValueError("only 16-bit PCM supported")
    pcm = np.frombuffer(
        b, dtype="<i2", count=meta["data_bytes"] // 2, offset=meta["data_offset"]
    )
    # abs in int64: np.abs on raw int16 wraps -32768 to -32768 and a
    # full-scale negative sample would report a NEGATIVE peak
    amps = np.abs(pcm.astype(np.int64))
    return {
        "n_frames": int(meta["n_frames"]),
        "sample_rate": int(meta["sample_rate"]),
        "peak": int(amps.max()) if amps.size else 0,
        "sum_abs": int(amps.sum()),
    }


# ------------------------------------------------------------------ Y4M


def synth_y4m(doc_id: int, width: int, height: int, n_frames: int) -> bytes:
    """YUV4MPEG2 (a REAL raw-video container: text header + uncompressed
    4:2:0 frames — the format ffmpeg pipes produce, no codec needed).
    Y plane pixel i of frame f = (doc_id + 13*f + 5*i) % 256, chroma
    constant 128 — fully reproducible by integer arithmetic."""
    hdr = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()
    ysz, csz = width * height, (width // 2) * (height // 2)
    frames = []
    for f in range(n_frames):
        y = bytes(((doc_id + 13 * f + 5 * i) % 256) for i in range(ysz))
        frames.append(b"FRAME\n" + y + b"\x80" * (2 * csz))
    return hdr + b"".join(frames)


def sample_y4m_frames(b: bytes, step: int = 2) -> dict:
    """REAL frame sampling straight from the container bytes: parse the
    stream header (W/H/C tokens), walk fixed-size 4:2:0 frames, take
    every ``step``-th one, and reduce its Y plane (numpy sum) — the
    video analog of the BMP resize / PCM feature passes."""
    import numpy as np

    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    tokens = b[:nl].decode("ascii", "replace").split()
    w = h = None
    for t in tokens[1:]:
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C") and t != "C420":
            raise ValueError(f"unsupported chroma mode {t}")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    ysz = w * h
    fsz = ysz + 2 * ((w // 2) * (h // 2))
    pos, frame_offsets = nl + 1, []
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        frame_offsets.append(fnl + 1)
        pos = fnl + 1 + fsz
    sampled = frame_offsets[::step]
    checksum = 0
    for off in sampled:
        yplane = np.frombuffer(b, dtype=np.uint8, offset=off, count=ysz)
        checksum += int(yplane.astype(np.int64).sum())
    return {
        "width": w,
        "height": h,
        "n_frames": len(frame_offsets),
        "n_sampled": len(sampled),
        "y_checksum": checksum,
    }


# ------------------------------------------------------------------ BMP


def synth_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """Minimal BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (pixel array
    truncated)."""
    row_bytes = (width * (bpp // 8) + 3) // 4 * 4
    img_size = row_bytes * height
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, img_size, 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + bytes(min(img_size, 64))


def synth_bmp_pixels(doc_id: int, width: int, height: int) -> bytes:
    """24bpp BMP with a FULL pixel array: pixel (x, y)'s blue channel =
    (doc_id + 3x + 7y) % 256 (green/red = +1/+2), rows bottom-up and
    padded to 4 bytes per the real format — the layout details
    (stride, padding, channel order, row direction) are exactly what a
    resize/feature pass must get right."""
    row_bytes = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_bytes - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # BMP stores bottom-up
        row = bytearray()
        for x in range(width):
            v = (doc_id + 3 * x + 7 * y) % 256
            row += bytes(((v, (v + 1) % 256, (v + 2) % 256)))  # B, G, R
        rows.append(bytes(row) + pad)
    body = b"".join(rows)
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def resize_bmp_nearest(b: bytes, step: int = 2) -> dict:
    """REAL nearest-neighbor downsample straight from BMP bytes: parse
    the header, undo the bottom-up row order and the 4-byte row
    padding with a numpy strided view, sample every ``step``-th pixel,
    and return output dims + the blue-channel checksum of the sampled
    grid (the value an oracle can recompute from the generator
    arithmetic)."""
    import numpy as np

    meta = parse_bmp(b)
    w, h = meta["width"], meta["height"]
    if meta["bpp"] != 24:
        raise ValueError("only 24bpp supported")
    row_bytes = (w * 3 + 3) // 4 * 4
    # honor the header's pixel-array offset (V4/V5 headers put it past
    # 54) and the row direction flag (negative biHeight = top-down)
    arr = np.frombuffer(
        b, dtype=np.uint8, offset=meta["data_offset"], count=row_bytes * h
    )
    rows = arr.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    top_down = rows if meta["top_down"] else rows[::-1]
    sampled = top_down[::step, ::step]
    return {
        "out_w": sampled.shape[1],
        "out_h": sampled.shape[0],
        "blue_checksum": int(sampled[:, :, 0].astype(np.int64).sum()),
    }


def parse_bmp(b: bytes) -> dict:
    if len(b) < 30 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (or truncated header)")
    data_offset = struct.unpack("<I", b[10:14])[0]  # bfOffBits — NOT always 54
    width, height = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    return {
        "width": width,
        "height": abs(height),
        "bpp": bpp,
        # negative biHeight = rows stored TOP-down (no flip needed)
        "top_down": height < 0,
        "data_offset": data_offset,
    }


# ------------------------------------------------------------------ PNG
#
# The one COMPRESSED format this engine decodes for real (the container
# parsers above are header walks; PNG adds zlib inflate + the five
# scanline filters). Dependency-free: zlib ships in the stdlib, the
# filter math is the spec's. ``decode_png`` would accept any 8-bit
# truecolor PNG (non-interlaced); the synthesizer exists only because
# the sandbox has no image files.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def synth_png(doc_id: int, width: int, height: int) -> bytes:
    """Spec-conformant 8-bit RGB PNG with deterministic pixels:
    red(x, y) = (doc_id + 3x + 7y) % 256 (green/blue derived). Each
    scanline uses filter type ``y % 5`` — the stream exercises ALL
    FIVE filters (None/Sub/Up/Average/Paeth), so a decoder with any
    unfilter bug diverges. The IDAT stream is split across two chunks
    (real encoders emit many) to force correct concatenation."""
    import zlib

    raw = bytearray()
    prev = bytes(width * 3)
    for y in range(height):
        line = bytearray()
        for x in range(width):
            r = (doc_id + 3 * x + 7 * y) % 256
            line += bytes((r, (r * 5 + x) % 256, (r + x * y) % 256))
        ft = y % 5
        raw.append(ft)
        bpp = 3
        for i, v in enumerate(line):
            a = line[i - bpp] if i >= bpp else 0  # left, same channel
            b_ = prev[i]  # up
            c = prev[i - bpp] if i >= bpp else 0  # upper-left
            if ft == 0:
                f = v
            elif ft == 1:
                f = (v - a) % 256
            elif ft == 2:
                f = (v - b_) % 256
            elif ft == 3:
                f = (v - (a + b_) // 2) % 256
            else:
                f = (v - _paeth(a, b_, c)) % 256
            raw.append(f)
        prev = bytes(line)
    comp = zlib.compress(bytes(raw), 6)
    cut = max(1, len(comp) // 2)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[:cut])
        + _png_chunk(b"IDAT", comp[cut:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> dict:
    """REAL PNG decode: CRC-verified chunk walk, multi-IDAT zlib
    inflate, and full scanline unfiltering (all five filter types, the
    Paeth predictor per the spec). Returns dims + the red-channel
    checksum of the reconstructed pixels — any inflate, filter or
    predictor bug diverges it. 8-bit truecolor (color type 2),
    non-interlaced; anything else raises ValueError."""
    import zlib

    import numpy as np

    if len(b) < 8 or b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, idat = 8, None, None, []
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_n, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype_n != 2 or interlace != 0:
                raise ValueError("only 8-bit truecolor non-interlaced supported")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("inflated size mismatch")
    bpp = 3
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, offset=y * (stride + 1) + 1, count=stride
        )
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up — vectorizable
            out[y] = line + prev  # uint8 wraps mod 256
        elif ft in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            row = out[y]
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    row[i] = (line[i] + a) % 256
                elif ft == 3:
                    row[i] = (line[i] + (a + up) // 2) % 256
                else:
                    row[i] = (line[i] + _paeth(a, up, c)) % 256
        else:
            raise ValueError(f"unknown filter type {ft}")
    pixels = out.reshape(height, width, 3)
    return {
        "width": width,
        "height": height,
        "red_checksum": int(pixels[:, :, 0].astype(np.int64).sum()),
    }
