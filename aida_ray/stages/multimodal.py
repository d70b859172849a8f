"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct
(mime, width/height or sample rate, duration).  Decode / resize /
frame-sample / feature-extract run as actor-pool ``map_batches`` stages
with SMALL batch sizes (payload bytes dominate memory).  Decode routes
through ``DecodeBackend``: :class:`StdlibDecodeBackend` REALLY decodes
PNG (zlib inflate + five-filter scanline reconstruction), BMP, binary
PPM/PGM images and WAV audio in four formats (PCM16/PCM8, G.711
μ-law/A-law expansion, mono IMA-ADPCM) with nothing beyond the stdlib
+ numpy; the
deterministic fake backend remains for shape-contract tests.
Baseline AND progressive JPEG decode for real too (stages/jpeg.py —
pure numpy Huffman + dequant + exact DCT-III, a unified
spectral-selection/successive-approximation scan engine, validated
against third-party-encoded files); MP3/MP4 remain the documented
codec seam — plug PIL/soundfile/torchaudio into
``DecodeBackend`` per actor in production.  Motion-JPEG AVI video
frame-samples for real (RIFF walk + per-frame JPEG decode);
inter-frame codecs (H.264/VP9) stay stubbed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("duration_ms", pa.int32())])),
])


class DecodeBackend:
    """Real decode backend interface. Implementations must be
    constructible inside the actor (once) and stateless per call."""

    def decode_image(self, payload: bytes) -> np.ndarray:  # (H, W, 3) uint8
        raise NotImplementedError(
            "no image codec in this environment — plug a PIL/The cv2 backend here")

    def sample_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        raise NotImplementedError("no video codec in this environment")

    def decode_audio(self, payload: bytes) -> tuple[int, np.ndarray]:
        """Return (sample_rate, int16 mono waveform)."""
        raise NotImplementedError(
            "no audio codec in this environment — plug a soundfile/"
            "torchaudio backend here")


class FakeDecodeBackend(DecodeBackend):
    """Deterministic stand-in: pseudo-pixels seeded by the payload hash.

    Keeps every downstream shape/dtype contract of a real decoder so
    tests exercise the full pipeline."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        h, w = 32 + seed % 32, 32 + (seed >> 8) % 32
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def sample_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        return [self.decode_image(payload + bytes([i])) for i in range(n)]

    def decode_audio(self, payload: bytes) -> tuple[int, np.ndarray]:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        n = 1000 + seed % 4000
        wave = rng.integers(-2 ** 15, 2 ** 15, size=n).astype(np.int16)
        return 16000, wave


class StdlibDecodeBackend(DecodeBackend):
    """REAL decoders, pure stdlib + numpy: PNG (zlib inflate + full
    None/Sub/Up/Average/Paeth scanline reconstruction; 8-bit gray/RGB/
    palette/alpha, verified against third-party-encoded files), BMP
    (24-bit uncompressed BI_RGB), binary PPM/PGM, and WAV (PCM16) via
    the ``wave`` module, and baseline-sequential JPEG
    (stages/jpeg.py: Huffman + dequant + exact DCT-III + YCbCr with
    arbitrary sampling factors and restart markers, verified against
    third-party-encoded files; our own Annex-K encoder bounds
    round-trip error by the quantization step; progressive SOF2 decodes
    through the same unified scan engine), with Motion-JPEG AVI frame
    sampling on top (RIFF walk + per-frame JPEG decode).
    Inter-frame video codecs and MP3/MP4 still need an external codec — plug PIL/soundfile into
    :class:`DecodeBackend` in production."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return self._decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            from aida_ray.stages.jpeg import decode_jpeg
            return decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from aida_ray.stages.jpeg import decode_gif
            return decode_gif(payload)
        if payload[:2] == b"BM":
            return self._decode_bmp(payload)
        if payload[:2] in (b"P6", b"P5"):
            return self._decode_pnm(payload)
        raise ValueError(
            "unsupported image container (PNG/JPEG/GIF/BMP/PPM/PGM only)")

    def sample_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        """REAL video frame sampling for Motion-JPEG AVI: RIFF walk →
        JPEG frame chunks → uniform index sample → baseline-JPEG
        decode per frame (stages/jpeg.py).  Inter-frame codecs
        (H.264/VP9/…) still need an external decoder."""
        from aida_ray.stages.jpeg import extract_mjpeg_frames
        frames = extract_mjpeg_frames(payload)
        if not frames:
            raise ValueError("AVI contains no MJPEG frames")
        idx = np.linspace(0, len(frames) - 1, min(n, len(frames)),
                          dtype=int)
        return [self.decode_image(frames[i]) for i in idx]

    @staticmethod
    def _decode_png(payload: bytes) -> np.ndarray:
        """REAL PNG decode, stdlib-only: chunk walk → zlib inflate →
        per-scanline reconstruction of all five PNG filters (None/
        Sub/Up/Average/Paeth, RFC 2083 §6).  8-bit depth, color types
        0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no
        interlace.  Alpha is dropped; gray/palette expand to RGB."""
        import struct
        import zlib
        pos, idat, plte = 8, [], None
        w = h = depth = ctype = interlace = None
        while pos + 8 <= len(payload):
            ln, typ = struct.unpack_from(">I4s", payload, pos)
            data = payload[pos + 8:pos + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = \
                    struct.unpack(">IIBBBBB", data)
            elif typ == b"PLTE":
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if w is None or depth != 8 or interlace != 0:
            raise ValueError("only 8-bit non-interlaced PNG supported")
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        raw = zlib.decompress(b"".join(idat))
        stride = w * ch
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        out = np.empty((h, stride), np.uint8)
        prev = np.zeros(stride, np.int32)
        p = 0
        for y in range(h):
            f = raw[p]
            row = np.frombuffer(raw, np.uint8, stride, p + 1) \
                .astype(np.int32)
            p += 1 + stride
            if f == 0:
                recon = row
            elif f == 2:                      # Up
                recon = (row + prev) & 0xFF
            elif f == 1:                      # Sub (sequential in x)
                recon = row
                for x in range(ch, stride):
                    recon[x] = (recon[x] + recon[x - ch]) & 0xFF
            elif f == 3:                      # Average
                recon = row
                for x in range(stride):
                    a = recon[x - ch] if x >= ch else 0
                    recon[x] = (recon[x] + ((a + prev[x]) >> 1)) & 0xFF
            elif f == 4:                      # Paeth
                recon = row
                for x in range(stride):
                    a = recon[x - ch] if x >= ch else 0
                    c = prev[x - ch] if x >= ch else 0
                    b_ = prev[x]
                    pp = a + b_ - c
                    pa_, pb_, pc_ = abs(pp - a), abs(pp - b_), abs(pp - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (b_ if pb_ <= pc_ else c)
                    recon[x] = (recon[x] + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter {f}")
            out[y] = recon
            prev = recon
        img = out.reshape(h, w, ch)
        if ctype == 3:
            if plte is None:
                raise ValueError("palette PNG without PLTE")
            return plte[img[..., 0]].copy()
        if ch == 1:
            return np.repeat(img, 3, axis=2).copy()
        if ch == 2:                           # gray+alpha → gray RGB
            return np.repeat(img[..., :1], 3, axis=2).copy()
        return img[..., :3].copy()

    @staticmethod
    def _decode_bmp(payload: bytes) -> np.ndarray:
        import struct
        off, = struct.unpack_from("<I", payload, 10)
        hdr_size, = struct.unpack_from("<I", payload, 14)
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp, = struct.unpack_from("<H", payload, 28)
        comp, = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or comp != 0 or hdr_size < 40:
            raise ValueError("only 24-bit uncompressed BI_RGB BMP")
        flip = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)
        img = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
        return img[::-1].copy() if flip else img.copy()

    @staticmethod
    def _decode_pnm(payload: bytes) -> np.ndarray:
        # header: magic, whitespace/comments, width, height, maxval
        fields, i = [], 2
        while len(fields) < 3:
            while i < len(payload) and payload[i:i + 1].isspace():
                i += 1
            if payload[i:i + 1] == b"#":
                while i < len(payload) and payload[i:i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PNM not supported")
        if payload[:2] == b"P6":
            img = np.frombuffer(payload, np.uint8, w * h * 3, i)
            return img.reshape(h, w, 3).copy()
        gray = np.frombuffer(payload, np.uint8, w * h, i).reshape(h, w)
        return np.repeat(gray[..., None], 3, axis=2).copy()

    def decode_audio(self, payload: bytes) -> tuple[int, np.ndarray]:
        """RIFF-WAVE → (sample_rate, int16 mono): PCM 16/8-bit, G.711
        μ-law and A-law expansion, and IMA-ADPCM block decode — the
        format tags a web/telephony crawl actually meets.  Own chunk
        parser (the stdlib ``wave`` module rejects everything but
        PCM); multi-channel takes the first channel."""
        import struct as _struct
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            sz, = _struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8:pos + 8 + sz]
            if cid == b"fmt ":
                fmt = _struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        tag, ch, sr, _brate, block_align, bits = fmt
        if tag == 1 and bits == 16:
            raw = np.frombuffer(data, "<i2").astype(np.int16)
        elif tag == 1 and bits == 8:
            raw = ((np.frombuffer(data, np.uint8).astype(np.int16)
                    - 128) << 8)
        elif tag == 7:                     # G.711 μ-law
            raw = _MULAW_TABLE[np.frombuffer(data, np.uint8)]
        elif tag == 6:                     # G.711 A-law
            raw = _ALAW_TABLE[np.frombuffer(data, np.uint8)]
        elif tag == 0x11:                  # IMA ADPCM
            if ch != 1:
                raise ValueError("IMA-ADPCM: mono only")
            raw = _ima_adpcm_decode(data, block_align)
            return sr, raw
        else:
            raise ValueError(f"unsupported WAV format tag {tag}")
        if ch > 1:
            raw = raw.reshape(-1, ch)[:, 0].copy()  # first channel
        return sr, raw


try:                                     # import-guarded (r5 item 8):
    from PIL import Image as _PILImage   # the container ships no PIL —
    HAVE_PIL = True                      # this proves the seam is
except ImportError:                      # pluggable, not hypothetical
    _PILImage = None
    HAVE_PIL = False


class PILDecodeBackend(DecodeBackend):
    """The production image backend a real deployment plugs in: PIL/
    Pillow for every raster format it knows (JPEG incl. progressive,
    PNG incl. interlace, GIF, WebP, TIFF, BMP, …).  Frame sampling
    covers PIL's multi-frame containers (animated GIF/WebP, multi-page
    TIFF); MJPEG-AVI falls through to the stdlib RIFF walk, and audio
    delegates to the stdlib WAV decoder (PIL has no audio).  Skipped
    (not stubbed) when Pillow is absent — the conditional test in
    tests/test_multimodal_backends.py runs iff the lib exists."""

    def __init__(self):
        if not HAVE_PIL:
            raise ImportError("Pillow not installed — use "
                              "StdlibDecodeBackend or pip install pillow")
        self._stdlib = StdlibDecodeBackend()

    def decode_image(self, payload: bytes) -> np.ndarray:
        import io
        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)

    def sample_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        import io
        if payload[:4] == b"RIFF":       # MJPEG AVI: PIL can't, we can
            return self._stdlib.sample_frames(payload, n)
        with _PILImage.open(io.BytesIO(payload)) as im:
            total = getattr(im, "n_frames", 1)
            idx = np.linspace(0, total - 1, min(n, total), dtype=int)
            out = []
            for i in idx:
                im.seek(int(i))
                out.append(np.asarray(im.convert("RGB"), dtype=np.uint8))
            return out

    def decode_audio(self, payload: bytes) -> tuple[int, np.ndarray]:
        return self._stdlib.decode_audio(payload)


def _build_mulaw_table() -> np.ndarray:
    """G.711 μ-law byte → linear int16 (standard expansion)."""
    u = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    """G.711 A-law byte → linear int16 (standard expansion)."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    # A-law sign convention is INVERTED vs mu-law: a set sign bit
    # (before the 0x55 toggle) marks the POSITIVE half (G.711 Table
    # 1a; matches CPython audioop exactly, table-verified in tests)
    return np.where(sign, mag, -mag).astype(np.int16)


_MULAW_TABLE = _build_mulaw_table()
_ALAW_TABLE = _build_alaw_table()

_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, np.int64)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], np.int64)


def _ima_adpcm_decode(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA-ADPCM block decode (4-bit nibbles, per-block header)."""
    out: list[int] = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off:off + block_align]
        pred = int(np.frombuffer(block, "<i2", 1, 0)[0])
        index = min(max(block[2], 0), 88)
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEPS[index])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                index = min(max(index + int(_IMA_INDEX_ADJ[nib]), 0), 88)
                out.append(pred)
    return np.array(out, np.int16)


def encode_mulaw_wav(wave_i16: np.ndarray, sr: int = 8000) -> bytes:
    """int16 mono → G.711 μ-law WAV (test/fixture helper; standard
    segment-search compression, BIAS 0x84)."""
    x = wave_i16.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x) + 0x84, 0x7FFF)
    exp = np.clip(np.floor(np.log2(mag)).astype(np.int64) - 7, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    u = (~(sign | (exp << 4) | mant)) & 0xFF
    body = u.astype(np.uint8).tobytes()
    return _wav_container(body, sr, tag=7, bits=8)


def _wav_container(body: bytes, sr: int, tag: int, bits: int,
                   block_align: int | None = None) -> bytes:
    import struct as _struct
    ba = block_align if block_align is not None else bits // 8
    fmt = _struct.pack("<HHIIHH", tag, 1, sr, sr * ba, ba, bits)
    chunks = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
              + b"data" + _struct.pack("<I", len(body)) + body
              + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_ima_adpcm_wav(wave_i16: np.ndarray, sr: int = 8000,
                         block_samples: int = 505) -> bytes:
    """int16 mono → mono IMA-ADPCM WAV (test/fixture helper)."""
    block_align = 4 + (block_samples - 1 + 1) // 2
    out = bytearray()
    x = wave_i16.astype(np.int64)
    i = 0
    index = 0
    while i < len(x):
        blk = x[i:i + block_samples]
        pred = int(blk[0])
        out += int(pred).to_bytes(2, "little", signed=True)
        out += bytes([index, 0])
        nibs = []
        for s in blk[1:]:
            step = int(_IMA_STEPS[index])
            delta = int(s) - pred
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            # reconstruct like the decoder to keep predictor in sync
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = min(max(index + int(_IMA_INDEX_ADJ[nib]), 0), 88)
            nibs.append(nib)
        if len(nibs) & 1:
            nibs.append(0)
        for a, b in zip(nibs[::2], nibs[1::2]):
            out.append(a | (b << 4))
        pad = block_align - (4 + len(nibs) // 2)
        out += b"\x00" * max(0, pad)
        i += block_samples
    return _wav_container(bytes(out), sr, tag=0x11, bits=4,
                          block_align=block_align)


def encode_pcm8_wav(wave_i16: np.ndarray, sr: int = 8000) -> bytes:
    """int16 mono → unsigned 8-bit PCM WAV (test/fixture helper)."""
    body = ((wave_i16.astype(np.int64) >> 8) + 128) \
        .astype(np.uint8).tobytes()
    return _wav_container(body, sr, tag=1, bits=8)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM bytes (test/fixture helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (test/fixture helper).  ``filters``
    picks the per-row filter type (cycling); defaults to cycling
    through all five so a decode round-trip exercises every
    reconstruction branch, not just filter 0."""
    import struct
    import zlib
    h, w = img.shape[:2]
    img = img.astype(np.uint8)
    filters = filters or [0, 1, 2, 3, 4]
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    lines = []
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        up = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        ul = np.concatenate([np.zeros(3, np.int32), up[:-3]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - up
        elif f == 3:
            filt = cur - ((left + up) >> 1)
        else:
            pp = left + up - ul
            pa_, pb_, pc_ = (np.abs(pp - left), np.abs(pp - up),
                             np.abs(pp - ul))
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, up, ul))
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + typ + data + \
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def encode_wav(wave_i16: np.ndarray, sr: int = 16000) -> bytes:
    """int16 mono waveform → WAV bytes (test/fixture helper)."""
    import io
    import wave as _wave
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(wave_i16.astype("<i2").tobytes())
    return buf.getvalue()


def avg_hash(img: np.ndarray) -> int:
    """8x8 average hash of an (H, W, 3) uint8 image (63-bit)."""
    gray = img.mean(axis=2)
    ys = np.linspace(0, img.shape[0], 9, dtype=int)
    xs = np.linspace(0, img.shape[1], 9, dtype=int)
    cells = np.array([[gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                       for j in range(8)] for i in range(8)])
    bits = (cells > cells.mean()).flatten()
    return int("".join("1" if b else "0" for b in bits), 2) >> 1


class VideoFrameFeatures:
    """Actor-pool stage: frame-sample ``n_frames`` per payload, then
    per-frame average-hash + luminance aggregate.  Backend constructed
    once per actor; the deterministic fake keeps the stage exact."""

    def __init__(self, backend: DecodeBackend | None = None,
                 n_frames: int = 4):
        self.backend = backend or FakeDecodeBackend()
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nfs, first, last, lum = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            frames = self.backend.sample_frames(payload, self.n_frames)
            hashes = [avg_hash(f) for f in frames]
            ids.append(mid)
            nfs.append(len(frames))
            first.append(hashes[0])
            last.append(hashes[-1])
            lum.append(round(float(np.mean([f.mean() for f in frames])) * 1e3))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(nfs, pa.int64()),
            "first_phash": pa.array(first, pa.int64()),
            "last_phash": pa.array(last, pa.int64()),
            "mean_lum_1e3": pa.array(lum, pa.int64()),
        })


class ImageFeatures:
    """Actor-pool stage: decode + feature-extract (mean/std per channel +
    8x8 grayscale thumbnail-hash). Backend constructed once per actor."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, stds, phashes, widths, heights = [], [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            img = self.backend.decode_image(payload)
            phash = avg_hash(img)
            ids.append(mid)
            means.append([float(img[..., c].mean()) for c in range(3)])
            stds.append([float(img[..., c].std()) for c in range(3)])
            phashes.append(phash)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "channel_mean": pa.array(means, pa.list_(pa.float64())),
            "channel_std": pa.array(stds, pa.list_(pa.float64())),
            "phash": pa.array(phashes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        })


class AudioFeatures:
    """Actor-pool stage: decode audio + deterministic waveform features
    (duration, RMS energy, zero-crossing count, peak amplitude — all
    integer-quantized, so the deterministic fake backend yields an exact
    VALUES oracle). Backend constructed once per actor; vectorized per
    clip. Large payloads ⇒ keep ``batch_size`` small (bytes dominate)."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nss, srs, durs, rmss, zcs, peaks = [], [], [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            sr, wave = self.backend.decode_audio(payload)
            w = wave.astype(np.float64)
            ids.append(mid)
            nss.append(len(wave))
            srs.append(sr)
            durs.append(int(len(wave) * 1000 // sr))
            rmss.append(int(round(float(np.sqrt(np.mean(w * w))))))
            # sign changes over nonzero samples (standard ZCR numerator)
            s = np.sign(w[w != 0])
            zcs.append(int(np.count_nonzero(s[1:] != s[:-1])))
            peaks.append(int(np.max(np.abs(w))) if len(w) else 0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_samples": pa.array(nss, pa.int64()),
            "sample_rate": pa.array(srs, pa.int64()),
            "duration_ms": pa.array(durs, pa.int64()),
            "rms": pa.array(rmss, pa.int64()),
            "zero_crossings": pa.array(zcs, pa.int64()),
            "peak": pa.array(peaks, pa.int64()),
        })


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (payload = pseudo bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(200, 2000)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "mime": pa.array(["image/fake"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array([{"width": 0, "height": 0, "duration_ms": 0}] * n,
                         MEDIA_SCHEMA.field("meta").type),
    })


# magic-byte signatures, first match wins (prefix, mime)
MAGIC_SIGNATURES = (
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    (b"RIFF", "audio/wav"),
    (b"<html", "text/html"),
    (b"<!DOCTYPE html", "text/html"),
)


def sniff_mime(pages: ray.data.Dataset, id_col: str = "doc_id",
               payload_col: str = "payload") -> ray.data.Dataset:
    """Content-type sniffing from magic bytes: classify opaque binary
    payloads by their leading signature (first match in
    MAGIC_SIGNATURES; 'application/octet-stream' otherwise) — the
    crawl-ingest step that routes fetched bodies to the right decode
    pool BEFORE trusting Content-Type headers.

    Emits (doc_id, mime, n_bytes).

    Scale shape: stateless map_batches; only the payload PREFIX is
    touched (prefix compare over the buffer), the column dies here."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        mimes, sizes = [], []
        for h in b[payload_col].to_pylist():
            h = h or b""
            mime = "application/octet-stream"
            for sig, m in MAGIC_SIGNATURES:
                if h[:len(sig)] == sig:
                    mime = m
                    break
            mimes.append(mime)
            sizes.append(len(h))
        return pa.table({id_col: pa.array(ids.astype(np.int64),
                                          pa.int64()),
                         "mime": pa.array(mimes, pa.string()),
                         "n_bytes": pa.array(sizes, pa.int64())})

    return pages.map_batches(batch, batch_format="pyarrow")
