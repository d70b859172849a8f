"""Image/video codecs, pure stdlib + numpy (no libjpeg/giflib).

JPEG decoder: baseline sequential (SOF0/SOF1) AND progressive (SOF2
— spectral selection + successive approximation with EOB runs, via
one unified scan engine), 8-bit, grayscale or YCbCr with arbitrary
sampling factors (4:4:4 / 4:2:0 / 4:2:2), DQT (8- and 16-bit tables),
DHT Huffman tables, DRI/RSTn restart markers.  The
IDCT is the exact separable orthonormal DCT-III (numpy matmul), and
chroma upsampling is sample replication — pixel output therefore
matches the spec's reference path, not any particular libjpeg
smoothing variant (decoders legitimately differ at that step; the
spec only fixes the coefficient pipeline).

JPEG encoder (test/fixture helper): 4:4:4 baseline with the Annex K
example quantization and Huffman tables — enough to round-trip the
decoder against independently-constructed streams and to bound
reconstruction error by the quantization step.

Also here: GIF87a/89a decode (full variable-width LZW + palette +
interlace) with an uncompressed-LZW fixture writer, and Motion-JPEG
AVI frame extraction (RIFF walk) with a minimal AVI writer.

Used by StdlibDecodeBackend.decode_image / sample_frames
(stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal DCT-II basis; IDCT-III is its transpose
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(0.125) if _u == 0 else 0.5
        _A[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K.1/K.2 example quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)

# Annex K.3 example Huffman specs: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _canonical_codes(bits, values):
    """(code, length) per symbol in canonical order (B.2.4.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """(length, code) -> symbol map for decoding."""
    enc = _canonical_codes(bits, values)
    return {(ln, cd): sym for sym, (cd, ln) in enc.items()}


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            return 0                      # spec: pad with 1s; 0 safe here
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """Table F.12 sign extension."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/SOF1) AND progressive (SOF2) JPEG → (H, W, 3)
    uint8 RGB.  One unified scan engine: every scan carries spectral
    selection [Ss, Se] and successive-approximation (Ah, Al) bounds
    (G.1.1); a baseline image is simply the single scan
    Ss=0/Se=63/Ah=Al=0.  DC first/refine, AC first/refine with EOB
    runs, restart markers, arbitrary sampling factors."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = []                            # (cid, h, v, tq)
    W = H = 0
    restart_interval = 0
    scans = []                            # (scan_comps, Ss, Se, Ah, Al,
    #                                        segments, dc_snap, ac_snap, dri)
    progressive = False
    sof_seen = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > len(payload):
            break
        ln, = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2:pos + ln]
        if marker == 0xDB:                # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    tab = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    tab = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                qt[tq] = tab
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            sof_seen = True
            H, W = struct.unpack_from(">HH", seg, 1)
            n = seg[5]
            comps = []
            for c in range(n):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker {marker:#x} "
                             "(baseline/progressive DCT only)")
        elif marker == 0xC4:              # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:              # DRI
            restart_interval, = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:              # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 15))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            # entropy bytes until the next non-RST/non-stuffed marker
            p = pos + ln
            segments, cur = [], bytearray()
            q = p
            while q < len(payload):
                b = payload[q]
                if b == 0xFF and q + 1 < len(payload):
                    nxt = payload[q + 1]
                    if nxt == 0x00:
                        cur.append(0xFF)
                        q += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytes(cur))
                        cur = bytearray()
                        q += 2
                        continue
                    break
                cur.append(b)
                q += 1
            segments.append(bytes(cur))
            scans.append((scan_comps, ss, se, ahal >> 4, ahal & 15,
                          segments, dict(huff_dc), dict(huff_ac),
                          restart_interval))
            pos = q
            continue
        pos += ln
    if not sof_seen or not scans:
        raise ValueError("no frame/scan data")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = -(-W // (8 * hmax))
    mcy = -(-H // (8 * vmax))
    comp_by_id = {c[0]: c for c in comps}
    # per-component block grids (interleaved padding dimensions)
    nblocks = {}
    coef = {}
    for cid, h, v, _tq in comps:
        by, bx = mcy * v, mcx * h
        nblocks[cid] = (by, bx)
        coef[cid] = np.zeros((by, bx, 64), np.int64)

    for (scan_comps, ss, se, ah, al, segments, hdc, hac,
         dri) in scans:
        _run_scan(scan_comps, ss, se, ah, al, segments, hdc, hac,
                  dri, comp_by_id, coef, nblocks, mcx, mcy, W, H,
                  hmax, vmax)

    planes = {}
    for cid, h, v, tq in comps:
        by, bx = nblocks[cid]
        plane = np.zeros((by * 8, bx * 8), np.float64)
        dq = qt[tq]
        cf = coef[cid]
        for y in range(by):
            for x in range(bx):
                blk = np.zeros(64, np.float64)
                blk[ZIGZAG] = cf[y, x] * dq
                plane[y * 8:y * 8 + 8, x * 8:x * 8 + 8] = \
                    _A.T @ blk.reshape(8, 8) @ _A + 128.0
        planes[cid] = plane

    out_planes = []
    for cid, h, v, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, hmax // h, axis=1), vmax // v, axis=0)
        out_planes.append(p[:H, :W])
    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = out_planes[:3]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255) \
        .round().astype(np.uint8)


def _run_scan(scan_comps, ss, se, ah, al, segments, huff_dc, huff_ac,
              restart_interval, comp_by_id, coef, nblocks, mcx, mcy,
              W, H, hmax, vmax) -> None:
    """Accumulate one scan into the coefficient store (G.1.1/G.1.2)."""
    interleaved = len(scan_comps) > 1
    if interleaved:
        units_total = mcx * mcy
    else:
        cid0, h0, v0, _ = comp_by_id[scan_comps[0][0]]
        cbx = -(-(W * h0) // (8 * hmax))
        cby = -(-(H * v0) // (8 * vmax))
        units_total = cbx * cby
    per_seg = restart_interval or units_total
    unit = 0
    for seg_bytes in segments:
        br = _BitReader(seg_bytes)
        pred = {cs: 0 for cs, _, _ in scan_comps}
        eobrun = 0
        for _ in range(min(per_seg, units_total - unit)):
            if interleaved:
                my, mx = divmod(unit, mcx)
                for cs, td, ta in scan_comps:
                    cid, h, v, _tq = comp_by_id[cs]
                    for by_ in range(v):
                        for bx_ in range(h):
                            eobrun = _decode_block_prog(
                                br, coef[cid], my * v + by_,
                                mx * h + bx_, ss, se, ah, al,
                                huff_dc.get(td), huff_ac.get(ta),
                                pred, cs, eobrun)
            else:
                cs, td, ta = scan_comps[0]
                cid, h0, v0, _tq = comp_by_id[cs]
                cbx = -(-(W * h0) // (8 * hmax))
                by_, bx_ = divmod(unit, cbx)
                eobrun = _decode_block_prog(
                    br, coef[cid], by_, bx_, ss, se, ah, al,
                    huff_dc.get(td), huff_ac.get(ta), pred, cs,
                    eobrun)
            unit += 1


def _decode_block_prog(br, cf, by, bx, ss, se, ah, al, dc_tab, ac_tab,
                       pred, cs, eobrun) -> int:
    """One block's slice of a scan; returns the running EOB count."""
    blk = cf[by, bx]
    if ss == 0:                           # DC band
        if ah == 0:                       # first
            s = br.read_huffman(dc_tab)
            diff = _extend(br.read_bits(s), s)
            pred[cs] += diff
            blk[0] = pred[cs] << al
        else:                             # refinement
            if br.read_bit():
                blk[0] |= 1 << al
        if se == 0:
            return eobrun
        k0 = max(ss, 1)
    else:
        k0 = ss
    if ah == 0:                           # AC first (G.1.2.2)
        if eobrun > 0:
            return eobrun - 1
        k = k0
        while k <= se:
            rs = br.read_huffman(ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                return (1 << r) - 1 + br.read_bits(r)
            k += r
            if k > se:
                break
            blk[k] = _extend(br.read_bits(s), s) << al
            k += 1
        return eobrun
    # AC refinement (G.1.2.3)
    p1, m1 = 1 << al, -1 << al
    k = k0
    if eobrun == 0:
        while k <= se:
            rs = br.read_huffman(ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1 + br.read_bits(r)
                    break
                val = 0                   # ZRL: skip 16 zero-history
            else:
                val = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        if val:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a first frame → (H, W, 3) uint8 RGB, pure stdlib +
    numpy: logical-screen/image descriptors, global/local color
    tables, full variable-width LZW decompression (clear/EOI codes,
    code-width growth), and interlace de-scrambling.  Transparency
    resolves against the background color (single-frame semantics —
    animation compositing is out of scope for feature extraction)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    transparent = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                     # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:   # GCE
                if payload[pos + 1] & 1:
                    transparent = payload[pos + 4]
            while payload[pos]:           # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                   # image descriptor
            ix, iy, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
            iflags = payload[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos) \
                    .reshape(-1, 3)
                pos += n * 3
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(data), min_code_size, iw * ih)
            idx = np.array(indices[:iw * ih], np.int64)
            if iflags & 0x40:             # interlaced: de-scramble rows
                rows = np.zeros(ih, np.int64)
                order = []
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    order += list(range(start, ih, step))
                rows[np.array(order, np.int64)] = np.arange(ih)
                idx = idx.reshape(ih, iw)[rows].reshape(-1)
            if ct is None:
                raise ValueError("GIF image without a color table")
            rgb = ct[np.clip(idx, 0, len(ct) - 1)]
            if transparent is not None and gct is not None:
                bg = gct[min(bg_index, len(gct) - 1)]
                rgb = np.where((idx == transparent)[:, None], bg, rgb)
            frame = rgb.reshape(ih, iw, 3).astype(np.uint8)
            out = np.zeros((sh, sw, 3), np.uint8)
            if gct is not None:
                out[:] = gct[min(bg_index, len(gct) - 1)]
            out[iy:iy + ih, ix:ix + iw] = frame[:sh - iy, :sw - ix]
            return out
        elif b == 0x3B:                   # trailer
            break
        else:
            pos += 1
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int
                ) -> list[int]:
    """Variable-width GIF-flavor LZW (Appendix F of the spec)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits              # LSB-first packing
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            if prev is not None:
                table.append(prev + [entry[0]])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= max_pixels:
                return out
    return out


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) palette indices + (N, 3) palette → GIF89a bytes
    (test/fixture helper).  Uses the classic 'uncompressed GIF' LZW
    stream: literal codes at min_code_size 7 with a clear code every
    125 symbols so the code width never grows — a fully valid stream
    any conformant LZW decoder must accept."""
    h, w = indices.shape
    n = len(palette)
    assert n <= 128 and indices.max(initial=0) < n
    pal = np.zeros((128, 3), np.uint8)
    pal[:n] = palette
    head = (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | 6, 0, 0])     # GCT present, 2^7 entries
            + pal.tobytes())
    desc = b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = 7
    clear, eoi = 128, 129
    codes: list[int] = [clear]
    for i, v in enumerate(indices.flatten().tolist()):
        if i and i % 125 == 0:
            codes.append(clear)
        codes.append(int(v))
    codes.append(eoi)
    acc = nbits = 0
    data = bytearray()
    for c in codes:                       # LSB-first, fixed 8-bit width
        acc |= c << nbits
        nbits += 8
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    blocks = bytearray([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + desc + bytes(blocks) + b"\x3B"


def extract_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Motion-JPEG AVI → list of JPEG frame payloads.

    Minimal tolerant RIFF walk: 'RIFF....AVI ' → any 'LIST....movi'
    → '##dc'/'##db' stream chunks whose body starts with the JPEG SOI
    (frames of other codecs are skipped).  Word-aligned chunk sizes
    per the RIFF spec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/AVI  header missing)")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            size, = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if fourcc == b"LIST":
                list_type = payload[body:body + 4]
                if list_type in (b"movi", b"hdrl", b"strl"):
                    walk(body + 4, min(body + size, end))
            elif fourcc[2:4] in (b"dc", b"db"):
                data = payload[body:body + size]
                if data[:2] == b"\xff\xd8":
                    frames.append(data)
            pos = body + size + (size & 1)     # word alignment

    walk(12, len(payload))
    return frames


def encode_mjpeg_avi(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """JPEG frame payloads → minimal MJPEG AVI (test/fixture helper:
    avih + one MJPG strl header + the movi LIST — the chunks
    :func:`extract_mjpeg_frames` consumes, laid out per the RIFF
    spec so any AVI parser can walk it)."""
    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10,
                       len(frames), 0, 1, 0, width, height, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0,
                       0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0,
                       0, 0, width, height)
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body



# ------------------------------------------------------------- encoder

def _encode_block(br_out, blk, qtab, dc_codes, ac_codes, pred):
    coef = _A @ (blk - 128.0) @ _A.T
    # zigzag order: q[k] = coef_natural[ZIGZAG[k]] / qt_natural[ZIGZAG[k]]
    q = np.round(coef.flatten()[ZIGZAG]
                 / qtab[ZIGZAG].astype(np.float64)).astype(np.int64)
    diff = int(q[0]) - pred
    pred = int(q[0])

    def emit_val(v):
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        if v < 0:
            v = v + (1 << t) - 1
        return t, int(v)

    t, bitsv = emit_val(diff) if diff else (0, 0)
    code, ln = dc_codes[t]
    br_out.append((code, ln))
    if t:
        br_out.append((bitsv, t))
    run = 0
    last_nz = max([k for k in range(1, 64) if q[k] != 0], default=0)
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            br_out.append((code, ln))
            run -= 16
        t, bitsv = emit_val(v)
        code, ln = ac_codes[(run << 4) | t]
        br_out.append((code, ln))
        br_out.append((bitsv, t))
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        br_out.append((code, ln))
    return pred


def _pack_bits(pairs) -> bytes:
    out = bytearray()
    acc, nbits = 0, 0
    for val, ln in pairs:
        acc = (acc << ln) | (val & ((1 << ln) - 1))
        nbits += ln
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
    if nbits:
        byte = ((acc << (8 - nbits)) & 0xFF) | ((1 << (8 - nbits)) - 1)
        out.append(byte)
        if byte == 0xFF:
            out.append(0x00)
    return bytes(out)


def encode_jpeg(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → baseline 4:4:4 JPEG (Annex K tables)."""
    H, W = img.shape[:2]
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
        + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
        - 0.081312 * rgb[..., 2] + 128.0
    ph = -(-H // 8) * 8
    pw = -(-W // 8) * 8

    def pad(p):
        out = np.empty((ph, pw))
        out[:H, :W] = p
        out[H:, :W] = p[H - 1:H, :]
        out[:, W:] = out[:, W - 1:W]
        return out

    y, cb, cr = pad(y), pad(cb), pad(cr)
    dc_l = _canonical_codes(*DC_LUMA)
    ac_l = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)
    pairs: list = []
    preds = [0, 0, 0]
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci, (plane, qtab, dcc, acc_) in enumerate(
                    [(y, QT_LUMA, dc_l, ac_l),
                     (cb, QT_CHROMA, dc_c, ac_c),
                     (cr, QT_CHROMA, dc_c, ac_c)]):
                blk = plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                preds[ci] = _encode_block(pairs, blk, qtab, dcc, acc_,
                                          preds[ci])
    scan = _pack_bits(pairs)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    def dqt(tq, tab):
        return seg(0xDB, bytes([tq]) + bytes(int(v) for v in tab))

    def dht(tc, th, spec):
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", H, W) + bytes([3])
              + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1])
              + bytes([3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xff\xd8" + dqt(0, QT_LUMA) + dqt(1, QT_CHROMA)
            + dht(0, 0, DC_LUMA) + dht(1, 0, AC_LUMA)
            + dht(0, 1, DC_CHROMA) + dht(1, 1, AC_CHROMA)
            + sof + sos + scan + b"\xff\xd9")
