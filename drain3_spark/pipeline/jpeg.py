"""Library-free baseline + progressive JPEG codec (stdlib + numpy).

Decoder: baseline sequential DCT JFIF (SOF0/1) AND progressive DCT
(SOF2, T.81 Annex G: spectral selection + successive approximation,
DC first/refinement and AC first/refinement scans with EOB runs) —
grayscale and YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart
markers, byte stuffing.  Arithmetic coding and 12-bit depth raise a
declared ``NotImplementedError``.  Output matches the PNM/BMP
decoders' conventions: (H, W, 3) uint8 RGB, grayscale stays (H, W, 1).

Encoder: the test/fixture-side counterpart — baseline 4:4:4, 4:2:2,
or 4:2:0 (or single-component grayscale), Annex K example quantization
tables
scaled by a quality factor, the specification's typical Huffman
tables.  A decode(encode(img)) round trip recovers the image to
quantization accuracy (pinned by the PSNR tests in
``tests/test_jpeg.py``).  :func:`encode_jpeg_progressive` emits a
multi-scan SOF2 stream (libjpeg-style script: DC at Al=1 + DC
refinement, banded AC first scans + AC refinement to Al=0) whose fully
refined coefficients equal the baseline encoder's — so progressive
decode must reproduce the baseline round-trip BIT-EXACTLY (pinned by
``test_progressive_matches_baseline``).

The IDCT/DCT run as 8x8 matrix products against a precomputed
orthonormal DCT-II basis — numpy-native, no per-coefficient loops.
Entropy coding is per-block Python, acceptable for the bounded
thumbnails this pipeline decodes per Arrow batch (same stance as the
PNG scanline filters).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# ITU-T T.81 Annex K.1 example quantization tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32).reshape(8, 8)

# T.81 Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
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

# orthonormal 8-point DCT-II basis: pixels = C.T @ coeffs @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16.0)
_C *= 0.5
_C[0] *= 1.0 / np.sqrt(2.0)


# ------------------------------------------------------------ bit streams

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:           # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:                 # pad with 1s per T.81 F.1.2.3
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    """Reads the entropy-coded segment: un-stuffs 0xFF00, stops at any
    other marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (used for RSTn); returns it."""
        self.acc = 0
        self.nbits = 0
        while True:
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = 0xFF00 | self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


# ----------------------------------------------------------- huffman

def _build_decode_table(bits: List[int], values: List[int]) -> Dict[Tuple[int, int], int]:
    """{(length, code): value} canonical Huffman mapping (T.81 C.2)."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """{value: (code, length)} — inverse of the decode mapping."""
    enc: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _huff_decode(reader: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(value: int, size: int) -> int:
    """T.81 F.12: map a SIZE-bit magnitude to its signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(v: int) -> int:
    """Bit size of |v| (0 for 0)."""
    return int(abs(v)).bit_length()


# ------------------------------------------------------------- decoder

def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF payload to (H, W, 1|3) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    htables: Dict[Tuple[int, int], Dict] = {}   # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:             # EOI before SOS
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2: pos + seglen]
        if marker == 0xDB:             # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = np.frombuffer(body[p:p + 64], np.uint8)
                qtables[tq] = q.reshape(8, 8)
                p += 64
        elif marker == 0xC4:           # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                values = list(body[p + 17:p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} not supported "
                "(baseline + progressive only)")
        elif marker == 0xDD:           # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:           # SOS — entropy data follows
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"cs": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not frame.get("progressive"):
                pos += seglen
                return _decode_scan(data, pos, frame, scan, qtables,
                                    htables, restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos + seglen, frame, scan, htables, restart_interval,
                ss, se, ahal >> 4, ahal & 0x0F)
            continue                   # more scans (or EOI) follow
        pos += seglen
    if frame is not None and frame.get("progressive") and "state" in frame:
        return _finish_progressive(frame, qtables)
    raise ValueError("JPEG missing SOS")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["dcT"] = htables[(0, s["dc"])]
        c["acT"] = htables[(1, s["ac"])]
        c["q"] = qtables[c["tq"]].astype(np.float64)
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                              np.float64)
        c["pred"] = 0

    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if not (0xFFD0 <= m <= 0xFFD7):
                    raise ValueError(f"expected RSTn, got {m:#x}")
                for c in order:
                    c["pred"] = 0
            try:
                for c in order:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blk = _decode_block(reader, c)
                            y0 = (my * c["v"] + v) * 8
                            x0 = (mx * c["h"] + hh) * 8
                            c["plane"][y0:y0 + 8, x0:x0 + 8] = blk
            except _MarkerHit as e:
                raise ValueError(
                    f"unexpected marker {e.marker:#x} inside scan")
            mcu_count += 1

    planes = []
    for c in order:
        p = c["plane"]
        # upsample subsampled chroma to full MCU grid (nearest)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    out = np.stack(planes, axis=-1)
    out = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    if len(order) == 1:
        return np.ascontiguousarray(out)
    if len(order) != 3:
        raise NotImplementedError(f"{len(order)}-component JPEG")
    return np.ascontiguousarray(_ycbcr_to_rgb(out))


def _decode_block(reader: _BitReader, c) -> np.ndarray:
    zz = np.zeros(64, np.float64)
    s = _huff_decode(reader, c["dcT"])
    diff = _extend(reader.read_bits(s), s) if s else 0
    c["pred"] += diff
    zz[0] = c["pred"]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, c["acT"])
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:                # ZRL: skip 16 zeros
                k += 16
                continue
            break                      # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    blk = np.zeros((8, 8), np.float64)
    blk.flat[ZIGZAG] = zz
    blk *= c["q"]
    return _C.T @ blk @ _C             # IDCT


# -------------------------------------------------- progressive decoder

def _prog_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _prog_state(frame):
    """Per-component zigzag-order coefficient arrays, allocated once and
    refined scan by scan (T.81 G.2)."""
    if "state" not in frame:
        hmax, vmax, mcux, mcuy = _prog_geometry(frame)
        frame["state"] = {
            c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
            for c in frame["comps"]}
    return frame["state"]


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips entropy
    bytes, 0xFF00 stuffing, and 0xFF fill bytes)."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return len(data)


def _decode_progressive_scan(data, pos, frame, scan, htables,
                             restart_interval, ss, se, ah, al) -> int:
    """Decode one SOF2 scan into the frame's coefficient state; returns
    the position of the next marker.  DC scans (ss == 0) may be
    interleaved; AC scans are single-component per T.81 G.1.1."""
    state = _prog_state(frame)
    hmax, vmax, mcux, mcuy = _prog_geometry(frame)
    by_id = {c["id"]: c for c in frame["comps"]}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        if ss == 0:
            c["dcT"] = htables.get((0, s["dc"]))
        else:
            c["acT"] = htables.get((1, s["ac"]))
        c["pred"] = 0
    reader = _BitReader(data, pos)
    ctx = {"eobrun": 0}

    if len(order) > 1 or (ss == 0 and len(order) == len(frame["comps"])):
        # interleaved DC scan, MCU order
        if ss != 0:
            raise ValueError("interleaved progressive AC scan")
        n_units = mcux * mcuy
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for c in order:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blocks.append(
                                (c, my * c["v"] + v, mx * c["h"] + hh))
                units.append(blocks)
    else:
        # single-component scan, component-raster block order
        c = order[0]
        bw_i = (-(-frame["w"] * c["h"] // hmax) + 7) // 8
        bh_i = (-(-frame["h"] * c["v"] // vmax) + 7) // 8
        n_units = bw_i * bh_i
        units = [[(c, i // bw_i, i % bw_i)] for i in range(n_units)]

    for u, blocks in enumerate(units):
        if restart_interval and u and u % restart_interval == 0:
            m = reader.align_to_marker()
            if not (0xFFD0 <= m <= 0xFFD7):
                raise ValueError(f"expected RSTn in progressive scan, "
                                 f"got {m:#x}")
            for c in order:
                c["pred"] = 0
            ctx["eobrun"] = 0
        try:
            for c, byi, bxi in blocks:
                coef = state[c["id"]][byi, bxi]
                if ss == 0:
                    if ah == 0:
                        sz = _huff_decode(reader, c["dcT"])
                        diff = _extend(reader.read_bits(sz), sz) if sz else 0
                        c["pred"] += diff
                        coef[0] = c["pred"] << al
                    elif reader.read_bit():
                        # DC refinement: append one magnitude bit
                        # (two's-complement OR matches the encoder's
                        # arithmetic-shift point transform)
                        coef[0] |= (1 << al)
                elif ah == 0:
                    _ac_first_block(reader, c["acT"], coef, ss, se, al, ctx)
                else:
                    _ac_refine_block(reader, c["acT"], coef, ss, se, al, ctx)
        except _MarkerHit as e:
            raise ValueError(
                f"unexpected marker {e.marker:#x} inside progressive scan")
    return _next_marker_pos(data, reader.pos)


def _ac_first_block(reader, acT, coef, ss, se, al, ctx) -> None:
    """T.81 G.2.2 decode of one block in an AC first scan (ah == 0)."""
    if ctx["eobrun"] > 0:
        ctx["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, acT)
        r, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if r != 15:
                ctx["eobrun"] = (1 << r) - 1
                if r:
                    ctx["eobrun"] += reader.read_bits(r)
                return
            k += 16                    # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("progressive AC run past band end")
        coef[k] = _extend(reader.read_bits(sz), sz) << al
        k += 1


def _ac_refine_block(reader, acT, coef, ss, se, al, ctx) -> None:
    """T.81 G.2.3 decode of one block in an AC refinement scan: newly
    significant coefficients arrive as ±1<<al; already-significant ones
    consume one correction bit each as the run passes over them."""
    p1 = 1 << al
    k = ss

    def refine(kk: int) -> None:
        if reader.read_bit() and not (int(coef[kk]) & p1):
            coef[kk] += p1 if coef[kk] >= 0 else -p1

    if ctx["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, acT)
            r, sz = rs >> 4, rs & 0x0F
            val = 0
            if sz == 0:
                if r != 15:
                    ctx["eobrun"] = (1 << r)
                    if r:
                        ctx["eobrun"] += reader.read_bits(r)
                    break
            else:
                if sz != 1:
                    raise ValueError("AC refinement magnitude > 1")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                if coef[k] != 0:
                    refine(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if ctx["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0:
                refine(k)
            k += 1
        ctx["eobrun"] -= 1


def _finish_progressive(frame, qtables) -> np.ndarray:
    """Dequantize the accumulated coefficient state and inverse-DCT all
    blocks of each component in ONE einsum (no per-block Python), then
    upsample/crop/color-convert exactly like the baseline path."""
    state = frame["state"]
    hmax, vmax, mcux, mcuy = _prog_geometry(frame)
    h, w = frame["h"], frame["w"]
    planes = []
    for c in frame["comps"]:
        coef = state[c["id"]].astype(np.float64)      # (by, bx, 64) zigzag
        nat = np.zeros_like(coef)
        nat[..., ZIGZAG] = coef
        nat = nat.reshape(*nat.shape[:2], 8, 8) \
            * qtables[c["tq"]].astype(np.float64)
        pix = np.einsum("ij,byjk,kl->byil", _C.T, nat, _C)
        by, bx = pix.shape[:2]
        p = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    out = np.stack(planes, axis=-1)
    out = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    if len(planes) == 1:
        return np.ascontiguousarray(out)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    return np.ascontiguousarray(_ycbcr_to_rgb(out))


def _ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y = img[..., 0].astype(np.float64)
    cb = img[..., 1].astype(np.float64) - 128.0
    cr = img[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


# ------------------------------------------------------------- encoder

def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)
    return out


def _pad_block(plane: np.ndarray, ys: int, xs: int) -> np.ndarray:
    """8x8 tile at (ys, xs), edge-replicated past the plane boundary."""
    blk = np.full((8, 8), 128.0)
    tile = plane[ys:ys + 8, xs:xs + 8]
    if tile.size == 0:
        return blk
    blk[:tile.shape[0], :tile.shape[1]] = tile
    if tile.shape[0] < 8:
        blk[tile.shape[0]:, :] = blk[tile.shape[0] - 1, :]
    if tile.shape[1] < 8:
        blk[:, tile.shape[1]:] = blk[:, tile.shape[1] - 1][:, None]
    return blk


def _encode_block(bw: _BitWriter, blk: np.ndarray, q: np.ndarray,
                  dcT, acT, pred: int) -> int:
    """Quantize + entropy-code one 8x8 block; returns the new DC pred."""
    coeffs = _C @ (blk - 128.0) @ _C.T
    qz = np.round(coeffs / q).astype(np.int64)
    zz = qz.flat[ZIGZAG]
    diff = int(zz[0]) - pred
    sz = _category(diff)
    code, length = dcT[sz]
    bw.write(code, length)
    if sz:
        bw.write(diff if diff >= 0 else diff + (1 << sz) - 1, sz)
    run = 0
    wrote_last = False
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = acT[0xF0]                   # ZRL
            bw.write(code, length)
            run -= 16
        vsz = _category(v)
        code, length = acT[(run << 4) | vsz]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << vsz) - 1, vsz)
        run = 0
        wrote_last = k == 63
    if not wrote_last:
        code, length = acT[0x00]                       # EOB
        bw.write(code, length)
    return int(zz[0])


def _prep_planes(img: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front end: color-convert + chroma-subsample and
    pick per-component quant tables / sampling factors.  Returns
    ``(h, w, nch, planes, qs, tsel, hv, ql, qc)`` — identical for the
    baseline and progressive encoders so their quantized coefficients
    (and therefore decoded pixels) agree exactly."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if nch not in (1, 3):
        raise ValueError(f"{nch}-channel image")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"subsampling {subsampling}")
    sub = subsampling if nch == 3 else "444"
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if nch == 3:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if sub != "444":
            fy = 2 if sub == "420" else 1       # vertical chroma factor
            for ci in (1, 2):
                p = planes[ci]
                ph = (p.shape[0] + fy - 1) // fy * fy
                pw = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                            mode="edge")
                planes[ci] = pp.reshape(ph // fy, fy, pw // 2, 2).mean((1, 3))
        qs = [ql, qc, qc]
        tsel = [0, 1, 1]
        hv = {"444": [(1, 1)] * 3,
              "422": [(2, 1), (1, 1), (1, 1)],
              "420": [(2, 2), (1, 1), (1, 1)]}[sub]
    else:
        planes = [img[..., 0].astype(np.float64)]
        qs = [ql]
        tsel = [0]
        hv = [(1, 1)]
    return h, w, nch, planes, qs, tsel, hv, ql, qc


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF bytes for (H, W, 1|3) uint8 — Annex K tables at
    ``quality``; ``subsampling`` is ``"444"``, ``"422"`` (2x1
    box-filtered chroma, 16x8 MCUs), or ``"420"`` (2x2, 16x16 MCUs);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs."""
    h, w, nch, planes, qs, tsel, hv, ql, qc = _prep_planes(
        img, quality, subsampling)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"       # APP0
    for tq, q in ((0, ql), (1, qc))[:1 if nch == 1 else 2]:
        zz = np.zeros(64, np.uint8)
        zz[:] = q.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zz)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nch) + b"\x08" \
        + struct.pack(">HH", h, w) + bytes([nch])
    for ci in range(nch):
        out += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], tsel[ci]])
    # DHT (four tables for color, two for gray)
    hts = [((0, 0), _DC_LUMA), ((1, 0), _AC_LUMA)]
    if nch == 3:
        hts += [((0, 1), _DC_CHROMA), ((1, 1), _AC_CHROMA)]
    enc_tables = {}
    for (tc, th), (bits, values) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        enc_tables[(tc, th)] = _build_encode_table(bits, values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nch) + bytes([nch])
    for ci in range(nch):
        tt = 0x00 if ci == 0 else 0x11
        out += bytes([ci + 1, tt])
    out += b"\x00\x3f\x00"

    hmax = max(x[0] for x in hv)
    vmax = max(x[1] for x in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    bw = _BitWriter()
    preds = [0] * nch
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                out += bw.flush()
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * nch
            for ci in range(nch):
                ch, cv = hv[ci]
                for v in range(cv):
                    for hh in range(ch):
                        ys = (my * cv + v) * 8
                        xs = (mx * ch + hh) * 8
                        blk = _pad_block(planes[ci], ys, xs)
                        preds[ci] = _encode_block(
                            bw, blk, qs[ci], enc_tables[(0, tsel[ci])],
                            enc_tables[(1, tsel[ci])], preds[ci])
            mcu_count += 1
    out += bw.flush()
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# -------------------------------------------------- progressive encoder

def _make_ac_prog_table() -> Tuple[List[int], List[int]]:
    """AC Huffman table for progressive scans: the Annex K baseline AC
    tables define no EOBn symbols for n > 0, so SOF2 scans need their
    own DHT.  A uniform 8-bit canonical table over every symbol a
    progressive AC scan can emit — EOBn ``(r << 4)`` for r = 0..14, ZRL
    0xF0, and ``(r << 4) | s`` for r = 0..15, s = 1..10 — is valid by
    Kraft (176/256 < 1, all-ones code unused) and keeps the encoder
    single-pass (no per-scan frequency optimization)."""
    values = [r << 4 for r in range(15)] + [0xF0]
    values += [(r << 4) | s for r in range(16) for s in range(1, 11)]
    bits = [0] * 16
    bits[7] = len(values)
    return bits, values


_AC_PROG = _make_ac_prog_table()


def _comp_coeff_grid(plane: np.ndarray, q: np.ndarray,
                     n_by: int, n_bx: int) -> np.ndarray:
    """(n_by, n_bx, 64) zigzag-order quantized coefficients over the
    MCU-padded block grid — block for block the same quantities the
    baseline encoder's ``_encode_block`` produces (same ``_pad_block``
    edge policy, same DCT expression, same rounding), so a fully
    refined progressive stream decodes to the identical pixels."""
    zzc = np.zeros((n_by, n_bx, 64), np.int32)
    for by in range(n_by):
        for bx in range(n_bx):
            blk = _pad_block(plane, by * 8, bx * 8)
            qz = np.round((_C @ (blk - 128.0) @ _C.T) / q).astype(np.int64)
            zzc[by, bx] = qz.flat[ZIGZAG]
    return zzc


def _sos_segment(specs: List[Tuple[int, int, int]], ss: int, se: int,
                 ah: int, al: int) -> bytes:
    body = bytes([len(specs)])
    for cs, td, ta in specs:
        body += bytes([cs, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


class _ProgScanWriter:
    """Entropy-coded-segment writer for one progressive scan: owns the
    bit writer, the cross-block EOB run, the pending correction bits
    (refinement scans), and restart-marker emission."""

    def __init__(self, out: bytearray, acT, restart_interval: int) -> None:
        self.out = out
        self.acT = acT
        self.ri = restart_interval
        self.bw = _BitWriter()
        self.eobrun = 0
        self.pend: List[int] = []      # buffered correction bits
        self.rst = 0
        self.units = 0

    def flush_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.acT[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pend:
            self.bw.write(b, 1)
        self.pend = []

    def unit_boundary(self) -> None:
        """Call before each unit (MCU or block); emits RSTn on the
        restart grid exactly like the baseline encoder."""
        if self.ri and self.units and self.units % self.ri == 0:
            self.flush_eobrun()
            self.out += self.bw.flush()
            self.bw = _BitWriter()
            self.out += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) % 8
        self.units += 1

    def finish(self) -> None:
        self.flush_eobrun()
        self.out += self.bw.flush()


def _enc_ac_first_block(w: _ProgScanWriter, zz: np.ndarray,
                        ss: int, se: int, al: int) -> None:
    """T.81 G.1.2.2 — one block of an AC first scan (Ah == 0): encode
    ``|coef| >> al`` with sign, folding all-zero bands into cross-block
    EOB runs."""
    run = 0
    for k in range(ss, se + 1):
        c = int(zz[k])
        v = abs(c) >> al
        if v == 0:
            run += 1
            continue
        w.flush_eobrun()
        while run > 15:
            code, ln = w.acT[0xF0]                    # ZRL
            w.bw.write(code, ln)
            run -= 16
        sz = v.bit_length()
        code, ln = w.acT[(run << 4) | sz]
        w.bw.write(code, ln)
        w.bw.write(v if c > 0 else (-v) + (1 << sz) - 1, sz)
        run = 0
    if run > 0:
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eobrun()


def _enc_ac_refine_block(w: _ProgScanWriter, zz: np.ndarray,
                         ss: int, se: int, al: int) -> None:
    """T.81 G.1.2.3 — one block of an AC refinement scan (Ah == al+1):
    newly significant coefficients (|coef| >> al == 1) are coded as
    run/size-1 with a sign bit; already-significant ones contribute one
    buffered correction bit each, emitted after the next symbol."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1                       # after the last newly-significant
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k
    run = 0
    br: List[int] = []                 # this block's correction bits
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            w.flush_eobrun()
            code, ln = w.acT[0xF0]                    # ZRL
            w.bw.write(code, ln)
            run -= 16
            for b in br:
                w.bw.write(b, 1)
            br = []
        if t > 1:                      # already significant
            br.append(t & 1)
            continue
        w.flush_eobrun()
        code, ln = w.acT[(run << 4) | 1]
        w.bw.write(code, ln)
        w.bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            w.bw.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        w.eobrun += 1
        w.pend.extend(br)
        if w.eobrun == 0x7FFF or len(w.pend) > 937:
            w.flush_eobrun()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsampling: str = "444",
                            restart_interval: int = 0) -> bytes:
    """Progressive (SOF2) JFIF bytes for (H, W, 1|3) uint8 — same
    Annex K quantization ladder as :func:`encode_jpeg`, emitted as a
    libjpeg-style scan script that exercises all four scan kinds:

    1. interleaved DC first scan at Al=1,
    2. per-component AC first scans, bands 1-5 then 6-63, at Al=1,
    3. per-component AC refinement scans of both bands to Al=0,
    4. interleaved DC refinement scan to Al=0.

    The fully refined coefficients equal the baseline encoder's, so
    ``decode_jpeg`` must return pixel-identical output for the two
    streams (pinned by ``test_progressive_matches_baseline``)."""
    h, w, nch, planes, qs, tsel, hv, ql, qc = _prep_planes(
        img, quality, subsampling)

    hmax = max(x[0] for x in hv)
    vmax = max(x[1] for x in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []                         # per component: MCU-padded grid
    real = []                          # per component: (bh_i, bw_i)
    for ci in range(nch):
        ch, cv = hv[ci]
        grids.append(_comp_coeff_grid(planes[ci], qs[ci],
                                      mcuy * cv, mcux * ch))
        real.append(((-(-h * cv // vmax) + 7) // 8,
                     (-(-w * ch // hmax) + 7) // 8))

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"       # APP0
    for tq, q in ((0, ql), (1, qc))[:1 if nch == 1 else 2]:
        zzq = np.zeros(64, np.uint8)
        zzq[:] = q.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zzq)
    # SOF2
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * nch) + b"\x08" \
        + struct.pack(">HH", h, w) + bytes([nch])
    for ci in range(nch):
        out += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], tsel[ci]])
    # DHT: Annex K DC tables + the shared progressive AC table as (1,0)
    hts = [((0, 0), _DC_LUMA)]
    if nch == 3:
        hts += [((0, 1), _DC_CHROMA)]
    hts += [((1, 0), _AC_PROG)]
    enc = {}
    for (tc, th), (bits, values) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        enc[(tc, th)] = _build_encode_table(bits, values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    al_dc = 1

    def mcu_blocks(ci: int):
        ch, cv = hv[ci]
        for v in range(cv):
            for hh in range(ch):
                yield v, hh

    # ---- scan 1: interleaved DC first (Ss=Se=0, Ah=0, Al=al_dc)
    out += _sos_segment([(ci + 1, 0 if tsel[ci] == 0 else 1, 0)
                         for ci in range(nch)], 0, 0, 0, al_dc)
    wdc = _ProgScanWriter(out, enc[(1, 0)], restart_interval)
    preds = [0] * nch
    for my in range(mcuy):
        for mx in range(mcux):
            wdc.unit_boundary()
            if wdc.ri and (wdc.units - 1) and \
                    (wdc.units - 1) % wdc.ri == 0:
                preds = [0] * nch      # RSTn resets DC predictions
            for ci in range(nch):
                ch, cv = hv[ci]
                dcT = enc[(0, 0 if tsel[ci] == 0 else 1)]
                for v, hh in mcu_blocks(ci):
                    dc = int(grids[ci][my * cv + v, mx * ch + hh, 0]) >> al_dc
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    sz = _category(diff)
                    code, ln = dcT[sz]
                    wdc.bw.write(code, ln)
                    if sz:
                        wdc.bw.write(
                            diff if diff >= 0 else diff + (1 << sz) - 1, sz)
    wdc.finish()

    # ---- AC scans: first (Al=1) then refinement (Al=0), two bands each
    for ah, al in ((0, 1), (1, 0)):
        for band in ((1, 5), (6, 63)):
            for ci in range(nch):
                bh_i, bw_i = real[ci]
                out += _sos_segment([(ci + 1, 0, 0)], band[0], band[1],
                                    ah, al)
                wac = _ProgScanWriter(out, enc[(1, 0)], restart_interval)
                for byi in range(bh_i):
                    for bxi in range(bw_i):
                        wac.unit_boundary()
                        zz = grids[ci][byi, bxi]
                        if ah == 0:
                            _enc_ac_first_block(wac, zz, band[0], band[1], al)
                        else:
                            _enc_ac_refine_block(wac, zz, band[0], band[1],
                                                 al)
                wac.finish()

    # ---- final scan: interleaved DC refinement to Al=0 (raw bits)
    out += _sos_segment([(ci + 1, 0, 0) for ci in range(nch)], 0, 0, al_dc,
                        0)
    wdr = _ProgScanWriter(out, enc[(1, 0)], restart_interval)
    for my in range(mcuy):
        for mx in range(mcux):
            wdr.unit_boundary()
            for ci in range(nch):
                ch, cv = hv[ci]
                for v, hh in mcu_blocks(ci):
                    dc = int(grids[ci][my * cv + v, mx * ch + hh, 0])
                    wdr.bw.write(dc & 1, 1)
    wdr.finish()

    out += b"\xff\xd9"                                 # EOI
    return bytes(out)
