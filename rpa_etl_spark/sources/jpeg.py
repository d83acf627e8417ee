"""Baseline JPEG codec (ITU T.81 sequential DCT, 8-bit, 4:4:4), pure
numpy + stdlib.

Completes the multimodal codec set (BMP/PNG images, WAV audio, AVI video)
with the one entropy-coded format: a real JFIF encoder and decoder. The
encoder builds its own length-limited canonical Huffman tables from the
image's symbol statistics and embeds them in DHT segments (T.81 allows
arbitrary tables — nothing depends on the Annex K examples), uses one
quantization table per luma/chroma, and writes standard SOI/APP0/DQT/
SOF0/DHT/SOS streams with FF byte stuffing. The decoder handles any
baseline 4:4:4 stream with embedded tables — not just our own output.

JPEG is lossy, so unlike the other codecs the gate is a bounded-error
round-trip (plus marker-structure and determinism checks), not bit
identity; see tests/test_jpeg_codec.py. The decode hot loop is
Python-bit-level — fine for tests and for Arrow-batched decode of small
thumbnails, but the declared-query oracle path stays on PNG/BMP where
features are exactly recomputable.
"""

from __future__ import annotations

import heapq
import struct
from collections import Counter

import numpy as np

# ---------------------------------------------------------------------------
# Shared math
# ---------------------------------------------------------------------------


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] /= np.sqrt(2)
    return m / 2.0  # orthonormal 8x8 DCT-II


_DCT = _dct_matrix()

_ZIGZAG = np.array(
    sorted(range(64), key=lambda i: (i // 8 + i % 8, (i // 8) if (i // 8 + i % 8) % 2 else -(i // 8)))
)  # index k -> flat position in the 8x8 block, diagonal walk

_QUANT_LUMA = np.full((8, 8), 12, dtype=np.int32)
_QUANT_LUMA[0, 0] = 8
_QUANT_CHROMA = np.full((8, 8), 16, dtype=np.int32)
_QUANT_CHROMA[0, 0] = 8


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y, cb, cr = arr[..., 0], arr[..., 1], arr[..., 2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _extra_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# Length-limited canonical Huffman (encoder side)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = 16) -> dict[int, int]:
    """Symbol -> code length, canonical, limited to ``max_len`` via the
    T.81 K.3-style adjustment (move long codes up the tree)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    uid = len(heap)
    depth: dict[int, int] = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, s1 + s2))
        uid += 1
    # counts per length, then push anything beyond max_len up
    counts = Counter(depth.values())
    lengths = sorted(counts)
    while lengths and lengths[-1] > max_len:
        ln = lengths[-1]
        # take two codes at ln: one moves to ln-1 by pairing with a code
        # pulled down from some j < ln-1
        counts[ln] -= 2
        counts[ln - 1] += 1
        j = ln - 2
        while counts.get(j, 0) == 0:
            j -= 1
        counts[j] -= 1
        counts[j + 1] = counts.get(j + 1, 0) + 2
        counts = Counter({k: v for k, v in counts.items() if v > 0})
        lengths = sorted(counts)
    # reassign canonical lengths: shortest-depth symbols get shortest codes,
    # tie-broken by symbol value for determinism
    ordered = sorted(freqs, key=lambda s: (depth[s], s))
    out: dict[int, int] = {}
    i = 0
    for ln in sorted(counts):
        for _ in range(counts[ln]):
            out[ordered[i]] = ln
            i += 1
    return out


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length), canonical ordering (length, then the DHT
    symbol order, which below is sorted by (length, symbol))."""
    code = 0
    out: dict[int, tuple[int, int]] = {}
    prev_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[s]
        code <<= ln - prev_len
        out[s] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _dht_segment(tc_th: int, lengths: dict[int, int]) -> bytes:
    by_len: list[list[int]] = [[] for _ in range(17)]
    for s, ln in lengths.items():
        by_len[ln].append(s)
    body = bytearray([tc_th])
    body.extend(len(by_len[ln]) for ln in range(1, 17))
    for ln in range(1, 17):
        body.extend(sorted(by_len[ln]))
    return struct.pack(">2sH", b"\xff\xc4", len(body) + 2) + bytes(body)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def finish(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _block_symbols(coeffs: np.ndarray, prev_dc: int):
    """Quantized zigzag coefficients -> (dc_sym, dc_bits, [(ac_sym,
    ac_bits)], new_prev_dc)."""
    dc = int(coeffs[0])
    diff = dc - prev_dc
    size = _category(diff)
    # walk only the nonzero ACs (run-lengths fall out of the index gaps —
    # same symbols as the per-k scan, without 63 Python iterations)
    ac_syms = []
    nz = np.nonzero(coeffs[1:])[0]
    prev_k = 0
    for k in nz.tolist():
        k += 1
        run = k - prev_k - 1
        prev_k = k
        while run >= 16:
            ac_syms.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        v = int(coeffs[k])
        s = _category(v)
        ac_syms.append(((run << 4) | s, (_extra_bits(v, s), s)))
    if len(nz) == 0 or nz[-1] + 1 < 63:
        ac_syms.append((0x00, (0, 0)))  # EOB
    return (size, (_extra_bits(diff, size), size)), ac_syms, dc


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in table.reshape(-1)[_ZIGZAG])
    return struct.pack(">2sH", b"\xff\xdb", len(body) + 2) + body


# constant segments hoisted out of jpeg_encode (the quant tables are module
# constants, APP0/SOS carry no per-image fields)
_DQT_BYTES = _dqt_segment(0, _QUANT_LUMA) + _dqt_segment(1, _QUANT_CHROMA)
_APP0 = struct.pack(">2sH5sBBBHHBB", b"\xff\xe0", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0)
_SOS = struct.pack(">2sHB", b"\xff\xda", 12, 3) + b"".join(
    struct.pack("BB", cid, (0x00 if cid == 1 else 0x11)) for cid in (1, 2, 3)
) + bytes([0, 63, 0])


def jpeg_encode(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, one luma + one
    chroma quant table, image-optimal Huffman tables)."""
    h, w, _ = arr.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if ph == h and pw == w:
        padded = arr.astype(np.float64)
    else:
        padded = np.pad(
            arr.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
        )
    ycc = _rgb_to_ycbcr(padded)

    # DCT + quantize every block of a component in ONE batched numpy pass
    # (bit-identical to the per-block matmul form; block order (by, bx) is
    # the same raster walk the MCU loop used)
    quants = [_QUANT_LUMA, _QUANT_CHROMA, _QUANT_CHROMA]
    nby, nbx = ph // 8, pw // 8
    comp_blocks: list[np.ndarray] = []
    for ci in range(3):
        ch = ycc[..., ci] - 128.0
        blocks = ch.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coeff = _DCT @ blocks @ _DCT.T
        q = np.round(coeff / quants[ci]).astype(np.int64)
        comp_blocks.append(q.reshape(-1, 64)[:, _ZIGZAG])

    # gather symbol statistics (tables: 0=luma, 1=chroma); the per-block
    # symbol lists are kept so the write pass below does not recompute them
    # (the DC-prediction chains of the two passes are identical by
    # construction: 4:4:4 interleaves exactly one block per component per
    # MCU, in the same raster order)
    dc_freq = [Counter(), Counter()]
    ac_freq = [Counter(), Counter()]
    n_blocks = comp_blocks[0].shape[0]
    comp_syms: list[list] = []
    for ci in range(3):
        t = 0 if ci == 0 else 1
        prev = 0
        entries = []
        for blk in comp_blocks[ci]:
            (dsym, dpair), acs, prev = _block_symbols(blk, prev)
            entries.append((dsym, dpair, acs))
            dc_freq[t][dsym] += 1
            for sym, _ in acs:
                ac_freq[t][sym] += 1
        comp_syms.append(entries)
    for t in range(2):
        dc_freq[t].setdefault(0, 1)
        ac_freq[t].setdefault(0x00, 1)
    dc_len = [_huffman_lengths(dict(dc_freq[t])) for t in range(2)]
    ac_len = [_huffman_lengths(dict(ac_freq[t])) for t in range(2)]
    dc_code = [_canonical_codes(dc_len[t]) for t in range(2)]
    ac_code = [_canonical_codes(ac_len[t]) for t in range(2)]

    # entropy-coded data: interleaved MCUs (4:4:4 -> one block per comp)
    bw = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(3):
            t = 0 if ci == 0 else 1
            dsym, (dbits, dsize), acs = comp_syms[ci][bi]
            c, ln = dc_code[t][dsym]
            bw.write(c, ln)
            if dsize:
                bw.write(dbits, dsize)
            for sym, (abits, asize) in acs:
                c, ln = ac_code[t][sym]
                bw.write(c, ln)
                if asize:
                    bw.write(abits, asize)
    entropy = bw.finish()

    sof0 = struct.pack(
        ">2sHBHHB", b"\xff\xc0", 17, 8, h, w, 3
    ) + b"".join(struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1) for cid in (1, 2, 3))
    return (
        b"\xff\xd8"
        + _APP0
        + _DQT_BYTES
        + sof0
        + _dht_segment(0x00, dc_len[0])  # Tc=0 (DC), Th=0 (luma)
        + _dht_segment(0x10, ac_len[0])  # Tc=1 (AC), Th=0
        + _dht_segment(0x01, dc_len[1])  # Tc=0, Th=1 (chroma)
        + _dht_segment(0x11, ac_len[1])  # Tc=1, Th=1
        + _SOS
        + entropy
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_dht(body: bytes) -> dict[int, dict[tuple[int, int], int]]:
    """DHT body -> {tc_th: {(length, code): symbol}} (may hold several)."""
    out: dict[int, dict[tuple[int, int], int]] = {}
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = body[pos + 1 : pos + 17]
        pos += 17
        table: dict[tuple[int, int], int] = {}
        code = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                table[(ln, code)] = body[pos]
                pos += 1
                code += 1
            code <<= 1
        out[tc_th] = table
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF (8-bit, 3-component 4:4:4) -> (H, W, 3) uint8 RGB.
    Reads the embedded quant + Huffman tables; rejects progressive,
    subsampled, or non-8-bit streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    h = w = None
    comp_q: list[int] = []
    comp_tables: list[tuple[int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        size = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:
            p = 0
            while p < len(body):
                tq = body[p]
                if tq >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = zz
                quant[tq & 0xF] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC0:
            depth, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if depth != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline supported")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comp_q.append(tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xC4:
            huff.update(_decode_dht(body))
        elif marker == 0xDA:
            ns = body[0]
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                comp_tables.append((tabs >> 4, tabs & 0xF))
            entropy_start = pos
            break
    if h is None or not comp_tables:
        raise ValueError("missing SOF0/SOS")
    # entropy data runs until the EOI marker
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[entropy_start:end])

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nby, nbx = ph // 8, pw // 8
    n_blocks = nby * nbx
    # entropy-decode every block's zigzag coefficients first (sequential by
    # nature: Huffman + DC prediction), then dequantize + IDCT all blocks
    # of each component in ONE batched numpy pass (bit-identical to the
    # per-block matmul form)
    comp_zz = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in range(3)]
    prev_dc = [0, 0, 0]
    for bi in range(n_blocks):
        for ci in range(3):
            dc_t, ac_t = comp_tables[ci]
            dsym = _read_symbol(br, huff[0x00 | dc_t])
            diff = _extend(br.read_bits(dsym), dsym) if dsym else 0
            prev_dc[ci] += diff
            zz = comp_zz[ci][bi]
            zz[0] = prev_dc[ci]
            k = 1
            while k < 64:
                sym = _read_symbol(br, huff[0x10 | ac_t])
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                run, sz = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.read_bits(sz), sz)
                k += 1
    plane_list = []
    for ci in range(3):
        coeffs = np.zeros((n_blocks, 64), dtype=np.float64)
        coeffs[:, _ZIGZAG] = comp_zz[ci]
        blocks = coeffs.reshape(-1, 8, 8) * quant[comp_q[ci]]
        recon = _DCT.T @ blocks @ _DCT + 128.0
        plane_list.append(
            recon.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(ph, pw)
        )
    planes = np.stack(plane_list, axis=-1)
    return _ycbcr_to_rgb(planes)[:h, :w]
