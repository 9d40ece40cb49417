"""GIF87a/89a codec in pure numpy/stdlib — LZW decode with full
dictionary growth (handles real-world files), plus a paired encoder.

Scope: static GIFs (first image block of an animated file), global or
local color tables, interlaced or sequential row order, 8-bit palettes.
A first frame smaller than or offset within the logical screen is
composited onto a background-color canvas at its left/top — decode dims
always equal the logical-screen dims, matching what a player renders.
Transparency (GCE) is ignored — frames decode as opaque RGB, consistent
with the PNG path dropping alpha. Corrupt streams raise ValueError;
non-GIF magic raises NotImplementedError at the decode_image boundary.

The encoder emits the classic "uncompressed GIF" LZW stream: a Clear
code is issued before the dictionary could force a code-width bump, so
every symbol stays at min_code_size+1 bits — a fully conformant stream
any GIF decoder accepts (and our own decoder, which DOES grow the
dictionary, reads it like any other). Palette = the image's unique
colors; images with more than 256 distinct colors are rejected
(quantization is a preprocessing choice, not a codec concern).

Format from the public GIF89a specification (CompuServe, 1990) and the
LZW variable-code procedure described there.
"""

from __future__ import annotations

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

# Cap on the background-canvas allocation (64M pixels = 192 MB RGB).
# The logical-screen dims are attacker-controlled header fields that,
# unlike frame pixels, need no LZW data behind them.
_MAX_CANVAS_PIXELS = 1 << 26


class _BitReaderLSB:
    """LZW code reader: GIF packs codes least-significant-bit first."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


class _BitWriterLSB:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows arrive in pass order; restore."""
    h = rows.shape[0]
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    end = clear + 1
    br = _BitReaderLSB(data)
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            table = table[: clear + 2]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        # clear/end were handled above, so any in-table code is a
        # literal single or a grown entry
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("invalid GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data ended early")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def decode_gif(payload: bytes) -> np.ndarray:
    """First image of a GIF -> HxWx3 uint8 (palette resolved)."""
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_impl(payload)
    except IndexError as e:
        raise ValueError("truncated GIF header") from e


def _decode_gif_impl(payload: bytes) -> np.ndarray:
    # logical screen descriptor: canvas size + background color index —
    # the frame's own descriptor carries position and dimensions; a frame
    # smaller than / offset within the canvas is composited like a player
    # renders it (canvas filled with the background color, frame pasted
    # at its left/top), so decode dims always equal the screen dims
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left = int.from_bytes(payload[pos + 1:pos + 3], "little")
            top = int.from_bytes(payload[pos + 3:pos + 5], "little")
            w = int.from_bytes(payload[pos + 5:pos + 7], "little")
            h = int.from_bytes(payload[pos + 7:pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n,
                    offset=pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image has no color table")
            if w <= 0 or h <= 0:
                raise ValueError("bad GIF image dimensions")
            if sw * sh > _MAX_CANVAS_PIXELS or w * h > _MAX_CANVAS_PIXELS:
                # bound BOTH the logical screen and the frame dims here,
                # BEFORE the LZW decode: dictionary growth amplifies
                # ~150 KB of crafted codes into a 65535x65535 index
                # array, and pal[rows] would allocate the 12.8 GB RGB
                # frame — the giant allocations happen during decode,
                # not at the canvas composite
                raise ValueError(
                    f"GIF dimensions {sw}x{sh} (frame {w}x{h}) exceed "
                    f"the {_MAX_CANVAS_PIXELS}-pixel decode bound")
            min_code = payload[pos]
            if not 1 <= min_code <= 8:
                raise ValueError(f"bad GIF LZW min code size {min_code}")
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(lzw), min_code, w * h)
            if int(idx.max()) >= pal.shape[0]:
                raise ValueError("GIF pixel index outside color table")
            rows = idx.reshape(h, w)
            if iflags & 0x40:
                rows = _deinterlace(rows)
            frame = pal[rows]  # fancy indexing already allocates fresh
            if left == 0 and top == 0 and (w, h) == (sw, sh):
                return frame
            if left + w > sw or top + h > sh or sw <= 0 or sh <= 0:
                raise ValueError("GIF frame extends beyond logical screen")
            bg = (global_pal[bg_index]
                  if global_pal is not None and bg_index < len(global_pal)
                  else np.zeros(3, dtype=np.uint8))
            canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
            canvas[top:top + h, left:left + w] = frame
            return canvas
        elif b == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("truncated GIF (no image block)")


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx3 uint8 (<=256 distinct colors) -> GIF89a payload."""
    if img.ndim != 3 or img.shape[2] < 3:
        raise ValueError(
            f"encode_gif needs an HxWx(>=3) array, got shape {img.shape}")
    h, w = img.shape[:2]
    if h <= 0 or w <= 0:
        raise ValueError("empty image")
    flat = img[..., :3].reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if pal.shape[0] > 256:
        raise ValueError(f"{pal.shape[0]} distinct colors exceed a GIF "
                         "palette; quantize first")
    pal_bits = max(1, int(pal.shape[0] - 1).bit_length())
    n_pal = 1 << pal_bits
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[: pal.shape[0]] = pal
    rows = idx.reshape(h, w)
    if interlace:
        order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                 + [*range(2, h, 4)] + [*range(1, h, 2)])
        rows = rows[order]
    pixels = rows.reshape(-1)

    min_code = max(2, pal_bits)
    clear = 1 << min_code
    width = min_code + 1
    bw = _BitWriterLSB()
    bw.write(clear, width)
    # uncompressed-GIF trick: re-Clear before the table (which a
    # conformant decoder grows by one per emitted code) would widen codes
    budget = (1 << width) - clear - 2
    count = 0
    for p in pixels:
        bw.write(int(p), width)
        count += 1
        if count == budget:
            bw.write(clear, width)
            count = 0
    bw.write(clear + 1, width)  # End Of Information
    stream = bw.flush()

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (pal_bits - 1), 0, 0])  # GCT flag + size
    out += pal_bytes.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
