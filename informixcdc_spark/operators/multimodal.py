"""Multimodal columns: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column that stays columnar (parquet/Arrow) end to end, with a
typed metadata struct alongside; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so bytes
never round-trip through row-at-a-time Python.

Codec tiers:

- REAL, always available: binary PPM/PGM rasters decode/resize with
  numpy alone (:func:`decode_image`, :func:`resize_image`) and PCM WAV
  audio decodes with numpy (:func:`decode_audio`) — genuine
  pixels/samples through the distributed pipeline, no native library
  needed. Header-only metadata (JPEG SOFn / PNG IHDR / PNM) parses from
  pure bytes (:func:`image_metadata`).
- REAL, optional: compressed formats (JPEG/PNG) via PIL when the
  :func:`pil_available` import probe finds it (absent in this
  container).
- STUB, for oracle-checked plumbing tests: :func:`decode_stub` /
  :func:`resize_stub` with ``fake=True`` produce deterministic
  byte-math stand-ins expressible in the DuckDB oracle; without
  ``fake`` they raise, documenting the boundary.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: metadata schema carried next to every binary payload
META_SCHEMA = "doc_id BIGINT, n_bytes INT, head_checksum INT, kind STRING"

#: feature-extraction output schema (decode stage)
FEATURE_SCHEMA = "doc_id BIGINT, n_bytes INT, feature ARRAY<FLOAT>"


def to_binary_payload(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap a column as an opaque binary payload (here: utf-8 bytes of
    text standing in for image/audio bytes).

    No internal rebalance: the r12 on/off A/B measured the payload
    exchange as a net loss for the light Arrow walk (e19 x0.62 with it
    on); a caller whose downstream Python pass is heavy enough to
    amortize it (e13's full feature decode, x1.48) rebalances its own
    input before wrapping."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(payload_col), "utf-8").alias("payload"),
    )


def payload_metadata(binary_df: DataFrame) -> DataFrame:
    """Typed metadata from the raw bytes — Arrow-batched mapInPandas
    (this is the real plumbing the stubbed decoders plug into)."""

    def _meta(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(b) for b in payloads],
                    "head_checksum": [sum(b[:4]) for b in payloads],
                    "kind": [
                        "low" if b[:1] and b[:1] <= b"m" else "high" for b in payloads
                    ],
                }
            )

    return binary_df.mapInPandas(_meta, schema=META_SCHEMA)


def decode_stub(
    binary_df: DataFrame, n_features: int = 8, fake: bool = False
) -> DataFrame:
    """The decode/feature-extract stage (image decode, audio resample,
    video frame-sample would slot in here).

    With ``fake=True``: a deterministic per-payload pseudo-feature (byte
    histogram moments), so pipelines are testable without codecs.
    Without: raises, documenting the missing-native-codec boundary.
    """

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) unavailable in this environment; "
                    "run with fake=True for the deterministic test decoder"
                )
            feats, nbytes = [], []
            for b in pdf["payload"]:
                raw = bytes(b)
                nbytes.append(len(raw))
                feats.append(
                    [
                        float(sum(raw[j::n_features]) % 997)
                        for j in range(n_features)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return binary_df.mapInPandas(_decode, schema=FEATURE_SCHEMA)


#: frame-sample output: one row PER SAMPLED FRAME (1→N mapInPandas shape)
FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_len INT, checksum INT"


def frame_sample(
    binary_df: DataFrame, frame_sz: int = 64, every_n: int = 3
) -> DataFrame:
    """Video-style frame sampling over an opaque payload: split into
    fixed-size frames, keep every ``every_n``-th, emit one OUTPUT ROW per
    sampled frame — the 1→N expansion shape a real frame decoder needs
    (mapInPandas yields more rows than it consumes; no driver involvement,
    no explode of a materialized array)."""

    def _sample(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                n_frames = (len(raw) + frame_sz - 1) // frame_sz
                for fi in range(0, n_frames, every_n):
                    chunk = raw[fi * frame_sz : (fi + 1) * frame_sz]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    lens.append(len(chunk))
                    sums.append(sum(chunk) % 997)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "checksum": pd.Series(sums, dtype="int32"),
                }
            )

    return binary_df.mapInPandas(_sample, schema=FRAME_SCHEMA)


#: resize output: payload replaced by the resized fake raster
RESIZE_SCHEMA = "doc_id BIGINT, width INT, height INT, payload BINARY"


def resize_stub(
    binary_df: DataFrame, width: int = 4, height: int = 4, fake: bool = False
) -> DataFrame:
    """Image-resize stage. Real decode/resample needs PIL/ffmpeg (absent
    in this container — NotImplementedError documents the boundary);
    ``fake=True`` runs a deterministic stand-in (stride subsampling of the
    payload to width·height bytes) so the Spark plumbing — schema, batch
    shape, binary-in/binary-out — is real and tested."""

    def _resize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "run with fake=True for the deterministic test resizer"
                )
            out = []
            for b in pdf["payload"]:
                raw = bytes(b)
                n = width * height
                stride = max(1, len(raw) // n)
                out.append(raw[::stride][:n].ljust(n, b"\x00"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(out), dtype="int32"),
                    "height": pd.Series([height] * len(out), dtype="int32"),
                    "payload": out,
                }
            )

    return binary_df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


# ===========================================================================
# REAL codec path (r3): PPM/PGM raster images decode with numpy alone —
# no native codec library needed — so decode/feature/resize run for real
# on this format; compressed formats (JPEG/PNG) go through PIL when the
# import probe finds it, and raise the documented boundary error when not.
# ===========================================================================
def pil_available() -> bool:
    """Import probe for the optional compressed-image codec dependency."""
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal binary PPM (P6, maxval 255) encoder — test-fixture builder
    and the resize stage's output format."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size != w*h*3")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def _parse_pnm_header(raw: bytes):
    """P5/P6 binary PNM header: (width, height, channels, raster_offset)."""
    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    channels = 3 if raw[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PNM supported")
    return width, height, channels, pos


def _parse_pnm(raw: bytes):
    """Decode P5 (grayscale) / P6 (RGB) binary PNM headers + raster.
    Returns (width, height, channels, ndarray[h, w, c])."""
    import numpy as np

    width, height, channels, pos = _parse_pnm_header(raw)
    n = width * height * channels
    raster = np.frombuffer(raw[pos : pos + n], dtype=np.uint8)
    if raster.size != n:
        raise ValueError("truncated PNM raster")
    return width, height, channels, raster.reshape(height, width, channels)


def _jpeg_dimensions(raw: bytes):
    """(width, height, channels) from a JPEG's SOFn segment — pure byte
    walk over the marker stream, no codec library. Handles baseline SOF0
    and progressive SOF2 (plus the other SOFn variants), skips
    standalone markers (SOI/RST/TEM) and fill bytes. Returns None when
    the payload is not a parseable JPEG. Segment layout per ITU T.81
    B.2.2: FF, marker, 2-byte BE length (incl. itself), then for SOFn:
    precision(1), height(2 BE), width(2 BE), n_components(1)."""
    if raw[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            return None  # desynced marker stream
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone marker, no length field
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        if seg_len < 2:
            return None
        # SOFn = C0..CF minus DHT(C4) / JPG(C8) / DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 10 > len(raw):
                return None
            height = int.from_bytes(raw[pos + 5 : pos + 7], "big")
            width = int.from_bytes(raw[pos + 7 : pos + 9], "big")
            return width, height, raw[pos + 9]
        pos += 2 + seg_len
    return None


#: PNG color type -> sample channels (palette entries expand to RGB but
#: the stored raster is 1 index/pixel; report stored channels)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_dimensions(raw: bytes):
    """(width, height, channels) from a PNG IHDR chunk — pure bytes."""
    if raw[:8] != b"\x89PNG\r\n\x1a\n" or raw[12:16] != b"IHDR" or len(raw) < 26:
        return None
    width = int.from_bytes(raw[16:20], "big")
    height = int.from_bytes(raw[20:24], "big")
    return width, height, _PNG_CHANNELS.get(raw[25])


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(raw: bytes):
    """Walk the PNG chunk stream, yielding (type, data) with CRC checks
    (layout + CRC scope per the PNG spec, ISO/IEC 15948 §5.3)."""
    import zlib

    pos = 8
    while pos + 8 <= len(raw):
        n = int.from_bytes(raw[pos : pos + 4], "big")
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + n]
        if len(data) != n:
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(raw[pos + 8 + n : pos + 12 + n], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + n


def _unfilter_scanline(ft: int, cur, prev, bpp: int):
    """Reconstruct one scanline from its filtered bytes (PNG filter
    types 0-4, spec §9.2). ``cur``/``prev`` are uint8 arrays (prev =
    zeros for the first scanline); uint8 arithmetic wraps mod 256,
    exactly the spec's unsigned-byte addition."""
    import numpy as np

    if ft == 0:  # None
        return cur
    if ft == 2:  # Up
        return cur + prev
    if ft == 1:  # Sub: per byte-lane running sum mod 256
        lanes = len(cur) // bpp  # scanline length is a bpp multiple
        recon = (
            np.cumsum(cur[: lanes * bpp].reshape(lanes, bpp), axis=0, dtype=np.uint64)
            & 0xFF
        ).astype(np.uint8).reshape(-1)
        return recon
    # Average/Paeth depend on the reconstructed LEFT pixel, so the walk
    # along the row is inherently sequential — but all ``bpp`` channel
    # lanes of a pixel are independent, so the loop runs once per PIXEL
    # with numpy vector arithmetic across the lanes (no per-byte Python
    # ints). Still O(width) interpreter steps per row: for bulk
    # real-size image columns route through PIL when available (the
    # decode_image probe prefers it); this pure-numpy path is the
    # no-codec-library fallback.
    n_px = len(cur) // bpp
    cur2 = cur[: n_px * bpp].reshape(n_px, bpp).astype(np.int16)
    prev2 = prev[: n_px * bpp].reshape(n_px, bpp).astype(np.int16)
    recon = np.zeros((n_px, bpp), dtype=np.int16)
    left = np.zeros(bpp, dtype=np.int16)
    if ft == 3:  # Average (floor of left+up mean, spec §9.3)
        for i in range(n_px):
            left = (cur2[i] + ((left + prev2[i]) >> 1)) & 0xFF
            recon[i] = left
        return recon.reshape(-1).astype(np.uint8)
    if ft == 4:  # Paeth predictor (spec §9.4)
        upleft = np.zeros(bpp, dtype=np.int16)
        for i in range(n_px):
            up = prev2[i]
            p = left + up - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - up)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
            )
            left = (cur2[i] + pred) & 0xFF
            recon[i] = left
            upleft = up
        return recon.reshape(-1).astype(np.uint8)
    raise ValueError(f"unknown PNG filter type {ft}")


def _unfilter_image(lines, stride: int, bpp: int):
    """Unfilter a block of scanlines (rows = [filter_byte, stride bytes])
    into reconstructed bytes — shared by the whole-image path and each
    Adam7 sub-image (every pass filters independently, spec §8.2)."""
    import numpy as np

    height = lines.shape[0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        prev = _unfilter_scanline(int(lines[y, 0]), lines[y, 1:], prev, bpp)
        out[y] = prev
    return out


#: Adam7 pass table: (x_start, y_start, x_step, y_step) per spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png(raw: bytes):
    """REAL PNG raster decode with stdlib ``zlib`` + numpy — no codec
    library: IDAT inflate, per-scanline unfilter (None/Sub/Up/Average/
    Paeth), palette expansion, Adam7 deinterlacing. Returns (width,
    height, channels, ndarray[h, w, c]) — dtype uint8 at depth 8,
    uint16 at depth 16 (PNG filters operate on BYTES regardless of
    depth, spec §9.1, so the unfilter is shared; samples are
    big-endian). Color types 0/2/3/4/6 at byte depths; sub-byte depths
    raise the documented boundary."""
    import zlib

    import numpy as np

    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(raw):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth not in (8, 16) or interlace not in (0, 1):
        raise NotImplementedError(
            "PNG decode covers byte depths (8/16); "
            f"got bit_depth={bit_depth} interlace={interlace}"
        )
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"bad PNG color type {color_type}")
    if color_type == 3 and bit_depth == 16:
        raise ValueError("paletted PNG is 8-bit max (spec table 11.1)")
    sample_bytes = bit_depth // 8
    bpp = channels * sample_bytes  # filter distance, in bytes (spec §9.2)
    flat = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 0:
        stride = width * bpp  # bytes per scanline
        if flat.size != height * (stride + 1):
            raise ValueError("PNG raster size mismatch")
        out = _unfilter_image(flat.reshape(height, stride + 1), stride, bpp)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        out = np.zeros((height, width * bpp), dtype=np.uint8)
        pixels = out.reshape(height, width, bpp)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            sub_w = (width - x0 + dx - 1) // dx if width > x0 else 0
            sub_h = (height - y0 + dy - 1) // dy if height > y0 else 0
            if sub_w == 0 or sub_h == 0:
                continue  # empty pass stores nothing, not even filters
            stride = sub_w * bpp
            block = flat[pos : pos + sub_h * (stride + 1)]
            if block.size != sub_h * (stride + 1):
                raise ValueError("PNG interlaced raster size mismatch")
            pos += block.size
            sub = _unfilter_image(
                block.reshape(sub_h, stride + 1), stride, bpp
            ).reshape(sub_h, sub_w, bpp)
            pixels[y0::dy, x0::dx] = sub
        if pos != flat.size:
            raise ValueError("PNG interlaced raster size mismatch")
    if bit_depth == 16:
        arr = (
            out.reshape(-1).view(">u2").astype(np.uint16)
            .reshape(height, width, channels)
        )
    else:
        arr = out.reshape(height, width, channels)
    if color_type == 3:  # palette indices -> RGB
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        arr = palette[arr[:, :, 0]]
        channels = 3
    return width, height, channels, arr


def _filter_scanline(ft: int, cur, prev, bpp: int):
    """Forward PNG filter (the encoder side of :func:`_unfilter_scanline`)
    — fixture builder so tests can exercise every reconstruction path."""
    import numpy as np

    cur = cur.astype(np.int16)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ft == 0:
        out = cur
    elif ft == 1:
        out = cur - left
    elif ft == 2:
        out = cur - up
    elif ft == 3:
        out = cur - (left + up) // 2
    elif ft == 4:
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        out = cur - pred
    else:
        raise ValueError(f"unknown PNG filter type {ft}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filters=None,
    palette: bytes | None = None,
    bit_depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """Minimal valid PNG encoder (8/16-bit, optional Adam7) — fixture
    builder for :func:`decode_png`. ``filters`` picks the per-scanline
    filter type (default: cycle 0..4 so every unfilter path is hit; for
    Adam7 the cycle runs within each pass). For color type 3,
    ``pixels`` are palette indices and ``palette`` is the RGB-triple
    PLTE payload. At depth 16, ``pixels`` are big-endian sample bytes
    (2 per sample)."""
    import zlib

    import numpy as np

    channels = _PNG_CHANNELS[color_type]
    if (color_type == 3) != (palette is not None):
        raise ValueError("palette iff color type 3")
    if bit_depth not in (8, 16) or (color_type == 3 and bit_depth == 16):
        raise ValueError("bit depth must be 8 or 16 (8 for palette)")
    bpp = channels * (bit_depth // 8)
    stride = width * bpp
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size != h*w*c*bytes_per_sample")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)

    def _filter_block(block, body: bytearray) -> None:
        prev = np.zeros(block.shape[1], dtype=np.uint8)
        for y in range(block.shape[0]):
            ft = filters[y] if filters is not None else y % 5
            body.append(ft)
            body += _filter_scanline(ft, block[y], prev, bpp).tobytes()
            prev = block[y]

    body = bytearray()
    if not interlace:
        _filter_block(arr, body)
    else:
        pix = arr.reshape(height, width, bpp)
        for x0, y0, dx, dy in _ADAM7:
            sub = pix[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            _filter_block(
                np.ascontiguousarray(sub).reshape(sub.shape[0], -1), body
            )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, 1 if interlace else 0])
    )
    plte = chunk(b"PLTE", palette) if palette is not None else b""
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )


def image_dimensions(raw: bytes):
    """Best-effort (format, width, height, channels) from header bytes
    alone — JPEG (SOF marker walk), PNG (IHDR), binary PNM. No codec
    library involved, so real-world image columns get real metadata even
    in minimal containers; full pixel decode of compressed formats still
    needs PIL (:func:`decode_image`) except PNG, which decodes for real
    via :func:`decode_png`. Returns (None, None, None, None) for
    unrecognized payloads."""
    dims = _jpeg_dimensions(raw)
    if dims is not None:
        return ("jpeg", *dims)
    dims = _png_dimensions(raw)
    if dims is not None:
        return ("png", *dims)
    try:
        w, h, c, _ = _parse_pnm_header(raw)
        return ("pnm", w, h, c)
    except (ValueError, IndexError):
        return (None, None, None, None)


#: header-sniffed image metadata (no decode): format + dimensions
IMAGE_META_SCHEMA = (
    "doc_id BIGINT, format STRING, width INT, height INT, channels INT"
)


def encode_jpeg_shell(width: int, height: int, channels: int = 3) -> bytes:
    """Minimal JPEG marker stream (SOI + APP0 + DQT filler + SOF0 + EOI)
    with the given frame dimensions — a deterministic fixture builder for
    the header sniffer. Not pixel-decodable (no scan data); headers are
    exactly what :func:`image_metadata` reads."""
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (2 + len(payload)).to_bytes(2, "big") + payload

    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    sof = (
        bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([channels]) + comp
    )
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00" + bytes(9))
        + seg(0xDB, bytes(3))
        + seg(0xC0, sof)
        + b"\xff\xd9"
    )


def payload_to_jpeg_shell(binary_df: DataFrame) -> DataFrame:
    """Derive a JPEG shell per payload with byte-length-determined
    dimensions (width = clamp(len, 1, 65535), height = len%240+1,
    channels = len%3+1) — closed-form functions of the payload, so an
    oracle can restate them while the REAL header walker proves it
    recovers them from the marker stream."""

    def _wrap(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                n = len(bytes(b))
                out.append(
                    encode_jpeg_shell(min(max(n, 1), 65535), n % 240 + 1, n % 3 + 1)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": out}
            )

    return binary_df.mapInPandas(_wrap, schema="doc_id BIGINT, payload BINARY")


def image_metadata(binary_df: DataFrame) -> DataFrame:
    """Header-only image metadata over an opaque binary column: one
    Arrow-batched ``mapInPandas`` pass reading a few hundred bytes per
    payload — the cheap scan that routes payloads to the right decode
    stage (and filters corrupt ones) before any expensive pixel work."""

    def _meta(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [image_dimensions(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": [r[0] for r in rows],
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                    "channels": pd.array([r[3] for r in rows], dtype="Int32"),
                }
            )

    return binary_df.mapInPandas(_meta, schema=IMAGE_META_SCHEMA)


#: real image decode output: dimensions + per-channel statistics
IMAGE_FEATURE_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, channels INT, "
    "mean ARRAY<FLOAT>, std ARRAY<FLOAT>"
)


def decode_image(binary_df: DataFrame) -> DataFrame:
    """REAL image decode + feature extraction over an opaque binary
    column: PPM/PGM rasters decode with numpy and PNG decodes with
    stdlib zlib + numpy unfiltering (:func:`decode_png`) — both always
    available; anything else uses PIL when present, else raises the
    documented codec boundary (JPEG entropy decode without a library is
    not worth reimplementing). Output: dimensions + per-channel
    mean/std — the Arrow-batched ``mapInPandas`` shape a CLIP-style
    embedding stage would use, with real pixels."""
    use_pil = pil_available()

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ws, hs, cs, means, stds = [], [], [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                if raw[:2] in (b"P5", b"P6"):
                    w, h, c, arr = _parse_pnm(raw)
                elif raw[:8] == _PNG_SIG:
                    w, h, c, arr = decode_png(raw)
                elif use_pil:  # pragma: no cover - PIL absent here
                    import io

                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(raw))
                    arr = np.asarray(img)
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    h, w, c = arr.shape
                else:
                    raise NotImplementedError(
                        "compressed-image codecs (PIL) unavailable; payload "
                        "is not PPM/PGM/PNG — install pillow or supply rasters"
                    )
                flat = arr.reshape(-1, c).astype(np.float64)
                ids.append(int(doc_id))
                ws.append(w)
                hs.append(h)
                cs.append(c)
                means.append([float(x) for x in flat.mean(axis=0)])
                stds.append([float(x) for x in flat.std(axis=0)])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(cs, dtype="int32"),
                    "mean": means,
                    "std": stds,
                }
            )

    return binary_df.mapInPandas(_decode, schema=IMAGE_FEATURE_SCHEMA)


def resize_image(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize (area/box resampling) for PPM/PGM/PNG payloads:
    decode with numpy (PNG via :func:`decode_png`), mean-pool each
    destination cell over its source box, re-encode as PPM.
    Binary-in/binary-out — the exact stage shape a thumbnailing /
    training-resolution-normalization pipeline needs. Output schema
    matches :func:`resize_stub` (RESIZE_SCHEMA)."""

    def _resize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                raw = bytes(b)
                if raw[:8] == _PNG_SIG:
                    w0, h0, c, arr = decode_png(raw)
                    if arr.dtype != np.uint8:  # 16-bit: high byte for P6
                        arr = (arr >> 8).astype(np.uint8)
                    arr = arr[:, :, :3]  # drop alpha for the P6 re-encode
                    c = arr.shape[2]
                else:
                    w0, h0, c, arr = _parse_pnm(raw)
                if c == 1:  # promote grayscale so output is always P6
                    arr = np.repeat(arr, 3, axis=2)
                    c = 3
                elif c == 2:  # gray+alpha: gray channel only, promoted
                    arr = np.repeat(arr[:, :, :1], 3, axis=2)
                    c = 3
                # box resample: split source rows/cols into dest-many
                # groups (sizes differ by at most 1) and mean-pool
                row_edges = (np.arange(height + 1) * h0) // height
                col_edges = (np.arange(width + 1) * w0) // width
                dst = np.empty((height, width, c), dtype=np.uint8)
                fa = arr.astype(np.float64)
                for i in range(height):
                    rs, re = row_edges[i], max(row_edges[i + 1], row_edges[i] + 1)
                    for j in range(width):
                        cs_, ce = col_edges[j], max(col_edges[j + 1], col_edges[j] + 1)
                        dst[i, j] = np.round(
                            fa[rs:re, cs_:ce].reshape(-1, c).mean(axis=0)
                        ).astype(np.uint8)
                out.append(encode_ppm(width, height, dst.tobytes()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(out), dtype="int32"),
                    "height": pd.Series([height] * len(out), dtype="int32"),
                    "payload": out,
                }
            )

    return binary_df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


#: fused metadata + feature schema (single batch walk)
META_FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, head_checksum INT, kind STRING, "
    "feature ARRAY<FLOAT>"
)


def payload_meta_features(
    binary_df: DataFrame, n_features: int = 8, fake: bool = False
) -> DataFrame:
    """Metadata AND (stub-)decoded features in ONE Arrow-batched pass —
    the fused form of :func:`payload_metadata` + :func:`decode_stub`.
    Each payload's bytes are touched once; no join back on doc_id. At
    100 TB that halves the Python-side byte traffic of the multimodal
    stage and removes a corpus-wide shuffle."""

    def _walk(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) unavailable in this environment; "
                    "run with fake=True for the deterministic test decoder"
                )
            nbytes, checks, kinds, feats = [], [], [], []
            for b in pdf["payload"]:
                raw = bytes(b)
                nbytes.append(len(raw))
                checks.append(sum(raw[:4]))
                kinds.append("low" if raw[:1] and raw[:1] <= b"m" else "high")
                feats.append(
                    [
                        float(sum(raw[j::n_features]) % 997)
                        for j in range(n_features)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": nbytes,
                    "head_checksum": checks,
                    "kind": kinds,
                    "feature": feats,
                }
            )

    return binary_df.mapInPandas(_walk, schema=META_FEATURE_SCHEMA)


# ===========================================================================
# REAL audio path (r4): WAV/RIFF is an uncompressed container, so the
# full decode — header walk + PCM sample extraction + per-channel
# features — runs with numpy alone, the audio counterpart of the PNM
# image codec above. Compressed audio (mp3/flac/ogg) would slot in
# behind the same mapInPandas signature via an optional codec probe,
# exactly like JPEG/PNG behind PIL on the image side.
# ===========================================================================
def encode_wav(
    n_channels: int, sample_rate: int, samples: bytes, bits: int = 16
) -> bytes:
    """Minimal PCM WAV encoder (RIFF/WAVE, fmt + data chunks) —
    test-fixture builder. ``samples`` is the raw interleaved
    little-endian PCM byte buffer."""
    if bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM supported")
    block_align = n_channels * bits // 8
    fmt = (
        (1).to_bytes(2, "little")            # audio_format = PCM
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")  # byte rate
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(samples).to_bytes(4, "little") + samples
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _parse_wav_header(raw: bytes):
    """RIFF chunk walk: (n_channels, sample_rate, bits, data_offset,
    data_len). Pure bytes — tolerates extra chunks (LIST, fact, ...)
    in any order before/after fmt and data."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(raw) and (fmt is None or data is None):
        cid = raw[pos : pos + 4]
        clen = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            f = raw[pos + 8 : pos + 8 + clen]
            if len(f) < 16:
                raise ValueError("truncated fmt chunk")
            if int.from_bytes(f[0:2], "little") != 1:
                raise ValueError("only PCM (audio_format=1) supported")
            fmt = (
                int.from_bytes(f[2:4], "little"),   # channels
                int.from_bytes(f[4:8], "little"),   # sample rate
                int.from_bytes(f[14:16], "little"), # bits/sample
            )
        elif cid == b"data":
            data = (pos + 8, min(clen, len(raw) - pos - 8))
        pos += 8 + clen + (clen % 2)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n_channels, sample_rate, bits = fmt
    if bits not in (8, 16) or n_channels < 1:
        raise ValueError("only 8/16-bit PCM supported")
    return n_channels, sample_rate, bits, data[0], data[1]


#: real audio decode output: stream params + per-channel features.
#: ``energy`` is the RAW-domain sum of squared PCM samples (8-bit:
#: (b-128)², 16-bit: i16²) — an exact integer, so oracle comparisons
#: need no float tolerance (float RMS would differ from a serial SQL
#: sum in the last bits via numpy's pairwise summation).
AUDIO_FEATURE_SCHEMA = (
    "doc_id BIGINT, n_channels INT, sample_rate INT, n_samples BIGINT, "
    "duration_sec DOUBLE, rms ARRAY<FLOAT>, peak ARRAY<FLOAT>, "
    "zero_crossings ARRAY<INT>, energy ARRAY<BIGINT>"
)


def text_to_wav(
    binary_df: DataFrame, sample_rate: int = 8000
) -> DataFrame:
    """Wrap each opaque payload's bytes as 8-bit mono PCM WAV — the
    deterministic audio-fixture builder (bytes ARE the samples), so the
    REAL :func:`decode_audio` path is exercisable — and oracle-checkable
    in closed form — on any binary column."""

    def _wrap(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_wav(1, sample_rate, bytes(b), bits=8)
                        for b in pdf["payload"]
                    ],
                }
            )

    return binary_df.mapInPandas(_wrap, schema="doc_id BIGINT, payload BINARY")


def _wav_features(raw: bytes):
    """Decode one PCM WAV payload: (n_channels, sample_rate, n_frames,
    rms[], peak[], zero_crossings[], energy[]) — the shared numpy core of
    :func:`decode_audio` and the fused e13 arm."""
    import numpy as np

    nch, rate, bits, off, dlen = _parse_wav_header(raw)
    if bits == 16:
        raw_pcm = np.frombuffer(
            raw, dtype="<i2", count=dlen // 2, offset=off
        ).astype(np.int64)
        pcm = raw_pcm.astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned, midpoint 128
        raw_pcm = (
            np.frombuffer(raw, dtype=np.uint8, count=dlen, offset=off)
            .astype(np.int64) - 128
        )
        pcm = raw_pcm.astype(np.float64) / 128.0
    n_frames = pcm.size // nch
    frames = pcm[: n_frames * nch].reshape(n_frames, nch)
    raw_frames = raw_pcm[: n_frames * nch].reshape(n_frames, nch)
    if n_frames:
        rms = np.sqrt((frames ** 2).mean(axis=0)).astype(np.float32).tolist()
        peak = np.abs(frames).max(axis=0).astype(np.float32).tolist()
        zc = (
            (np.diff(np.signbit(frames), axis=0) != 0)
            .sum(axis=0).astype(np.int32).tolist()
        )
        energy = (raw_frames ** 2).sum(axis=0).tolist()
    else:
        rms, peak = [0.0] * nch, [0.0] * nch
        zc, energy = [0] * nch, [0] * nch
    return nch, rate, n_frames, rms, peak, zc, energy


def decode_audio(binary_df: DataFrame) -> DataFrame:
    """REAL audio decode + feature extraction over an opaque binary
    column: PCM WAV decodes with numpy (8-bit unsigned / 16-bit signed,
    interleaved channels de-multiplexed via reshape). Output per
    payload: stream parameters plus per-channel RMS, peak and
    zero-crossing counts on samples normalized to [-1, 1] — the
    Arrow-batched shape a wav2vec-style embedding stage would consume,
    with real samples."""

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_channels": [], "sample_rate": [],
                "n_samples": [], "duration_sec": [], "rms": [],
                "peak": [], "zero_crossings": [], "energy": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                nch, rate, n_frames, rms, peak, zc, energy = _wav_features(
                    bytes(b)
                )
                rows["doc_id"].append(int(doc_id))
                rows["n_channels"].append(nch)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n_frames)
                rows["duration_sec"].append(n_frames / rate if rate else 0.0)
                rows["rms"].append(rms)
                rows["peak"].append(peak)
                rows["zero_crossings"].append(zc)
                rows["energy"].append(energy)
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(_decode, schema=AUDIO_FEATURE_SCHEMA)


#: fused audio+image arm for per-doc grading: exact-integer audio
#: features (mono) + header-recovered image dimensions
AUDIO_IMAGE_SCHEMA = (
    "doc_id BIGINT, audio_n_samples BIGINT, audio_peak INT, audio_zc INT, "
    "audio_energy BIGINT, img_format STRING, img_width INT, "
    "img_height INT, img_channels INT"
)


def payload_audio_image_features(binary_df: DataFrame) -> DataFrame:
    """The e13 audio+image arms in ONE Arrow-batched walk: each payload's
    bytes wrap as 8-bit mono PCM and run the REAL WAV decode
    (:func:`_wav_features` — RIFF walk + numpy sample math), then derive
    a JPEG shell whose dimensions the REAL SOF marker walker
    (:func:`image_dimensions`) must recover. Same codec code as the
    standalone stages; one Python crossing and one join instead of two
    of each (PERF.md §8's fusion rule at the Python boundary)."""

    def _walk(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "audio_n_samples": [], "audio_peak": [],
                "audio_zc": [], "audio_energy": [], "img_format": [],
                "img_width": [], "img_height": [], "img_channels": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                _media_row(rows, int(doc_id), bytes(b))
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(_walk, schema=AUDIO_IMAGE_SCHEMA)


def _media_row(rows: dict, doc_id: int, raw: bytes) -> None:
    """Append one payload's audio+image feature row (shared by the
    fused arms): REAL WAV decode of the bytes-as-samples wrap, REAL SOF
    walk of the byte-length-determined JPEG shell."""
    _, _, n_frames, _, peak, zc, energy = _wav_features(
        encode_wav(1, 8000, raw, bits=8)
    )
    n = len(raw)
    fmt, w, h, c = image_dimensions(
        encode_jpeg_shell(min(max(n, 1), 65535), n % 240 + 1, n % 3 + 1)
    )
    rows["doc_id"].append(doc_id)
    rows["audio_n_samples"].append(n_frames)
    rows["audio_peak"].append(int(round(peak[0] * 128)))
    rows["audio_zc"].append(int(zc[0]))
    rows["audio_energy"].append(int(energy[0]))
    rows["img_format"].append(fmt)
    rows["img_width"].append(w)
    rows["img_height"].append(h)
    rows["img_channels"].append(c)


#: everything e13 grades, ONE walk: metadata + stub features + audio + image
ALL_FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, head_checksum INT, kind STRING, "
    "feature ARRAY<FLOAT>, "
    "audio_n_samples BIGINT, audio_peak INT, audio_zc INT, "
    "audio_energy BIGINT, img_format STRING, img_width INT, "
    "img_height INT, img_channels INT"
)


def payload_all_features(
    binary_df: DataFrame, n_features: int = 8
) -> DataFrame:
    """Metadata, stub features, REAL audio decode, and REAL image header
    walk in ONE Arrow-batched pass — zero joins. At corpus scale the
    alternative (separate walks joined on doc_id) shuffles the whole
    corpus once per extra arm; here each payload's bytes cross the
    Python boundary once and no Exchange exists at all. The standalone
    stages stay public and are pinned equivalent in the unit suite."""

    def _walk(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_bytes": [], "head_checksum": [],
                "kind": [], "feature": [], "audio_n_samples": [],
                "audio_peak": [], "audio_zc": [], "audio_energy": [],
                "img_format": [], "img_width": [], "img_height": [],
                "img_channels": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                _media_row(rows, int(doc_id), raw)
                rows["n_bytes"].append(len(raw))
                rows["head_checksum"].append(sum(raw[:4]))
                rows["kind"].append(
                    "low" if raw[:1] and raw[:1] <= b"m" else "high"
                )
                rows["feature"].append(
                    [
                        float(sum(raw[j::n_features]) % 997)
                        for j in range(n_features)
                    ]
                )
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(_walk, schema=ALL_FEATURE_SCHEMA)
