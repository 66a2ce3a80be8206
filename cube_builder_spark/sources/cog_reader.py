"""S5 (remote half) — ranged Cloud-Optimized-GeoTIFF reader, stdlib
only.

Reference: GDAL ``/vsicurl`` access with ``GDAL_DISABLE_READDIR_ON_OPEN``
and HTTP range reads (``config.py:85-88``,
``drivers/datasets/__init__.py:78-83``): open a remote COG, read its
header/IFDs cheaply, then fetch only the tile byte-ranges a requested
window intersects. This module reproduces that access pattern with
``urllib`` + the repo's own GeoTIFF codec (sinks/cog.py) — no GDAL.

Layout contract (what makes the range pattern work, and what
``write_cog_band`` produces): IFDs lead the file, tile data trails,
overviews' data precede full-res data — so header + overview reads
touch only the file's head.

Executor use: the fetcher is plain Python/urllib, so a pandas-UDF
reader can window remote COGs per task exactly like the reference's
one-Celery-task-per-asset rasterio reads, with bounded bytes per task.
"""

from __future__ import annotations

import struct
import urllib.request
import zlib

import numpy as np

_BLOCK = 16 * 1024


class BytesFetcher:
    """RangeFetcher interface over an in-memory buffer — lets
    CogReader parse archive-member bytes (e.g. a BigTIFF inside a
    zip/tar) without spooling to disk."""

    def __init__(self, data: bytes):
        self._d = data
        self.bytes_fetched = 0
        self.n_requests = 0

    def size(self) -> int:
        return len(self._d)

    def get(self, start: int, length: int) -> bytes:
        self.n_requests += 1
        self.bytes_fetched += length
        return self._d[start:start + length]


class RangeFetcher:
    """Byte-range access over file paths, file:// and http(s):// URIs
    with a block cache (16 KB blocks, contiguous misses coalesced into
    one request). ``bytes_fetched``/``n_requests`` expose the I/O
    actually performed so tests can assert windows don't read the whole
    file."""

    def __init__(self, uri: str, block: int = _BLOCK):
        self.uri = uri
        self.block = block
        self._remote = uri.startswith(("http://", "https://"))
        self._path = uri.removeprefix("file://") if not self._remote else None
        self._blocks: dict[int, bytes] = {}
        self._full: bytes | None = None      # server ignored Range
        self._size: int | None = None
        self.bytes_fetched = 0
        self.n_requests = 0

    def size(self) -> int:
        """Total object size. Local: one stat. Remote: a 1-byte range
        probe whose Content-Range carries the total — and if the
        server ignores Range (200), the full body is kept so no
        further requests happen (same fallback as ``get``)."""
        if self._size is not None:
            return self._size
        if self._full is not None:
            self._size = len(self._full)
        elif not self._remote:
            import os
            self._size = os.path.getsize(self._path)
        else:
            req = urllib.request.Request(self.uri,
                                         headers={"Range": "bytes=0-0"})
            self.n_requests += 1
            with urllib.request.urlopen(req) as resp:
                body = resp.read()
                self.bytes_fetched += len(body)
                if resp.status == 206:
                    self._size = int(
                        resp.headers["Content-Range"].rsplit("/", 1)[1])
                else:
                    self._full = body
                    self._size = len(body)
        return self._size

    def _fetch_raw(self, start: int, length: int) -> bytes:
        self.n_requests += 1
        if not self._remote:
            with open(self._path, "rb") as f:
                f.seek(start)
                data = f.read(length)
            self.bytes_fetched += len(data)
            return data
        req = urllib.request.Request(
            self.uri, headers={"Range": f"bytes={start}-{start + length - 1}"})
        with urllib.request.urlopen(req) as resp:
            body = resp.read()
            self.bytes_fetched += len(body)
            if resp.status == 206:
                return body
            # 200: server ignored Range and sent the whole file — keep
            # it so no further requests are needed
            self._full = body
            return body[start:start + length]

    def get(self, start: int, length: int) -> bytes:
        if length <= 0:
            return b""
        # bound every range against the object size: a corrupt offset
        # must raise cleanly, not OSError a local seek or drive an
        # unbounded remote fetch (fuzz-found, round 8). Short tails
        # (start+length past EOF) clamp — the parse layer detects the
        # short read; a start AT/past EOF can never be a valid range.
        # Local stat is free; a remote size is only used once known
        # (206 Content-Range / 200 full body) so no extra probe request
        # is spent on the happy path.
        if (not self._remote or self._size is not None
                or self._full is not None):
            total = self.size()
            if start < 0 or start >= total:
                raise ValueError(
                    f"range start {start} outside object of {total} bytes")
            length = min(length, total - start)
        elif start < 0:
            raise ValueError(f"negative range start {start}")
        if self._full is not None:
            return self._full[start:start + length]
        blk = self.block
        b0, b1 = start // blk, (start + length - 1) // blk
        missing = [b for b in range(b0, b1 + 1) if b not in self._blocks]
        # coalesce contiguous missing blocks into single range requests
        i = 0
        while i < len(missing):
            j = i
            while j + 1 < len(missing) and missing[j + 1] == missing[j] + 1:
                j += 1
            lo, hi = missing[i], missing[j]
            data = self._fetch_raw(lo * blk, (hi - lo + 1) * blk)
            if self._full is not None:
                return self._full[start:start + length]
            for b in range(lo, hi + 1):
                off = (b - lo) * blk
                self._blocks[b] = data[off:off + blk]
            i = j + 1
        out = b"".join(self._blocks[b] for b in range(b0, b1 + 1))
        skip = start - b0 * blk
        return out[skip:skip + length]


class CogReader:
    """Lazy COG: parses the IFD chain from ranged reads at open; tile
    payloads are fetched only when a window asks for them."""

    def __init__(self, uri: str, fetcher: RangeFetcher | None = None):
        self.fetcher = fetcher or RangeFetcher(uri)
        get = self.fetcher.get
        self.levels: list[dict] = []
        self.geo: dict = {}
        # corrupt-input posture (differential-fuzz hardened, round 8):
        # every malformed header/IFD must surface as a clean ValueError
        # — never a hang (IFD cycle), a multi-GB fetch (bogus count),
        # an OSError'd seek (bogus offset), or a silent wrong array.
        # struct/KeyError/unicode failures from flipped bytes are
        # normalized below.
        try:
            self._parse_header(uri, get)
        except (struct.error, KeyError, UnicodeDecodeError,
                OverflowError, MemoryError) as e:
            raise ValueError(f"corrupt TIFF structure: {e!r}") from e
        if not self.levels:
            raise ValueError("corrupt TIFF: empty IFD chain")

    def _parse_header(self, uri: str, get):
        magic = get(0, 4)
        if magic == b"II\x2a\x00":                 # classic TIFF (42)
            big = False
            (ifd_off,) = struct.unpack("<I", get(4, 4))
        elif magic == b"II\x2b\x00":               # BigTIFF (43)
            # >4 GiB rasters: 8-byte offsets/counts, 20-byte IFD
            # entries — the format a 100 TB mosaic level actually
            # ships in (the ZIP64 of the TIFF world)
            big = True
            osize, pad = struct.unpack("<HH", get(4, 4))
            if osize != 8 or pad != 0:
                raise ValueError(
                    f"unsupported BigTIFF offset size {osize}: {uri!r}")
            (ifd_off,) = struct.unpack("<Q", get(8, 8))
        else:
            raise ValueError(f"not a little-endian TIFF: {uri!r}")
        self.bigtiff = big
        # structural widths: (count-field, entry, entry-fmt, inline,
        # offset-fmt)
        n_len, e_len, e_fmt, inline, off_fmt = (
            (8, 20, "<HHQ8s", 8, "<Q") if big else
            (2, 12, "<HHI4s", 4, "<I"))
        self._parse_ifds(get, ifd_off, big, n_len, e_len, e_fmt,
                         inline, off_fmt, set())

    def _parse_ifds(self, get, ifd_off, big, n_len, e_len, e_fmt,
                    inline, off_fmt, seen_offsets):
        first = True
        while ifd_off:
            if ifd_off in seen_offsets or len(seen_offsets) > 64:
                # a cycle (or absurd chain length) in the next-IFD
                # pointers would loop forever on corrupt input
                raise ValueError(
                    f"corrupt IFD chain: cycle or >64 IFDs at {ifd_off}")
            seen_offsets.add(ifd_off)
            (n,) = struct.unpack(
                "<Q" if big else "<H", get(ifd_off, n_len))
            # classic TIFF bounds n at 65535 by its 16-bit count field;
            # BigTIFF's 64-bit count would let a corrupt/truncated file
            # drive a multi-GB ranged fetch here. No real IFD carries
            # more than a few dozen tags — cap at the classic limit.
            if n > 0xFFFF:
                raise ValueError(
                    f"corrupt IFD at {ifd_off}: implausible entry "
                    f"count {n}")
            raw_entries = get(ifd_off + n_len, n * e_len)
            tags = {}
            for i in range(n):
                t, code, count, raw = struct.unpack_from(
                    e_fmt, raw_entries, i * e_len)
                tags[t] = (code, count, raw)

            def val(t, tags=tags, get=get):
                if t not in tags:
                    raise ValueError(f"corrupt TIFF: missing tag {t}")
                code, count, raw = tags[t]
                esize = {2: 1, 3: 2, 4: 4, 12: 8, 16: 8, 17: 8}[code]
                fmt = {3: "H", 4: "I", 12: "d", 16: "Q", 17: "q"}.get(code)
                size = esize * count
                # a corrupt count field must not drive an unbounded
                # fetch/allocation — no tag payload can exceed the file
                if size > self.fetcher.size():
                    raise ValueError(
                        f"corrupt TIFF: tag {t} payload {size}B exceeds "
                        f"file size")
                if size <= inline:
                    if code == 2:
                        return raw[:size].rstrip(b"\x00").decode()
                    vals = struct.unpack_from(f"<{count}{fmt}", raw)
                else:
                    (off,) = struct.unpack_from(off_fmt, raw)
                    payload = get(off, size)
                    if code == 2:
                        return payload.rstrip(b"\x00").decode()
                    vals = struct.unpack(f"<{count}{fmt}", payload)
                return vals[0] if count == 1 else vals

            w, h, tile = val(256), val(257), val(322)
            offs, cnts = val(324), val(325)
            if isinstance(offs, int):
                offs, cnts = (offs,), (cnts,)
            self.levels.append({
                "width": w, "height": h, "tile": tile,
                "offsets": tuple(offs), "counts": tuple(cnts),
                "subfile_type": val(254) if 254 in tags else 0})
            if first:
                scale, tie = val(33550), val(33922)
                self.geo = {"pixel_size": (scale[0], scale[1]),
                            "origin": (tie[3], tie[4]),
                            "nodata": (int(val(42113))
                                       if 42113 in tags else None)}
                first = False
            (ifd_off,) = struct.unpack(
                "<Q" if big else "<I",
                get(ifd_off + n_len + n * e_len, n_len if big else 4))

    def read_window(self, row0: int, col0: int, height: int, width: int,
                    level: int = 0) -> np.ndarray:
        """Decode exactly the tiles intersecting the window at the given
        pyramid level; bytes fetched ≈ the window's compressed tiles."""
        lv = self.levels[level]
        tile, w, h = lv["tile"], lv["width"], lv["height"]
        row1 = min(row0 + height, h)
        col1 = min(col0 + width, w)
        if row0 < 0 or col0 < 0 or row0 >= h or col0 >= w:
            raise IndexError(f"window ({row0},{col0})+({height},{width}) "
                             f"outside level {level} shape ({h},{w})")
        tx = (w + tile - 1) // tile
        out = np.zeros((row1 - row0, col1 - col0), "<i2")
        for tr in range(row0 // tile, (row1 - 1) // tile + 1):
            for tc in range(col0 // tile, (col1 - 1) // tile + 1):
                i = tr * tx + tc
                if i >= len(lv["offsets"]) or i >= len(lv["counts"]):
                    raise ValueError(
                        f"corrupt TIFF: tile index {i} beyond offsets "
                        f"array (level {level})")
                payload = self.fetcher.get(lv["offsets"][i], lv["counts"][i])
                try:
                    block = np.frombuffer(zlib.decompress(payload),
                                          "<i2").reshape(tile, tile)
                except (zlib.error, ValueError) as e:
                    # truncated/undersized tile payload: clean error,
                    # never a partially-wrong array
                    raise ValueError(
                        f"corrupt tile payload at index {i} "
                        f"(level {level}): {e}") from e
                # intersection of this tile with the window
                r_lo = max(row0, tr * tile)
                r_hi = min(row1, (tr + 1) * tile)
                c_lo = max(col0, tc * tile)
                c_hi = min(col1, (tc + 1) * tile)
                out[r_lo - row0:r_hi - row0, c_lo - col0:c_hi - col0] = \
                    block[r_lo - tr * tile:r_hi - tr * tile,
                          c_lo - tc * tile:c_hi - tc * tile]
        return out


def read_cog_window(uri: str, row0: int, col0: int, height: int, width: int,
                    level: int = 0) -> np.ndarray:
    """One-shot convenience: open + window in a single fetcher."""
    return CogReader(uri).read_window(row0, col0, height, width, level)
