"""Minimal vendored BIFF8 (.xls) string-grid reader — no xlrd.

Legacy Excel 97-2003 workbooks are two nested public formats:

* an **OLE2 / Compound File Binary** container (MS-CFB): 512-byte
  sectors, a FAT chaining them, a directory of streams, and a
  "mini stream" (64-byte minisectors with their own miniFAT) holding
  streams smaller than 4096 bytes;
* the **BIFF8 record stream** (MS-XLS) inside the ``Workbook``
  directory entry: ``[u16 record id][u16 length][payload]`` records —
  a globals substream (SST shared strings, BOUNDSHEET sheet offsets)
  followed by one substream per sheet (LABELSST / NUMBER / RK / MULRK
  / BLANK / MULBLANK / BOOLERR / FORMULA cell records).

This module implements exactly enough of both to satisfy the
reference's parse contract (``/root/reference/app/services/
file_parser.py:53-61`` via pandas+xlrd, pinned by
``tests/test_file_parser.py:90-125``): the first worksheet as a
rectangular all-string grid, blanks as ``""``, never null.

Scope is deliberate: BIFF8 only (BOF version 0x0600 — Excel 97+, the
format every "legacy CMS .xls" download actually uses); earlier BIFF
versions and encrypted (FILEPASS) workbooks raise a loud ValueError.
Rich-text runs, phonetic data and CONTINUE-spanning strings are
handled; formatting, formulas' expressions, charts etc. are ignored —
only cached/stored cell VALUES matter for ingestion.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_MAX_CHAIN = 1 << 22  # cycle guard: no real upload has 4M sectors


def _sector(data: bytes, n: int, size: int) -> bytes:
    off = 512 + n * size
    return data[off : off + size]


def _read_chain(data: bytes, fat: list[int], start: int, size: int) -> bytes:
    out = bytearray()
    s, hops = start, 0
    while s != _ENDOFCHAIN and s != _FREESECT:
        if s >= len(fat) or hops > _MAX_CHAIN:
            raise ValueError("corrupt CFB: broken sector chain")
        out += _sector(data, s, size)
        s = fat[s]
        hops += 1
    return bytes(out)


def extract_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Pull the first directory stream whose name is in ``names`` out
    of a CFB container (regular and mini-stream storage both handled)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/.xls file (bad CFB signature)")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    (mini_shift,) = struct.unpack_from("<H", data, 32)
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (mini_cutoff,) = struct.unpack_from("<I", data, 56)
    (first_minifat,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (first_difat,) = struct.unpack_from("<I", data, 68)
    (n_difat,) = struct.unpack_from("<I", data, 72)
    sec_size = 1 << sector_shift
    mini_size = 1 << mini_shift

    # FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    fat_sectors = [
        s
        for (s,) in struct.iter_unpack("<I", data[76 : 76 + 109 * 4])
        if s not in (_FREESECT, _ENDOFCHAIN)
    ]
    d, hops = first_difat, 0
    while d not in (_ENDOFCHAIN, _FREESECT) and hops < n_difat + 1:
        sec = _sector(data, d, sec_size)
        entries = list(struct.unpack(f"<{sec_size // 4}I", sec))
        fat_sectors += [s for s in entries[:-1] if s not in (_FREESECT, _ENDOFCHAIN)]
        d = entries[-1]
        hops += 1
    del n_fat  # implied by the DIFAT walk

    fat: list[int] = []
    for s in fat_sectors:
        fat += struct.unpack(f"<{sec_size // 4}I", _sector(data, s, sec_size))

    directory = _read_chain(data, fat, first_dir, sec_size)
    root_start = root_size = None
    target = None
    for off in range(0, len(directory) - 127, 128):
        name_len = struct.unpack_from("<H", directory, off + 64)[0]
        if name_len < 2:
            continue
        name = directory[off : off + name_len - 2].decode("utf-16-le", "replace")
        obj_type = directory[off + 66]
        start = struct.unpack_from("<I", directory, off + 116)[0]
        size = struct.unpack_from("<Q", directory, off + 120)[0]
        if obj_type == 5:  # root: owns the mini stream
            root_start, root_size = start, size
        elif obj_type == 2 and name in names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"CFB container has no stream named any of {names}")
    start, size = target

    if size >= mini_cutoff:
        return _read_chain(data, fat, start, sec_size)[:size]
    # mini-stream path: the root entry's chain holds the mini stream;
    # the miniFAT chains 64-byte minisectors inside it
    if root_start is None:
        raise ValueError("corrupt CFB: mini stream without root entry")
    mini_stream = _read_chain(data, fat, root_start, sec_size)[:root_size]
    minifat: list[int] = []
    if n_minifat:
        raw = _read_chain(data, fat, first_minifat, sec_size)
        minifat = [s for (s,) in struct.iter_unpack("<I", raw)]
    out = bytearray()
    s, hops = start, 0
    while s not in (_ENDOFCHAIN, _FREESECT):
        if s >= len(minifat) or hops > _MAX_CHAIN:
            raise ValueError("corrupt CFB: broken minisector chain")
        out += mini_stream[s * mini_size : (s + 1) * mini_size]
        s = minifat[s]
        hops += 1
    return bytes(out[:size])


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BLANK = 0x0201
_MULBLANK = 0x00BE
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_BOUNDSHEET = 0x0085
_FILEPASS = 0x002F


def _records(stream: bytes):
    """Yield (record_id, offset_of_payload, payload) triples."""
    off = 0
    n = len(stream)
    while off + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, off)
        yield rid, off + 4, stream[off + 4 : off + 4 + ln]
        off += 4 + ln


class _SSTReader:
    """XLUnicodeRichExtendedString list that may span CONTINUE records.

    The subtlety of the format: when a string's character data is split
    across a CONTINUE boundary, the continuation re-states its own
    "compressed or UTF-16" flag byte — the two halves may use different
    widths. Modeled as a cursor over (payload, position) fragments.
    """

    def __init__(self, fragments: list[bytes]):
        self.frags = fragments
        self.fi = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.frags[self.fi]) - self.pos

    def _advance_frag(self) -> None:
        self.fi += 1
        self.pos = 0
        if self.fi >= len(self.frags):
            raise ValueError("corrupt SST: ran out of CONTINUE data")

    def take(self, n: int) -> bytes:
        """n raw bytes, never splitting across a fragment silently."""
        out = bytearray()
        while n:
            if self._remaining() == 0:
                self._advance_frag()
            chunk = self.frags[self.fi][self.pos : self.pos + n]
            out += chunk
            self.pos += len(chunk)
            n -= len(chunk)
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        flags = self.take(1)[0]
        c_run = struct.unpack("<H", self.take(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<I", self.take(4))[0] if flags & 0x04 else 0
        wide = flags & 0x01
        chars: list[str] = []
        remaining = cch
        while remaining:
            if self._remaining() == 0:
                self._advance_frag()
                # a continuation restarts with its own width flag byte
                wide = self.take(1)[0] & 0x01
            avail = self._remaining() // (2 if wide else 1)
            n = min(remaining, avail)
            if n == 0:
                raise ValueError("corrupt SST: empty continuation")
            raw = self.take(n * (2 if wide else 1))
            chars.append(
                raw.decode("utf-16-le") if wide else raw.decode("latin-1")
            )
            remaining -= n
        self.take(4 * c_run)  # rich-text runs: formatting only, skip
        self.take(cb_ext)  # phonetic/ext data: skip
        return "".join(chars)


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    (_total, unique) = struct.unpack_from("<II", payload, 0)
    rd = _SSTReader([payload[8:], *continues])
    return [rd.read_string() for _ in range(unique)]


def _decode_rk(rk: int) -> float:
    div100 = rk & 0x01
    as_int = rk & 0x02
    if as_int:
        # rk arrives as a SIGNED i32; Python's >> is arithmetic, so this
        # is exactly the stored 30-bit signed integer
        v = float(rk >> 2)
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if div100 else v


def _num_to_str(v: float) -> str:
    """Render a stored double the way the xlsx raw text would appear:
    integral values without a trailing '.0'."""
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def _biff8_unicode_inline(payload: bytes, off: int) -> str:
    """Inline XLUnicodeString (LABEL records): u16 cch + flags + chars."""
    cch, flags = struct.unpack_from("<HB", payload, off)
    off += 3
    if flags & 0x08:
        off += 2
    if flags & 0x04:
        off += 4
    if flags & 0x01:
        return payload[off : off + 2 * cch].decode("utf-16-le")
    return payload[off : off + cch].decode("latin-1")


def parse_xls_grid(data: bytes) -> list[list[str]]:
    """.xls bytes → first worksheet as a rectangular all-string grid
    (the reference contract: positional cells, blanks ``""``)."""
    stream = extract_stream(data, ("Workbook", "Book"))

    recs = list(_records(stream))
    if not recs or recs[0][0] != _BOF:
        raise ValueError("not a BIFF workbook stream (missing BOF)")
    version = struct.unpack_from("<H", recs[0][2], 0)[0] if len(recs[0][2]) >= 2 else 0
    if version != 0x0600:
        raise ValueError(
            f"unsupported BIFF version 0x{version:04x}: only BIFF8 "
            "(Excel 97-2003) .xls files are supported"
        )

    sst: list[str] = []
    first_sheet_off: int | None = None
    for i, (rid, off, payload) in enumerate(recs):
        if rid == _FILEPASS:
            raise ValueError("encrypted .xls workbooks are not supported")
        if rid == _SST:
            conts = []
            for rid2, _o2, p2 in recs[i + 1 :]:
                if rid2 != _CONTINUE:
                    break
                conts.append(p2)
            sst = _parse_sst(payload, conts)
        elif rid == _BOUNDSHEET and first_sheet_off is None:
            first_sheet_off = struct.unpack_from("<I", payload, 0)[0]
        elif rid == _EOF:
            break  # end of globals substream

    if first_sheet_off is None:
        raise ValueError("BIFF workbook has no BOUNDSHEET (no sheets)")

    cells: dict[tuple[int, int], str] = {}
    pending_formula_cell: tuple[int, int] | None = None
    for rid, _off, payload in _records(stream[first_sheet_off:]):
        if rid == _EOF:
            break
        if rid == _LABELSST:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", payload, 0)
            cells[(rw, col)] = sst[isst] if isst < len(sst) else ""
        elif rid == _LABEL:
            rw, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            cells[(rw, col)] = _biff8_unicode_inline(payload, 6)
        elif rid == _NUMBER:
            rw, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            (v,) = struct.unpack_from("<d", payload, 6)
            cells[(rw, col)] = _num_to_str(v)
        elif rid == _RK:
            rw, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            (rk,) = struct.unpack_from("<i", payload, 6)
            cells[(rw, col)] = _num_to_str(_decode_rk(rk))
        elif rid == _MULRK:
            rw, col_first = struct.unpack_from("<HH", payload, 0)
            n = (len(payload) - 6) // 6
            for j in range(n):
                (rk,) = struct.unpack_from("<i", payload, 4 + j * 6 + 2)
                cells[(rw, col_first + j)] = _num_to_str(_decode_rk(rk))
        elif rid in (_BLANK,):
            rw, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            cells[(rw, col)] = ""
        elif rid == _MULBLANK:
            rw, col_first = struct.unpack_from("<HH", payload, 0)
            n = (len(payload) - 6) // 2
            for j in range(n):
                cells[(rw, col_first + j)] = ""
        elif rid == _BOOLERR:
            rw, col, _ixfe, val, is_err = struct.unpack_from("<HHHBB", payload, 0)
            cells[(rw, col)] = "" if is_err else ("TRUE" if val else "FALSE")
        elif rid == _FORMULA:
            rw, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            result = payload[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # cached string: value arrives in STRING
                    pending_formula_cell = (rw, col)
                    cells[(rw, col)] = ""
                elif kind == 1:
                    cells[(rw, col)] = "TRUE" if result[2] else "FALSE"
                elif kind == 3:
                    cells[(rw, col)] = ""
                else:  # error
                    cells[(rw, col)] = ""
            else:
                (v,) = struct.unpack("<d", result)
                cells[(rw, col)] = _num_to_str(v)
        elif rid == _STRING and pending_formula_cell is not None:
            cells[pending_formula_cell] = _biff8_unicode_inline(payload, 0)
            pending_formula_cell = None

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [
        [cells.get((r, c), "") for c in range(n_cols)] for r in range(n_rows)
    ]
