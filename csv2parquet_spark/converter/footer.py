"""Post-write parquet footer surgery: set ``FileMetaData.created_by``.

Closes W10 (reference ``--created-by``, `/root/reference/src/main.rs:98`
and `:240-241` — arrow-rs ``WriterProperties::set_created_by``).
parquet-mr hardcodes its own build string and exposes no writer
property for it, but the field lives entirely in the file FOOTER — the
last region of a parquet file (``[data pages][column/offset indexes]
[FileMetaData thrift][4-byte LE length]["PAR1"]``). Every byte offset
recorded inside FileMetaData (data page offsets, column/offset index
offsets, bloom filter offsets) points BEFORE the footer, so replacing
the footer in place moves nothing it references: parse the trailing
thrift-compact ``FileMetaData`` struct, splice field 6 (``created_by``,
BINARY), rewrite the tail. O(footer bytes), independent of data size —
the right shape for 100 TB outputs where a footer is KBs per file.

The thrift compact-protocol walker below implements only what skipping
an arbitrary struct requires (varints, zigzag field ids, container
headers); it copies all other fields byte-for-byte, so unknown/future
footer fields survive untouched.
"""

from __future__ import annotations

import os
import struct

_MAGIC = b"PAR1"
_MAGIC_ENCRYPTED = b"PARE"

# thrift compact-protocol type ids
_STOP = 0
_TRUE = 1
_FALSE = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12

_CREATED_BY_FIELD_ID = 6  # parquet.thrift FileMetaData field 6: created_by


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Walker:
    """Cursor over a thrift compact buffer; skip() is exact, not lenient —
    a malformed footer raises rather than silently corrupting."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        result = shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def skip_value(self, ttype: int, in_container: bool) -> None:
        if ttype in (_TRUE, _FALSE):
            # struct-field bools encode the value in the type nibble
            # (no payload); container-element bools are one byte.
            if in_container:
                self.pos += 1
        elif ttype == _BYTE:
            self.pos += 1
        elif ttype in (_I16, _I32, _I64):
            self.varint()
        elif ttype == _DOUBLE:
            self.pos += 8
        elif ttype == _BINARY:
            # NOT `self.pos += self.varint()`: augmented assignment loads
            # the old pos BEFORE varint() advances it, silently dropping
            # the length bytes from the skip.
            n = self.varint()
            self.pos += n
        elif ttype in (_LIST, _SET):
            head = self.byte()
            size, elem = head >> 4, head & 0x0F
            if size == 15:
                size = self.varint()
            for _ in range(size):
                self.skip_value(elem, in_container=True)
        elif ttype == _MAP:
            size = self.varint()
            if size:
                kv = self.byte()
                kt, vt = kv >> 4, kv & 0x0F
                for _ in range(size):
                    self.skip_value(kt, in_container=True)
                    self.skip_value(vt, in_container=True)
        elif ttype == _STRUCT:
            self.skip_struct()
        else:
            raise ValueError(f"unknown thrift compact type {ttype}")

    def skip_struct(self) -> None:
        last_fid = 0
        while True:
            head = self.byte()
            if head == _STOP:
                return
            delta, ttype = head >> 4, head & 0x0F
            if delta == 0:
                last_fid = _zigzag_decode(self.varint())
            else:
                last_fid += delta
            self.skip_value(ttype, in_container=False)


def _field_header(prev_fid: int, fid: int, ttype: int) -> bytes:
    delta = fid - prev_fid
    if 1 <= delta <= 15:
        return bytes([(delta << 4) | ttype])
    return bytes([ttype]) + _varint(_zigzag_encode(fid))


def _assert_no_more_created_by(w: "_Walker", last_fid: int) -> None:
    """Walk the remaining top-level fields and raise on another field 6.

    parquet-mr/arrow-rs serialize FileMetaData fields in ascending id
    order, so once the splice point is passed a second field 6 should
    be impossible — but a pathological writer emitting ids out of order
    via long-form headers could smuggle one past the insertion branch
    (ADVICE r8). Keep the splice loud rather than emit a duplicate
    field the sanity re-parse would not detect.
    """
    while True:
        head = w.byte()
        if head == _STOP:
            return
        delta, ttype = head >> 4, head & 0x0F
        if delta == 0:
            last_fid = _zigzag_decode(w.varint())
        else:
            last_fid += delta
        if last_fid == _CREATED_BY_FIELD_ID:
            raise ValueError(
                "FileMetaData serializes field 6 (created_by) out of "
                "ascending field-id order; refusing to splice a duplicate"
            )
        w.skip_value(ttype, in_container=False)


def _splice_created_by(footer: bytes, value: bytes) -> bytes:
    """Return a new FileMetaData buffer with field 6 set to ``value``.

    Replaces the field when present (parquet-mr always writes it);
    inserts it in field-id order otherwise, re-encoding the one
    following field header whose delta changes. Either way the walk
    continues past the splice point so an out-of-order duplicate
    field 6 raises instead of surviving silently.
    """
    w = _Walker(footer)
    last_fid = 0
    new_value = _varint(len(value)) + value
    while True:
        header_pos = w.pos
        head = w.byte()
        if head == _STOP:
            # struct ended without field 6: append before STOP
            return (
                footer[:header_pos]
                + _field_header(last_fid, _CREATED_BY_FIELD_ID, _BINARY)
                + new_value
                + footer[header_pos:]
            )
        delta, ttype = head >> 4, head & 0x0F
        if delta == 0:
            fid = _zigzag_decode(w.varint())
        else:
            fid = last_fid + delta
        if fid == _CREATED_BY_FIELD_ID:
            if ttype != _BINARY:
                raise ValueError(
                    f"FileMetaData field 6 has type {ttype}, expected BINARY"
                )
            value_pos = w.pos
            w.skip_value(ttype, in_container=False)
            end_pos = w.pos
            _assert_no_more_created_by(w, fid)
            return footer[:value_pos] + new_value + footer[end_pos:]
        if fid > _CREATED_BY_FIELD_ID:
            # insert before this field, re-encoding its header: the
            # delta is now relative to field 6 (w.pos sits at the start
            # of this field's VALUE — only the header is replaced).
            value_pos = w.pos
            w.skip_value(ttype, in_container=False)
            _assert_no_more_created_by(w, fid)
            return (
                footer[:header_pos]
                + _field_header(last_fid, _CREATED_BY_FIELD_ID, _BINARY)
                + new_value
                + _field_header(_CREATED_BY_FIELD_ID, fid, ttype)
                + footer[value_pos:]
            )
        last_fid = fid
        w.skip_value(ttype, in_container=False)


def patch_created_by(path: str, created_by: str) -> None:
    """Rewrite ``path``'s footer so ``FileMetaData.created_by`` equals
    ``created_by``. In-place, metadata-only: data pages and index
    structures are not read or moved."""
    size = os.path.getsize(path)
    if size < 12:
        raise ValueError(f"not a parquet file (too small): {path}")
    with open(path, "rb") as f:
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] == _MAGIC_ENCRYPTED:
            raise ValueError(f"encrypted parquet footer not supported: {path}")
        if tail[4:] != _MAGIC:
            raise ValueError(f"missing parquet magic in {path}")
        footer_len = struct.unpack("<I", tail[:4])[0]
        if footer_len > size - 8:
            raise ValueError(f"corrupt footer length {footer_len} in {path}")
        f.seek(size - 8 - footer_len)
        footer = f.read(footer_len)
    new_footer = _splice_created_by(footer, created_by.encode("utf-8"))
    # sanity: the spliced struct must still parse to exactly its length
    check = _Walker(new_footer)
    check.skip_struct()
    if check.pos != len(new_footer):
        raise ValueError("footer splice produced a malformed FileMetaData")
    with open(path, "r+b") as f:
        f.seek(size - 8 - footer_len)
        f.write(new_footer)
        f.write(struct.pack("<I", len(new_footer)))
        f.write(_MAGIC)
        f.truncate()
