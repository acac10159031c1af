"""Property-based tests (hypothesis) for the parquet footer splicer
(converter/footer.py) — the round-8 W10 closure is raw thrift
compact-protocol byte surgery, so it gets an independent encoder here:
random FileMetaData-shaped structs are built by a test-side encoder
written from the spec (not by the code under test), spliced, then
decoded field-by-field and compared against the model.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from csv2parquet_spark.converter import footer as fm

# ---------------------------------------------------------------------------
# Independent thrift-compact encoder (test-side model)
# ---------------------------------------------------------------------------


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


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _encode_value(v) -> tuple[int, bytes]:
    """value -> (compact type id, payload bytes); bools are handled at
    the field level (value lives in the type nibble)."""
    if isinstance(v, bool):
        return (1 if v else 2), b""
    if isinstance(v, int):
        return 6, _varint(_zigzag(v))  # i64
    if isinstance(v, float):
        import struct as _s

        return 7, _s.pack("<d", v)
    if isinstance(v, bytes):
        return 8, _varint(len(v)) + v
    if isinstance(v, list):
        # homogeneous list of i64 (enough to exercise container skips)
        body = b"".join(_varint(_zigzag(x)) for x in v)
        if len(v) < 15:
            return 9, bytes([(len(v) << 4) | 6]) + body
        return 9, bytes([0xF0 | 6]) + _varint(len(v)) + body
    if isinstance(v, dict):  # nested struct: {fid: value}
        return 12, _encode_struct(v)
    raise TypeError(type(v))


def _encode_struct(fields: dict) -> bytes:
    out = bytearray()
    last = 0
    for fid in sorted(fields):
        ttype, payload = _encode_value(fields[fid])
        delta = fid - last
        if 1 <= delta <= 15:
            out.append((delta << 4) | ttype)
        else:
            out.append(ttype)
            out += _varint(_zigzag(fid))
        out += payload
        last = fid
    out.append(0)
    return bytes(out)


def _decode_struct(buf: bytes):
    """Decode with the walker primitives into {fid: value-ish} — binary
    fields decode to bytes, everything else to a skip marker; returns
    (fields, end_pos)."""
    w = fm._Walker(buf)
    fields = {}
    last = 0
    while True:
        head = w.byte()
        if head == 0:
            return fields, w.pos
        delta, ttype = head >> 4, head & 0x0F
        last = last + delta if delta else fm._zigzag_decode(w.varint())
        if ttype == 8:
            n = w.varint()
            fields[last] = buf[w.pos : w.pos + n]
            w.pos += n
        elif ttype == 12:
            start = w.pos
            w.skip_value(ttype, False)
            fields[last] = ("struct", buf[start : w.pos])
        else:
            start = w.pos
            w.skip_value(ttype, False)
            fields[last] = (ttype, buf[start : w.pos])


# field values: scalars, byte strings, i64 lists, one level of nesting
_scalar = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.binary(max_size=40),
    st.lists(st.integers(min_value=-(2**30), max_value=2**30), max_size=20),
)
_value = st.one_of(
    _scalar,
    st.dictionaries(st.integers(min_value=1, max_value=40), _scalar, max_size=4),
)
_struct = st.dictionaries(
    st.integers(min_value=1, max_value=40), _value, min_size=0, max_size=12
)


def _binary_field6(fields: dict) -> dict:
    """FileMetaData field 6 is BINARY by schema; a non-binary field 6 is
    a rejected malformed input (tested separately), so the random model
    coerces any generated field 6 to bytes."""
    if 6 in fields and not isinstance(fields[6], bytes):
        fields = {**fields, 6: b"prior"}
    return fields


@settings(max_examples=300, deadline=None)
@given(fields=_struct, value=st.binary(max_size=300))
def test_splice_random_structs(fields, value):
    """For ANY struct: after splicing, field 6 holds the new value, every
    other field's bytes are unchanged, and the buffer parses to exactly
    its own length."""
    fields = _binary_field6(fields)
    buf = _encode_struct(fields)
    out = fm._splice_created_by(buf, value)

    w = fm._Walker(out)
    w.skip_struct()
    assert w.pos == len(out)

    got, _ = _decode_struct(out)
    want, _ = _decode_struct(buf)
    want[6] = value  # the one field the splice may add/replace
    assert got == want


@settings(max_examples=100, deadline=None)
@given(fields=_struct)
def test_splice_idempotent_roundtrip(fields):
    """Splicing twice (grow then shrink) keeps every other field stable."""
    fields = _binary_field6(fields)
    buf = _encode_struct(fields)
    big = fm._splice_created_by(buf, b"x" * 200)
    small = fm._splice_created_by(big, b"y")
    got, _ = _decode_struct(small)
    want, _ = _decode_struct(buf)
    want[6] = b"y"
    assert got == want


def test_splice_rejects_non_binary_field6():
    import pytest

    buf = _encode_struct({6: 123})  # i64 at field 6
    with pytest.raises(ValueError, match="expected BINARY"):
        fm._splice_created_by(buf, b"v")


def _long_form_field(fid: int, payload: bytes) -> bytes:
    """Long-form BINARY field header (delta nibble 0 + zigzag fid) —
    the escape hatch a pathological writer could use to emit field ids
    out of ascending order."""
    return bytes([fm._BINARY]) + _varint(_zigzag(fid)) + _varint(len(payload)) + payload


def test_splice_raises_on_out_of_order_duplicate_field6():
    """ADVICE r8: a writer emitting ids out of order via long-form
    headers could smuggle a genuine field 6 PAST the insertion point,
    yielding a duplicate the sanity re-parse can't see. The splice now
    keeps walking and refuses loudly — both on the insert branch
    (5, 8, then out-of-order 6) and the replace branch (6 twice)."""
    import pytest

    insert_case = (
        _long_form_field(5, b"five")
        + _long_form_field(8, b"eight")  # > 6: insertion point
        + _long_form_field(6, b"smuggled")  # out-of-order genuine field 6
        + bytes([fm._STOP])
    )
    with pytest.raises(ValueError, match="ascending"):
        fm._splice_created_by(insert_case, b"v")

    replace_case = (
        _long_form_field(6, b"first")
        + _long_form_field(9, b"nine")
        + _long_form_field(6, b"second")
        + bytes([fm._STOP])
    )
    with pytest.raises(ValueError, match="duplicate"):
        fm._splice_created_by(replace_case, b"v")

    # in-order structs keep splicing fine through the same walk
    ok = _long_form_field(5, b"five") + _long_form_field(8, b"eight") + bytes(
        [fm._STOP]
    )
    out = fm._splice_created_by(ok, b"v")
    got, _ = _decode_struct(out)
    assert got == {5: b"five", 6: b"v", 8: b"eight"}
