"""Cap'n Proto query-response wire format — the reference's binary
``/multi_query_cols`` payload, built on the same pure-Python codec as
the EventBuffer (sources/event_buffer.py).

Schema (locustdb-serialization/schemas/api.capnp):

    MultiQueryResponse { responses: List(QueryResponse) }
    QueryResponse      { columns: List(Column) }
    Column             { name: Text, data: union {
                           f64 (0) | i64 (1) | string (2) | mixed (3) |
                           null (4, row count) | xorF64 (5, Data) |
                           deltaEncodedI8/16/32 (6/7/8, first + deltas) |
                           doubleDeltaEncodedI8/16/32 (9/10/11,
                             first + second + delta-deltas) |
                           range (12, start/len/step) } }
    AnyVal             { union { f64 (0) | i64 (1) | string (2) |
                                 null (3) } }

Layouts confirmed against the capnpc-generated reference code
(locustdb-serialization/src/api_capnp.rs): Column is data 4 words /
ptrs 2 (union tag u16 @ byte 0; first/null-count/range-start @ word 1;
second/range-len @ word 2; range-step @ word 3; name -> ptr 0, list
payload -> ptr 1); QueryResponse and MultiQueryResponse are one
pointer each; AnyVal is data 2 / ptrs 1 (payload @ word 0, tag u16 @
byte 8, string -> ptr 0).

Integer columns reproduce the reference's compression selection
(api.rs:183-270 + determine_delta_compressability): constant-delta
sequences travel as `range`; else the narrowest of delta-i8,
double-delta-i8, delta-i16, double-delta-i16, delta-i32,
double-delta-i32 that fits; else plain i64. Float columns travel
xor-compressed (compression.py — the reference's Gorilla-style codec,
NULL sentinel included) when the request's EncodingOpts ask for it.
Deserialization decodes every variant back to plain Python values, so
the Python client is lossless-transparent.
"""

from __future__ import annotations

import struct

from .event_buffer import _Builder, _Reader, _unframe, pack, unpack

__all__ = [
    "encode_values", "serialize_multi_query_response",
    "deserialize_multi_query_response",
]

# Column.data union tags, schema ordinal order
(_F64, _I64, _STRING, _MIXED, _NULL, _XOR_F64,
 _D8, _D16, _D32, _DD8, _DD16, _DD32, _RANGE) = range(13)
# AnyVal union tags
_AV_F64, _AV_I64, _AV_STR, _AV_NULL = range(4)

_INT_FMT = {_D8: "b", _D16: "h", _D32: "i"}
_INT_CODE = {_D8: 2, _D16: 3, _D32: 4}  # capnp list size codes
_BOUND = {_D8: 127, _D16: 32767, _D32: 2147483647}


def _delta_stats(xs: list[int]):
    deltas = [b - a for a, b in zip(xs, xs[1:])]
    dds = [b - a for a, b in zip(deltas, deltas[1:])]
    return deltas, dds


def _pick_int_encoding(xs: list[int]):
    """Mirror of the reference's selection order (api.rs:190-270):
    range, delta-i8, double-delta-i8, delta-i16, dd-i16, delta-i32,
    dd-i32, plain i64. Returns (tag, payload...)."""
    if len(xs) < 2:
        return (_I64, xs)
    deltas, dds = _delta_stats(xs)
    lo, hi = min(deltas), max(deltas)
    if lo == hi and -(2**63) <= lo < 2**63:
        return (_RANGE, xs[0], len(xs), lo)
    # a 2-element list always has lo == hi, so past this point dds is
    # non-empty (len >= 3)
    dlo, dhi = min(dds), max(dds)
    for d_tag, dd_tag in ((_D8, _DD8), (_D16, _DD16), (_D32, _DD32)):
        b = _BOUND[d_tag]
        if -b - 1 <= lo and hi <= b:
            return (d_tag, xs[0], deltas)
        if -b - 1 <= dlo and dhi <= b:
            return (dd_tag, xs[0], xs[1], dds)
    if not (-(2**63) <= min(xs) and max(xs) < 2**63):
        raise OverflowError("int column value exceeds i64")
    return (_I64, xs)


def _delta_decode(first: int, deltas: list[int]) -> list[int]:
    out = [first]
    x = first
    for d in deltas:
        x += d
        out.append(x)
    return out


def _double_delta_decode(first: int, second: int,
                         dds: list[int]) -> list[int]:
    out = [first, second]
    x = second
    delta = second - first
    for dd in dds:
        delta += dd
        x += delta
        out.append(x)
    return out


def encode_values(values: list, encoding_opts: dict | None,
                  full_precision: bool = False):
    """Classify a column of Python values into the reference's
    BasicTypeColumn dispatch (server/mod.rs:481-553 encode_column
    including the mixed type_signature downgrades). Returns
    (tag, payload tuple) ready for the serializer."""
    from ..compression import NULL as XOR_NULL
    from ..compression import encode as xor_encode

    sig = 0
    for v in values:
        if v is None:
            sig |= 4
        elif isinstance(v, bool) or isinstance(v, int):
            sig |= 1
        elif isinstance(v, float):
            sig |= 8
        else:
            sig |= 2
    xor = bool(encoding_opts and encoding_opts.get("xor_float_compression"))
    mantissa = (None if full_precision or not encoding_opts
                else encoding_opts.get("mantissa"))
    if sig == 2:
        return (_STRING, [str(v) for v in values])
    if sig == 1:
        return _pick_int_encoding([int(v) for v in values])
    if sig == 4:
        return (_NULL, len(values))
    if sig in (8, 12):
        # pure floats / floats+nulls — exactly the reference's
        # signature dispatch (int/float mixes stay Mixed, like its
        # typed engine)
        floats = [XOR_NULL if v is None else float(v) for v in values]
        if xor:
            return (_XOR_F64, xor_encode(floats, 100, mantissa))
        return (_F64, floats)
    if sig == 0:
        return (_F64, [])
    return (_MIXED, list(values))


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------


def _write_column(b: _Builder, cw: int, name: str, tag: int, payload):
    """Write one Column struct body at word `cw` (data 4 + ptrs 2:
    name ptr at cw+4, list ptr at cw+5)."""
    b.put_u16(cw, 0, tag)
    b.write_text(cw + 4, name)
    if tag == _F64:
        b.write_scalars(cw + 5, [float(v) for v in payload], "d")
    elif tag == _I64:
        b.write_scalars(cw + 5, payload, "q")
    elif tag == _STRING:
        b.write_text_list(cw + 5, payload)
    elif tag == _NULL:
        b.put_u64(cw + 1, payload)
    elif tag == _XOR_F64:
        data = payload
        target = b.alloc((len(data) + 7) // 8)
        b.buf[8 * target:8 * target + len(data)] = data
        b.list_ptr(cw + 5, target, 2, len(data))
    elif tag in (_D8, _D16, _D32):
        first, deltas = payload
        b.put_i64(cw + 1, first)
        fmt = _INT_FMT[tag]
        width = struct.calcsize(fmt)
        target = b.alloc((len(deltas) * width + 7) // 8)
        struct.pack_into(f"<{len(deltas)}{fmt}", b.buf, 8 * target,
                         *deltas)
        b.list_ptr(cw + 5, target, _INT_CODE[tag], len(deltas))
    elif tag in (_DD8, _DD16, _DD32):
        first, second, dds = payload
        b.put_i64(cw + 1, first)
        b.put_i64(cw + 2, second)
        base = {_DD8: _D8, _DD16: _D16, _DD32: _D32}[tag]
        fmt = _INT_FMT[base]
        width = struct.calcsize(fmt)
        target = b.alloc((len(dds) * width + 7) // 8)
        struct.pack_into(f"<{len(dds)}{fmt}", b.buf, 8 * target, *dds)
        b.list_ptr(cw + 5, target, _INT_CODE[base], len(dds))
    elif tag == _RANGE:
        start, length, step = payload
        b.put_i64(cw + 1, start)
        b.put_u64(cw + 2, length)
        b.put_i64(cw + 3, step)
    elif tag == _MIXED:
        vals = payload
        mbody = b.init_composite(cw + 5, len(vals), 2, 1)
        for m, v in enumerate(vals):
            mw = mbody + 3 * m
            if v is None:
                b.put_u16(mw + 1, 0, _AV_NULL)
            elif isinstance(v, bool) or isinstance(v, int):
                b.put_u16(mw + 1, 0, _AV_I64)
                b.put_i64(mw, int(v))
            elif isinstance(v, float):
                b.put_u16(mw + 1, 0, _AV_F64)
                b.put_f64(mw, v)
            else:
                b.put_u16(mw + 1, 0, _AV_STR)
                b.write_text(mw + 2, str(v))
    else:
        raise ValueError(f"unknown column tag {tag}")


def serialize_multi_query_response(
    responses: list[dict[str, list]],
    encoding_opts: dict | None = None,
) -> bytes:
    """responses: one {column_name: values} dict per query. Values are
    classified/compressed per the reference's encode_column; the
    result is the packed-capnp MultiQueryResponse bytes the reference
    server returns when EncodingOpts are present."""
    full_precision = set(
        (encoding_opts or {}).get("full_precision_cols", ()))
    b = _Builder()
    root = b.alloc(1)  # MultiQueryResponse: 1 ptr
    b.struct_ptr(0, root, 0, 1)
    rbody = b.init_composite(root, len(responses), 0, 1)
    for r, cols in enumerate(responses):
        rw = rbody + r  # QueryResponse body: 1 ptr word
        items = list(cols.items())
        cbody = b.init_composite(rw, len(items), 4, 2)
        for c, (name, values) in enumerate(items):
            tag, *payload = encode_values(
                values, encoding_opts,
                full_precision=name in full_precision)
            _write_column(b, cbody + 6 * c, name, tag,
                          payload[0] if len(payload) == 1 else tuple(payload))
    return pack(b.message())


# ---------------------------------------------------------------------------
# deserialization
# ---------------------------------------------------------------------------


def _read_column(r: _Reader, seg: int, cw: int, cdw: int, cpw: int):
    name = r.text(seg, cw + cdw)
    tag = r.word(seg, cw) & 0xFFFF if cdw >= 1 else _F64
    p1 = cw + cdw + 1

    def _i64_at(word):
        return struct.unpack_from("<q", r.segs[seg], 8 * word)[0]

    if tag == _F64:
        return name, r.scalar_list(seg, p1, "d")
    if tag == _I64:
        return name, r.scalar_list(seg, p1, "q")
    if tag == _STRING:
        return name, r.text_list(seg, p1)
    if tag == _NULL:
        return name, [None] * r.word(seg, cw + 1)
    if tag == _XOR_F64:
        from ..compression import decode as xor_decode

        res = r.resolve(seg, p1)
        if res is None:
            return name, []
        kind, tseg, target, code, count = res
        if kind != "list" or code != 2:
            raise ValueError("xorF64 payload is not Data")
        blob = bytes(r.segs[tseg][8 * target:8 * target + count])
        return name, xor_decode(blob)
    if tag in (_D8, _D16, _D32, _DD8, _DD16, _DD32):
        base = {_D8: _D8, _DD8: _D8, _D16: _D16, _DD16: _D16,
                _D32: _D32, _DD32: _D32}[tag]
        res = r.resolve(seg, p1)
        vals: list[int] = []
        if res is not None:
            kind, tseg, target, code, count = res
            if kind != "list" or code != _INT_CODE[base]:
                raise ValueError("delta payload size-code mismatch")
            fmt = _INT_FMT[base]
            vals = list(struct.unpack_from(
                f"<{count}{fmt}", r.segs[tseg], 8 * target))
        first = _i64_at(cw + 1)
        if tag in (_D8, _D16, _D32):
            return name, _delta_decode(first, vals)
        second = _i64_at(cw + 2)
        return name, _double_delta_decode(first, second, vals)
    if tag == _RANGE:
        start = _i64_at(cw + 1)
        length = r.word(seg, cw + 2)
        step = _i64_at(cw + 3)
        return name, [start + i * step for i in range(length)]
    if tag == _MIXED:
        vals = []
        for mseg, mw, mdw, mpw in r.composite(seg, p1):
            vtag = (r.word(mseg, mw + 1) & 0xFFFF) if mdw >= 2 else _AV_NULL
            if vtag == _AV_F64:
                vals.append(struct.unpack_from(
                    "<d", r.segs[mseg], 8 * mw)[0])
            elif vtag == _AV_I64:
                vals.append(struct.unpack_from(
                    "<q", r.segs[mseg], 8 * mw)[0])
            elif vtag == _AV_STR:
                vals.append(r.text(mseg, mw + mdw))
            else:
                vals.append(None)
        return name, vals
    raise ValueError(f"unknown Column.data tag {tag}")


def deserialize_multi_query_response(data: bytes) -> list[dict[str, list]]:
    """Packed-capnp MultiQueryResponse bytes -> one {column: values}
    dict per query, with every compressed variant decoded back to
    plain Python values (xor floats with the NULL sentinel mapped to
    None)."""
    r = _Reader(_unframe(unpack(data)))
    root = r.resolve(0, 0)
    if root is None:
        return []
    kind, seg, target, dw, pw = root
    if kind != "struct" or pw < 1:
        raise ValueError("root is not a MultiQueryResponse")
    out: list[dict[str, list]] = []
    for rseg, rw, rdw, rpw in r.composite(seg, target + dw):
        cols: dict[str, list] = {}
        for cseg, cw, cdw, cpw in r.composite(rseg, rw + rdw):
            name, vals = _read_column(r, cseg, cw, cdw, cpw)
            cols[name] = vals
        out.append(cols)
    return out
