"""Mapbox Vector Tile protobuf codec (pure Python).

Encode mirrors mvt_tile::encode (/root/reference/mvt.cpp:299-418):
per-layer key/value constant pools with first-use ordering
(mvt_layer::tag, mvt.cpp:493-517), geometry as command/count-packed
zigzag deltas, field order (version 15, name 1, extent 5, keys 3,
values 4, features 2; feature: type 3, tags 2, id 1, geometry 4).

Value typing mirrors stringified_to_mvt_value (mvt.cpp:590-644):
stringified doubles are narrowed to int/uint/sint, then float if the
float round-trips, else double.

Decode is the test oracle (mvt_tile::decode, mvt.cpp:111-297).
gzip compression: zlib level 9, gzip container (mvt.cpp:84-109).

Tile schema: /root/reference/vector_tile.proto.
"""

from __future__ import annotations

import math
import struct

import zlib
from dataclasses import dataclass, field

# MVT value types (mvt.hpp:59-68)
T_STRING = 0
T_FLOAT = 1
T_DOUBLE = 2
T_INT = 3
T_UINT = 4
T_SINT = 5
T_BOOL = 6
T_NULL = 7

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

OP_MOVETO = 1
OP_LINETO = 2
OP_CLOSEPATH = 7

LLONG_MAX = (1 << 63) - 1
LLONG_MIN = -(1 << 63)
ULLONG_MAX = (1 << 64) - 1
INT_MAX = (1 << 31) - 1
INT_MIN = -(1 << 31)


# ---------- varint / zigzag ----------

def _write_varint(buf: bytearray, v: int) -> None:
    if 0 <= v < 0x80:  # single-byte fast path (the overwhelming case)
        buf.append(v)
        return
    v &= 0xFFFFFFFFFFFFFFFF
    while v > 0x7F:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def zigzag32(v: int) -> int:
    return ((v << 1) ^ (v >> 31)) & 0xFFFFFFFF


def dezigzag(v: int) -> int:
    return (v >> 1) ^ (-(v & 1))


def zigzag64(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & 0xFFFFFFFFFFFFFFFF


# ---------- value model ----------

@dataclass(frozen=True)
class MvtValue:
    type: int
    # exactly one of these is meaningful depending on type
    s: str = ""
    num: float = 0.0
    i: int = 0
    b: bool = False

    def key(self):
        """Dedup identity, mirroring mvt_value::operator< (type, then value)."""
        if self.type == T_STRING:
            return (self.type, self.s)
        if self.type in (T_FLOAT, T_DOUBLE):
            return (self.type, self.num)
        if self.type in (T_INT, T_UINT, T_SINT):
            return (self.type, self.i)
        if self.type == T_BOOL:
            return (self.type, self.b)
        return (self.type,)


def _c_strtoll_prefix(s: str):
    """Parse an optional-sign decimal/hex/octal integer prefix like strtoll
    (base 0).  Returns (value or None, rest-of-string)."""
    i = 0
    n = len(s)
    while i < n and s[i].isspace():
        i += 1
    start = i
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    base = 10
    if s[i : i + 2].lower() == "0x":
        base = 16
        i += 2
    elif i < n and s[i] == "0" and i + 1 < n and s[i + 1].isdigit():
        base = 8
        i += 1
    digits = "0123456789abcdef"[:base]
    j = i
    while j < n and s[j].lower() in digits:
        j += 1
    if j == i:
        return None, s[start:]
    return sign * int(s[i:j], base), s[j:]


def _is_integer(s: str):
    """mvt.cpp:519-547 — integer, or integer followed by .000..."""
    v, rest = _c_strtoll_prefix(s)
    if v is None:
        return None
    if v > LLONG_MAX or v < LLONG_MIN:
        return None
    if rest == "":
        return v
    if not rest.startswith("."):
        return None
    if any(c != "0" for c in rest[1:]):
        return None
    return v


def _is_unsigned_integer(s: str):
    """mvt.cpp:549-588 — like _is_integer but rejects leading '-'."""
    t = s.lstrip()
    if t.startswith("-"):
        return None
    v, rest = _c_strtoll_prefix(s)
    if v is None or v < 0 or v > ULLONG_MAX:
        return None
    if rest == "":
        return v
    if not rest.startswith(".") or any(c != "0" for c in rest[1:]):
        return None
    return v


from functools import lru_cache


@lru_cache(maxsize=65536)
def stringified_to_mvt_value(vt: int, s: str) -> MvtValue:
    """mvt.cpp:590-644.  Cached: the same feature's attributes are
    re-typed in every tile it appears in (MvtValue is frozen)."""
    if vt == T_DOUBLE:
        uv = _is_unsigned_integer(s)
        if uv is not None:
            if uv <= LLONG_MAX:
                return MvtValue(T_INT, i=uv)
            return MvtValue(T_UINT, i=uv)
        v = _is_integer(s)
        if v is not None:
            return MvtValue(T_SINT, i=v)
        try:
            d = float(s)
        except ValueError:
            d = 0.0
        # strtof overflow (ERANGE -> HUGE_VALF) falls through to double;
        # struct round-trips through IEEE binary32 exactly like
        # np.float32 incl. the overflow boundary (verified), without the
        # errstate context cost
        try:
            f = struct.unpack("<f", struct.pack("<f", d))[0]
        except OverflowError:
            f = math.inf if d > 0 else -math.inf
        if math.isinf(f) and not math.isinf(d):
            return MvtValue(T_DOUBLE, num=d)
        if f == d:
            return MvtValue(T_FLOAT, num=d)
        return MvtValue(T_DOUBLE, num=d)
    if vt == T_BOOL:
        return MvtValue(T_BOOL, b=s.startswith("t"))
    if vt == T_NULL:
        return MvtValue(T_NULL)
    return MvtValue(T_STRING, s=s)


# ---------- tile model ----------

@dataclass
class MvtFeature:
    type: int = 0
    tags: list = field(default_factory=list)
    geometry: list = field(default_factory=list)  # [(op, x, y), ...]
    id: int = 0
    has_id: bool = False


@dataclass
class MvtLayer:
    name: str = ""
    version: int = 2
    extent: int = 4096
    features: list = field(default_factory=list)
    keys: list = field(default_factory=list)
    values: list = field(default_factory=list)  # list[MvtValue]
    _key_map: dict = field(default_factory=dict)
    _value_map: dict = field(default_factory=dict)

    def tag(self, feature: MvtFeature, key: str, value: MvtValue) -> None:
        """mvt_layer::tag — first-use-ordered constant pools."""
        ko = self._key_map.get(key)
        if ko is None:
            ko = len(self.keys)
            self.keys.append(key)
            self._key_map[key] = ko
        vk = value.key()
        vo = self._value_map.get(vk)
        if vo is None:
            vo = len(self.values)
            self.values.append(value)
            self._value_map[vk] = vo
        feature.tags.append(ko)
        feature.tags.append(vo)


@dataclass
class MvtTile:
    layers: list = field(default_factory=list)


# ---------- encoding ----------

def _field(buf: bytearray, num: int, wire: int) -> None:
    _write_varint(buf, (num << 3) | wire)


def _add_string(buf: bytearray, num: int, s) -> None:
    b = s.encode("utf-8") if isinstance(s, str) else bytes(s)
    _field(buf, num, 2)
    _write_varint(buf, len(b))
    buf += b


def _encode_value(v: MvtValue) -> bytes:
    buf = bytearray()
    if v.type == T_STRING:
        _add_string(buf, 1, v.s)
    elif v.type == T_FLOAT:
        _field(buf, 2, 5)
        buf += struct.pack("<f", v.num)
    elif v.type == T_DOUBLE:
        _field(buf, 3, 1)
        buf += struct.pack("<d", v.num)
    elif v.type == T_INT:
        _field(buf, 4, 0)
        _write_varint(buf, v.i)
    elif v.type == T_UINT:
        _field(buf, 5, 0)
        _write_varint(buf, v.i)
    elif v.type == T_SINT:
        _field(buf, 6, 0)
        _write_varint(buf, zigzag64(v.i))
    elif v.type == T_BOOL:
        _field(buf, 7, 0)
        _write_varint(buf, 1 if v.b else 0)
    else:
        raise ValueError("trying to write null attribute to tile")
    return bytes(buf)


def _encode_packed(buf: bytearray, num: int, values) -> None:
    if not values:
        # protozero add_packed_* writes nothing for an empty range
        return
    inner = bytearray()
    ap = inner.append
    for v in values:  # inlined _write_varint (hot: geometry + tags)
        if 0 <= v < 0x80:
            ap(v)
            continue
        v &= 0xFFFFFFFFFFFFFFFF
        while v > 0x7F:
            ap((v & 0x7F) | 0x80)
            v >>= 7
        ap(v)
    _field(buf, num, 2)
    _write_varint(buf, len(inner))
    buf += inner


def encode_geometry(geometry) -> list:
    """Command/count packing with zigzag deltas (mvt.cpp:357-410)."""
    out = []
    px = py = 0
    cmd_idx = -1
    cmd = -1
    length = 0
    for op, gx, gy in geometry:
        if op != cmd:
            if cmd_idx >= 0:
                out[cmd_idx] = (length << 3) | (cmd & 7)
            cmd = op
            length = 0
            cmd_idx = len(out)
            out.append(0)
        if op == OP_MOVETO or op == OP_LINETO:
            dx = gx - px
            dy = gy - py
            if dx < INT_MIN or dx > INT_MAX or dy < INT_MIN or dy > INT_MAX:
                raise ValueError(f"geometry delta too big: {dx},{dy}")
            out.append(zigzag32(dx))
            out.append(zigzag32(dy))
            px, py = gx, gy
            length += 1
        elif op == OP_CLOSEPATH:
            length += 1
        else:
            raise ValueError("corrupted geometry")
    if cmd_idx >= 0:
        out[cmd_idx] = (length << 3) | (cmd & 7)
    return out


def _add_tagged_bytes(buf: bytearray, tag_byte: int, b) -> None:
    """Length-delimited field with a precomputed single-byte tag (every
    MVT field number is < 16, so (num << 3) | wire always fits)."""
    buf.append(tag_byte)
    _write_varint(buf, len(b))
    buf += b


def encode_tile(tile: MvtTile) -> bytes:
    data = bytearray()
    for layer in tile.layers:
        lbuf = bytearray()
        lbuf.append(0x78)  # field 15 varint: version
        _write_varint(lbuf, layer.version)
        _add_tagged_bytes(lbuf, 0x0A, layer.name.encode("utf-8"))  # 1: name
        lbuf.append(0x28)  # field 5 varint: extent
        _write_varint(lbuf, layer.extent)
        for k in layer.keys:
            _add_tagged_bytes(lbuf, 0x1A, k.encode("utf-8"))  # 3: key
        for v in layer.values:
            _add_tagged_bytes(lbuf, 0x22, _encode_value(v))  # 4: value
        for f in layer.features:
            fbuf = bytearray()
            fbuf.append(0x18)  # field 3 varint: type
            _write_varint(fbuf, f.type)
            _encode_packed(fbuf, 2, f.tags)
            if f.has_id:
                fbuf.append(0x08)  # field 1 varint: id
                _write_varint(fbuf, f.id)
            _encode_packed(fbuf, 4, encode_geometry(f.geometry))
            _add_tagged_bytes(lbuf, 0x12, fbuf)  # 2: feature
        _add_tagged_bytes(data, 0x1A, lbuf)  # 3: layer
    return bytes(data)


def gzip_tile(data: bytes) -> bytes:
    """zlib level 9 in a gzip container (mvt.cpp:84-109 / tile.cpp:2418)."""
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def is_compressed(data: bytes) -> bool:
    return len(data) > 2 and (
        (data[0] == 0x78 and data[1] == 0x9C) or (data[0] == 0x1F and data[1] == 0x8B)
    )


# ---------- decoding (test oracle) ----------

class _Reader:
    __slots__ = ("b", "i", "n")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0
        self.n = len(b)

    def varint(self) -> int:
        shift = 0
        out = 0
        while True:
            c = self.b[self.i]
            self.i += 1
            out |= (c & 0x7F) << shift
            if not c & 0x80:
                return out
            shift += 7

    def skip(self, wire: int) -> None:
        if wire == 0:
            self.varint()
        elif wire == 1:
            self.i += 8
        elif wire == 2:
            self.i += self.varint()
        elif wire == 5:
            self.i += 4
        else:
            raise ValueError(f"bad wire type {wire}")

    def bytes_field(self) -> bytes:
        ln = self.varint()
        out = self.b[self.i : self.i + ln]
        self.i += ln
        return out

    def eof(self) -> bool:
        return self.i >= self.n


def _decode_value(b: bytes) -> MvtValue:
    r = _Reader(b)
    out = MvtValue(T_NULL)
    while not r.eof():
        tag = r.varint()
        num, wire = tag >> 3, tag & 7
        if num == 1:
            out = MvtValue(T_STRING, s=r.bytes_field().decode("utf-8"))
        elif num == 2:
            out = MvtValue(T_FLOAT, num=struct.unpack("<f", r.b[r.i : r.i + 4])[0])
            r.i += 4
        elif num == 3:
            out = MvtValue(T_DOUBLE, num=struct.unpack("<d", r.b[r.i : r.i + 8])[0])
            r.i += 8
        elif num == 4:
            v = r.varint()
            if v >= 1 << 63:
                v -= 1 << 64
            out = MvtValue(T_INT, i=v)
        elif num == 5:
            out = MvtValue(T_UINT, i=r.varint())
        elif num == 6:
            out = MvtValue(T_SINT, i=dezigzag(r.varint()))
        elif num == 7:
            out = MvtValue(T_BOOL, b=bool(r.varint()))
        else:
            r.skip(wire)
    return out


def decode_geometry(packed: list) -> list:
    out = []
    px = py = 0
    i = 0
    n = len(packed)
    while i < n:
        v = packed[i]
        i += 1
        cmd = v & 7
        count = v >> 3
        if cmd in (OP_MOVETO, OP_LINETO):
            for _ in range(count):
                px += dezigzag(packed[i])
                py += dezigzag(packed[i + 1])
                i += 2
                out.append((cmd, px, py))
        else:
            for _ in range(count):
                out.append((OP_CLOSEPATH, 0, 0))
    return out


def decode_tile(data: bytes) -> MvtTile:
    if is_compressed(data):
        data = zlib.decompress(data, 47)
    tile = MvtTile()
    r = _Reader(data)
    while not r.eof():
        tag = r.varint()
        num, wire = tag >> 3, tag & 7
        if num == 3 and wire == 2:
            tile.layers.append(_decode_layer(r.bytes_field()))
        else:
            r.skip(wire)
    return tile


def _decode_layer(b: bytes) -> MvtLayer:
    layer = MvtLayer()
    r = _Reader(b)
    feats = []
    while not r.eof():
        tag = r.varint()
        num, wire = tag >> 3, tag & 7
        if num == 15:
            layer.version = r.varint()
        elif num == 1:
            layer.name = r.bytes_field().decode("utf-8")
        elif num == 5:
            layer.extent = r.varint()
        elif num == 3:
            layer.keys.append(r.bytes_field().decode("utf-8"))
        elif num == 4:
            layer.values.append(_decode_value(r.bytes_field()))
        elif num == 2:
            feats.append(r.bytes_field())
        else:
            r.skip(wire)
    for fb in feats:
        layer.features.append(_decode_feature(fb))
    return layer


def _decode_feature(b: bytes) -> MvtFeature:
    f = MvtFeature()
    r = _Reader(b)
    while not r.eof():
        tag = r.varint()
        num, wire = tag >> 3, tag & 7
        if num == 3:
            f.type = r.varint()
        elif num == 1:
            f.id = r.varint()
            f.has_id = True
        elif num == 2:
            pr = _Reader(r.bytes_field())
            while not pr.eof():
                f.tags.append(pr.varint())
        elif num == 4:
            pr = _Reader(r.bytes_field())
            packed = []
            while not pr.eof():
                packed.append(pr.varint())
            f.geometry = decode_geometry(packed)
        else:
            r.skip(wire)
    return f
