"""tippecanoe-json-tool drop-in (jsontool.cpp).

Re-stringifies GeoJSON features one per line in jsonpull's canonical
compact form (jsonpull/jsonpull.c:843-919: key order and duplicate
keys preserved, number source text verbatim, minimal string escaping),
with the reference's three transforms:

- ``-w`` / ``--wrap``: wrap the stream back into a Feature/Geometry-
  Collection (jsontool.cpp:174-203 buffer state machine).
- ``-e key`` / ``--extract``: prefix each feature with the sort-quoted
  value of a property (jsontool.cpp:106-139 ``sort_quote`` — note the
  reference's ``\\u%04lu`` DECIMAL escape quirk, reproduced exactly).
- ``-c file.csv``: streaming sort-merge join of CSV attributes onto
  feature properties (jsontool.cpp:207-364 ``join_csv``), first CSV
  column as the key; both inputs must be pre-sorted (byte order) and
  out-of-sort input is a fatal error, as in the reference.

Feature discovery mirrors geojson-loop.cpp parse_json: objects are
considered in jsonpull COMPLETION order (children before the object
that contains them), bare geometries count only until the first
Feature, objects under a ``properties`` value are never features, and
emitted/absorbed objects are disconnected from their parent before the
parent itself is considered (json_free semantics), so a container
re-stringifies without them.

Spark path: one task per input file runs the same walk + join kernel
(CSV broadcast as a first-row-wins dict — equivalent to the
reference's forward-only merge cursor on sorted input), output lines
re-assembled in (file, seq) order; the reference's out-of-sort
fatality is reproduced exactly by a driver-side cursor replay over
just the join keys (no feature bodies move through the driver).
"""

from __future__ import annotations

import json
import sys

GEOM_NAMES = ("Point", "MultiPoint", "LineString", "MultiLineString",
              "Polygon", "MultiPolygon")

MISSING = object()


class JsonToolError(Exception):
    """Fatal jsontool error (reference exit(EXIT_FAILURE) paths)."""


class RawNum(str):
    """JSON number with its source text preserved (jsonpull keeps the
    literal text and json_stringify prints it verbatim)."""


class JsonObj:
    """Hash with key order and duplicate keys preserved (jsonpull
    hashes are parallel key/value arrays, never deduplicated)."""

    __slots__ = ("pairs",)

    def __init__(self, pairs):
        self.pairs = [list(p) for p in pairs]

    def get(self, key, default=MISSING):
        # json_hash_get: first match wins (jsonpull.c:193-208)
        for k, v in self.pairs:
            if k == key:
                return v
        return default


def _reject_constant(name):
    raise ValueError(f"JSON does not allow {name}")


def _loads(text: str):
    return json.loads(text, object_pairs_hook=JsonObj, parse_float=RawNum,
                      parse_int=RawNum, parse_constant=_reject_constant)


def parse_stream_objects(text: str) -> list:
    """Top-level JSON objects of a stream: whole-document, then
    newline-delimited (RS-tolerant), then jsonpull-style lenient
    balanced-object recovery — the io.geojson strategy with the
    order-preserving hooks jsontool needs."""
    stripped = text.strip()
    if not stripped:
        return []
    try:
        return [_loads(stripped)]
    except (json.JSONDecodeError, ValueError):
        pass
    try:
        out = []
        for line in stripped.replace("\x1e", "\n").splitlines():
            line = line.strip().rstrip(",")
            if line:
                out.append(_loads(line))
        return out
    except (json.JSONDecodeError, ValueError):
        from .geojson import _lenient_objects

        return _lenient_objects(stripped, loads=_loads)


# ---------------------------------------------------------------------------
# jsonpull json_stringify (jsonpull.c:843-919)

def _escape_string(s: str) -> str:
    i = s.find("\x00")
    if i >= 0:  # C strings stop at NUL
        s = s[:i]
    out = ['"']
    for c in s:
        if c in ('\\', '"'):
            out.append('\\' + c)
        elif c < ' ':
            out.append('\\u%04x' % ord(c))
        else:
            out.append(c)
    out.append('"')
    return "".join(out)


def stringify(o) -> str:
    if isinstance(o, JsonObj):
        return "{" + ",".join(
            _escape_string(k) + ":" + stringify(v) for k, v in o.pairs) + "}"
    if isinstance(o, list):
        return "[" + ",".join(stringify(v) for v in o) + "]"
    if isinstance(o, RawNum):
        return str(o)
    if isinstance(o, str):
        return _escape_string(o)
    if o is None:
        return "null"
    if o is True:
        return "true"
    if o is False:
        return "false"
    raise TypeError(f"unexpected node {type(o)}")


# ---------------------------------------------------------------------------
# sort_quote (jsontool.cpp:30-139): encode a string so it sorts in
# UTF-32 order despite JSON quoting — codepoints below the surrogate
# range become DECIMAL \u%04lu escapes (the reference's sprintf quirk),
# everything else is re-emitted as raw UTF-8 bytes.

def _decode32(bs: bytes) -> list:
    utf32 = []
    i = 0
    n = len(bs)
    while i < n:
        b = bs[i]
        i += 1
        if b < 0x80:
            utf32.append(b)
        elif (b & 0xE0) == 0xC0:
            if i < n and (bs[i] & 0xC0) == 0x80:
                utf32.append(((b & 0x1F) << 6) | (bs[i] & 0x3F))
                i += 1
            else:
                utf32.append(0xFFFD)
        elif (b & 0xF0) == 0xE0:
            if i + 1 < n and (bs[i] & 0xC0) == 0x80 \
                    and (bs[i + 1] & 0xC0) == 0x80:
                utf32.append(((b & 0x0F) << 12) | ((bs[i] & 0x3F) << 6)
                             | (bs[i + 1] & 0x3F))
                i += 2
            else:
                utf32.append(0xFFFD)
        elif (b & 0xF8) == 0xF0:
            if i + 2 < n and (bs[i] & 0xC0) == 0x80 \
                    and (bs[i + 1] & 0xC0) == 0x80 \
                    and (bs[i + 2] & 0xC0) == 0x80:
                utf32.append(((b & 0x07) << 18) | ((bs[i] & 0x3F) << 12)
                             | ((bs[i + 1] & 0x3F) << 6) | (bs[i + 2] & 0x3F))
                i += 3
            else:
                utf32.append(0xFFFD)
        else:
            utf32.append(0xFFFD)
    return utf32


def sort_quote(s: str) -> str:
    out = []
    for c in _decode32(s.encode("utf-8", "surrogatepass")):
        if c < 0xD800:
            out.append("\\u%04d" % c)
        else:
            out.append(chr(c))
    return "".join(out)


# ---------------------------------------------------------------------------
# geojson-loop.cpp parse_json walk, in completion order

def _remove_from(parent, node) -> None:
    """json_free disconnection: drop `node` (by identity) from its
    parent container so later stringification of the parent excludes
    it."""
    if isinstance(parent, list):
        for i, x in enumerate(parent):
            if x is node:
                del parent[i]
                return
    elif isinstance(parent, JsonObj):
        for i, kv in enumerate(parent.pairs):
            if kv[1] is node:
                del parent.pairs[i]
                return


def walk_features(objs, fname: str = "input", stderr=None):
    """Yield (kind, node) in jsonpull completion order: kind 1 =
    Feature, kind 2 = bare geometry.  Emitted nodes (and absorbed
    FeatureCollections) are disconnected from their parents, mirroring
    parse_json's json_free calls."""
    if stderr is None:
        stderr = sys.stderr
    st = {"features": 0, "geoms": 0}
    out = []

    def visit(node, parent, grandparent, under_props):
        if isinstance(node, list):
            for item in list(node):
                visit(item, node, parent, under_props)
            return
        if not isinstance(node, JsonObj):
            return
        props_val = node.get("properties")
        for kv in list(node.pairs):
            child_under = under_props or (
                kv[0] == "properties" and kv[1] is props_val)
            visit(kv[1], node, parent, child_under)

        t = node.get("type")
        if not isinstance(t, str) or isinstance(t, RawNum):
            return
        if st["features"] == 0 and t in GEOM_NAMES:
            # jsonpull runs these hash_get probes THE MOMENT the
            # candidate completes (geojson-loop.cpp:76-92), when the
            # enclosing hash holds only the pairs parsed so far — a
            # "geometry"/"geometries" key AFTER the candidate's own
            # pair is invisible to it, so only keys at-or-before the
            # candidate's position may veto
            def _get_upto(obj, key, child):
                for kv in obj.pairs:
                    if kv[0] == key:
                        return kv[1]
                    if kv[1] is child:
                        break
                return MISSING

            is_geom = True
            if parent is not None:
                if isinstance(parent, list) and isinstance(grandparent,
                                                           JsonObj):
                    if _get_upto(grandparent, "geometries",
                                 parent) is not MISSING:
                        is_geom = False  # inside a GeometryCollection
                elif isinstance(parent, JsonObj):
                    if _get_upto(parent, "geometry",
                                 node) is not MISSING:
                        is_geom = False  # the geometry of a Feature
            if under_props:
                is_geom = False
            if is_geom:
                st["geoms"] += 1
                out.append((2, node))
                _remove_from(parent, node)
                return
        if t != "Feature":
            if t == "FeatureCollection":
                _remove_from(parent, node)
            return
        st["features"] += 1
        geometry = node.get("geometry")
        if geometry is MISSING:
            print(f"{fname}: feature with no geometry", file=stderr)
            _remove_from(parent, node)
            return
        props = node.get("properties")
        if props is MISSING or not (isinstance(props, JsonObj)
                                    or props is None):
            print(f"{fname}: feature without properties hash", file=stderr)
            _remove_from(parent, node)
            return
        if under_props:
            return
        out.append((1, node))
        _remove_from(parent, node)

    for o in objs:
        visit(o, None, None, False)
    return out


# ---------------------------------------------------------------------------
# CSV merge join (jsontool.cpp:207-364)

def _csv_lines(text: str):
    """csv_getline stream: lines including their '\\n', '' at EOF."""
    start = 0
    while start < len(text):
        nl = text.find("\n", start)
        if nl < 0:
            yield text[start:]
            break
        yield text[start:nl + 1]
        start = nl + 1


def _key_bytes(s: str) -> bytes:
    return s.encode("utf-8", "surrogatepass")


class CsvJoiner:
    """The reference's forward-only merge cursor over a sorted CSV.
    State (header, current row, previous keys) spans every input file,
    as the globals do in jsontool.cpp."""

    def __init__(self, text: str, pe: bool, stderr=None):
        from ..core.text import check_utf8
        from ..operators.tilejoin import csv_dequote, csv_split

        self._check_utf8 = check_utf8
        self._split = csv_split
        self._dequote = csv_dequote
        self._lines = _csv_lines(text)
        self.pe = pe
        self.header = []
        self.fields = []
        self.prev_joinkey = ""
        self.stderr = stderr if stderr is not None else sys.stderr
        self._warned = False

    def _getline(self) -> str:
        return next(self._lines, "")

    def join(self, feature: JsonObj) -> None:
        if not self.header:
            s = self._getline()
            if not s:
                raise JsonToolError("Couldn't get column header from CSV file")
            err = self._check_utf8(s)
            if err:
                raise JsonToolError(err)
            self.header = [self._dequote(h) for h in self._split(s)]
            if not self.header:
                raise JsonToolError(f'No columns in CSV header "{s}"')

        properties = feature.get("properties")
        key = MISSING
        if isinstance(properties, JsonObj):
            key = properties.get(self.header[0])
        if key is MISSING:
            if not self._warned:
                print(f'Warning: couldn\'t find CSV key '
                      f'"{self.header[0]}" in JSON', file=self.stderr)
                self._warned = True
            return

        if isinstance(key, str):  # JSON_STRING or JSON_NUMBER (RawNum)
            joinkey = str(key)
        else:
            joinkey = stringify(key)

        fields = self.advance(joinkey)
        if fields is not None:
            _append_csv_fields(properties, self.header, fields, self.pe)

    def advance(self, joinkey: str) -> list | None:
        """Move the merge cursor for one feature key (sort-order errors
        exactly as the reference, both sides); returns the matched CSV
        row's fields, or None when the cursor yields no join — which on
        out-of-sort input that escapes the fatal checks can differ from
        a dict lookup (the cursor silently skips rows it passed)."""
        if _key_bytes(joinkey) < _key_bytes(self.prev_joinkey):
            raise JsonToolError(
                f'GeoJSON file is out of sort: "{joinkey}" follows '
                f'"{self.prev_joinkey}"')
        self.prev_joinkey = joinkey

        if not self.fields or _key_bytes(joinkey) > _key_bytes(self.fields[0]):
            prevkey = self.fields[0] if self.fields else ""
            while True:
                s = self._getline()
                if not s:
                    self.fields = []
                    break
                err = self._check_utf8(s)
                if err:
                    raise JsonToolError(err)
                self.fields = [self._dequote(f) for f in self._split(s)]
                if self.fields and _key_bytes(self.fields[0]) < _key_bytes(prevkey):
                    raise JsonToolError(
                        f'CSV file is out of sort: "{self.fields[0]}" '
                        f'follows "{prevkey}"')
                if self.fields and _key_bytes(self.fields[0]) >= _key_bytes(joinkey):
                    break
                if self.fields:
                    prevkey = self.fields[0]

        if self.fields and joinkey == self.fields[0]:
            return self.fields
        return None


def _append_csv_fields(properties: JsonObj, header, fields, pe: bool) -> None:
    """jsontool.cpp:316-362: append columns 1.. to the properties hash
    with the reference's typing (post-dequote re-dequote for doubled
    quotes, JSON number grammar, empty columns skipped under -pe)."""
    from ..operators.tilejoin import csv_dequote, is_number

    for i in range(1, len(fields)):
        if i >= len(header):
            break  # reference would read header[i] out of range; be safe
        k = header[i]
        v = fields[i]
        attr_number = False
        add = True
        if len(v) > 0:
            if v[0] == '"':
                v = csv_dequote(v)
            elif is_number(v):
                attr_number = True
        elif pe:
            add = False  # JSON_NULL attr_type is never added
        if add:
            properties.pairs.append([k, RawNum(v) if attr_number else v])


# ---------------------------------------------------------------------------
# output assembly (jsontool.cpp out(), buffer state machine)

class _OutState:
    __slots__ = ("buffered", "buffered_type", "state", "warned_extract")

    def __init__(self):
        self.buffered = None
        self.buffered_type = -1
        self.state = 0
        self.warned_extract = False


def _out_lines(ost: _OutState, s: str, typ: int, properties,
               wrap: bool, extract, stderr):
    """Yield output lines for one feature (jsontool.cpp:141-203)."""
    if extract is not None:
        extracted = sort_quote("null")
        found = False
        o = MISSING
        if isinstance(properties, JsonObj):
            o = properties.get(extract)
        if o is not MISSING:
            found = True
            if isinstance(o, str):  # string or number: source text
                extracted = sort_quote(str(o))
            else:
                extracted = sort_quote(stringify(o))
        if not found and not ost.warned_extract:
            print(f'Warning: extract key "{extract}" not found in JSON',
                  file=stderr)
            ost.warned_extract = True
        yield '{"%s":%s}' % (extracted, s)
        return

    if not wrap:
        yield s
        return

    if ost.state == 0:
        ost.buffered = s
        ost.buffered_type = typ
        ost.state = 1
        return

    if ost.state == 1:
        if ost.buffered_type == 1:
            yield '{"type":"FeatureCollection","features":['
        else:
            yield '{"type":"GeometryCollection","geometries":['
        yield ost.buffered
        ost.state = 2

    yield ","
    yield s

    if typ != ost.buffered_type:
        raise JsonToolError("Error: mix of bare geometries and features")


def _out_flush(ost: _OutState):
    if ost.state == 1:
        yield ost.buffered
    elif ost.state == 2:
        yield "]}"


def run_jsontool_local(files, wrap: bool = False, extract: str | None = None,
                       csv_text: str | None = None, pe: bool = False,
                       stderr=None):
    """Local streaming runner: ``files`` is an iterable of
    (fname, text); yields output lines (no trailing newline) exactly as
    the reference binary prints them.  Fatal conditions raise
    JsonToolError AFTER any lines the reference would already have
    printed (the caller streams, so partial output matches)."""
    if stderr is None:
        stderr = sys.stderr
    if extract is not None and wrap:
        raise JsonToolError("--wrap and --extract not supported together")
    joiner = CsvJoiner(csv_text, pe, stderr=stderr) if csv_text is not None \
        else None
    ost = _OutState()
    for fname, text in files:
        objs = parse_stream_objects(text)
        for kind, node in walk_features(objs, fname, stderr=stderr):
            if kind == 1:
                if joiner is not None:
                    joiner.join(node)
                props = node.get("properties")
                props = props if isinstance(props, JsonObj) else None
                yield from _out_lines(ost, stringify(node), 1, props,
                                      wrap, extract, stderr)
            else:
                yield from _out_lines(ost, stringify(node), 2, None,
                                      wrap, extract, stderr)
    yield from _out_flush(ost)


# ---------------------------------------------------------------------------
# distributed path

def _format_feature_line(node, kind: int, ext: str | None):
    """Final output line for a walked node (extract wrapper or plain
    stringify) — shared by the distributed kernel and the driver-side
    divergence repair so both format identically.  Returns
    (line, extract_found)."""
    props = node.get("properties") if kind == 1 else MISSING
    props = props if isinstance(props, JsonObj) else None
    if ext is not None and kind == 1:
        extracted = None
        o = MISSING
        if isinstance(props, JsonObj):
            o = props.get(ext)
        if o is not MISSING:
            extracted = (sort_quote(str(o)) if isinstance(o, str)
                         else sort_quote(stringify(o)))
        line = '{"%s":%s}' % (
            extracted if extracted is not None else sort_quote("null"),
            stringify(node))
        return line, extracted is not None
    if ext is not None:
        return '{"%s":%s}' % (sort_quote("null"), stringify(node)), False
    return stringify(node), True


def jsontool_spark(spark, paths, wrap: bool = False,
                   extract: str | None = None, csv_path: str | None = None,
                   pe: bool = False, stderr=None):
    """Spark jsontool: per-file tasks run the walk + stringify + CSV
    attach kernel (CSV broadcast as a first-row-wins dict — equivalent
    to the reference's forward-only cursor when inputs are sorted, and
    sorted input is the tool's contract); the driver replays the
    reference's merge cursor over just the (ordered) join keys so
    out-of-sort inputs fail with exactly the reference's error, then
    streams lines in (file, seq) order through the wrap/extract state
    machine.  Feature bodies never pass through the driver unjoined or
    unstringified — the driver sees only finished output lines.

    Yields output lines like run_jsontool_local."""
    import pandas as pd

    if stderr is None:
        stderr = sys.stderr
    if extract is not None and wrap:
        raise JsonToolError("--wrap and --extract not supported together")

    from ..operators.tilejoin import csv_dequote, csv_split

    csv_text = None
    header = []
    mapping = {}
    if csv_path is not None:
        with open(csv_path, "r", encoding="utf-8", errors="surrogateescape") as f:
            csv_text = f.read()
        lines = list(_csv_lines(csv_text))
        if not lines:
            raise JsonToolError("Couldn't get column header from CSV file")
        header = [csv_dequote(h) for h in csv_split(lines[0])]
        if not header:
            raise JsonToolError(f'No columns in CSV header "{lines[0]}"')
        for line in lines[1:]:
            fields = [csv_dequote(f) for f in csv_split(line)]
            if fields:
                mapping.setdefault(fields[0], fields)

    from .geojson import read_file_text

    files_pdf = pd.DataFrame({"path": list(paths),
                              "fidx": range(len(paths))})
    files_df = spark.createDataFrame(files_pdf) \
        .repartition(max(len(paths), 1), "path")
    bc = spark.sparkContext.broadcast((header, mapping, pe, extract))

    def part(it):
        hdr, mp, pe_, ext = bc.value
        for b in it:
            for r in b.itertuples(index=False):
                rows = []
                text = read_file_text(r.path)
                objs = parse_stream_objects(text)
                import io as _io

                sink = _io.StringIO()  # per-task stderr noise stays local
                for seq, (kind, node) in enumerate(
                        walk_features(objs, r.path, stderr=sink)):
                    joinkey = None
                    has_key = False
                    body_plain = None
                    if kind == 1 and hdr:
                        properties = node.get("properties")
                        key = MISSING
                        if isinstance(properties, JsonObj):
                            key = properties.get(hdr[0])
                        if key is not MISSING:
                            has_key = True
                            joinkey = (str(key) if isinstance(key, str)
                                       else stringify(key))
                            fields = mp.get(joinkey)
                            if fields:
                                # pre-attach body, kept so the driver
                                # can REBUILD this row if the real merge
                                # cursor disagrees with the dict join
                                # (out-of-sort input that escapes the
                                # fatal checks).  Divergence requires
                                # the key to EXIST in the CSV, so
                                # unjoined rows ship no duplicate body.
                                body_plain = stringify(node)
                                _append_csv_fields(properties, hdr,
                                                   fields, pe_)
                    line, found = _format_feature_line(node, kind, ext)
                    rows.append({"fidx": int(r.fidx), "seq": seq,
                                 "kind": kind, "line": line,
                                 "joinkey": joinkey, "has_key": has_key,
                                 "body_plain": body_plain,
                                 "extract_found": found})
                if rows:
                    yield pd.DataFrame(rows)

    out = files_df.mapInPandas(
        part, schema="fidx long, seq long, kind int, line string, "
                     "joinkey string, has_key boolean, "
                     "body_plain string, extract_found boolean") \
        .orderBy("fidx", "seq")

    ost = _OutState()
    joiner = CsvJoiner(csv_text, pe, stderr=stderr) if csv_text is not None \
        else None
    warned_key = False
    for row in out.toLocalIterator():
        line = row["line"]
        found = row["extract_found"]
        if joiner is not None and row["kind"] == 1:
            # replay the reference's merge cursor over the key sequence
            # (in output order): validates sort order with the exact
            # reference errors, and yields the row the CURSOR would
            # join — on out-of-sort input that escapes the fatal
            # checks, that can differ from the broadcast dict the
            # distributed attach used (the cursor silently skips rows
            # it already passed), so divergent rows are rebuilt here
            # from the pre-attach body.
            if not joiner.header:
                s = joiner._getline()
                if not s:
                    raise JsonToolError(
                        "Couldn't get column header from CSV file")
                err = joiner._check_utf8(s)
                if err:
                    raise JsonToolError(err)
                joiner.header = [joiner._dequote(h)
                                 for h in joiner._split(s)]
                if not joiner.header:
                    raise JsonToolError(f'No columns in CSV header "{s}"')
            if not row["has_key"]:
                if not warned_key:
                    print(f'Warning: couldn\'t find CSV key '
                          f'"{joiner.header[0]}" in JSON', file=stderr)
                    warned_key = True
            else:
                cursor_fields = joiner.advance(row["joinkey"])
                dict_fields = mapping.get(row["joinkey"])
                if cursor_fields != dict_fields:
                    node = parse_stream_objects(row["body_plain"])[0]
                    if cursor_fields is not None:
                        _append_csv_fields(node.get("properties"),
                                           joiner.header, cursor_fields,
                                           joiner.pe)
                    line, found = _format_feature_line(node, 1, extract)
        if extract is not None:
            if not found and not ost.warned_extract:
                print(f'Warning: extract key "{extract}" not found in JSON',
                      file=stderr)
                ost.warned_extract = True
            yield line
            continue
        if not wrap:
            yield line
            continue
        yield from _out_lines(ost, line, row["kind"], None,
                              True, None, stderr)
    yield from _out_flush(ost)
