"""tippecanoe-json-tool drop-in (jsontool.cpp): byte parity against
the reference binary for plain / --wrap / --extract / CSV-join modes,
incl. the Makefile's own json-tool-test sequence and its checked-in
golden, plus the Spark path."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import REPO

JTBIN = os.path.join(REPO, ".refbuild", "tippecanoe-json-tool")
JP = "/root/reference/tests/join-population"

requires_jsontool = pytest.mark.skipif(
    not os.path.exists(JTBIN), reason="tippecanoe-json-tool not built")


def _ref(args, stdin: bytes | None = None):
    r = subprocess.run([JTBIN, *args], input=stdin, capture_output=True)
    return r.returncode, r.stdout


def _ours(args, stdin_text: str | None = None):
    """Run our json-tool in-process, capturing stdout bytes."""
    import contextlib
    import io

    from tippecanoe_spark.cli import main

    buf = io.BytesIO()

    class _W:
        buffer = buf

        def write(self, s):
            buf.write(s.encode())

        def flush(self):
            pass

    old_out, old_in = sys.stdout, sys.stdin
    sys.stdout = _W()
    try:
        if stdin_text is not None:
            sys.stdin = io.StringIO(stdin_text)
        with contextlib.redirect_stderr(io.StringIO()):
            rc = main(["json-tool", *args])
    finally:
        sys.stdout, sys.stdin = old_out, old_in
    return rc, buf.getvalue()


@requires_jsontool
@pytest.mark.parametrize("args", [
    [f"{JP}/macarthur.json"],
    ["-w", f"{JP}/macarthur.json"],
    ["-w", f"{JP}/macarthur.json", f"{JP}/macarthur2.json"],
    ["-e", "NAME", f"{JP}/macarthur.json"],
])
def test_jsontool_parity_basic(args):
    rrc, rout = _ref(args)
    orc, oout = _ours(args)
    assert orc == rrc
    assert oout == rout


@requires_jsontool
def test_jsontool_makefile_sequence(tmp_path):
    """The reference Makefile's json-tool-test (Makefile:280-289):
    extract+sort, then the CSV join and its --empty-csv-columns-are-null
    variant, compared against the binary AND the checked-in
    .standard goldens."""
    rrc, rout = _ref(["-e", "GEOID10", f"{JP}/tabblock_06001420.json"])
    orc, oout = _ours(["-e", "GEOID10", f"{JP}/tabblock_06001420.json"])
    assert (orc, oout) == (rrc, rout)

    sorted_path = tmp_path / "sorted.json"
    sorted_path.write_bytes(b"".join(
        line + b"\n" for line in sorted(rout.splitlines())))

    for extra, golden in [
        ([], f"{JP}/tabblock_06001420.json.sort.joined.standard"),
        (["--empty-csv-columns-are-null"],
         f"{JP}/tabblock_06001420-null.json.sort.joined.standard"),
    ]:
        args = [*extra, "-c", f"{JP}/population.csv", str(sorted_path)]
        rrc, rout2 = _ref(args)
        orc, oout2 = _ours(args)
        assert orc == rrc == 0
        assert oout2 == rout2
        assert oout2 == open(golden, "rb").read()


@requires_jsontool
def test_jsontool_bare_geometries_and_stdin():
    nd = ('{"type":"Point","coordinates":[1,2]}\n'
          '{"type":"LineString","coordinates":[[1,2],[3,4]]}\n')
    rrc, rout = _ref(["-w"], stdin=nd.encode())
    orc, oout = _ours(["-w"], stdin_text=nd)
    assert (orc, oout) == (rrc, rout)
    assert b"GeometryCollection" in oout


@requires_jsontool
def test_jsontool_geometry_veto_is_positional():
    """jsonpull probes the enclosing hash the moment a candidate
    geometry COMPLETES (geojson-loop.cpp:76-92), so a 'geometry' key
    AFTER the candidate's pair cannot veto it — only one at-or-before
    can (r5 regression: the old walk tested the fully-parsed parent)."""
    cases = [
        # later 'geometry' key: candidate under 'x' IS emitted
        '{"x": {"type":"Point","coordinates":[0,0]}, "geometry": 1}\n',
        # earlier 'geometry' key: vetoed
        '{"geometry": 1, "x": {"type":"Point","coordinates":[0,0]}}\n',
        # candidate is itself the geometry value: vetoed
        '{"geometry": {"type":"Point","coordinates":[0,0]}}\n',
        # same positional rule for 'geometries' in the grandparent
        '{"x": [{"type":"Point","coordinates":[0,0]}], "geometries": 1}\n',
        '{"geometries": 1, "x": [{"type":"Point","coordinates":[0,0]}]}\n',
    ]
    for doc in cases:
        rrc, rout = _ref([], stdin=doc.encode())
        orc, oout = _ours([], stdin_text=doc)
        assert (orc, oout) == (rrc, rout), doc


@requires_jsontool
def test_jsontool_bundled_short_options(tmp_path):
    """getopt_long splits bundled shorts ("-ename", "-we name"); the
    drop-in must accept the same spellings (r5 regression)."""
    f = tmp_path / "in.json"
    f.write_text('{"type":"Feature","properties":{"name":"a"},'
                 '"geometry":{"type":"Point","coordinates":[1,1]}}\n')
    for args in (["-ename"], ["-e", "name"], ["-we", "name"], ["-wename"]):
        rrc, rout = _ref([*args, str(f)])
        orc, oout = _ours([*args, str(f)])
        assert (orc, oout) == (rrc, rout), args
    # getopt consumes the NEXT token verbatim as an option argument even
    # when it starts with '-': "-e -we" extracts the key "-we", it is
    # NOT bundled -w -e (r5 regression: a context-free splitter mangled
    # it and silently read stdin)
    f2 = tmp_path / "dash.json"
    f2.write_text('{"type":"Feature","properties":{"-we":"x"},'
                  '"geometry":{"type":"Point","coordinates":[1,1]}}\n')
    rrc, rout = _ref(["-e", "-we", str(f2)])
    orc, oout = _ours(["-e", "-we", str(f2)])
    assert (orc, oout) == (rrc, rout)
    # "-pe -c <file>": -c consumes the file as its CSV argument, leaving
    # no inputs — both sides fall back to (empty) stdin, rc 0
    rrc, rout = _ref(["-pe", "-c", str(f2)], stdin=b"")
    orc, oout = _ours(["-pe", "-c", str(f2)], stdin_text="")
    assert (orc, oout) == (rrc, rout)


@requires_jsontool
def test_jsontool_mixture_is_fatal():
    nd = ('{"type":"Point","coordinates":[1,2]}\n'
          '{"type":"Feature","properties":{},'
          '"geometry":{"type":"Point","coordinates":[5,6]}}\n')
    rrc, rout = _ref(["-w"], stdin=nd.encode())
    orc, oout = _ours(["-w"], stdin_text=nd)
    assert rrc == 1 and orc == 1
    assert oout == rout  # partial output printed before the error


@requires_jsontool
def test_jsontool_out_of_sort_and_unicode(tmp_path):
    """GeoJSON out-of-sort is fatal with partial output; sort_quote
    reproduces the reference's DECIMAL \\u%04lu quirk (including
    >4-digit escapes for codepoints over 9999) and raw UTF-8 above the
    surrogate threshold."""
    src = tmp_path / "oos.json"
    src.write_text(
        '{"type":"Feature","properties":{"k":"b","s":"sn\\u00f6w '
        '\\u2603 \\u0007"},"geometry":{"type":"Point",'
        '"coordinates":[1,2]}}\n'
        '{"type":"Feature","properties":{"k":"a"},"geometry":'
        '{"type":"Point","coordinates":[3,4]}}\n')
    csv = tmp_path / "j.csv"
    csv.write_text('k, v\n"a",1\n"b",2\n')
    rrc, rout = _ref(["-c", str(csv), str(src)])
    orc, oout = _ours(["-c", str(csv), str(src)])
    assert rrc == 1 and orc == 1
    assert oout == rout

    rrc, rout = _ref(["-e", "s", str(src)])
    orc, oout = _ours(["-e", "s", str(src)])
    assert (orc, oout) == (rrc, rout)
    # decimal quirk: '☃' (U+2603 = 9731) as 霱, missing key as
    # the decimal escapes of "null"
    assert b"\\u9731" in oout
    assert b'{"\\u0110\\u0117\\u0108\\u0108":' in oout


@requires_jsontool
def test_jsontool_number_and_order_preservation():
    """jsonpull stringify keeps number source text (1.50, 1e3) and
    duplicate keys verbatim."""
    nd = ('{"type":"Feature","properties":{"a":1.50,"b":1e3,"a":2},'
          '"geometry":{"type":"Point","coordinates":[0.5,1.0]}}\n')
    rrc, rout = _ref([], stdin=nd.encode())
    orc, oout = _ours([], stdin_text=nd)
    assert (orc, oout) == (rrc, rout)
    assert b'"a":1.50,"b":1e3,"a":2' in oout
    assert b"[0.5,1.0]" in oout


@requires_jsontool
def test_jsontool_spark_path_matches_local(tmp_path):
    """The distributed path produces the identical byte stream,
    including the CSV join and multi-file wrap assembly."""
    rrc, rout = _ref(["-e", "GEOID10", f"{JP}/tabblock_06001420.json"])
    sorted_path = tmp_path / "sorted.json"
    sorted_path.write_bytes(b"".join(
        line + b"\n" for line in sorted(rout.splitlines())))

    args = ["-c", f"{JP}/population.csv", str(sorted_path)]
    _, rjoin = _ref(args)
    orc, ojoin = _ours(["--spark-master", "local[4]", *args])
    assert orc == 0
    assert ojoin == rjoin

    args = ["-w", f"{JP}/macarthur.json", f"{JP}/macarthur2.json"]
    _, rwrap = _ref(args)
    orc, owrap = _ours(["--spark-master", "local[4]", *args])
    assert orc == 0
    assert owrap == rwrap


@requires_jsontool
def test_jsontool_spark_cursor_skip_semantics(tmp_path):
    """Out-of-sort CSV that ESCAPES the fatal checks: the forward-only
    cursor reads past row 'a' while serving feature 'a' (no join,
    no error) — a dict join would wrongly attach it.  The Spark path
    must reproduce the cursor exactly (r5 regression: the broadcast
    dict joined rows the cursor skips)."""
    csvf = tmp_path / "j.csv"
    csvf.write_text("key,attr\nb,vb\na,va\n")
    js = tmp_path / "in.json"
    js.write_text(
        '{"type":"Feature","properties":{"key":"a"},'
        '"geometry":{"type":"Point","coordinates":[1,1]}}\n'
        '{"type":"Feature","properties":{"key":"b"},'
        '"geometry":{"type":"Point","coordinates":[2,2]}}\n')
    rrc, rout = _ref(["-c", str(csvf), str(js)])
    orc, oout = _ours(["-c", str(csvf), str(js)])
    assert (orc, oout) == (rrc, rout)
    assert b'"key":"a"}' in rout  # feature a NOT joined by the cursor
    src, sout = _ours(["--spark-master", "local[2]", "-c", str(csvf),
                       str(js)])
    assert (src, sout) == (rrc, rout)


@requires_jsontool
def test_jsontool_long_options_parity(tmp_path):
    """--prevent (long -p), the '--' end-of-options marker, and unknown
    long options must behave like getopt_long (jsontool.cpp:406):
    '--prevent e' is accepted, '--' ends option scanning, and an
    unknown '--foo' is an error — never treated as an input file."""
    js = tmp_path / "f.json"
    js.write_text(
        '{"type":"Feature","properties":{},'
        '"geometry":{"type":"Point","coordinates":[0,0]}}\n')
    for args in (["--prevent", "e", str(js)],
                 ["--prevent=e", str(js)],
                 ["--", str(js)]):
        rrc, rout = _ref(args)
        orc, oout = _ours(args)
        assert (orc, oout) == (rrc, rout), args
    # unknown long option / bad --prevent value: both error (rc 1, no
    # output), matching the reference's exit
    for args in (["--bogus", str(js)],
                 ["--prevent", "x", str(js)],
                 ["--wrap=x", str(js)]):
        rrc, rout = _ref(args)
        orc, oout = _ours(args)
        assert (orc, oout) == (rrc, rout) == (1, b""), args
