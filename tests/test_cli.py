"""The drop-in CLI (python -m tippecanoe_spark): same flag syntax as
the reference binary, byte-identical tilesets through both the local
runner and the Spark path, plus tile-join and decode subcommands."""

from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import REFBIN, REPO

TJBIN = os.path.join(REPO, ".refbuild", "tile-join")
REF_TESTS = "/root/reference/tests"

requires_reference = pytest.mark.skipif(
    not os.path.exists(REFBIN), reason="reference binary not built")
requires_tilejoin = pytest.mark.skipif(
    not os.path.exists(TJBIN), reason="tile-join binary not built")


def _read(path):
    from tippecanoe_spark.io.mbtiles import read_mbtiles

    return read_mbtiles(path)


@requires_reference
def test_cli_build_local_matches_reference(tmp_path):
    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/muni/muni.json"
    ref_out = tmp_path / "ref.mbtiles"
    our_out = tmp_path / "ours.mbtiles"
    subprocess.run([REFBIN, "-q", "-f", "-z5", "-o", str(ref_out), src],
                   check=True, capture_output=True)
    rc = main(["-q", "-f", "-z5", "--local-runner",
               "-o", str(our_out), src])
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))


@requires_reference
def test_cli_build_spark_multifile_matches_reference(tmp_path):
    """Spark path, two inputs (one gzipped), tippecanoe flag spellings
    incl. an attached-value option (-z4) and a drop mode."""
    from tippecanoe_spark.cli import main

    raw = open(f"{REF_TESTS}/muni/muni.json", "rb").read()
    p1 = tmp_path / "alpha.json"
    p1.write_bytes(raw)
    p2 = tmp_path / "beta.json.gz"
    p2.write_bytes(gzip.compress(raw))
    ref_out = tmp_path / "ref.mbtiles"
    our_out = tmp_path / "ours.mbtiles"
    subprocess.run([REFBIN, "-q", "-f", "-z4", "-o", str(ref_out),
                    str(p1), str(p2)], check=True, capture_output=True)
    rc = main(["-q", "-f", "-z4", "--spark-master", "local[4]",
               "-o", str(our_out), str(p1), str(p2)])
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))

    # metadata fields the reference also derives
    import sqlite3

    ref_meta = dict(sqlite3.connect(str(ref_out)).execute(
        "select name, value from metadata"))
    our_meta = dict(sqlite3.connect(str(our_out)).execute(
        "select name, value from metadata"))
    for k in ("minzoom", "maxzoom", "bounds", "center", "format", "json"):
        assert our_meta[k] == ref_meta[k], (k, ref_meta[k], our_meta[k])


@requires_reference
@requires_tilejoin
def test_cli_join_csv_matches_reference(tmp_path):
    from tippecanoe_spark.cli import main

    feats = []
    for i, g in enumerate(["muni", "other", "n3", "nomatch"]):
        feats.append(json.dumps({
            "type": "Feature",
            "properties": {"GEOID": g, "orig": i},
            "geometry": {"type": "Point", "coordinates": [i * 3, i * 2]},
        }))
    src = tmp_path / "in.json"
    src.write_text("\n".join(feats))
    csv_path = tmp_path / "join.csv"
    csv_path.write_text('GEOID,population\n"muni",12345\nother, 77 \n')

    base = tmp_path / "base.mbtiles"
    rc = main(["-q", "-f", "-z4", "--local-runner", "-l", "in",
               "-o", str(base), str(src)])
    assert rc == 0

    ref_out = tmp_path / "refjoin.mbtiles"
    subprocess.run([TJBIN, "-q", "-f", "-o", str(ref_out),
                    "-c", str(csv_path), str(base)],
                   check=True, capture_output=True)
    our_out = tmp_path / "ourjoin.mbtiles"
    rc = main(["join", "-f", "-o", str(our_out), "-c", str(csv_path),
               str(base)])
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))


@requires_reference
def test_cli_short_letter_options_match_reference(tmp_path):
    """The reference's -aX / -pX single-letter spellings (options.hpp
    letter tables), incl. multi-letter bundles like -ps -pt."""
    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/tl_2018_51685_roads/in.json"
    for opts in (["-z6", "-as", "-O50"],        # -as = --drop-densest-as-needed
                 ["-z6", "-ps", "-pt"],         # no-simplify + no-tiny-poly
                 ["-z6", "-ar", "-ao"]):        # reverse + reorder
        ref_out = tmp_path / "ref.mbtiles"
        our_out = tmp_path / "ours.mbtiles"
        subprocess.run([REFBIN, "-q", "-f", "-o", str(ref_out)]
                       + opts + [src], check=True, capture_output=True)
        rc = main(["-q", "-f", "--local-runner", "-l", "in",
                   "-o", str(our_out)] + opts + [src])
        assert rc == 0
        assert _read(str(ref_out)) == _read(str(our_out)), opts


@requires_reference
def test_cli_named_layers_match_reference(tmp_path):
    """-L name:file per-input layer naming (--named-layer)."""
    from tippecanoe_spark.cli import main

    raw = open(f"{REF_TESTS}/muni/muni.json", "rb").read()
    p1 = tmp_path / "f1.json"
    p1.write_bytes(raw)
    p2 = tmp_path / "f2.json"
    p2.write_bytes(raw)
    ref_out = tmp_path / "ref.mbtiles"
    our_out = tmp_path / "ours.mbtiles"
    args = ["-q", "-f", "-z4", "-L", f"alpha:{p1}", "-L", f"beta:{p2}"]
    subprocess.run([REFBIN] + args + ["-o", str(ref_out)],
                   check=True, capture_output=True)
    rc = main(args + ["--local-runner", "-o", str(our_out)])
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))


@requires_reference
def test_cli_csv_input_matches_reference(tmp_path):
    from tippecanoe_spark.cli import main

    src = "/root/reference/tests/csv/ne_110m_populated_places_simple.csv"
    ref_out = tmp_path / "ref.mbtiles"
    our_out = tmp_path / "ours.mbtiles"
    subprocess.run([REFBIN, "-q", "-f", "-z3", "-o", str(ref_out), src],
                   check=True, capture_output=True)
    rc = main(["-q", "-f", "-z3", "--local-runner", "-o", str(our_out), src])
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))


@requires_reference
def test_cli_guess_flags_spark_match_reference(tmp_path):
    """-zg / -Bg / -rg through the SPARK path: the distributed
    estimators (resolve_guesses_spark) drive the build; tiles and the
    guessed maxzoom are byte-identical to the reference."""
    import sqlite3

    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/muni/muni.json"
    ref_out = tmp_path / "ref.mbtiles"
    our_out = tmp_path / "ours.mbtiles"
    subprocess.run([REFBIN, "-q", "-f", "-zg", "-Bg", "-rg",
                    "-o", str(ref_out), src], check=True, capture_output=True)
    rc = main(["-q", "-f", "-zg", "-Bg", "-rg", "--spark-master", "local[4]",
               "-o", str(our_out), src])
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))
    ref_meta = dict(sqlite3.connect(str(ref_out)).execute(
        "select name, value from metadata"))
    our_meta = dict(sqlite3.connect(str(our_out)).execute(
        "select name, value from metadata"))
    assert our_meta["maxzoom"] == ref_meta["maxzoom"]


@requires_reference
def test_cli_guess_flags_hilbert_match_reference(tmp_path):
    """-ah combined with -zg/-Bg/-rg: with --hilbert the ix column is
    hilbert-encoded, so the guess scans must decode/encode through the
    hilbert curve (main.cpp:3051-3054 dispatch; serial.cpp:468,
    main.cpp:2059).  Byte-identical tiles + guessed maxzoom through
    both the Spark estimators and the local ones.  The wraparound
    fixture has teeth here: decoding its hilbert indexes as quadkeys
    guesses maxzoom 9 instead of the correct 10."""
    import sqlite3

    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/wraparound/in.json"
    ref_out = tmp_path / "ref.mbtiles"
    subprocess.run([REFBIN, "-q", "-f", "-ah", "-zg", "-Bg", "-rg",
                    "-o", str(ref_out), src], check=True, capture_output=True)
    ref = _read(str(ref_out))
    ref_meta = dict(sqlite3.connect(str(ref_out)).execute(
        "select name, value from metadata"))
    for extra in (["--spark-master", "local[4]"], ["--local-runner"]):
        our_out = tmp_path / "ours.mbtiles"
        rc = main(["-q", "-f", "-ah", "-zg", "-Bg", "-rg", *extra,
                   "-o", str(our_out), src])
        assert rc == 0
        assert ref == _read(str(our_out)), extra
        our_meta = dict(sqlite3.connect(str(our_out)).execute(
            "select name, value from metadata"))
        assert our_meta["maxzoom"] == ref_meta["maxzoom"], extra


@requires_reference
@requires_tilejoin
def test_cli_join_option_matrix_matches_reference(tmp_path):
    """join subcommand flags (-x, -X, -pC, -R rename) byte-identical to
    the tile-join binary."""
    from tippecanoe_spark.cli import main

    feats = []
    for i, g in enumerate(["muni", "other", "n3"]):
        feats.append(json.dumps({
            "type": "Feature",
            "properties": {"GEOID": g, "orig": i},
            "geometry": {"type": "Point", "coordinates": [i * 3, i * 2]},
        }))
    src = tmp_path / "in.json"
    src.write_text("\n".join(feats))
    base = tmp_path / "base.mbtiles"
    assert main(["-q", "-f", "-z4", "--local-runner", "-l", "in",
                 "-o", str(base), str(src)]) == 0

    for ref_opts, our_opts in (
            (["-x", "orig"], ["-x", "orig"]),
            (["-X"], ["-X"]),
            (["-pC"], ["-pC"]),
    ):
        ref_out = tmp_path / "rj.mbtiles"
        our_out = tmp_path / "oj.mbtiles"
        subprocess.run([TJBIN, "-q", "-f", "-o", str(ref_out)]
                       + ref_opts + [str(base)],
                       check=True, capture_output=True)
        rc = main(["join", "-f", "-o", str(our_out)] + our_opts + [str(base)])
        assert rc == 0
        assert _read(str(ref_out)) == _read(str(our_out)), ref_opts


@requires_reference
def test_cli_one_tile_matches_reference(tmp_path):
    """-R z/x/y single-tile debug build (--one-tile)."""
    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/muni/muni.json"
    ref_out = tmp_path / "ref.mbtiles"
    our_out = tmp_path / "ours.mbtiles"
    subprocess.run([REFBIN, "-q", "-f", "-R", "4/2/6", "-o", str(ref_out),
                    src], check=True, capture_output=True)
    rc = main(["-q", "-f", "-R", "4/2/6", "-o", str(our_out), src])
    assert rc == 0
    ref = _read(str(ref_out))
    ours = _read(str(our_out))
    assert set(ref) == {(4, 2, 6)} and ref == ours


@requires_reference
def test_cli_attribute_description_and_no_tilestats(tmp_path):
    """-Y name:desc replaces the derived field type in the metadata
    json; --no-tile-stats drops the tilestats block (both
    mbtiles.cpp)."""
    import sqlite3

    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/muni/muni.json"
    for opts in (["-Y", "name:The stop name"],
                 ["--no-tile-stats"],
                 ["-Y", "name:x", "--no-tile-stats"]):
        ref_out = tmp_path / "ref.mbtiles"
        our_out = tmp_path / "ours.mbtiles"
        subprocess.run([REFBIN, "-q", "-f", "-z3", "-o", str(ref_out)]
                       + opts + [src], check=True, capture_output=True)
        rc = main(["-q", "-f", "-z3", "--local-runner",
                   "-o", str(our_out)] + opts + [src])
        assert rc == 0
        ref_meta = dict(sqlite3.connect(str(ref_out)).execute(
            "select name, value from metadata"))
        our_meta = dict(sqlite3.connect(str(our_out)).execute(
            "select name, value from metadata"))
        assert our_meta["json"] == ref_meta["json"], opts
        assert _read(str(ref_out)) == _read(str(our_out))


def _decode_ours(args, capsys):
    from tippecanoe_spark.cli import main

    capsys.readouterr()  # drain
    assert main(["decode"] + args) == 0
    return capsys.readouterr().out


def _decode_ref(args):
    p = subprocess.run([os.path.join(REPO, ".refbuild", "tippecanoe-decode")]
                       + args, capture_output=True, text=True, check=True)
    return p.stdout


@requires_reference
def test_cli_decode_byte_identical(tmp_path, capsys):
    """decode subcommand == tippecanoe-decode byte-for-byte: full
    tileset, -c pipeline, -S stats, zoom range, layer filter,
    metadata exclusion, and single-tile (with parent fallback) modes,
    over point, line, and polygon tilesets with string and numeric
    attributes."""
    from tippecanoe_spark.cli import main

    pts = tmp_path / "pts.mbtiles"
    assert main(["-q", "-f", "-z4", "--local-runner", "-o", str(pts),
                 f"{REF_TESTS}/muni/muni.json"]) == 0

    feats = []
    for i in range(40):
        x0 = (i % 8) * 0.5 - 2
        y0 = (i // 8) * 0.5 - 1
        ring = [[x0, y0], [x0 + 0.5, y0], [x0 + 0.5, y0 + 0.5],
                [x0, y0 + 0.5], [x0, y0]]
        feats.append(json.dumps({
            "type": "Feature",
            "properties": {"i": i, "r": i + 0.25, "s": f"p{i}",
                           "b": i % 2 == 0},
            "geometry": {"type": "Polygon", "coordinates": [ring]}}))
    psrc = tmp_path / "polys.json"
    psrc.write_text("\n".join(feats))
    pol = tmp_path / "pol.mbtiles"
    assert main(["-q", "-f", "-z4", "--local-runner", "-l", "polys",
                 "-o", str(pol), str(psrc)]) == 0

    lns = tmp_path / "lns.mbtiles"
    assert main(["-q", "-f", "-z6", "--local-runner", "-l", "in",
                 "-o", str(lns), f"{REF_TESTS}/tl_2018_51685_roads/in.json"]) == 0

    for ts in (pts, pol, lns):
        for opts in ([], ["-c"], ["-S"], ["-Z", "2", "-z", "4"],
                     ["-x", "name"], ["-l", "polys"]):
            assert _decode_ours(opts + [str(ts)], capsys) == \
                _decode_ref(opts + [str(ts)]), (ts, opts)
    # single tile + parent fallback (requests a z6 child of a z4 tile)
    assert _decode_ours([str(pts), "4", "2", "6"], capsys) == \
        _decode_ref([str(pts), "4", "2", "6"])
    assert _decode_ours([str(pts), "6", "10", "24"], capsys) == \
        _decode_ref([str(pts), "6", "10", "24"])


@requires_reference
def test_cli_enumerate_byte_identical(tmp_path, capsys):
    en = os.path.join(REPO, ".refbuild", "tippecanoe-enumerate")
    if not os.path.exists(en):
        pytest.skip("enumerate binary not built")
    from tippecanoe_spark.cli import main

    out = tmp_path / "e.mbtiles"
    assert main(["-q", "-f", "-z4", "--local-runner", "-o", str(out),
                 f"{REF_TESTS}/muni/muni.json"]) == 0
    ref = subprocess.run([en, str(out)], capture_output=True, text=True,
                         check=True).stdout
    capsys.readouterr()
    assert main(["enumerate", str(out)]) == 0
    assert capsys.readouterr().out == ref


@requires_reference
def test_cli_build_spark_dirtiles_matches_reference(tmp_path):
    """Spark path with -e: distributed foreachPartition writes
    (io.dirtiles.write_dirtiles_spark), byte-identical tiles and the
    same derived metadata.json fields as the reference's -e export."""
    from tippecanoe_spark.cli import main
    from tippecanoe_spark.io.dirtiles import read_dirtiles

    src = f"{REF_TESTS}/muni/muni.json"
    ref_out = tmp_path / "ref_dir"
    our_out = tmp_path / "our_dir"
    subprocess.run([REFBIN, "-q", "-f", "-z4", "-e", str(ref_out), src],
                   check=True, capture_output=True)
    rc = main(["-q", "-f", "-z4", "--spark-master", "local[4]",
               "-e", str(our_out), src])
    assert rc == 0
    assert read_dirtiles(str(ref_out)) == read_dirtiles(str(our_out))
    ref_meta = json.load(open(ref_out / "metadata.json"))
    our_meta = json.load(open(our_out / "metadata.json"))
    for k in ("minzoom", "maxzoom", "bounds", "center", "format"):
        assert our_meta[k] == ref_meta[k], (k, ref_meta[k], our_meta[k])


def test_dirtiles_spark_write_task_retry_idempotent(tmp_path):
    """A task that dies after writing part of its partition must
    succeed on retry over its own partial output (temp + os.replace;
    the exists/force policy runs once on the driver).  Uses a dedicated
    local[2,2] session so Spark actually re-attempts the failed task."""
    from pyspark.sql import SparkSession

    from tippecanoe_spark.io.dirtiles import read_dirtiles, write_dirtiles_spark

    existing = SparkSession.getActiveSession()
    if existing is not None:
        existing.stop()  # getOrCreate would reuse it (wrong master = no retries)
    spark = (SparkSession.builder.master("local[2,2]")
             .appName("dirtiles-retry")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    assert spark.sparkContext.master == "local[2,2]"
    try:
        want = {(3, x, 1): bytes([x]) * 10 for x in range(6)}

        def gen(_it):
            import pandas as pd
            from pyspark import TaskContext

            rows = pd.DataFrame(
                {"z": [3] * 6, "x": list(range(6)), "y": [1] * 6,
                 "tile": [bytes([x]) * 10 for x in range(6)]})
            yield rows.iloc[:3]  # partial output lands on disk...
            if TaskContext.get().attemptNumber() == 0:
                raise RuntimeError("injected task failure")
            yield rows.iloc[3:]

        tiles_df = (spark.range(1).repartition(1).mapInPandas(
            gen, schema="z int, x long, y long, tile binary"))
        out = tmp_path / "out"
        n, _busiest = write_dirtiles_spark(tiles_df, str(out), force=False)
        assert n == 6
        assert read_dirtiles(str(out)) == want
        leftovers = [p for root, _d, files in os.walk(out)
                     for p in files if ".tmp." in p]
        assert not leftovers, leftovers
    finally:
        spark.stop()


@requires_reference
def test_cli_force_clears_stale_dirtiles(tmp_path):
    """-f -e re-export with a smaller maxzoom must remove the old
    build's deep-zoom tiles (check_dir semantics, dirtiles.cpp:66-105),
    on both the local and the Spark CLI paths — byte-identical to the
    reference doing the same re-export."""
    from tippecanoe_spark.cli import main
    from tippecanoe_spark.io.dirtiles import read_dirtiles

    src = f"{REF_TESTS}/muni/muni.json"
    ref_out = tmp_path / "ref_dir"
    for opts in (["-q", "-f", "-z4"], ["-q", "-f", "-z2"]):
        subprocess.run([REFBIN, *opts, "-e", str(ref_out), src],
                       check=True, capture_output=True)
    want = read_dirtiles(str(ref_out))
    assert not any(z > 2 for (z, _x, _y) in want)

    for extra in ([], ["--spark-master", "local[4]"]):
        our_out = tmp_path / f"our_dir{len(extra)}"
        assert main(["-q", "-f", "-z4", *extra, "-e", str(our_out), src]) == 0
        assert any(z > 2 for (z, _x, _y) in read_dirtiles(str(our_out)))
        assert main(["-q", "-f", "-z2", *extra, "-e", str(our_out), src]) == 0
        assert read_dirtiles(str(our_out)) == want, extra


@requires_reference
def test_cli_tile_stats_limits_match_reference(tmp_path):
    """--tile-stats-values-limit / --tile-stats-sample-values-limit
    change the tilestats block in the metadata json exactly like the
    reference (mbtiles.cpp globals, main.cpp:2684-2689)."""
    import sqlite3

    from tippecanoe_spark.cli import main
    from tippecanoe_spark.operators import stats as stats_mod

    defaults = (stats_mod.MAX_TILESTATS_ATTRIBUTES,
                stats_mod.MAX_TILESTATS_SAMPLE_VALUES,
                stats_mod.MAX_TILESTATS_VALUES)
    src = f"{REF_TESTS}/muni/muni.json"
    ref_out = tmp_path / "ref.mbtiles"
    our_out = tmp_path / "ours.mbtiles"
    opts = ["-q", "-f", "-z3", "--tile-stats-values-limit", "3",
            "--tile-stats-sample-values-limit", "7"]
    subprocess.run([REFBIN, *opts, "-o", str(ref_out), src],
                   check=True, capture_output=True)
    rc = main([*opts, "--spark-master", "local[4]",
               "-o", str(our_out), src])
    assert rc == 0
    ref_meta = dict(sqlite3.connect(str(ref_out)).execute(
        "select name, value from metadata"))
    our_meta = dict(sqlite3.connect(str(our_out)).execute(
        "select name, value from metadata"))
    assert our_meta["json"] == ref_meta["json"]
    # the limits live on TileConfig now: building with overrides must
    # NOT leak into the module defaults (the r4 ADVICE defect)
    assert (stats_mod.MAX_TILESTATS_ATTRIBUTES,
            stats_mod.MAX_TILESTATS_SAMPLE_VALUES,
            stats_mod.MAX_TILESTATS_VALUES) == defaults


@requires_reference
def test_cli_allow_existing_and_exists_guard(tmp_path):
    """Without -f/-F an existing tileset refuses (mbtiles.cpp:48);
    -F / --allow-existing writes into it (forcetable, main.cpp:2912)."""
    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/onefeature/in.json"
    out = tmp_path / "out.mbtiles"
    assert main(["-q", "-z2", "--local-runner", "-o", str(out), src]) == 0
    # exists, no -f/-F -> refuse
    assert main(["-q", "-z2", "--local-runner", "-o", str(out), src]) == 1
    # -F writes into the existing db (distinct zoom avoids tile clashes)
    assert main(["-q", "-z3", "-Z3", "-F", "--local-runner",
                 "-o", str(out), src]) == 0
    zs = {z for (z, _x, _y) in _read(str(out))}
    assert 2 in zs and 3 in zs


def test_cli_errors():
    from tippecanoe_spark.cli import main

    assert main([]) == 2  # no inputs
    assert main(["in.json"]) == 2  # no output
    with pytest.raises(ValueError):
        main(["-o", "/tmp/x.mbtiles", "--definitely-not-an-option", "in.json"])


def test_cli_minzoom_above_maxzoom_fatal():
    """minzoom > maxzoom is fatal AFTER the detail clamps
    (main.cpp:3112-3115): -d14 caps maxzoom at 18, so -Z19 must error
    even though the literal -z20 exceeds it."""
    from tippecanoe_spark.cli import options_to_config

    with pytest.raises(ValueError, match="cannot be greater than"):
        options_to_config("-d14 -z20 -Z19")
    # the clamp itself: -m above -d reduces min_detail (main.cpp:3085)
    assert options_to_config("-d10 -m12").min_detail == 10
    # -zg presets maxzoom to 24 first (main.cpp:2742), so -Z up to 24 is fine
    assert options_to_config("-zg -Z20").minzoom == 20
    # -d0 is normalized to 12 BEFORE the min_detail clamp
    # (main.cpp:3081-3083), keeping min_detail at its default 7
    c = options_to_config("-d0 -z14")
    assert c.full_detail == 12 and c.min_detail == 7
    # getopt attaches the rest of the token verbatim: "-d-4" means
    # optarg "-4" (then normalized to 12), byte-parity-checked vs the
    # binary; non-numeric attachments still error
    assert options_to_config("-d-4 -z5").full_detail == 12
    import pytest as _pt
    with _pt.raises(ValueError):
        options_to_config("-dx")
    # atof's dot grammar for attached float optargs: "-r.5" is 0.5 and
    # "-r5." is 5.0 (a bare leading/trailing dot is valid to getopt+atof)
    assert options_to_config("-r.5 -z5").droprate == 0.5
    assert options_to_config("-r5. -z5").droprate == 5.0
    with _pt.raises(ValueError):
        options_to_config("-r. -z5")


@requires_reference
def test_cli_multilayer_fixtures_match_reference(tmp_path):
    """The reference's own multi-input fixtures: tests/multilayer
    (-l merged vs per-file layers) and tests/named (-L named layers +
    positional), at their goldens' option sets (Makefile:90-95)."""
    from tippecanoe_spark.cli import main

    ml = f"{REF_TESTS}/multilayer"
    nd = f"{REF_TESTS}/named"
    cases = [
        ["-z3", "-l", "together", f"{ml}/lines.json", f"{ml}/places.json"],
        ["-z3", "-n", "separate", f"{ml}/lines.json", f"{ml}/places.json"],
        ["-z0", "-L", f"algeria:{nd}/alg", "-L", f"albania:{nd}/alb",
         f"{nd}/sweden.json"],
        ["-z0", "-L", f"algeria:{nd}/alg", "-L", f"albania:{nd}/alb",
         "-l", "unified", f"{nd}/sweden.json"],
    ]
    for args in cases:
        ref_out = tmp_path / "ref.mbtiles"
        our_out = tmp_path / "ours.mbtiles"
        subprocess.run([REFBIN, "-q", "-f", "-o", str(ref_out)] + args,
                       check=True, capture_output=True)
        rc = main(["-q", "-f", "--local-runner", "-o", str(our_out)] + args)
        assert rc == 0
        assert _read(str(ref_out)) == _read(str(our_out)), args
        ref_out.unlink()
        our_out.unlink()


def _meta(path, exclude=("generator", "generator_options", "name",
                         "description")):
    import sqlite3

    db = sqlite3.connect(path)
    out = {k: v for k, v in db.execute("SELECT name, value FROM metadata")
           if k not in exclude}
    db.close()
    return out


@requires_reference
def test_cli_layer_json_source(tmp_path):
    """-L'{"file":..., "description":..., "layer":..., "format":...}'
    JSON source specs (parse_json_source, main.cpp:2407-2446): named
    layer + per-layer description into vector_layers, file "" = stdin,
    format "csv" overrides the extension dispatch.  Mirrors the
    reference Makefile's layer-json-test and csv-test (-L form)."""
    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/ne_110m_populated_places/in.json"
    ref_out, our_out = tmp_path / "ref.mbtiles", tmp_path / "ours.mbtiles"

    # named file + description
    spec = '{"file":"%s", "description":"World cities", "layer":"places"}' % src
    subprocess.run([REFBIN, "-q", "-z0", "-r1", "-yNAME", "-f",
                    "-o", str(ref_out), "-L" + spec],
                   check=True, capture_output=True)
    rc = main(["-q", "-z0", "-r1", "-yNAME", "-f", "--local-runner",
               "-o", str(our_out), "-L" + spec])
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))
    ref_meta, our_meta = _meta(str(ref_out)), _meta(str(our_out))
    assert '"description": "World cities"' in our_meta["json"]
    assert ref_meta == our_meta

    # stdin + csv format override, through the Spark path
    csv_src = f"{REF_TESTS}/csv/ne_110m_populated_places_simple.csv"
    spec = '{"file":"", "format":"csv", "layer":"places_simple"}'
    with open(csv_src, "rb") as fh:
        subprocess.run([REFBIN, "-q", "-z2", "-f", "-o", str(ref_out),
                        "-L" + spec], check=True, stdin=fh,
                       capture_output=True)
    import io
    import sys as _sys

    old = _sys.stdin
    try:
        _sys.stdin = io.TextIOWrapper(io.BytesIO(
            open(csv_src, "rb").read()), encoding="utf-8")
        rc = main(["-q", "-z2", "-f", "-o", str(our_out), "-L" + spec])
    finally:
        _sys.stdin = old
    assert rc == 0
    assert _read(str(ref_out)) == _read(str(our_out))
    assert _meta(str(ref_out)) == _meta(str(our_out))


@requires_reference
def test_cli_attribution_name_center(tmp_path):
    """-ANullIsland / -NNullIsland attached forms plus the 'center'
    metadata: the busiest maxzoom tile is chosen by final drawvec op
    count (write_tile's count, tile.cpp:549,2598-2613), not compressed
    byte size — nullisland's z4 tie straddles Greenwich, so the wrong
    metric flips the center's sign."""
    from tippecanoe_spark.cli import main

    src = f"{REF_TESTS}/nullisland/in.json"
    ref_out, our_out = tmp_path / "ref.mbtiles", tmp_path / "ours.mbtiles"
    for extra in (["-ANullIsland"], ["-NNullIsland"], []):
        subprocess.run([REFBIN, "-q", "-f", "-b0", "-z4"] + extra +
                       ["-o", str(ref_out), src],
                       check=True, capture_output=True)
        rc = main(["-q", "-f", "-b0", "-z4", "--local-runner"] + extra +
                  ["-o", str(our_out), src])
        assert rc == 0
        assert _read(str(ref_out)) == _read(str(our_out))
        assert _meta(str(ref_out)) == _meta(str(our_out)), extra
