"""Build configuration — the engine's equivalent of tippecanoe's CLI.

Defaults mirror /root/reference/main.cpp:2448-2480 (maxzoom 14, droprate
2.5, buffer 5, full detail 12, low detail 12, min detail 7, 500 KB /
200k-feature tile limits).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TileConfig:
    minzoom: int = 0
    maxzoom: int = 14          # -z      (main.cpp:2466)
    basezoom: int = -1         # -B      (defaults to maxzoom, main.cpp:3075)
    droprate: float = 2.5      # -r      (main.cpp:2472)
    # -Bg<w>/-rg<w> marker width; -Bf<n>/-rf<n> store sqrt(50000/n)
    # (main.cpp:2767-2790, 2877-2894)
    basezoom_marker_width: float = 1.0
    gamma: float = 0.0         # -g
    buffer: int = 5            # -b      (main.cpp:2474)
    full_detail: int = 12      # -d      (main.cpp:3081)
    low_detail: int = 12       # -D
    min_detail: int = 7        # -m
    simplification: float = 1.0  # -S
    max_tile_size: int = 500000     # -M (main.cpp:75)
    max_tile_features: int = 200000  # -O (main.cpp:76)
    cluster_distance: int = 0  # -K
    layer_name: str = ""       # -l (default: input basename)

    # feature transforms
    include: set = field(default_factory=set)   # -y
    exclude: set = field(default_factory=set)   # -x
    exclude_all: bool = False                   # -X
    attribute_types: dict = field(default_factory=dict)  # -T name:type
    accumulate: dict = field(default_factory=dict)       # -E name:op
    feature_filter: dict | None = None          # -j
    empty_csv_columns_null: bool = False        # -pe (geocsv import)

    # drop strategies (additional[] flags)
    drop_densest: bool = False      # --drop-densest-as-needed
    drop_smallest: bool = False     # --drop-smallest-as-needed
    drop_fraction: bool = False     # --drop-fraction-as-needed
    coalesce_densest: bool = False
    coalesce_smallest: bool = False
    coalesce_fraction: bool = False
    cluster_densest: bool = False   # --cluster-densest-as-needed
    increase_gamma: bool = False    # --increase-gamma-as-needed
    drop_lines: bool = False        # --drop-lines
    drop_polygons: bool = False     # --drop-polygons
    coalesce: bool = False          # -ac
    reverse: bool = False           # -ar
    reorder: bool = False           # -ao
    calculate_feature_density: bool = False
    detect_shared_borders: bool = False
    extend_zooms: bool = False
    grid_low_zooms: bool = False
    detect_wraparound: bool = False
    generate_ids: bool = False
    convert_stringified_ids: bool = False  # --convert-stringified-ids-to-numbers
    use_attribute_for_id: str | None = None
    one_tile: tuple | None = None               # -R z/x/y -> (x, y); z pins min=max
    attribute_descriptions: dict = field(default_factory=dict)  # -Y name:desc
    no_tilestats: bool = False                  # -pg / --no-tile-stats
    # --tile-stats-*-limit overrides (None = operators/stats defaults)
    tilestats_attributes_limit: int | None = None
    tilestats_sample_values_limit: int | None = None
    tilestats_values_limit: int | None = None

    # prevent[] flags
    no_clipping: bool = False        # -pc
    no_duplication: bool = False     # -pD
    no_tiny_polygon_reduction: bool = False  # -pt
    no_simplification: bool = False  # -ps
    no_simplification_low: bool = False  # -pS (actually: at maxzoom)
    no_shared_nodes: bool = False    # -pn / --no-simplification-of-shared-nodes
    no_feature_limit: bool = False   # -pf
    no_tile_size_limit: bool = False  # -pk
    # -pd / --force-feature-limit (P_DYNAMIC_DROP, main.cpp:2560).
    # Enables the per-tile fraction shrink in the retry ladder
    # (tile.cpp:2396,2494) WITHOUT joining the 2-pass zoom-global
    # discovery (tile.cpp:2780-2782 lists only additional[] flags) and
    # WITHOUT exporting fraction_out (tile.cpp:2404-2410 ratchets only
    # for A_DROP/COALESCE_FRACTION_AS_NEEDED); still_dropping is set
    # unconditionally when the shrink fires (tile.cpp:2407-2408).
    prevent_dynamic_drop: bool = False
    no_tile_compression: bool = False  # -pC
    no_input_order: bool = False     # -pi (preserve input order)
    use_source_polygon_winding: bool = False  # -pw
    reverse_source_polygon_winding: bool = False  # -pW
    use_hilbert: bool = False        # --hilbert

    prefilter: str | None = None   # -C (shell pipe per tile, plugin.cpp)
    postfilter: str | None = None  # -c
    projection: str = "EPSG:4326"  # -s (input CRS; EPSG:3857 supported)

    clip_bboxes: list = field(default_factory=list)  # --clip-bounding-box
    geometry_scale_override: int = -1  # frozen when --extend-zooms grows maxzoom
    guess_maxzoom_flag: bool = False   # -zg (resolved by operators.guess)

    def __post_init__(self):
        if self.basezoom < 0:
            self.basezoom = self.maxzoom

    @property
    def geometry_scale(self) -> int:
        """main.cpp:3123: 32 - (full_detail + maxzoom), floored at 0.
        Computed ONCE at startup in the reference; when --extend-zooms
        grows maxzoom mid-run the scale does not change (the override
        pins it)."""
        if self.geometry_scale_override >= 0:
            return self.geometry_scale_override
        gs = 32 - (self.full_detail + self.maxzoom)
        return max(gs, 0)

    def detail_at(self, z: int) -> int:
        """tile detail: full_detail at maxzoom else low_detail
        (main.cpp traverse_zooms / tile.cpp:1745)."""
        return self.full_detail if z == self.maxzoom else self.low_detail

    @property
    def uses_index(self) -> bool:
        """Whether the spatial index (quadkey/hilbert of bbox midpoint) is
        computed — serial.cpp:562-566."""
        return (
            self.drop_densest
            or self.coalesce_densest
            or self.cluster_densest
            or self.calculate_feature_density
            or self.increase_gamma
            or self.gamma > 0
            or self.cluster_distance != 0
        )

    @property
    def any_as_needed(self) -> bool:
        """Drives the 2-pass zoom-global parameter discovery
        (tile.cpp:2782-2791)."""
        return (
            self.drop_densest
            or self.drop_smallest
            or self.drop_fraction
            or self.coalesce_densest
            or self.coalesce_smallest
            or self.coalesce_fraction
            or self.cluster_densest
            or self.increase_gamma
        )


COORD_OFFSET = 4 << 32  # tile.cpp:52


def shift_right(a: int, scale: int) -> int:
    """SHIFT_RIGHT (serial.cpp:26) — offset so negatives round consistently."""
    return ((a + COORD_OFFSET) >> scale) - (COORD_OFFSET >> scale)


def shift_left(a: int, scale: int) -> int:
    """SHIFT_LEFT (serial.cpp:27)."""
    return ((a + (COORD_OFFSET >> scale)) << scale) - COORD_OFFSET
