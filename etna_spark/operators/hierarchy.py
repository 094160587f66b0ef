"""Hierarchical rollup across the SERIES axis.

Reference: the sparse summing-matrix multiply that aggregates child segments
into parent-level series (``get_level_dataframe``,
/root/reference/etna/datasets/utils.py:292-359; ``get_level_dataset``,
tsdataset.py:1391-1455) with the level tree from
hierarchical_structure.py:1-192.

Spark mapping: the summing matrix IS a groupBy — broadcast-join the
(child → parent) mapping, aggregate per (parent, ts). Repeated application
walks the level tree (segment → region → total), exactly like the time-axis
tier cascade; all aggregates stay algebraic so levels can be derived from
the previous level without touching leaves.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hierarchy_rollup(
    df: DataFrame,
    mapping: DataFrame,
    child_col: str,
    parent_col: str,
    value_cols: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Aggregate child-level series to the parent level: one row per
    (parent, ts) with summed values. ``mapping`` is the tiny (child, parent)
    dimension — broadcast."""
    joined = df.join(F.broadcast(mapping), on=child_col, how="inner")
    return joined.groupBy(parent_col, ts_col).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )


class HierarchicalStructure:
    """First-class multi-level hierarchy (reference
    hierarchical_structure.py:18-192): an arbitrary-depth level tree given
    as an adjacency list, e.g. ``{"total": ["X", "Y"], "X": ["a", "b"],
    "Y": ["c", "d"]}``, with named levels top-to-bottom.

    Spark-first split of the reference design: the tree is SERIES-level
    metadata (segment names, not data) and stays driver-side like the
    reference's csr summing matrix — but the matrix itself becomes a
    (source_segment → target_ancestor) dimension table, and multi-hop
    level transitions COMPOSE driver-side, so any (source, target) level
    pair is ONE broadcast join + groupBy instead of a join per level.
    Validations mirror the reference: single root, node/edge count,
    connectivity, all leaves on one level, level-name arity.
    """

    def __init__(
        self,
        level_structure: dict[str, Sequence[str]],
        level_names: Sequence[str] | None = None,
    ):
        self.level_structure = {k: list(v) for k, v in level_structure.items()}
        children = [c for cs in self.level_structure.values() for c in cs]
        child_set = set(children)
        if len(children) != len(child_set):
            raise ValueError("Invalid tree definition: repeated child node!")
        parents = set(self.level_structure)
        roots = parents - child_set
        if len(roots) != 1:
            raise ValueError("Invalid tree definition: unable to find root!")
        self.root = roots.pop()
        n_nodes = len(child_set | parents)
        if len(children) != n_nodes - 1:
            raise ValueError(
                "Invalid tree definition: invalid number of nodes and edges!"
            )
        self._parent = {
            c: p for p, cs in self.level_structure.items() for c in cs
        }
        # BFS: group segments into depth levels
        levels: list[list[str]] = []
        leaf_depths: set[int] = set()
        seen = 1
        q: deque[tuple[str, int]] = deque([(self.root, 0)])
        while q:
            node, d = q.popleft()
            if d == len(levels):
                levels.append([])
            levels[d].append(node)
            kids = self.level_structure.get(node, [])
            if not kids:
                leaf_depths.add(d)
            for c in kids:
                q.append((c, d + 1))
                seen += 1
        if seen != n_nodes:
            raise ValueError("Invalid tree definition: disconnected graph!")
        if len(leaf_depths) != 1:
            raise ValueError(
                "All hierarchy tree leaves must be on the same level!"
            )
        if level_names is None:
            level_names = [f"level_{i}" for i in range(len(levels))]
        if len(level_names) != len(levels):
            raise ValueError(
                "Length of `level_names` must be equal to hierarchy tree "
                "depth!"
            )
        self.level_names = list(level_names)
        self._level_segments = dict(zip(self.level_names, levels))
        self._level_index = {n: i for i, n in enumerate(self.level_names)}
        self._segment_level = {
            s: name for name, segs in self._level_segments.items() for s in segs
        }

    def get_level_segments(self, level_name: str) -> list[str]:
        if level_name not in self._level_segments:
            raise ValueError(f"Invalid level name: {level_name}")
        return list(self._level_segments[level_name])

    def get_segment_level(self, segment: str) -> str:
        if segment not in self._segment_level:
            raise ValueError(f"Segment {segment} is out of the hierarchy")
        return self._segment_level[segment]

    def ancestor_at(self, segment: str, target_level: str) -> str:
        """The unique ancestor of ``segment`` on ``target_level``."""
        if target_level not in self._level_index:
            raise ValueError(f"Invalid level name: {target_level}")
        src_i = self._level_index[self.get_segment_level(segment)]
        tgt_i = self._level_index[target_level]
        if tgt_i > src_i:
            raise ValueError(
                "Target level must be higher or equal in hierarchy than "
                "source level!"
            )
        node = segment
        for _ in range(src_i - tgt_i):
            node = self._parent[node]
        return node

    def level_mapping(
        self, source_level: str, target_level: str
    ) -> list[tuple[str, str]]:
        """(source_segment, target_ancestor) pairs — the reference's
        summing matrix for the level pair, as edges."""
        for name in (source_level, target_level):
            if name not in self._level_index:
                raise ValueError(f"Invalid level name: {name}")
        if self._level_index[target_level] > self._level_index[source_level]:
            raise ValueError(
                "Target level must be higher or equal in hierarchy than "
                "source level!"
            )
        return [
            (s, self.ancestor_at(s, target_level))
            for s in self._level_segments[source_level]
        ]

    def mapping_df(
        self,
        spark: SparkSession,
        source_level: str,
        target_level: str,
        child_col: str = "segment",
        parent_col: str | None = None,
    ) -> DataFrame:
        """The (child, parent) dimension for any level pair — feeds
        :func:`hierarchy_rollup` and the Top-Down/Bottom-Up reconciliators
        directly (their ``mapping`` argument) at ANY (source, target)."""
        parent_col = parent_col or f"{target_level}_segment"
        return spark.createDataFrame(
            self.level_mapping(source_level, target_level),
            f"{child_col} string, {parent_col} string",
        )

    def rollup(
        self,
        df: DataFrame,
        source_level: str,
        target_level: str,
        value_cols: Sequence[str],
        segment_col: str = "segment",
        ts_col: str = "ts",
    ) -> DataFrame:
        """Aggregate ``source_level`` series to ``target_level`` in one
        broadcast join + groupBy, however many levels apart (the transitive
        mapping composes driver-side — tree metadata, not data)."""
        if self._level_index[target_level] == self._level_index[source_level]:
            return df
        mapping = self.mapping_df(
            df.sparkSession, source_level, target_level,
            child_col=segment_col, parent_col="_tgt",
        )
        out = hierarchy_rollup(
            df, mapping, segment_col, "_tgt", value_cols, ts_col=ts_col
        )
        return out.withColumnRenamed("_tgt", segment_col)
