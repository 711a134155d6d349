"""The KnowledgeGraph container — node/edge DataFrames + SQL passthrough.

Reference mapping:
- Kuzu property graph (one DB per project, schema/init.rs) → a set of
  DataFrames with fixed StructTypes, one per node/edge table.
- ``gkg devtools query '<cypher>'`` raw passthrough
  (crates/gkg/src/commands/query.rs:13-66) → ``KnowledgeGraph.sql(...)``
  over registered temp views: users get full Spark SQL instead of Cypher.

The container is intentionally thin: queries live in
``knowledge_graph_spark.queries.library`` as pure functions over this object,
mirroring how the reference keeps all Cypher in querying/library.rs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_graph_spark import schema as S

NODE_KEYS = ("directory_nodes", "file_nodes", "definition_nodes", "imported_symbol_nodes")
EDGE_KEYS = (
    "directory_relationships",
    "file_relationships",
    "definition_relationships",
    "imported_symbol_relationships",
)


@dataclass
class KnowledgeGraph:
    spark: SparkSession
    nodes: dict[str, DataFrame]
    edges: dict[str, DataFrame]
    repository_name: str = "repo"
    # per-file line inventory (path, line_no, line_text) — the source text
    # the reference's context-snippet enrichment reads back from disk
    # (file_reader_utils.rs:1-252); here it is indexed alongside the graph
    # so snippet assembly is a broadcast join, not driver file IO
    file_lines: DataFrame | None = None
    _views_registered: bool = field(default=False, repr=False)

    # -- accessors ---------------------------------------------------------
    @property
    def directories(self) -> DataFrame:
        return self.nodes["directory_nodes"]

    @property
    def files(self) -> DataFrame:
        return self.nodes["file_nodes"]

    @property
    def definitions(self) -> DataFrame:
        return self.nodes["definition_nodes"]

    @property
    def imports(self) -> DataFrame:
        return self.nodes["imported_symbol_nodes"]

    def edge(self, key: str, types: tuple[str, ...] | None = None) -> DataFrame:
        df = self.edges[key]
        if types:
            df = df.filter(F.col("type").isin(list(types)))
        return df

    def materialize(
        self,
        parallelism: int = 8,
        truncate: bool = False,
        coalesce_to: int | None = None,
    ) -> "KnowledgeGraph":
        """Cache and force every node/edge table, submitting the 8 jobs
        concurrently — the bulk-index analog. Spark's scheduler interleaves
        independent jobs across idle cores (locally) or executors (cluster),
        so wall-clock is the slowest table, not the sum; the reference
        indexes with a worker pool the same way.

        ``truncate=True`` additionally severs lineage (``localCheckpoint``):
        every later plan over the graph references a flat in-memory scan
        instead of re-embedding the whole extract→build subtree. Use it when
        the graph will be referenced from MANY downstream plans (the
        incremental splice anti-joins each table several times; with plain
        cache the merged plan's ANALYSIS alone dominates wall time). The
        trade-off is recomputability — a truncated table evicted under
        memory pressure cannot be rebuilt from lineage — so the default
        stays lineage-preserving for long-lived service graphs."""
        from concurrent.futures import ThreadPoolExecutor

        if truncate:
            from knowledge_graph_spark.persist import tracked_local_checkpoint

            def pin(d: DataFrame) -> DataFrame:
                # small known-size graphs: collapsing partitions first makes
                # the eager checkpoint a handful of tasks instead of a
                # (shuffle-partitions × tables) task storm
                if coalesce_to is not None:
                    d = d.coalesce(coalesce_to)
                return tracked_local_checkpoint(d)

            with ThreadPoolExecutor(parallelism) as ex:
                node_keys = list(self.nodes)
                edge_keys = list(self.edges)
                node_futs = {k: ex.submit(pin, self.nodes[k]) for k in node_keys}
                edge_futs = {k: ex.submit(pin, self.edges[k]) for k in edge_keys}
                line_fut = (
                    ex.submit(pin, self.file_lines)
                    if self.file_lines is not None
                    else None
                )
                self.nodes = {k: f.result() for k, f in node_futs.items()}
                self.edges = {k: f.result() for k, f in edge_futs.items()}
                if line_fut is not None:
                    self.file_lines = line_fut.result()
            if self._views_registered:
                self.register_views()
            return self

        self.cache()
        dfs = list(self.nodes.values()) + list(self.edges.values())
        if self.file_lines is not None:
            self.file_lines = self.file_lines.cache()
            dfs.append(self.file_lines)
        with ThreadPoolExecutor(parallelism) as ex:
            list(ex.map(lambda d: d.count(), dfs))
        return self

    def all_edges(self) -> DataFrame:
        """Union of the 4 physical edge tables with a table discriminator."""
        out = None
        for k in EDGE_KEYS:
            d = self.edges[k].withColumn("edge_table", F.lit(k))
            out = d if out is None else out.unionByName(d)
        return out

    # -- SQL passthrough (§2.11a) -----------------------------------------
    def register_views(self, prefix: str = "") -> None:
        for k in NODE_KEYS + EDGE_KEYS:
            df = self.nodes.get(k) if k in NODE_KEYS else self.edges.get(k)
            if df is not None:
                df.createOrReplaceTempView(prefix + k)
        if self.file_lines is not None:
            self.file_lines.createOrReplaceTempView(prefix + "file_lines")
        self._views_registered = True

    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            self.register_views()
        return self.spark.sql(query)

    # -- persistence (S3/S4: parquet at rest, directly queryable) ----------
    def write(self, base_dir: str, parallelism: int = 8) -> None:
        """Write all node/edge tables (and the line inventory) as parquet,
        submitting the independent write jobs concurrently — serial writes
        leave the cluster idle between job submissions, and the 9 tables
        share cached build intermediates (block-level locks de-duplicate
        concurrent cache computation), so wall-clock is the slowest table,
        not the sum."""
        from concurrent.futures import ThreadPoolExecutor

        from knowledge_graph_spark.io import write_parquet

        targets = [(df, f"{base_dir}/{k}") for k, df in self.nodes.items()]
        targets += [(df, f"{base_dir}/{k}") for k, df in self.edges.items()]
        if self.file_lines is not None:
            targets.append((self.file_lines, f"{base_dir}/file_lines"))
        with ThreadPoolExecutor(parallelism) as ex:
            list(ex.map(lambda t: write_parquet(t[0], t[1]), targets))

    @classmethod
    def read(cls, spark: SparkSession, base_dir: str, repository_name: str = "repo") -> "KnowledgeGraph":
        import os

        nodes = {k: spark.read.parquet(f"{base_dir}/{k}") for k in NODE_KEYS}
        edges = {k: spark.read.parquet(f"{base_dir}/{k}") for k in EDGE_KEYS}
        fl_dir = f"{base_dir}/file_lines"
        file_lines = spark.read.parquet(fl_dir) if os.path.isdir(fl_dir) else None
        return cls(spark, nodes, edges, repository_name, file_lines=file_lines)

    def cache(self) -> "KnowledgeGraph":
        for df in (*self.nodes.values(), *self.edges.values()):
            df.cache()
        if self.file_lines is not None:
            # the line inventory feeds every context-snippet render; left
            # uncached each render re-derives it from the source tables
            self.file_lines = self.file_lines.cache()
        return self
