"""Stage orchestration: checkpointed, resumable, lineage-tracked (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Every stage writes its output to ``<checkpoint_dir>/<stage>/`` keyed by a
config hash; a re-run with the same config **skips** completed stages
(parquet `_SUCCESS` is the completion marker) and re-reads the checkpoint —
idempotent because every generated id in the pipeline is deterministic
(skolem IRIs, content hashes). A ``lineage`` table records per-stage row
counts, wall time and the stage input's config hash.

The per-row invariant — ``sha256(content)`` computed at the source scan —
is carried through extraction and into the ``kg:sha256`` triples;
:meth:`KGPipeline.verify_invariant` re-derives it from the source and
checks set equality end-to-end.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import annotate, extract, link, synth


@dataclass
class KGConfig:
    checkpoint_dir: str
    n_files: int = 1000
    n_repos: int | None = None
    range_partitions: int | None = None
    jaccard_threshold: float = 0.55
    source_path: str | None = None  # read an existing table instead of synth

    @property
    def config_hash(self) -> str:
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:12]


class KGPipeline:
    def __init__(self, spark: SparkSession, config: KGConfig):
        self.spark = spark
        self.config = config
        self.lineage: list[dict] = []

    # -- checkpoint plumbing -------------------------------------------------
    def _stage_path(self, name: str) -> str:
        return os.path.join(self.config.checkpoint_dir,
                            f"{name}-{self.config.config_hash}")

    def _done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._stage_path(name), "_SUCCESS"))

    def _footer_partition_rows(self, path: str) -> dict[int, int]:
        """Per-partition lineage from the parquet FOOTER statistics — a
        metadata-only read, no data scan. The previous formulation
        re-aggregated the checkpoint (``groupBy(spark_partition_id)``),
        which re-reads the whole stage output: at 100 TB that doubles
        every stage's I/O just to record counts that each part file's
        footer already stores (Iceberg keeps the same counts in manifest
        metadata; this is the seam-equivalent read). Partition id = the
        file's rank in sorted-name order — stable across resumes, unlike
        a reader's spark_partition_id, which depends on split packing.

        Lineage-schema note (ADVICE r4): ``partition_rows`` keys are
        part-FILE ranks since this change, not reader-partition ids —
        lineage written by the pre-footer formulation keyed on
        ``spark_partition_id`` and is not directly comparable. The
        listing assumes the checkpoint dir is a local POSIX path
        (``os.listdir``); a real object-store/Iceberg deployment reads
        the same counts from manifest metadata behind the snapshot seam
        (sources/snapshots.py)."""
        import pyarrow.parquet as pq

        files = sorted(f for f in os.listdir(path)
                       if f.endswith(".parquet") and not f.startswith("."))
        # read_metadata opens-reads-closes the footer; ParquetFile would
        # leave a dangling open handle per part file (ADVICE r4)
        return {
            i: pq.read_metadata(os.path.join(path, f)).num_rows
            for i, f in enumerate(files)
        }

    def _run_stage(self, name: str, build) -> DataFrame:
        path = self._stage_path(name)
        t0 = time.time()
        resumed = self._done(name)
        if not resumed:
            build().write.mode("overwrite").parquet(path)
        df = self.spark.read.parquet(path)
        # per-partition lineage (north rule): row count per part file of
        # the checkpointed output, straight from the parquet footers —
        # a resume can verify any partition range without any rescan
        per_part = self._footer_partition_rows(path)
        self.lineage.append({
            "stage": name,
            "config_hash": self.config.config_hash,
            "rows": sum(per_part.values()),
            "n_partitions": len(per_part),
            "partition_rows": per_part,
            "wall_s": round(time.time() - t0, 3),
            "resumed": resumed,
        })
        return df

    def _write_lineage(self) -> None:
        path = os.path.join(self.config.checkpoint_dir,
                            f"lineage-{self.config.config_hash}")
        self.spark.createDataFrame(
            [(d["stage"], d["config_hash"], d["rows"], d["wall_s"]) for d in self.lineage],
            "stage string, config_hash string, rows long, wall_s double",
        ).write.mode("overwrite").parquet(path)
        # per-partition metrics table: (stage, partition, rows)
        rows = [
            (d["stage"], int(p), int(n))
            for d in self.lineage for p, n in d["partition_rows"].items()
        ]
        self.spark.createDataFrame(
            rows or [("", -1, 0)],
            "stage string, partition int, rows long",
        ).write.mode("overwrite").parquet(
            os.path.join(self.config.checkpoint_dir,
                         f"partitions-{self.config.config_hash}"))

    # -- stages ---------------------------------------------------------------
    def source(self) -> DataFrame:
        if self.config.source_path:
            src = self.spark.read.parquet(self.config.source_path)
        else:
            src = synth.synth_source_table(
                self.spark, self.config.n_files, self.config.n_repos,
                self.config.range_partitions)
        return src.withColumn("content_sha256", F.sha2(F.col("content"), 256))

    def run(self) -> dict[str, DataFrame]:
        src = self._run_stage("source", self.source)

        extracted = self._run_stage(
            "extract",
            lambda: extract.extract_structures(
                src.drop("content_sha256"), self.config.range_partitions))
        return self._finish(src, extracted)

    def run_incremental(self, prev: "KGPipeline") -> dict[str, DataFrame]:
        """Same outputs as :meth:`run`, but extraction touches content only
        for files that differ from *prev*'s completed run (kg/delta.py
        shapes): the snapshot diff compares (repo, path, content_sha256) —
        prev's source checkpoint already stores the sha, so the OLD
        content is never re-read — and the new source joins the
        (broadcast) delta key set before the extraction UDF. The merged
        extraction lands in THIS run's ``extract`` checkpoint, so later
        resumes (full or incremental) skip it identically; relinking and
        assembly always run globally over the narrow rows (a new alias
        can re-canonicalize an old mention)."""
        from . import delta as delta_mod

        src = self._run_stage("source", self.source)

        def build_extract() -> DataFrame:
            prev_src = self.spark.read.parquet(
                prev._stage_path("source")).select(
                "repo", "path", "content_sha256")
            prev_ext = self.spark.read.parquet(prev._stage_path("extract"))
            diff = delta_mod.source_diff(prev_src, src)
            # extract flags must match what run() built prev's checkpoint
            # with: range layout, sha carried, no file rows
            return delta_mod.incremental_structures(
                prev_ext, src.drop("content_sha256"), diff,
                range_partitions=self.config.range_partitions,
                layout="range", carry_sha=True, emit_file_rows=False)

        extracted = self._run_stage("extract", build_extract)
        return self._finish(src, extracted)

    def _finish(self, src: DataFrame,
                extracted: DataFrame) -> dict[str, DataFrame]:
        mentions = extracted.filter(
            F.col("kind").isin("import", "dep")).select(
            F.col("name").alias("mention"))
        labels = self._run_stage(
            "labels",
            lambda: link.link_mentions(
                mentions, self.config.jaccard_threshold))

        entities = self._run_stage("entities", lambda: link.entity_table(labels))

        from .assemble import build_graph

        final = self._run_stage(
            "graph", lambda: build_graph(src, extracted, labels))

        self._write_lineage()
        return {
            "source": src,
            "extracted": extracted,
            "labels": labels,
            "entities": entities,
            "triples": final,
        }

    # -- invariants -----------------------------------------------------------
    def verify_invariant(self, results: dict[str, DataFrame]) -> bool:
        """sha256(content) equality end-to-end: the set of (file, sha) pairs
        in the final graph must equal the set recomputed from the source."""
        src = results["source"].select(
            annotate.file_iri(F.col("repo"), F.col("path")).alias("subj"),
            F.sha2(F.col("content"), 256).alias("obj"))
        graph = results["triples"].filter(
            F.col("pred") == annotate.KG + "sha256").select("subj", "obj")
        return (
            src.exceptAll(graph).isEmpty()
            and graph.exceptAll(src).isEmpty()
        )
