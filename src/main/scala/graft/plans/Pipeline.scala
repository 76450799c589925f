package graft.plans

import org.apache.spark.sql.SparkSession
import graft.sources.{DataGenerator, FixSchemaGen, FixSchemaGenerator, GenConfig}

/** The reference's `prepare` pipeline (`main.rs:347-377`) re-expressed on
  * Spark: three phases, one snapshot commit per phase.
  *
  *   phase 1  data files        (`generate_data`,              `main.rs:117-161`)
  *   phase 2  positional deletes (`generate_pos_delete_data`,  `main.rs:163-216`)
  *   phase 3  equality deletes  (`generate_equality_delete_data`, `main.rs:218-276`)
  *
  * Unlike the reference (strictly sequential per-file loop over a tokio
  * runtime, `main.rs:128`), each file's rows are produced by a
  * distributed `spark.range` projection; the per-file loop here only
  * controls deterministic file naming, which the reference's
  * `DefaultFileNameGenerator` contract requires (`main.rs:141-142`);
  * `prepareBulkData` below is the single-job variant for scale.
  */
object Pipeline {

  /** `cleanup` subcommand (`main.rs:379-398`), made idempotent. */
  def cleanup(root: String, cfg: GenConfig): Unit = {
    TableIO.dropTable(root, cfg.namespace, cfg.tableName)
    TableIO.dropNamespace(root, cfg.namespace)
  }

  /** Full `prepare` (`main.rs:347-377`). Returns the final snapshot version. */
  def prepare(spark: SparkSession, root: String, cfg: GenConfig,
      gen: DataGenerator = FixSchemaGenerator): Long = {
    prepareData(spark, root, cfg, gen)
    prepareDeletes(spark, root, cfg, gen)
  }

  /** DDL + phase 1 only (data files, one fast_append commit,
    * `main.rs:125-158`). Files are independent, so the per-file write
    * jobs run concurrently (the reference writes strictly sequentially,
    * `main.rs:128`).
    */
  def prepareData(spark: SparkSession, root: String, cfg: GenConfig,
      gen: DataGenerator = FixSchemaGenerator): Long = {
    val (ns, t) = (cfg.namespace, cfg.tableName)
    TableIO.createNamespace(root, ns) // D1 (idempotent; reference is not)
    TableIO.createTableIfNotExists(root, ns, t, gen.schema) // D2
    val rpf = cfg.data.rowsPerFile
    val dataEntries = {
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(
        Future.sequence((0 until cfg.data.fileCount).toVector.map { i =>
          Future(TableIO.writeExactFile(spark, root, ns, t,
            FixSchemaGen.dataFilePath(i), gen.dataFile(spark, i, rpf),
            "data", seq = 1L, recordCount = rpf,
            bounds = gen.fileBounds(i, rpf)))
        }),
        Duration.Inf)
    }
    TableIO.commit(root, ns, t, dataEntries)
  }

  /** Phases 2 + 3 (delete generation) against an already-committed data
    * snapshot — also used standalone after `prepareBulkData`.
    */
  def prepareDeletes(spark: SparkSession, root: String, cfg: GenConfig,
      gen: DataGenerator = FixSchemaGenerator): Long = {
    val (ns, t) = (cfg.namespace, cfg.tableName)

    // Phase 2: sorted positional deletes (`main.rs:163-216`): the sorted
    // global delete set split into files of <= pos.rowsPerFile rows
    // (the SortPositionDeleteWriter `cache_num` cap, `main.rs:196`).
    // Each file's slice [lo, hi) of the global delete set is generated
    // directly from its range — file_path/pos are pure functions of the
    // global row number g (file g/rpf, pos g%rpf), already emitted in
    // sorted (file_path, pos) order — so no filter/sort over the full
    // set is ever computed (a re-filter per slice is O(files * total)).
    val pRpf = cfg.posDelete.rowsPerFile
    val pTotal = cfg.actualPosDeletes
    val pFiles = if (pTotal == 0 || pRpf == 0) 0 else ((pTotal + pRpf - 1) / pRpf).toInt
    val posEntries = (0 until pFiles).map { i =>
      val lo = i * pRpf
      val hi = math.min((i + 1) * pRpf, pTotal)
      val slice = {
        import org.apache.spark.sql.functions._
        spark.range(lo, hi).select(
          format_string("data/part-%05d.parquet",
            (col("id") / cfg.data.rowsPerFile).cast("int")).as("file_path"),
          (col("id") % cfg.data.rowsPerFile).as("pos"))
      }
      TableIO.writeExactFile(spark, root, ns, t,
        FixSchemaGen.posDeleteFilePath(i), slice, "pos_delete", seq = 2L,
        recordCount = hi - lo)
    }
    if (posEntries.nonEmpty) TableIO.commit(root, ns, t, posEntries)

    // Phase 3: equality deletes projected to (foo, bar) (`main.rs:218-276`).
    val eTotal = cfg.actualEqDeletes
    val eRpf = cfg.eqDelete.rowsPerFile
    val eFiles = if (eTotal == 0 || eRpf == 0) 0 else ((eTotal + eRpf - 1) / eRpf).toInt
    val start = cfg.actualPosDeletes
    val eqEntries = (0 until eFiles).map { i =>
      val lo = start + i * eRpf
      val hi = math.min(start + (i + 1) * eRpf, start + eTotal)
      val slice = gen.eqDeleteKeys(spark, lo, hi)
      TableIO.writeExactFile(spark, root, ns, t,
        FixSchemaGen.eqDeleteFilePath(i), slice, "eq_delete", seq = 3L,
        recordCount = hi - lo)
    }
    if (eqEntries.nonEmpty) TableIO.commit(root, ns, t, eqEntries)

    TableIO.currentVersion(root, ns, t)
  }

  /** The 100 TB write path for phase 1: ONE Spark job materializes every
    * data file — `allData` is shuffled once on the file index
    * (`repartition(col)` co-locates each file's rows in one task),
    * sorted within partitions so file contents are byte-identical to the
    * per-file path, and written with `partitionBy`. The driver then only
    * renames O(#files) outputs into the reference naming scheme and
    * commits the manifest. Per-file jobs cost O(files) scheduling
    * round-trips; this path costs one.
    */
  def prepareBulkData(spark: SparkSession, root: String, cfg: GenConfig,
      gen: DataGenerator = FixSchemaGenerator,
      props: WriterProps = WriterProps()): Long = {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val (ns, t) = (cfg.namespace, cfg.tableName)
    TableIO.createNamespace(root, ns)
    TableIO.createTableIfNotExists(root, ns, t, gen.schema)

    val rpf = cfg.data.rowsPerFile
    val dir = TableIO.tableDir(root, ns, t)
    val stage = Files.createTempDirectory(dir, ".bulk")
    try {
      // One range, `_file` derived arithmetically (generators override
      // taggedData; the trait default unions per-file branches, which at
      // 100k files makes the PLAN the bottleneck — r1 verdict finding 7).
      TableIO.alignFieldIds(gen.taggedData(spark, cfg.data.fileCount, rpf),
          TableIO.readSchema(root, ns, t))
        .repartition(col("_file"))
        .sortWithinPartitions(gen.schema.fieldNames.head)
        .write.partitionBy("_file").mode("overwrite")
        .option("compression", props.compression)
        .option("parquet.block.size", props.rowGroupBytes.toString)
        .option("parquet.page.size", props.pageBytes.toString)
        .parquet(stage.resolve("out").toString)
      val entries = (0 until cfg.data.fileCount).map { i =>
        val pdir = stage.resolve(s"out/_file=$i")
        val parts = Files.list(pdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        require(parts.size == 1, s"expected one part for file $i, got ${parts.size}")
        val target = dir.resolve(FixSchemaGen.dataFilePath(i))
        Files.createDirectories(target.getParent)
        Files.move(parts.head, target, StandardCopyOption.REPLACE_EXISTING)
        ManifestEntry(FixSchemaGen.dataFilePath(i), "data", 1L, rpf,
          gen.fileBounds(i, rpf))
      }
      TableIO.commit(root, ns, t, entries)
    } finally {
      Files.walk(stage).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
  }
}
