package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.sources.GenConfig

/** Per-JVM cache of generated tables so every `SparkEntry.queries` entry
  * that exercises the write→MOR-read pipeline reuses one prepared catalog
  * instead of re-running the write path per query.
  */
object GeneratedTables {
  private val roots = scala.collection.concurrent.TrieMap[String, String]()

  /** Ensure the reference-default table exists under a temp catalog root
    * keyed by `key` (normally the sf dir — the generated workload itself
    * is sf-independent, matching `config.toml` defaults). Returns the
    * catalog root.
    */
  def ensure(spark: SparkSession, key: String,
      cfg: GenConfig = GenConfig.reference): String =
    roots.getOrElseUpdate(key + "#" + cfg.toString, {
      val root = Files.createTempDirectory("graft-catalog-").toString
      Pipeline.prepare(spark, root, cfg)
      root
    })

  /** Memoize a custom table-build sequence (evolution scenarios etc.)
    * under its own catalog root.
    */
  def ensureCustom(key: String)(build: String => Unit): String =
    roots.getOrElseUpdate("custom#" + key, {
      val root = Files.createTempDirectory("graft-catalog-").toString
      build(root)
      root
    })
}
