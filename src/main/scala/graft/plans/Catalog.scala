package graft.plans

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Session-catalog integration: expose every graft table under a catalog
  * root as a Spark temp view named `<namespace>_<table>` whose contents
  * are the current MOR snapshot — so `spark.table(...)` / `spark.sql`
  * query graft tables like any other relation (the `spark.catalog`
  * analogue of the reference's `load_table`, `main.rs:119-124`).
  */
object Catalog {

  /** List (namespace, table) pairs under the catalog root. */
  def listTables(root: String): Seq[(String, String)] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Seq.empty
    def dirs(p: Path) =
      Files.list(p).iterator().asScala.filter(Files.isDirectory(_)).toSeq
    for {
      ns <- dirs(r)
      t <- dirs(ns)
      if Files.isRegularFile(t.resolve("schema.json"))
    } yield (ns.getFileName.toString, t.getFileName.toString)
  }

  /** Register each table's MOR view as `<ns>_<table>`; returns the view
    * names. Views are lazy — each query re-plans against the CURRENT
    * snapshot at view creation time; call again after commits.
    */
  def registerAll(spark: SparkSession, root: String): Seq[String] =
    listTables(root).map { case (ns, t) =>
      val name = s"${ns}_$t"
      Mor.read(spark, root, ns, t).createOrReplaceTempView(name)
      name
    }
}
