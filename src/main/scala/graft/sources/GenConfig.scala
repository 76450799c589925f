package graft.sources

/** Workload configuration mirroring the reference's TOML shape.
  *
  * Reference: `config.toml:1-36` and the structs in `main.rs:54-84`
  * (`Config { catalog, table, data_files, pos_delete_files,
  * equality_delete_files }`). The catalog connection block
  * (`main.rs:56-66`) is replaced by a local catalog-root path since this
  * engine emulates the Iceberg commit protocol over a filesystem.
  */
final case class FileConfig(rowsPerFile: Long, fileCount: Int) {
  def totalRows: Long = rowsPerFile * fileCount
}

final case class GenConfig(
    namespace: String,
    tableName: String,
    data: FileConfig,
    posDelete: FileConfig,
    eqDelete: FileConfig
) {
  /** Surviving-row arithmetic of `print_summary` (`main.rs:334-345`),
    * corrected for cursor exhaustion (the reference can print a negative
    * total; see SURVEY.md C5): deletes can never exceed available rows.
    */
  def expectedSurvivingRows: Long = {
    val n = data.totalRows
    val p = math.min(posDelete.totalRows, n)
    val e = math.min(eqDelete.totalRows, n - p)
    n - p - e
  }
  /** Number of positional deletes actually emittable (cursor cap, C2/C3). */
  def actualPosDeletes: Long = math.min(posDelete.totalRows, data.totalRows)
  /** Number of equality deletes actually emittable (cursor continues, C4). */
  def actualEqDeletes: Long =
    math.min(eqDelete.totalRows, data.totalRows - actualPosDeletes)
}

object GenConfig {
  /** The reference's default workload (`config.toml:17-35`):
    * 5x1000 data, 2x1000 positional deletes, 2x1000 equality deletes
    * => 1000 surviving rows.
    */
  val reference: GenConfig = GenConfig(
    namespace = "test_namespace",
    tableName = "t1",
    data = FileConfig(1000L, 5),
    posDelete = FileConfig(1000L, 2),
    eqDelete = FileConfig(1000L, 2)
  )

  /** Minimal TOML parser for the reference's config shape (S1,
    * `main.rs:102-104`). Supports `[section]` headers, `key = "str"` and
    * `key = int` lines, `#` comments. Anything fancier is out of scope —
    * the reference's own config uses nothing more.
    */
  def fromToml(toml: String): GenConfig = {
    val sectionRe = """^\s*\[([A-Za-z0-9_.]+)\]\s*$""".r
    val kvRe = """^\s*([A-Za-z0-9_]+)\s*=\s*(.+?)\s*$""".r
    var section = ""
    val values = scala.collection.mutable.Map[String, String]()
    toml.linesIterator.map(_.takeWhile(_ != '#')).foreach {
      case sectionRe(s) => section = s
      case kvRe(k, v) =>
        val clean = v.trim.stripPrefix("\"").stripSuffix("\"")
        values(s"$section.$k") = clean
      case _ => ()
    }
    def str(k: String, dflt: String): String = values.getOrElse(k, dflt)
    def fc(sec: String, dflt: FileConfig): FileConfig = FileConfig(
      values.get(s"$sec.rows_per_file").map(_.toLong).getOrElse(dflt.rowsPerFile),
      values.get(s"$sec.file_count").map(_.toInt).getOrElse(dflt.fileCount)
    )
    GenConfig(
      namespace = str("table.namespace", reference.namespace),
      tableName = str("table.table_name", reference.tableName),
      data = fc("data_files", reference.data),
      posDelete = fc("pos_delete_files", reference.posDelete),
      eqDelete = fc("equality_delete_files", reference.eqDelete)
    )
  }
}
