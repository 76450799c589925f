package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation

/** Fixture drift tripwire (r7 item 7 / VERDICT r8 item 5). The driver
  * REGENERATES /root/testdata between rounds, and the physical types
  * have drifted before: events.ts shipped as TIMESTAMP(NANOS) in some
  * rounds and TIMESTAMP(MICROS) in others, which silently failed 11
  * queries in r7 until re-investigated. The READERS are
  * schema-adaptive (`Util.rdEvents` / `Util.rdEmbeddings`), so drift
  * no longer breaks queries — this spec exists so the NEXT drift is a
  * one-line red diagnosis naming exactly what changed, instead of a
  * head-scratch over downstream symptoms (hash mismatches, precision
  * divergence vs the DuckDB oracle).
  *
  * Assertions read the parquet FOOTER (physical + logical annotation),
  * not Spark's inferred schema, because the inference itself is what
  * the adaptive readers bend — the footer is the ground truth the
  * oracle (DuckDB) also sees.
  */
class FixtureGuardSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def footer(table: String): MessageType = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet"),
      new org.apache.hadoop.conf.Configuration())
    val r = ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  private def primitiveOf(schema: MessageType, col: String) = {
    assert(schema.containsField(col),
      s"column '$col' MISSING from footer — testdata regenerated with a " +
        s"new schema? footer: $schema")
    schema.getType(Seq(col): _*).asPrimitiveType()
  }

  test("events.ts is an INT64 timestamp in MICROS or NANOS — the two " +
      "shapes Util.rdEvents adapts to") {
    val ts = primitiveOf(footer("events"), "ts")
    assert(ts.getPrimitiveTypeName == PrimitiveTypeName.INT64,
      s"events.ts physical type is ${ts.getPrimitiveTypeName}, expected " +
        "INT64 — Util.rdEvents handles only nanos-long and timestamp " +
        "reads; every events/streaming query will break. Extend " +
        "Util.normalizeEventsTs for the new shape.")
    ts.getLogicalTypeAnnotation match {
      case t: TimestampLogicalTypeAnnotation =>
        val u = t.getUnit.toString
        assert(u == "MICROS" || u == "NANOS",
          s"events.ts timestamp unit is $u — rdEvents adapts to " +
            "MICROS/NANOS only; add the new unit to normalizeEventsTs")
      case other => fail(
        s"events.ts logical annotation is $other, expected TIMESTAMP — " +
          "if the generator switched to raw epoch longs, teach " +
          "Util.normalizeEventsTs its unit before trusting any events query")
    }
  }

  test("embeddings.embedding element type is FLOAT (the ANN codegen " +
      "fast path; DOUBLE would silently cost oracle precision)") {
    val schema = footer("embeddings")
    assert(schema.containsField("embedding"),
      s"embeddings.embedding missing from footer: $schema")
    val elem = schema.getType(Seq("embedding"): _*).asGroupType()
      .getType(0).asGroupType().getType(0).asPrimitiveType()
    assert(elem.getPrimitiveTypeName == PrimitiveTypeName.FLOAT,
      s"embeddings.embedding element is ${elem.getPrimitiveTypeName}, " +
        "expected FLOAT. Util.rdEmbeddings will cast (and warn on " +
        "stderr), keeping the ann/emb/dedup_embedding families running, " +
        "but Spark then computes on lossy floats while the DuckDB " +
        "oracle computes on the file's own values — hash divergence is " +
        "possible. Regenerate as float or make the oracle read " +
        "identically before trusting those comparisons.")
  }

  test("documents carries (doc_id INT64, text STRING) — the dedup/text " +
      "family's fingerprinting contract") {
    val schema = footer("documents")
    val id = primitiveOf(schema, "doc_id")
    assert(id.getPrimitiveTypeName == PrimitiveTypeName.INT64,
      s"documents.doc_id is ${id.getPrimitiveTypeName}, expected INT64 — " +
        "dedup band keys and cluster labels assume long ids")
    val txt = primitiveOf(schema, "text")
    assert(txt.getPrimitiveTypeName == PrimitiveTypeName.BINARY &&
      txt.getLogicalTypeAnnotation ==
        LogicalTypeAnnotation.stringType(),
      s"documents.text is ${txt.getPrimitiveTypeName}/" +
        s"${txt.getLogicalTypeAnnotation}, expected BINARY/STRING — " +
        "normalize/fingerprint expressions assume UTF-8 strings")
  }

  test("lineitem key/measure/date columns keep their committed types") {
    val schema = footer("lineitem")
    val expect = Seq(
      ("l_orderkey", PrimitiveTypeName.INT64, "join/repartition key"),
      ("l_quantity", PrimitiveTypeName.DOUBLE, "decimal-cast aggregates"),
      ("l_extendedprice", PrimitiveTypeName.DOUBLE, "revenue arithmetic"),
      ("l_shipdate", PrimitiveTypeName.INT64, "date-range filters"))
    expect.foreach { case (name, want, why) =>
      val p = primitiveOf(schema, name)
      assert(p.getPrimitiveTypeName == want,
        s"lineitem.$name is ${p.getPrimitiveTypeName}, expected $want " +
          s"($why) — TPC-H-family queries and their oracles assume this")
    }
    val sd = primitiveOf(schema, "l_shipdate")
    assert(sd.getLogicalTypeAnnotation
        .isInstanceOf[TimestampLogicalTypeAnnotation],
      s"l_shipdate annotation is ${sd.getLogicalTypeAnnotation}, " +
        "expected TIMESTAMP — date filters in q1/q_date_agg compare " +
        "against timestamp literals")
  }
}
