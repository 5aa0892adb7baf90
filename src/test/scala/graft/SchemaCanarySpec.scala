package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Testdata-drift canary (round-5 verdict item 5).
  *
  * The driver regenerates /root/testdata between rounds, and the parquet
  * TIMESTAMP encoding has already switched once mid-build (round 5:
  * NANOS + nanosAsLong-long → MICROS/isAdjustedToUTC=false surfacing as
  * NTZ — 90 tests broke before `Tables.scala` absorbed it). This suite
  * reads the parquet FOOTERS directly (no Spark session confs involved,
  * so the assertions see the raw encoding, not the adapted one) and
  * fails loudly against the SURVEY.md §1.2/§1.3 matrix, so the next
  * regeneration is a one-line diagnosis instead of an archaeology
  * session. The adaptation point for any new encoding is
  * `Tables.t` / `Tables.events` — see §1.3's standing-fix note.
  */
class SchemaCanarySpec extends SparkSpecBase {

  /** column → (physicalType, logicalAnnotation-or-"") from the footer. */
  private def footerSchema(table: String): Map[String, (String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = HadoopInputFile.fromPath(new Path(s"$sf/$table.parquet"), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      msg.getFields.asScala.map { f =>
        val ann = Option(f.getLogicalTypeAnnotation).map(_.toString).getOrElse("")
        val phys =
          if (f.isPrimitive) f.asPrimitiveType().getPrimitiveTypeName.toString
          else "GROUP"
        f.getName -> (phys, ann)
      }.toMap
    } finally reader.close()
  }

  /** The two encodings §1.3 documents for a timestamp column. Anything
    * else is NEW drift: fail with the observation so the fix (extend the
    * branch in Tables) starts from the answer, not the question. */
  private def assertKnownTimestamp(table: String, col: String): Unit = {
    val (phys, ann) = footerSchema(table)(col)
    val known =
      phys == "INT64" && (
        ann.startsWith("TIMESTAMP(MICROS") || // r5+: µs, NTZ-annotated
          ann.startsWith("TIMESTAMP(NANOS") || // ≤r4: ns via nanosAsLong
          ann.startsWith("TIMESTAMP(MILLIS")) // pre-r5 o_orderdate/l_shipdate
    assert(known,
      s"NEW testdata timestamp encoding for $table.$col: physical=$phys " +
        s"annotation='$ann'. Known encodings are TIMESTAMP(MICROS|NANOS|" +
        "MILLIS) INT64 (SURVEY.md §1.3). Extend Tables.t/Tables.events " +
        "(src/main/scala/graft/Tables.scala) and update SURVEY §1.3.")
  }

  test("every table matches the SURVEY §1.2 column matrix") {
    // column name → physical type, per table (SURVEY §1.2). A missing or
    // re-typed column is drift that query code would hit as a resolution
    // or cast error 200 tests deep; catch it here with the matrix diff.
    val expected = Map(
      "region" -> Map("r_regionkey" -> "INT32", "r_name" -> "BINARY"),
      "nation" -> Map("n_nationkey" -> "INT32", "n_name" -> "BINARY",
        "n_regionkey" -> "INT32"),
      "customer" -> Map("c_custkey" -> "INT64", "c_name" -> "BINARY",
        "c_nationkey" -> "INT32", "c_acctbal" -> "DOUBLE",
        "c_mktsegment" -> "BINARY"),
      "supplier" -> Map("s_suppkey" -> "INT64", "s_name" -> "BINARY",
        "s_nationkey" -> "INT32", "s_acctbal" -> "DOUBLE"),
      "part" -> Map("p_partkey" -> "INT64", "p_name" -> "BINARY",
        "p_brand" -> "BINARY", "p_type" -> "BINARY", "p_size" -> "INT32",
        "p_retailprice" -> "DOUBLE"),
      "orders" -> Map("o_orderkey" -> "INT64", "o_custkey" -> "INT64",
        "o_orderstatus" -> "BINARY", "o_totalprice" -> "DOUBLE",
        "o_orderdate" -> "INT64", "o_orderpriority" -> "BINARY"),
      "lineitem" -> Map("l_orderkey" -> "INT64", "l_partkey" -> "INT64",
        "l_suppkey" -> "INT64", "l_linenumber" -> "INT32",
        "l_quantity" -> "DOUBLE", "l_extendedprice" -> "DOUBLE",
        "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
        "l_returnflag" -> "BINARY", "l_linestatus" -> "BINARY",
        "l_shipdate" -> "INT64"),
      "documents" -> Map("doc_id" -> "INT64", "text" -> "BINARY",
        "lang" -> "BINARY", "source" -> "BINARY", "n_chars" -> "INT64"),
      "embeddings" -> Map("vec_id" -> "INT64", "embedding" -> "GROUP",
        "label" -> "INT32"),
      "events" -> Map("event_id" -> "INT64", "ts" -> "INT64",
        "user_id" -> "INT64", "event_type" -> "BINARY",
        "value" -> "DOUBLE", "props" -> "BINARY"))
    val drift = expected.flatMap { case (table, cols) =>
      val observed = footerSchema(table)
      cols.flatMap { case (name, phys) =>
        observed.get(name) match {
          case None => Some(s"$table.$name: MISSING (have " +
            s"${observed.keys.toSeq.sorted.mkString(", ")})")
          case Some((p, _)) if p != phys =>
            Some(s"$table.$name: physical $p, expected $phys")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty,
      "TESTDATA DRIFT vs SURVEY.md §1.2 — the driver regenerated the " +
        "tables with a new shape. Diff:\n  " + drift.mkString("\n  ") +
        "\nAdapt src/main/scala/graft/Tables.scala and update SURVEY §1.2.")
  }

  test("timestamp columns carry a KNOWN §1.3 encoding") {
    assertKnownTimestamp("events", "ts")
    assertKnownTimestamp("orders", "o_orderdate")
    assertKnownTimestamp("lineitem", "l_shipdate")
  }

  test("documents text/lang are ASCII and non-empty (FNV oracle precondition)") {
    // The round-6 DuckDB oracles for x_expr_custom and q_mm_decode/
    // resize/frames re-derive UTF-8 byte values as unicode(char)
    // (Tables.asciiBytesSql) — equal to the byte ONLY for ASCII. The
    // driver corpus has been pure ASCII every round; if a regeneration
    // ever ships non-ASCII (or empty) text, this canary names the four
    // oracles to rework instead of letting them hash-mismatch opaquely.
    import org.apache.spark.sql.functions._
    val bad = Tables.t(spark, sf, "documents")
      .where(length(col("text")) === 0 || length(col("lang")) === 0 ||
        octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")) ||
        octet_length(encode(col("lang"), "UTF-8")) =!= length(col("lang")))
      .count()
    assert(bad == 0L,
      s"TESTDATA DRIFT: $bad documents rows have non-ASCII or empty " +
        "text/lang. The DuckDB oracles for x_expr_custom and " +
        "q_mm_decode/resize/frames (Tables.asciiBytesSql) assume ASCII " +
        "bytes — rework them (e.g. drop back to oracle=unit) and " +
        "update SURVEY §1.2.")
  }

  test("documents n_chars is positive and equals length(text)") {
    // q_sample_weighted divides by n_chars (a zero would make its key
    // NaN/inf with engine-specific sort placement) and the quality/
    // doc-stats family reads it as THE document length; pin the
    // generator contract so a regeneration that breaks it fails here.
    import org.apache.spark.sql.functions._
    val bad = Tables.t(spark, sf, "documents")
      .filter(col("n_chars") <= 0 || col("n_chars") =!= length(col("text")))
      .count()
    assert(bad == 0L,
      s"TESTDATA DRIFT: $bad documents rows violate n_chars == " +
        "length(text) > 0 — q_sample_weighted's exponential key and the " +
        "doc-stats family assume it; re-check SURVEY §1.2.")
  }

  test("Tables adapts every timestamp to classic TimestampType") {
    import org.apache.spark.sql.types._
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
    assert(Tables.t(spark, sf, "orders")
      .schema("o_orderdate").dataType == TimestampType)
    assert(Tables.t(spark, sf, "lineitem")
      .schema("l_shipdate").dataType == TimestampType)
    // embeddings arrive as array<float> — the ANN family's input contract
    assert(Tables.t(spark, sf, "embeddings")
      .schema("embedding").dataType == ArrayType(FloatType, true))
  }
}
