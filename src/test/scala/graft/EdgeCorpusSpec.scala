package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Latent-path tests over SYNTHETIC corpora: the driver testdata is
  * degenerate in ways that leave two graded code paths unexercised —
  * every char bigram appears in every language's profile (so the
  * lang-ID smoothing floor is never hit), and no user flips state twice
  * in the same microsecond (so the SCD2 sort never ties). These
  * fixtures construct exactly those inputs, guarding the
  * try_element_at smoothing fallback and the (user_id, valid_from,
  * state) total order against regression.
  */
class EdgeCorpusSpec extends SparkSpecBase {

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-edge-corpus").toString
    val s = spark // stable identifier for the implicits import
    import s.implicits._
    // lang-ID corpus where each language's profile MISSES grams the
    // other language's docs contain: "aaaa" grams {aa} never occur in
    // the fr profile ({bb}), so scoring doc 1 under fr probes absent
    // map keys — the smoothing-floor path, which depends on
    // null-on-missing-key lookup semantics (try_element_at) that
    // element_at does not guarantee across Spark versions/ANSI modes.
    Seq(
      (1L, "aaaa", "en"),
      (2L, "bbbb", "fr"),
      (3L, "aabb", "en"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // SCD2 corpus with a same-microsecond state flip: user 1's view
    // and click both land at t=1s exactly, so two intervals share
    // valid_from and only the state tie-break makes the sort total.
    // ts is a LONG of epoch-nanos, matching the driver testdata's
    // TIMESTAMP(NANOS) column as read via nanosAsLong.
    Seq(
      (1L, 1_000_000_000L, 1L, "view"),
      (2L, 1_000_000_000L, 1L, "click"),
      (3L, 2_000_000_000L, 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("lang-id scores docs whose grams are absent from a profile " +
    "(smoothing floor applies on missing map keys)") {
    val out = queries.PipelinePlus.qTextLangId(spark, fixtureDir)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val predicted = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    // all-aa text scores higher under the aa-dominated en profile even
    // though every gram is unseen by fr (floor applies, query survives)
    assert(predicted(1L) == "en")
    assert(predicted(2L) == "fr")
  }

  test("scd2 orders same-microsecond state flips totally " +
    "(state tie-break on tied valid_from)") {
    val rows = queries.Warehouse.qScd2(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.get(3)).map(_.asInstanceOf[Timestamp]), r.getLong(4)))
    val t1 = Timestamp.valueOf("1970-01-01 00:00:01")
    val t2 = Timestamp.valueOf("1970-01-01 00:00:02")
    // view@1s closes at the same-µs click; click closes at the 2s view;
    // output order is (user, valid_from, state): click before view at
    // the 1s tie — deterministic on BOTH engines by construction
    assert(rows.toSeq == Seq(
      (1L, "click", t1, Some(t2), 1L),
      (1L, "view", t1, Some(t1), 1L),
      (1L, "view", t2, None, 1L)))
  }
}
