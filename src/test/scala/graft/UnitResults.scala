package graft

import scala.collection.mutable

import org.scalatest.Reporter
import org.scalatest.events._

/** Declares, for each `oracle=unit` row (a `SparkEntry.queries` key with
  * NO `oracleSql` entry — non-SQL-expressible or engine-specific), the
  * ScalaTest evidence that verifies it: (suite, test name) pairs.
  *
  * [[UnitResultsReporter]] resolves this map against a full `sbt test`
  * run and writes `UNIT_RESULTS.json` so the driver/judge can confirm
  * all unit rows without re-running the 7-minute suite (round-3 advice).
  * `ContractSpec` pins the key set to exactly
  * `queries.keySet -- oracleSql.keySet`, so a new unit row cannot ship
  * without declared evidence.
  */
object UnitEvidence {
  val evidence: Map[String, Seq[(String, String)]] = Map(
    // q_agg_approx_pct graduated to a DuckDB oracle in round 12 (the
    // q_pct_sketch_union fixed-grid pattern: engine-portable integer
    // bins replace Spark's QuantileSummaries internals); its
    // PipelineExtraSpec bound test remains as extra in-engine evidence.
    "q_agg_cms" -> Seq(
      "PipelineSketchSpec" -> "cms: estimates dominate exact counts within the ε·N bound"),
    "q_agg_hll" -> Seq(
      "CustomSpec" -> "approx_count_distinct within 5% of exact (q_agg_hll contract)"),
    "q_agg_hll_union" -> Seq(
      "PipelineSketchSpec" -> "hll union: merged estimate within 5% of exact, per scope"),
    // q_compact_files graduated to a DuckDB oracle in round 6
    // (preservation + target-count math re-derived from documents)
    "q_contamination_bloom" -> Seq(
      "PipelineSketchSpec" -> "bloom contamination: superset of exact hits, bounded fp excess",
      "PlanAuditSpec" -> "q_contamination_bloom probes with NO join — the filter is a literal"),
    // q_source_csv/json (round 6), the three q_sink_* rows and the
    // eleven s_stream_* rows (round 6) graduated to DuckDB-oracled
    // rows — the streaming oracles check the materialized output
    // against the declarative batch answer (streaming/Streams.scala).
    // q_mm_decode/resize/frames and x_expr_custom graduated too (their
    // deterministic stand-in decoders / FNV hash are re-derivable in
    // DuckDB via a HUGEINT fold, Tables.fnv1a64Sql). All their
    // SourcesSpec/StreamingSpec/PipelinePlusSpec/CustomSpec tests
    // remain as extra in-engine evidence rather than declared unit
    // coverage.
    // q_text_lang_id graduated to a DuckDB oracle in round 12: the
    // per-(lang, gram) log-probs rescale to an exact integer grid
    // (round(ln·1e6), the q_naive_bayes discipline), retiring the
    // float-argmax tie class; the oracle re-derives profile, grid,
    // scores, and argmax relationally. Its PipelinePlusSpec tests
    // remain as extra in-engine evidence.
  )
}

/** ScalaTest reporter (wired via `Test / testOptions` `-C`) that records
  * every test outcome and, when a run observed ALL evidence tests from
  * [[UnitEvidence]] (i.e. a full `sbt test`, not a `testOnly` subset),
  * writes `UNIT_RESULTS.json`: per unit row, the covering tests and
  * their pass/fail status. Content is deterministic (no durations or
  * timestamps) so the committed artifact only diffs when evidence or
  * outcomes change.
  */
class UnitResultsReporter extends Reporter {
  private val outcomes = mutable.Map.empty[(String, String), String]
  private var totalSucceeded = 0
  private var totalFailed = 0

  override def apply(event: Event): Unit = synchronized {
    event match {
      case e: TestSucceeded =>
        totalSucceeded += 1
        outcomes((e.suiteName, e.testName)) = "pass"
      case e: TestFailed =>
        totalFailed += 1
        outcomes((e.suiteName, e.testName)) = "fail"
      // canceled (failed assume(), e.g. missing testdata) and ignored
      // evidence tests must still count as OBSERVED — with a non-pass
      // status — or a full green run would skip the rewrite and leave a
      // stale artifact claiming "pass" for a test that no longer runs.
      case e: TestCanceled =>
        outcomes((e.suiteName, e.testName)) = "canceled"
      case e: TestIgnored =>
        outcomes((e.suiteName, e.testName)) = "ignored"
      case _: RunCompleted | _: RunStopped | _: RunAborted => writeIfComplete()
      case _ => ()
    }
  }

  private def writeIfComplete(): Unit = {
    val missing = UnitEvidence.evidence.values.flatten
      .filterNot(outcomes.contains).toSeq
    if (missing.nonEmpty) {
      println(s"[unit-results] partial run — not writing UNIT_RESULTS.json " +
        s"(${missing.size} evidence tests not observed)")
      return
    }
    val rows = UnitEvidence.evidence.toSeq.sortBy(_._1).map {
      case (id, tests) =>
        val status =
          if (tests.forall(t => outcomes(t) == "pass")) "pass" else "fail"
        val ev = tests.map { case (suite, test) =>
          s"""{"suite":${JsonOut.str(suite)},"test":${JsonOut.str(test)},"status":"${outcomes((suite, test))}"}"""
        }.mkString("[", ",", "]")
        s"""    ${JsonOut.str(id)}: {"status":"$status","evidence":$ev}"""
    }
    val json =
      s"""{
         |  "comment": "per-unit-row ScalaTest evidence for the oracle=unit queries (no DuckDB oracle); written by graft.UnitResultsReporter on a full sbt test run",
         |  "count_note": "tests_succeeded counts ScalaTest events only; a full sbt test additionally runs 16 ScalaCheck KernelProps properties under the ScalaCheck framework (invisible to a ScalaTest Reporter), so sbt's own total is tests_succeeded + 16",
         |  "tests_succeeded": $totalSucceeded,
         |  "tests_failed": $totalFailed,
         |  "unit_rows": {
         |${rows.mkString(",\n")}
         |  }
         |}
         |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("UNIT_RESULTS.json"), json)
    println(s"[unit-results] wrote UNIT_RESULTS.json " +
      s"(${UnitEvidence.evidence.size} unit rows)")
  }
}
