package graft

/** Driver-contract sanity: every declared query runs on sf0.001, returns
  * rows, and every oracle key points at a declared query (SURVEY.md §0.2).
  */
class ContractSpec extends SparkSpecBase {

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("UnitEvidence covers exactly the oracle=unit rows") {
    val unitRows = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val declared = UnitEvidence.evidence.keySet
    assert(declared == unitRows,
      s"undeclared unit rows: ${unitRows -- declared}; " +
        s"stale evidence entries: ${declared -- unitRows}")
  }

  test("UnitEvidence points at tests that actually exist") {
    // Renaming an evidence test would otherwise just make the reporter
    // treat every full run as partial and silently freeze the committed
    // UNIT_RESULTS.json. Resolve each (suite, test) against the real
    // suite's registered test names (suite constructors only register
    // tests — the shared SparkSession stays untouched).
    // NOTE: resolution assumes every evidence suite lives directly in
    // the `graft` package with a nullary constructor (true for all
    // suites in this repo); a failure below can therefore also mean
    // "suite moved / can't instantiate", so the reflection error is
    // carried into the message instead of being swallowed as absence.
    val bad = UnitEvidence.evidence.values.flatten.toSeq.distinct
      .flatMap { case (suiteName, testName) =>
        try {
          if (Class.forName(s"graft.$suiteName").getDeclaredConstructor()
              .newInstance().asInstanceOf[org.scalatest.Suite]
              .testNames.contains(testName))
            None
          else Some(s"$suiteName/$testName: test name not registered")
        } catch {
          case t: Throwable =>
            Some(s"$suiteName/$testName: cannot resolve suite ($t)")
        }
      }
    assert(bad.isEmpty,
      s"evidence pointing at unresolvable suites/tests: $bad")
  }

  test("every oracle SQL carries a total ORDER BY (determinism rule A)") {
    // the ORDER BY must govern the OUTERMOST select — one inside a
    // subquery or window OVER(...) doesn't order the output. Strip all
    // parenthesized content, then look for ORDER BY in what remains.
    def stripParens(s: String): String = {
      val b = new StringBuilder
      var depth = 0
      s.foreach {
        case '(' => depth += 1
        case ')' => if (depth > 0) depth -= 1
        case c => if (depth == 0) b.append(c)
      }
      b.toString
    }
    val missing = SparkEntry.oracleSql.collect {
      case (k, sql) if !stripParens(sql.toUpperCase).contains("ORDER BY") => k
    }
    assert(missing.isEmpty, s"oracles without outermost ORDER BY: $missing")
  }

  // Streaming rows get their own suite (they drive MemoryStream pipelines);
  // everything else must produce a non-empty deterministic result here.
  private val streamingKeys =
    SparkEntry.queries.keySet.filter(_.startsWith("s_stream"))

  /** The driver pandas-sorts + hashes EVERY query's output parquet —
    * nested (array/map/struct) top-level columns crash its comparator
    * ("unhashable type: numpy.ndarray"), even for no-oracle rows. So
    * nested types are banned from all output schemas; serialize to a
    * string wire format instead (round-1 lesson, VERDICT r1 §wrong-2). */
  private def assertDriverHashable(name: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val nested = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType}"
    }
    assert(nested.isEmpty,
      s"$name has driver-unhashable nested output columns: " +
        nested.mkString(", "))
  }

  for (name <- SparkEntry.queries.keySet.diff(streamingKeys).toSeq.sorted) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf)
      assertDriverHashable(name, df.schema)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("SparkEntry map literals carry no duplicate keys (source-level)") {
    // A Scala Map literal with a repeated key silently keeps the LAST
    // binding — round 11 nearly shipped a new operator that shadowed an
    // existing one this way (a second "q_eval_confusion"). The runtime
    // Map cannot reveal the collision, so scan the source text.
    // resolve against user.dir explicitly and SKIP (not error) when the
    // source tree is not visible — a forked test JVM with a different
    // working directory must not turn this source-level lint into a
    // spurious failure (round-11 advice)
    val srcFile = new java.io.File(
      sys.props.getOrElse("user.dir", "."),
      "src/main/scala/graft/SparkEntry.scala")
    assume(srcFile.isFile,
      s"source tree not visible from ${sys.props.get("user.dir")}; " +
        "skipping source-level duplicate-key scan")
    val src = scala.io.Source.fromFile(srcFile, "UTF-8")
    val text = try src.mkString finally src.close()
    val keyRe = """"((?:q|s|x)_[a-z_0-9]+)"\s*->""".r
    def dups(section: String): Seq[String] = {
      val keys = keyRe.findAllMatchIn(section).map(_.group(1)).toSeq
      keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
        .toSeq.sorted
    }
    // the query map literal lives in rawQueries since the round-12
    // trackPins wrapper; fall back to the old `def queries` name so the
    // scan keeps working if the wrapper is ever inlined away
    val qStart = math.max(text.indexOf("def rawQueries"),
      text.indexOf("def queries"))
    val oStart = text.indexOf("def oracleSql")
    assert(qStart >= 0 && oStart > qStart)
    assert(dups(text.substring(qStart, oStart)).isEmpty,
      s"duplicate queries keys: ${dups(text.substring(qStart, oStart))}")
    assert(dups(text.substring(oStart)).isEmpty,
      s"duplicate oracleSql keys: ${dups(text.substring(oStart))}")
  }
}
