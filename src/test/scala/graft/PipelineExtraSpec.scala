package graft

import org.apache.spark.sql.functions._

/** Properties of the second-wave pipeline + relational-breadth operators
  * that the DuckDB oracle can't express (invariants, not values).
  */
class PipelineExtraSpec extends SparkSpecBase {

  test("embed_norm: quantized components bounded, norms positive, total") {
    val df = queries.PipelineExtra.qEmbedNorm(spark, sf)
    assert(df.count() == Tables.t(spark, sf, "embeddings").count())
    assert(df.filter(col("l2_norm") <= 0).count() == 0)
    // quant ships comma-joined (driver-hashable wire format)
    val outOfRange = df
      .select(explode(split(col("quant"), ",").cast("array<int>")).as("q"))
      .filter(col("q") > 127 || col("q") < -127 || col("q").isNull)
    assert(outOfRange.count() == 0)
  }

  test("LSH pairs are bucket-consistent and cosine-bounded") {
    val df = queries.PipelineExtra.qSimLsh(spark, sf).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val cos = r.getDouble(r.fieldIndex("cos"))
      assert(cos >= -1.0001 && cos <= 1.0001)
      assert(r.getLong(r.fieldIndex("v1")) < r.getLong(r.fieldIndex("v2")))
    }
    val coss = df.map(r => r.getDouble(r.fieldIndex("cos")))
    assert(coss.sameElements(coss.sortBy(-_)), "not sorted by cos desc")
  }

  test("ngram jaccard within (0, 1], ordered pairs") {
    val rows = queries.PipelineExtra.qDedupNgram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(r.fieldIndex("jaccard"))
      assert(j > 0.0 && j <= 1.0)
      assert(r.getLong(r.fieldIndex("d1")) < r.getLong(r.fieldIndex("d2")))
    }
  }

  test("salted join equals the plain join") {
    val salted = queries.RelationalPlus.qJoinSalted(spark, sf).collect().toSeq
    val plain = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }

  test("fact salt occupies every bucket (no dead dim replicas)") {
    // the old l_linenumber % 8 salt never produced 0 (linenumber is
    // 1..7), so 1/8 of the exploded dim rows shuffled and matched
    // nothing and a hot key concentrated on salt=1 instead of spreading
    val salts = Tables.t(spark, sf, "lineitem")
      .select(pmod(hash(col("l_partkey"), col("l_linenumber")), lit(8))
        .as("salt"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts == (0 until 8).toSet, s"salt buckets hit: $salts")
  }

  test("unpivot doubles the row count; pivot keeps one row per priority") {
    val parts = Tables.t(spark, sf, "part").count()
    assert(queries.RelationalPlus.qUnpivot(spark, sf).count() == 2 * parts)
    assert(queries.RelationalPlus.qPivot(spark, sf).count() == 5)
  }

  test("shingles3: short docs yield the whole text as one shingle") {
    import org.apache.spark.sql.functions.explode
    val df = spark.createDataFrame(Seq(
      (1L, "a b"), (2L, "only"), (3L, "x y z"), (4L, "p q r s")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(Tables.shingles3(col("text"))).as("sh"))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "a b"), (2L, "only"),
      (3L, "x y z"),
      (4L, "p q r"), (4L, "q r s")))
  }

  test("approx percentiles land within one bin width below exact") {
    val binDollars = queries.RelationalPlus.ApproxPctBinCents / 100.0
    val rows = queries.RelationalPlus.qAggApproxPct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(("p50_cents", "p50_exact"), ("p90_cents", "p90_exact"))
        .foreach { case (a, e) =>
          val approx = r.getLong(r.fieldIndex(a)) / 100.0
          val exact = r.getDouble(r.fieldIndex(e))
          // lower bin edge of the kq-th ORDER STATISTIC: within one bin
          // width of it by construction; the interpolated exact sits
          // within one inter-value gap of that order statistic (≤ $1 on
          // this dense two-decimal domain), hence the symmetric slack
          assert(math.abs(exact - approx) <= binDollars + 1.0,
            s"$a=$approx vs $e=$exact (bin $binDollars)")
        }
    }
  }

  test("split: deterministic, total, dup texts share a split") {
    val s1 = queries.PipelineExtra.qSplitTrain(spark, sf)
    assert(s1.count() == Tables.t(spark, sf, "documents").count())
    // same text ⇒ same split (content-hash property, the leakage guard)
    val perText = Tables.t(spark, sf, "documents")
      .join(s1, "doc_id")
      .groupBy(md5(col("text"))).agg(countDistinct("split").as("ns"))
    assert(perText.filter(col("ns") > 1).count() == 0)
  }

  test("shard packing: shard id is exactly floor(start offset / budget)") {
    val packed = queries.PipelineExtra.qShardPack(spark, sf).collect()
      .sortBy(_.getLong(0))
    var cum = 0L
    packed.foreach { r =>
      assert(r.getLong(2) == cum / 2000,
        s"doc ${r.getLong(0)}: shard ${r.getLong(2)} != ${cum / 2000}")
      cum += r.getLong(1)
    }
  }

  test("retention: offsets non-negative, day-0 actives equal cohort size") {
    val ret = queries.Events.qEvtRetention(spark, sf)
    assert(ret.filter(col("day_offset") < 0).count() == 0)
    // every user appears in their cohort's day-0 row
    val day0 = ret.filter(col("day_offset") === 0)
      .agg(sum("n_users")).head.getLong(0)
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(day0 == users)
  }
}
