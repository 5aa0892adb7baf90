package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the driver-side pure kernels (SURVEY.md §5.3)
  * — no SparkSession, so these run in milliseconds. */
object KernelProps extends Properties("graft.kernels") {

  // strings biased toward spaces / unicode / empties
  private val tokeny: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.oneOf(" ", "  ", ""),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("ü", "☃", "中文", "\t", "a b"))).map(_.mkString)

  property("TokenCount == size(split(s,' ',-1)) for all strings") =
    Prop.forAll(tokeny) { s =>
      functions.TokenCount.count(UTF8String.fromString(s)) ==
        s.split(" ", -1).length
    }

  property("Fnv1a64 matches a BigInt reference implementation") =
    Prop.forAll(tokeny) { s =>
      val bytes = s.getBytes("UTF-8")
      val mask = BigInt("ffffffffffffffff", 16)
      var h = BigInt("cbf29ce484222325", 16)
      bytes.foreach { b =>
        h = (h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16) & mask
      }
      functions.Fnv1a64.hash(bytes) == h.longValue
    }

  property("Fnv1a64 is pure (same input ⇒ same hash)") =
    Prop.forAll(tokeny) { s =>
      val b = s.getBytes("UTF-8")
      functions.Fnv1a64.hash(b) == functions.Fnv1a64.hash(b.clone())
    }

  private val tokenSet: Gen[Set[String]] =
    Gen.containerOf[Set, String](Gen.oneOf("a", "b", "c", "d", "e", "f"))

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  property("jaccard ∈ [0,1], jaccard(A,A)=1, symmetric") =
    Prop.forAll(tokenSet, tokenSet) { (a, b) =>
      val j = jaccard(a, b)
      j >= 0.0 && j <= 1.0 && jaccard(a, a) == 1.0 &&
        j == jaccard(b, a)
    }

  private val vec: Gen[Array[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)

  private def arr(xs: Array[Double]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs)

  property("ArrayDot matches sequential fold bit-for-bit") =
    Prop.forAll(vec, vec) { (a, b) =>
      functions.ArrayDot.dot(arr(a), arr(b)) ==
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    }

  property("ArrayDot ragged input truncates to shorter length") =
    Prop.forAll(vec, vec) { (a, b) =>
      val short = a.take(8)
      functions.ArrayDot.dot(arr(short), arr(b)) ==
        short.zip(b.take(8)).foldLeft(0.0) {
          case (acc, (x, y)) => acc + x * y
        }
    }

  property("ArrayDot throws on a null element (never undefined data)") =
    Prop.forAll(vec) { a =>
      val withNull = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(a.map(x => java.lang.Double.valueOf(x))
          .updated(3, null: java.lang.Double))
      Prop.throws(classOf[IllegalArgumentException]) {
        functions.ArrayDot.dot(withNull, arr(a))
      }
    }

  private val lvec: Gen[List[Long]] =
    Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))
  private def larr(xs: List[Long]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)

  property("ArraySqDistLong == HOF zip_with fold, exactly") =
    Prop.forAll(lvec, lvec) { (a, b) =>
      functions.ArraySqDistLong.sqdist(larr(a), larr(b)) ==
        a.zip(b).foldLeft(0L) { case (acc, (x, y)) =>
          acc + (x - y) * (x - y)
        }
    }

  property("ArraySqDistLong: symmetric, zero iff equal, non-negative") =
    Prop.forAll(lvec, lvec) { (a, b) =>
      val ab = functions.ArraySqDistLong.sqdist(larr(a), larr(b))
      val ba = functions.ArraySqDistLong.sqdist(larr(b), larr(a))
      val aa = functions.ArraySqDistLong.sqdist(larr(a), larr(a))
      ab == ba && aa == 0L && ab >= 0L && (ab != 0L || a == b)
    }

  property("ArrayDot symmetric, Cauchy–Schwarz holds") =
    Prop.forAll(vec, vec) { (a, b) =>
      val ab = functions.ArrayDot.dot(arr(a), arr(b))
      val ba = functions.ArrayDot.dot(arr(b), arr(a))
      val aa = functions.ArrayDot.dot(arr(a), arr(a))
      val bb = functions.ArrayDot.dot(arr(b), arr(b))
      ab == ba && ab * ab <= aa * bb * (1 + 1e-9)
    }

  // ─────────────────────── TopKRows heap aggregate ───────────────────────

  private val rowGen: Gen[(Double, Long, Int)] = for {
    s <- Gen.chooseNum(-100.0, 100.0)
    a <- Gen.chooseNum(0L, 50L)
    b <- Gen.chooseNum(0, 10)
  } yield (s, a, b)

  private def topkRef(rows: Seq[(Double, Long, Int)],
      k: Int): Seq[(Double, Long, Int)] =
    rows.sortBy { case (s, a, b) => (-s, a, b) }.take(k)

  private def heapAgg(k: Int) = {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    functions.TopKRows(
      BoundReference(0, DoubleType, nullable = false),
      BoundReference(1, LongType, nullable = false),
      BoundReference(2, IntegerType, nullable = false), k)
  }

  private def evalRows(agg: functions.TopKRows)(
      buf: agg.Buf): Seq[(Double, Long, Int)] = {
    val arr = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getDouble(0), r.getLong(1), r.getInt(2))
    }
  }

  property("TopKRows == sort.take(k) regardless of arrival order") =
    Prop.forAll(Gen.listOf(rowGen), Gen.chooseNum(1, 5)) { (rows, k) =>
      val agg = heapAgg(k)
      val buf = rows.foldLeft(agg.createAggregationBuffer()) { (b, r) =>
        agg.update(b, org.apache.spark.sql.catalyst.InternalRow(
          r._1, r._2, r._3))
      }
      evalRows(agg)(buf) == topkRef(rows, k)
    }

  property("TopKRows merge(partials) == single-pass, any split") =
    Prop.forAll(Gen.listOf(rowGen), Gen.chooseNum(0, 100),
        Gen.chooseNum(1, 5)) { (rows, cut, k) =>
      val agg = heapAgg(k)
      val (l, r) = rows.splitAt(if (rows.isEmpty) 0 else cut % (rows.size + 1))
      def fill(part: Seq[(Double, Long, Int)]) =
        part.foldLeft(agg.createAggregationBuffer()) { (b, e) =>
          agg.update(b, org.apache.spark.sql.catalyst.InternalRow(
            e._1, e._2, e._3))
        }
      val merged = agg.merge(fill(l), fill(r))
      evalRows(agg)(merged) == topkRef(rows, k)
    }

  property("TopKRows serialize/deserialize round-trips") =
    Prop.forAll(Gen.listOf(rowGen), Gen.chooseNum(1, 5)) { (rows, k) =>
      val agg = heapAgg(k)
      val buf = rows.foldLeft(agg.createAggregationBuffer()) { (b, r) =>
        agg.update(b, org.apache.spark.sql.catalyst.InternalRow(
          r._1, r._2, r._3))
      }
      evalRows(agg)(agg.deserialize(agg.serialize(buf))) ==
        evalRows(agg)(buf)
    }

  // The identity the one-pass minhash build rests on (PipelinePlus
  // .minhashSig): md5 hex is fixed-length lowercase, so the numeric
  // 60-bit prefix orders exactly like the full digest string, and
  // min-then-truncate equals truncate-then-min over any input set.
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket60(hex: String): Long =
    java.lang.Long.parseLong(hex.take(15), 16)

  property("min over md5 strings == min over 60-bit prefix buckets") =
    Prop.forAll(Gen.nonEmptyListOf(tokeny)) { ss =>
      val hexes = ss.map(md5hex)
      bucket60(hexes.min) == hexes.map(bucket60).min
    }

  // ───────────────── Lcp (round 8) ─────────────────

  private def refLcp(a: String, b: String): Int = {
    // character-level reference: count of i where the i-char prefixes
    // match — exactly the HOF formulation the oracle keeps
    val n = math.min(a.length, b.length)  // UTF-16 — safe for BMP gens
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  private val lcpStr: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(4)),
    Gen.oneOf("ü", "中", "☃", ""))).map(_.mkString.take(16))

  property("Lcp matches the char-level reference on BMP strings") =
    Prop.forAll(lcpStr, lcpStr) { (a, b) =>
      functions.Lcp.lcp(UTF8String.fromString(a),
        UTF8String.fromString(b)) == refLcp(a, b)
    }

  property("Lcp(a, a) = numChars(a); Lcp with empty = 0") =
    Prop.forAll(lcpStr) { a =>
      val u = UTF8String.fromString(a)
      functions.Lcp.lcp(u, u) == u.numChars() &&
        functions.Lcp.lcp(u, UTF8String.fromString("")) == 0
    }

  property("Lcp never splits a multi-byte char (boundary backoff)") =
    Prop.forAll(lcpStr, lcpStr) { (a, b) =>
      val l = functions.Lcp.lcp(UTF8String.fromString(a),
        UTF8String.fromString(b))
      // the l-char prefixes must be equal strings
      a.take(l) == b.take(l)
    }

  // ───────────────── PackSignBits (round 8) ─────────────────

  private val vecGen: Gen[Array[Double]] =
    Gen.chooseNum(0, 80).flatMap(n =>
      Gen.containerOfN[Array, Double](n,
        Gen.oneOf(Gen.chooseNum(-5.0, 5.0), Gen.const(0.0),
          Gen.const(-0.0))))

  property("PackSignBits matches the bit-by-bit reference") =
    Prop.forAll(vecGen) { v =>
      val ref = v.take(64).zipWithIndex.foldLeft(0L) { case (h, (x, i)) =>
        if (x >= 0) h | (1L << i) else h
      }
      functions.PackSignBits.pack(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)) == ref
    }
}
