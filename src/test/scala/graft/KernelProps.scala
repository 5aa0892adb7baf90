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

  property("ArrayDot symmetric, Cauchy–Schwarz holds") =
    Prop.forAll(vec, vec) { (a, b) =>
      val ab = functions.ArrayDot.dot(arr(a), arr(b))
      val ba = functions.ArrayDot.dot(arr(b), arr(a))
      val aa = functions.ArrayDot.dot(arr(a), arr(a))
      val bb = functions.ArrayDot.dot(arr(b), arr(b))
      ab == ba && ab * ab <= aa * bb * (1 + 1e-9)
    }
}
