package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{LongPairs, MinHashBands, MinHashSignature, PolyHash, SimHash64, WordShingles}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Unit pins for the native signature expressions the dedup pipelines ride
  * on. The load-bearing property: [[PolyHash.hashUTF8]] (the byte-decoding
  * path called from generated code) must agree with [[PolyHash.hash]] (the
  * codepoint spelling the DuckDB oracles replay) on ALL of Unicode — BMP,
  * surrogate pairs, multi-byte UTF-8 — or the oracle match silently rests
  * on ASCII-only fixtures.
  */
class SignatureFunctionsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("hashUTF8 == hash(String) over arbitrary Unicode (incl. astral plane)") {
    val unicodeString: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.asciiPrintableChar.map(_.toString),
      2 -> Gen.choose(0x80, 0xffff).map(cp =>
        if (Character.isSurrogate(cp.toChar)) "x" else new String(Character.toChars(cp))),
      1 -> Gen.choose(0x10000, 0x10ffff).map(cp => new String(Character.toChars(cp)))
    )).map(_.mkString)
    check(Prop.forAll(unicodeString) { s =>
      PolyHash.hashUTF8(UTF8String.fromString(s)) == PolyHash.hash(s)
    })
  }

  test("hashUTF8 agrees on the documents fixture corpus") {
    val texts = TestSpark.spark.read
      .parquet(s"${TestSpark.sf001}/documents.parquet")
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach { s =>
      assert(PolyHash.hashUTF8(UTF8String.fromString(s)) == PolyHash.hash(s))
    }
  }

  test("MinHashSignature equals the explicit min-over-affine-rehashes") {
    val shingles = Seq("the quick fox", "quick fox jumps", "fox jumps over")
    val arr = new GenericArrayData(shingles.map(UTF8String.fromString).toArray[Any])
    val sig = MinHashSignature.compute(arr, 8)
    (0 until 8).foreach { i =>
      val a = ((2L * i + 1) * PolyHash.Mult) % PolyHash.P
      val b = i * 1000003L + 12345L
      val expect = shingles.map(s => (a * PolyHash.hash(s) + b) % PolyHash.P).min
      assert(sig.getLong(i) == expect, s"hash $i")
    }
  }

  test("MinHashBands equals the per-band PolyHash fold of the signature") {
    val shingles = Seq("alpha beta gamma", "beta gamma delta", "gamma delta eps")
    val arr = new GenericArrayData(shingles.map(UTF8String.fromString).toArray[Any])
    val sig = MinHashSignature.compute(arr, 32)
    val bands = MinHashBands.compute(arr, 32, 8)
    (0 until 8).foreach { b =>
      val expect = (0 until 4).foldLeft(0L)((acc, r) =>
        (acc * PolyHash.B + sig.getLong(b * 4 + r)) % PolyHash.P)
      assert(bands.getLong(b) == expect, s"band $b")
    }
  }

  test("SimHash64 equals the explicit vote tally") {
    val words = "one two three two one one".split(" ").toSeq
    val planes = Seq((2654435761L, 0L), (2246822519L, 104729L), (3266489917L, 130363L))
    val arr = new GenericArrayData(words.map(UTF8String.fromString).toArray[Any])
    val got = SimHash64.compute(arr, planes(0)._1, planes(0)._2,
      planes(1)._1, planes(1)._2, planes(2)._1, planes(2)._2)
    val expect = {
      var sig = 0L
      for (j <- 0 until 64) {
        val votes = words.map { w =>
          val h = PolyHash.hash(w)
          val (a, b) = if (j < 31) planes(0) else if (j < 62) planes(1) else planes(2)
          val m = (a * h + b) % PolyHash.P
          val off = if (j < 31) j else if (j < 62) j - 31 else j - 62
          if (((m >> off) & 1L) == 1L) 1 else -1
        }.sum
        if (votes > 0) sig |= (1L << j)
      }
      sig
    }
    assert(got == expect)
  }

  test("LongPairs emits exactly the ascending (a < b) pairs") {
    val arr = new GenericArrayData(Array[Any](3L, 7L, 11L, 20L))
    val pairs = LongPairs.compute(arr)
    val got = (0 until pairs.numElements()).map { i =>
      val r = pairs.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }
    assert(got == Seq((3L, 7L), (3L, 11L), (3L, 20L), (7L, 11L), (7L, 20L), (11L, 20L)))
    assert(LongPairs.compute(new GenericArrayData(Array[Any](42L))).numElements() == 0)
  }

  test("LongPairsPacked == LongPairs with each pair packed (a<<32)|b; rejects 32-bit overflow") {
    val ids: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, Int.MaxValue.toLong))
      .map(_.distinct.sorted)
    check(Prop.forAll(ids) { xs =>
      val arr = new GenericArrayData(xs.toArray[Any])
      val packed = graft.functions.LongPairsPacked.compute(arr)
      val viaStructs = LongPairs.compute(arr)
      val want = (0 until viaStructs.numElements()).map { i =>
        val r = viaStructs.getStruct(i, 2); (r.getLong(0) << 32) | r.getLong(1)
      }
      (0 until packed.numElements()).map(packed.getLong) == want
    })
    // ids past the 31-bit slot would alias two pairs — must fail fast
    intercept[IllegalArgumentException] {
      graft.functions.LongPairsPacked.compute(
        new GenericArrayData(Array[Any](1L, 1L << 31)))
    }
  }

  test("BucketMembersAgg: any split/merge order yields the cap-smallest ids + exact count") {
    val agg = new graft.functions.BucketMembersAgg(5)
    val members: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct)
    val splits: Gen[Int] = Gen.choose(1, 4)
    check(Prop.forAll(members, splits) { (ids, nSplits) =>
      // partial-aggregate simulation: reduce each slice, merge in a rotated
      // order (merge must be commutative/associative up to the final result)
      val slices = ids.grouped(math.max(1, (ids.size + nSplits - 1) / nSplits)).toList
      val partials = slices.map(_.foldLeft(agg.zero)(agg.reduce))
      val rotated = if (partials.isEmpty) List(agg.zero)
        else partials.drop(1) :+ partials.head
      val (got, n) = agg.finish(rotated.foldLeft(agg.zero)(agg.merge))
      got == ids.sorted.take(5) && n == ids.size
    })
  }

  test("signature expressions stay inside whole-stage codegen") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .select(col("doc_id"),
        MinHashBands.minhash_bands(WordShingles.word_shingles(col("text"), 3), 32, 8).as("b"),
        SimHash64.simhash64(split(col("text"), " "),
          Seq((2654435761L, 0L), (2246822519L, 104729L), (3266489917L, 130363L))).as("s"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("minhash_bands")),
      plan)
    // and they actually evaluate through the generated path
    assert(df.count() > 0)
  }
}
