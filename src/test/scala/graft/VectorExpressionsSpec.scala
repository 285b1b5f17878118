package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val dim = 16
  lazy val vecs = (0 until 100).map { i =>
    (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }
  lazy val df = vecs.toDF("id", "vec")

  /** Driver-side reference: identical float->double promotion and
    * left-to-right accumulation order as the native loops. */
  private def refDot(a: Array[Float], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  test("arrayDot and arrayNorm2 match driver-side loops bit-exactly") {
    val out = df.select(col("id"),
      VectorExpressions.arrayDot(col("vec"), col("vec")).as("dot"),
      VectorExpressions.arrayNorm2(col("vec")).as("n2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    vecs.foreach { case (id, v) =>
      val expect = refDot(v, v.map(_.toDouble))
      assert(out(id)._1 == expect && out(id)._2 == expect)
    }
  }

  test("arraySub and arrayAdd are bit-identical to the zip_with forms they replace") {
    // round 12: the IVF-PQ residual path swapped interpreted
    // zip_with(_-_)/zip_with(_+_) for these natives — equality must be
    // EXACT (the e62 lossless spec depends on bit-identical x̂), with
    // the raw float input widening per element like an up-front cast
    val cent = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val centCol = typedLit(cent.toSeq)
    val out = df.select(col("id"),
      VectorExpressions.arraySub(col("vec"), centCol).as("sub"),
      VectorExpressions.arrayAdd(col("vec"), centCol).as("add"),
      zip_with(transform(col("vec"), _.cast("double")), centCol, (a, b) => a - b).as("zsub"),
      zip_with(transform(col("vec"), _.cast("double")), centCol, (a, b) => a + b).as("zadd"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Double]](1) == r.getAs[scala.collection.Seq[Double]](3))
      assert(r.getAs[scala.collection.Seq[Double]](2) == r.getAs[scala.collection.Seq[Double]](4))
    }
  }

  test("pqReconstruct and pqAssign match the slice/argmin/element_at composition") {
    // round 12: the fused kernels replace the m-way unrolled
    // composition (which generated JIT-uncompilable whole-stage code);
    // equality must be EXACT — same slice offsets, distance fold
    // order, tie resolution, and short-tail guard
    val m = 4; val dsub = dim / m
    val cbs: Array[Array[Array[Double]]] = Array.fill(m)(
      Array.fill(6)(Array.fill(dsub)(rnd.nextDouble() * 2 - 1)))
    val composed = concat(cbs.zipWithIndex.map { case (cb, s) =>
      element_at(typedLit(cb.map(_.toSeq).toSeq),
        VectorExpressions.nearestCentroid(slice(col("vec"), s * dsub + 1, dsub), cb) + 1)
    }.toIndexedSeq: _*)
    val assignsComposed = array(cbs.zipWithIndex.map { case (cb, s) =>
      VectorExpressions.nearestCentroid(slice(col("vec"), s * dsub + 1, dsub), cb)
    }.toIndexedSeq: _*)
    val out = df.select(
      VectorExpressions.pqReconstruct(col("vec"), cbs, dsub).as("f"),
      composed.as("c"),
      VectorExpressions.pqAssign(col("vec"), cbs, dsub).as("fa"),
      assignsComposed.as("ca")).collect()
    out.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Double]](0) == r.getAs[scala.collection.Seq[Double]](1))
      assert(r.getAs[scala.collection.Seq[Int]](2) == r.getAs[scala.collection.Seq[Int]](3))
    }
  }

  test("nearestCentroid and centroidDistances match driver argmin") {
    val cents = Array.fill(5)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val out = df.select(col("id"),
      VectorExpressions.nearestCentroid(col("vec"), cents).as("c"),
      VectorExpressions.centroidDistances(col("vec"), cents).as("d"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getAs[scala.collection.Seq[Double]](2))).toMap
    vecs.foreach { case (id, v) =>
      val dists = cents.map { c =>
        var s = 0.0; var i = 0
        while (i < dim) { val t = v(i).toDouble - c(i); s += t * t; i += 1 }
        s
      }
      val best = dists.indexOf(dists.min)
      assert(out(id)._1 == best)
      assert(out(id)._2.toSeq == dists.toSeq)
    }
  }

  test("planeSignature sets exactly the sign bits of the plane dots") {
    val planes = Array.fill(10)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val out = df.select(col("id"),
      VectorExpressions.planeSignature(col("vec"), planes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      var expect = 0L
      planes.zipWithIndex.foreach { case (p, b) =>
        if (refDot(v, p) >= 0) expect |= 1L << b
      }
      assert(out(id) == expect)
    }
  }

  test("extensions expose array_dot / array_norm2 to SQL") {
    val r = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "array_norm2(array(3.0D, 4.0D)) AS n").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 25.0)
  }

  test("extensions expose array_abs_max / quantize_int8 to SQL") {
    val r = spark.sql(
      "SELECT array_abs_max(array(0.5D, -2.0D, 1.0D)) AS m, " +
        "quantize_int8(array(0.5D, -2.0D, 1.0D), 2.0D) AS q").head()
    assert(r.getDouble(0) == 2.0)
    // floor(0.25*127+0.5)=32, floor(-127+0.5)=-127, floor(63.5+0.5)=64
    assert(r.getAs[scala.collection.Seq[Int]](1).toSeq == Seq(32, -127, 64))
  }

  test("native expressions accept array<double> input too") {
    val ddf = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }.toDF("id", "vec")
    val got = ddf.select(VectorExpressions.arrayNorm2(col("vec")).as("n2"))
      .agg(sum("n2")).head().getDouble(0)
    val expect = vecs.map { case (_, v) => refDot(v, v.map(_.toDouble)) }.sum
    assert(math.abs(got - expect) < 1e-9)
  }

  test("null element slots read as 0.0 on interpreted and codegen paths") {
    val ndf = Seq((1L, Array[java.lang.Double](1.0, null, 3.0)))
      .toDF("id", "vec")
    // codegen path (whole-stage over a projection)
    val cg = ndf.select(
      VectorExpressions.arrayDot(col("vec"), col("vec")).as("d"),
      VectorExpressions.arrayNorm2(col("vec")).as("n")).head()
    assert(cg.getDouble(0) == 10.0 && cg.getDouble(1) == 10.0)
    // interpreted path (force eval through a literal-only expression tree)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val arr = Literal.create(ArrayData.toArrayData(Array[Any](1.0, null, 3.0)),
      ArrayType(DoubleType, containsNull = true))
    assert(VectorExpressions.ArrayDot(arr, arr).eval(null) == 10.0)
    assert(VectorExpressions.ArrayNorm2(arr).eval(null) == 10.0)
  }

  test("sortedIntersectCount matches a driver-side set intersection") {
    val rnd2 = new scala.util.Random(13)
    val rows = (0 until 60).map { i =>
      val a = Array.fill(rnd2.nextInt(50))(rnd2.nextInt(40).toLong).distinct.sorted
      val b = Array.fill(rnd2.nextInt(50))(rnd2.nextInt(40).toLong).distinct.sorted
      (i.toLong, a, b)
    }
    // codegen path
    val out = rows.toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(out(id) == a.toSet.intersect(b.toSet).size, s"row $id")
    }
    // interpreted path + 64-bit exactness above 2^53 (7-gram codes)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val big = Array((1L << 53) + 1L, (1L << 53) + 2L, (1L << 62))
    val l1 = Literal.create(ArrayData.toArrayData(big),
      ArrayType(LongType, containsNull = false))
    val l2 = Literal.create(ArrayData.toArrayData(Array((1L << 53) + 2L, (1L << 62))),
      ArrayType(LongType, containsNull = false))
    assert(graft.functions.VectorExpressions.SortedIntersectCount(l1, l2).eval(null) == 2)
    // a double-compared version would collapse 2^53+1 and 2^53+2
    val l3 = Literal.create(ArrayData.toArrayData(Array((1L << 53) + 2L)),
      ArrayType(LongType, containsNull = false))
    assert(graft.functions.VectorExpressions.SortedIntersectCount(l1, l3).eval(null) == 1)
  }

  test("packedGrams and shingleHashes match the HOF chains they replaced") {
    import graft.functions.StringExpressions
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "abc", "ab", "", "single",
      "repeat repeat repeat repeat")
    val df2 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    // reference: the original split/transform/ascii packing
    val hof = df2.select(col("id"),
        transform(split(col("t"), ""), c => ascii(c).cast("long")).as("cc"))
      .select(col("id"),
        when(size(col("cc")) >= 3,
          array_sort(array_distinct(transform(
            sequence(lit(1), greatest(size(col("cc")) - 2, lit(1))),
            p => (0 until 3).map(i => element_at(col("cc"), p + i) *
              lit(1L << (8 * (2 - i)))).reduce(_ + _)))))
          .otherwise(array().cast("array<bigint>")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val nat = df2.select(col("id"), StringExpressions.packedGrams(col("t"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.indices.foreach(i => assert(nat(i.toLong) == hof(i.toLong), s"grams of '${texts(i)}'"))
    // reference: the original slice/concat_ws/polyHash shingles
    val shof = df2.select(col("id"), split(col("t"), " ").as("w"))
      .select(col("id"), col("w"),
        explode(when(size(col("w")) >= 2,
            sequence(lit(1), size(col("w")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("id"),
        graft.functions.polyFingerprint(concat_ws(" ", slice(col("w"), col("i"), lit(2)))).as("h"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val snat = df2.select(col("id"),
        explode(StringExpressions.shingleHashes(col("t"), 2)).as("h"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    texts.indices.foreach { i =>
      assert(snat.getOrElse(i.toLong, Seq()) == shof.getOrElse(i.toLong, Seq()),
        s"shingles of '${texts(i)}'")
    }
    // reference: the original slice/concat_ws STRING shingles
    val strHof = df2.select(col("id"), split(col("t"), " ").as("w"))
      .select(col("id"), col("w"),
        explode(when(size(col("w")) >= 2,
            sequence(lit(1), size(col("w")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("id"), concat_ws(" ", slice(col("w"), col("i"), lit(2))).as("g"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    val strNat = df2.select(col("id"),
        explode(StringExpressions.shingleStrings(col("t"), 2)).as("g"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    texts.indices.foreach { i =>
      assert(strNat.getOrElse(i.toLong, Seq()) == strHof.getOrElse(i.toLong, Seq()),
        s"string shingles of '${texts(i)}'")
    }
  }

  test("extensions expose the text kernels and sorted_intersect_count to SQL") {
    import spark.implicits._
    Seq((1L, "Hello, World!  42")).toDF("id", "t").createOrReplaceTempView("__sqlt")
    val r = spark.sql(
      """SELECT normalize_text(t) AS n, poly_hash(normalize_text(t)) AS h,
         size(packed_grams(normalize_text(t), 3)) AS g,
         size(shingle_hashes(normalize_text(t), 2)) AS s,
         sorted_intersect_count(array(1L, 5L, 9L), array(5L, 9L, 11L)) AS c
         FROM __sqlt""").head()
    assert(r.getString(0) == "hello world 42")
    assert(r.getInt(4) == 2)
    assert(r.getInt(2) > 0 && r.getInt(3) == 2)
  }

  test("native normalizeText is bit-identical to the composed regex chain") {
    val rnd3 = new scala.util.Random(99)
    val alphabet = "abzAZ09 \t\n!@#.é漢ΩßKİ" // incl. Kelvin sign + dotted I
    val rows = (0 until 300).map { i =>
      val len = rnd3.nextInt(40)
      (i.toLong, Seq.fill(len)(alphabet(rnd3.nextInt(alphabet.length))).mkString)
    } ++ Seq((1000L, ""), (1001L, "   "), (1002L, "a!!b  c"), (1003L, "ÀÉÎ"),
      (1004L, null.asInstanceOf[String]))
    val df3 = rows.toDF("id", "t")
    val out = df3.select(col("id"),
        graft.functions.normalizeText(col("t")).as("nat"),
        trim(regexp_replace(regexp_replace(lower(col("t")), "[^a-z0-9\\s]", " "),
          "\\s+", " ")).as("ref"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getString(1) == r.getString(2),
          s"id=${r.getLong(0)}: '${r.getString(1)}' != '${r.getString(2)}'")
    }
  }

  test("non-array input fails at analysis time, not as a runtime CCE") {
    val bad = Seq((1L, "oops")).toDF("id", "vec")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorExpressions.arrayNorm2(col("vec"))).collect()
    }
    assert(e.getMessage.contains("array_norm2") || e.getMessage.contains("DATATYPE"))
  }

  test("arrayAbsMax and quantizeInt8 match driver-side reference exactly") {
    val out = df.select(col("id"),
      VectorExpressions.arrayAbsMax(col("vec")).as("scale"),
      VectorExpressions.quantizeInt8(col("vec"),
        VectorExpressions.arrayAbsMax(col("vec"))).as("q"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getAs[scala.collection.Seq[Int]](2))).toMap
    vecs.foreach { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max
      val codes = v.map(x => math.floor(x.toDouble / scale * 127.0 + 0.5).toInt)
      assert(out(id)._1 == scale)
      assert(out(id)._2.toSeq == codes.toSeq)
      assert(codes.forall(c => c >= -127 && c <= 127))
    }
    // zero vector: scale 0, all-zero codes (no division)
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("id", "vec")
      .select(VectorExpressions.arrayAbsMax(col("vec")).as("s"),
        VectorExpressions.quantizeInt8(col("vec"), lit(0.0)).as("q")).head()
    assert(z.getDouble(0) == 0.0 && z.getAs[scala.collection.Seq[Int]](1).forall(_ == 0))
  }

  test("quantized cosine top-k agrees with exact float top-1 for most queries") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    def top1(dfr: org.apache.spark.sql.DataFrame) = dfr
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = top1(graft.vector.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 1))
    val quant = top1(graft.vector.Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", 1))
    val agree = exact.count { case (q, n) => quant.get(q).contains(n) }
    // int8 on 64 dims: angle error ~1e-3 — top-1 flips only on near-ties
    assert(agree >= (exact.size * 8) / 10, s"top-1 agreement $agree/${exact.size}")
  }

  test("assign maps matrix positions back to non-contiguous cluster ids") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("cluster", IntegerType),
      StructField("centroid", ArrayType(DoubleType))))
    // ids 7 and 3 (unsorted, non-contiguous): rows near (1,0) must get 7
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(7, Seq(1.0, 0.0)), Row(3, Seq(0.0, 1.0))),
      schema)
    val pts = Seq((1L, Array(0.9f, 0.1f)), (2L, Array(0.1f, 0.9f)))
      .toDF("id", "vec")
    val got = graft.vector.Cluster.assign(pts, "id", "vec", cents)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    assert(got(1L) == 7 && got(2L) == 3)
  }
}
