package graft

import graft.functions.GraftExpressions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExpressionsSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("cosine_sim matches a hand computation and is symmetric") {
    val df = Seq(
      (Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b"), cosine_sim($"b", $"a")).collect()
    val exp = Seq(2.0 / (math.sqrt(5.0) * math.sqrt(5.0)), 1.0, 0.0)
    got.zip(exp).foreach { case (row, e) =>
      assert(math.abs(row.getDouble(0) - e) < 1e-12)
      assert(row.getDouble(0) == row.getDouble(1))
    }
  }

  test("cosine_sim zero vector yields 0.0, null input yields null") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(cosine_sim($"a", $"b")).head.getDouble(0) == 0.0)
    val withNull = df.select(cosine_sim(lit(null).cast("array<float>"), $"b"))
    assert(withNull.head.isNullAt(0))
  }

  test("cosine_sim interpreted eval equals codegen result") {
    val e = load()
    val viaExpr = e.selectExpr("vec_id").count() // touch table
    assert(viaExpr > 0)
    val pairs = e.limit(5).select($"vec_id".as("ia"), $"embedding".as("ea"))
      .crossJoin(e.limit(5).select($"vec_id".as("ib"), $"embedding".as("eb")))
    val codegen = pairs.select($"ia", $"ib", cosine_sim($"ea", $"eb").as("c")).collect()
    // interpreted path via eval on collected arrays
    val rows = pairs.select($"ia", $"ib", $"ea", $"eb").collect()
    val manual = rows.map { r =>
      val a = r.getSeq[Float](2); val b = r.getSeq[Float](3)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      ((r.getLong(0), r.getLong(1)), if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb)))
    }.toMap
    codegen.foreach { r =>
      assert(math.abs(r.getDouble(2) - manual((r.getLong(0), r.getLong(1)))) < 1e-12)
    }
  }

  test("bitmap_jaccard computes bit_count(and)/bit_count(or)") {
    val df = Seq(
      (Array(0x0FL, 0x00L), Array(0x03L, 0x00L)), // inter 2, union 4
      (Array(-1L), Array(-1L)), // identical full masks
      (Array(0x01L), Array(0x02L)) // disjoint
    ).toDF("a", "b")
    val got = df.select(bitmap_jaccard($"a", $"b")).collect().map(_.getDouble(0))
    assert(got(0) == 0.5 && got(1) == 1.0 && got(2) == 0.0)
  }

  test("simhash64 is stable and near-identical token sets have small hamming distance") {
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(0, "tokX").updated(1, "tokY") // 2/40 tokens changed
    val far = (1 to 40).map(i => s"other$i")
    val df = Seq((1, base), (2, base), (3, near), (4, far)).toDF("id", "toks")
      .select($"id", simhash64($"toks").as("h"))
    val m = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(1) == m(2), "deterministic across rows")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1), m(3)) < ham(m(1), m(4)), "near set closer than far set")
    assert(ham(m(1), m(3)) <= 16)
  }

  test("minhash signature match-rate estimates jaccard") {
    val a = (1 to 100).map(i => s"w$i")
    val b = (26 to 125).map(i => s"w$i") // |inter|=75, |union|=125 → j=0.6
    val df = Seq((1, a), (2, b)).toDF("id", "toks")
      .select($"id", minhash_signature($"toks", 128).as("sig"))
    val sigs = df.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val matches = sigs(1).zip(sigs(2)).count { case (x, y) => x == y }
    val est = matches / 128.0
    assert(math.abs(est - 0.6) < 0.15, s"est=$est should approximate 0.6")
  }

  test("SQL registration exposes cosine_similarity and simhash64") {
    register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c, " +
        "simhash64(array('a','b')) AS h").head
    assert(r.getDouble(0) == 1.0)
    assert(!r.isNullAt(1))
  }

  private def load() =
    spark.read.parquet(s"${GraftSparkSession.sfDir}/embeddings.parquet")

  test("PQ native encode and ADC score match the composed-builtins formulation bit-for-bit") {
    // real embeddings, synthetic-but-deterministic codebooks: the native
    // expressions replaced the CodegenFallback higher-order composition
    // on the two corpus-scale passes of sim_ann_pq; this pins that the
    // arithmetic (double fold order, half-up round-6 per centroid,
    // first-min argmin, lookup-sum) is identical on every vector
    val m = 8; val k = 4
    val e = load().limit(200)
    val sub = e.select(size(col("embedding"))).head.getInt(0) / m
    val books: Array[Array[Array[Double]]] = Array.tabulate(m, k, sub) {
      (i, c, j) => math.sin(i * 31 + c * 7 + j).abs * 0.2
    }
    def booksLit = array((0 until m).map { i =>
      array(books(i).map(c => array(c.map(lit(_)).toIndexedSeq: _*)).toIndexedSeq: _*) }: _*)
    def sqDist(a: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      round(aggregate(zip_with(a, c,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v), 6)
    val composedCodes = transform(sequence(lit(0), lit(m - 1)), i => {
      val d = transform(element_at(booksLit, i + 1),
        c => sqDist(slice(col("embedding"), i * sub + 1, lit(sub)), c))
      array_position(d, array_min(d)).cast("int")
    })
    val both = e.select(col("vec_id"),
      pq_encode(col("embedding"), books).as("native"),
      composedCodes.as("composed"))
    assert(both.filter(not(col("native") === col("composed"))).count() == 0,
      "native PQ encode must equal the composed formulation on every vector")
    // ADC: random-ish per-row tables from the embedding itself
    val tab = transform(sequence(lit(0), lit(m - 1)), i =>
      transform(sequence(lit(1), lit(k)), c =>
        round(element_at(col("embedding"), i + 1).cast("double") * c, 6)))
    val adc = e.select(
      pq_adc_score(tab, pq_encode(col("embedding"), books)).as("native"),
      round(aggregate(zip_with(tab, pq_encode(col("embedding"), books),
        (t, c) => element_at(t, c)), lit(0.0), (a, v) => a + v), 6).as("composed"))
    assert(adc.filter(not(col("native") === col("composed"))).count() == 0,
      "native ADC lookup-sum must equal the composed formulation")
    // interpreted parity too (the nocodegen lesson): same checks with
    // codegen fully disabled
    val orig = (spark.conf.getOption("spark.sql.codegen.wholeStage"),
      spark.conf.getOption("spark.sql.codegen.factoryMode"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(both.filter(not(col("native") === col("composed"))).count() == 0)
      assert(adc.filter(not(col("native") === col("composed"))).count() == 0)
    } finally {
      orig._1.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
      orig._2.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("KmeansArgmin matches the composed HOF assignment bit-for-bit (incl. ties and k=40)") {
    // the native expression replaced transform∘sq_distance∘array_min∘
    // array_position in kmeansAssign (the corpus-scale loop of every
    // Lloyd's pass); pin cl AND dist equality on real embeddings for a
    // small and a corpus-scaled k, plus the first-min tie-break with a
    // DUPLICATED centroid (both formulations must pick the lower id)
    val e = load().limit(300)
    def composed(cents: Seq[(Int, Seq[Float])]) = {
      val centArr = array(cents.map { case (_, c) => array(c.map(lit(_)): _*) }: _*)
      val idArr = array(cents.map { case (id, _) => lit(id) }: _*)
      val dists = transform(centArr, c =>
        round(graft.functions.GraftExpressions.sq_distance(col("embedding"), c), 6))
      struct(
        element_at(idArr, array_position(dists, array_min(dists)).cast("int")).as("cl"),
        array_min(dists).as("dist"))
    }
    val seed = e.orderBy(col("vec_id")).limit(40)
      .collect().map(r => r.getSeq[Float](1).toSeq)
    for (k <- Seq(4, 40)) {
      val cents = (0 until k).map(i => (i + 1, seed(i))).toSeq
      val both = e.select(col("vec_id"),
        graft.functions.GraftExpressions.kmeans_argmin(col("embedding"), cents).as("native"),
        composed(cents).as("composedv"))
      assert(both.filter(not(col("native") <=> col("composedv"))).count() == 0,
        s"native argmin must equal the composed formulation at k=$k")
    }
    // tie: centroid 2 duplicates centroid 1 — first minimum (lower id) wins
    val tied = Seq((1, seed(0)), (2, seed(0)), (3, seed(1)))
    val t = e.select(
      graft.functions.GraftExpressions.kmeans_argmin(col("embedding"), tied).as("native"),
      composed(tied).as("composedv"))
    assert(t.filter(not(col("native") <=> col("composedv"))).count() == 0)
    assert(t.filter(col("native.cl") === 2).count() == 0,
      "a tie must resolve to the FIRST centroid in cl order")
    // null face: empty centroid set and a length-mismatched centroid → null
    val emptyC = e.limit(5).select(
      graft.functions.GraftExpressions.kmeans_argmin(col("embedding"), Seq.empty).as("n"))
    assert(emptyC.filter(col("n").isNotNull).count() == 0)
    val mism = e.limit(5).select(
      graft.functions.GraftExpressions.kmeans_argmin(col("embedding"),
        Seq((1, Seq(1.0f, 2.0f)))).as("n"))
    assert(mism.filter(col("n").isNotNull).count() == 0)
  }

  test("PQ expressions: NaN/Infinity propagate like round(); malformed inputs error, not garbage") {
    // round6 mirrors Spark's RoundBase double path: NaN/Infinity pass
    // through unchanged (BigDecimal.valueOf(NaN) would throw). A vector
    // with a NaN element must produce the same result as the composed
    // round(aggregate(...), 6) form, in both evaluator modes.
    val m = 2; val k = 2; val sub = 2
    val books: Array[Array[Array[Double]]] =
      Array.tabulate(m, k, sub)((i, c, j) => i + c * 0.5 + j * 0.25)
    def booksLit = array((0 until m).map { i =>
      array(books(i).map(c => array(c.map(lit(_)).toIndexedSeq: _*)).toIndexedSeq: _*) }: _*)
    def sqDist(a: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      round(aggregate(zip_with(a, c,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v), 6)
    val composedCodes = transform(sequence(lit(0), lit(m - 1)), i => {
      val d = transform(element_at(booksLit, i + 1),
        c => sqDist(slice(col("v"), i * sub + 1, lit(sub)), c))
      array_position(d, array_min(d)).cast("int")
    })
    val rows = Seq(
      Array(Double.NaN, 1.0, 2.0, 3.0),
      Array(1.0, Double.PositiveInfinity, 2.0, 3.0),
      Array(Double.NegativeInfinity, Double.NaN, 0.0, 0.0),
      Array(0.1, 0.2, 0.3, 0.4)).toDF("v")
    def check(): Unit = {
      val both = rows.select(pq_encode(col("v"), books).as("native"),
        composedCodes.as("composed"))
      assert(both.filter(not(col("native") === col("composed"))).count() == 0,
        "NaN/Inf vectors must encode identically to the composed form")
      // ADC with NaN in the lookup table: sum is NaN, round6 passes it
      val tab = array(array(lit(Double.NaN), lit(1.0)), array(lit(2.0), lit(3.0)))
      val adc = rows.select(
        pq_adc_score(tab, pq_encode(col("v"), books)).as("native"),
        round(aggregate(zip_with(tab, pq_encode(col("v"), books),
          (t, c) => element_at(t, c)), lit(0.0), (a, x) => a + x), 6).as("composed"))
      assert(adc.filter(not(col("native") === col("composed"))).count() == 0,
        "NaN lookup tables must score identically to the composed form")
    }
    check()
    val orig = (spark.conf.getOption("spark.sql.codegen.wholeStage"),
      spark.conf.getOption("spark.sql.codegen.factoryMode"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() finally {
      orig._1.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
      orig._2.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
    // malformed inputs: descriptive errors instead of silent garbage
    // reads against UnsafeArrayData (the advisory's finding)
    val short = intercept[Exception] {
      Seq(Array(1.0, 2.0)).toDF("v").select(pq_encode(col("v"), books)).collect()
    }
    assert(findMessage(short).contains("pq_encode"), s"got: ${findMessage(short)}")
    val badCode = intercept[Exception] {
      Seq((Array(Array(1.0, 2.0), Array(3.0, 4.0)), Array(0, 1)))
        .toDF("tab", "codes")
        .select(pq_adc_score(col("tab"), col("codes"))).collect()
    }
    assert(findMessage(badCode).contains("pq_adc_score"), s"got: ${findMessage(badCode)}")
    // wrong-typed inputs fail at analysis, not runtime
    val badType = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array("x"), Array(1))).toDF("tab", "codes")
        .select(pq_adc_score(col("tab"), col("codes"))).collect()
    }
    assert(badType.getMessage.toLowerCase.contains("pq_adc_score") ||
      badType.getMessage.toLowerCase.contains("data type mismatch"))
  }

  private def findMessage(e: Throwable): String = {
    var cur: Throwable = e
    val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append(' '); cur = cur.getCause }
    sb.toString
  }

  test("WordShingles and BitmapFromTokens match their composed-builtins formulations bit-for-bit") {
    val docs = spark.read.parquet(s"${GraftSparkSession.sfDir}/documents.parquet")
      .limit(300).select(col("doc_id"), split(col("text"), " ").as("w"))
    // shingles: native vs transform∘concat_ws∘element_at on real docs
    def composedShingles(k: Int) = transform(
      sequence(lit(1), greatest(size(col("w")) - (k - 1), lit(0))),
      i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j)): _*))
    def checkShingles(): Unit = for (k <- Seq(2, 3, 5)) {
      val both = docs.select(word_shingles(col("w"), k).as("native"),
        composedShingles(k).as("composed"))
      assert(both.filter(not(col("native") === col("composed"))).count() == 0,
        s"k=$k shingles must be byte-identical to the composed form")
    }
    // bitmap: native vs the per-chunk aggregate() fold with a map literal
    val vocab = docs.select(explode(col("w")).as("t")).distinct()
      .orderBy(col("t")).limit(500).as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()
    val nChunks = (vocab.length + 63) / 64
    val idxMap = typedlit(vocab.zipWithIndex.toMap)
    def checkBitmap(): Unit = {
      val both = docs.select(
        bitmap_from_tokens(col("w"), vocab, nChunks).as("native"),
        transform(sequence(lit(0), lit(nChunks - 1)),
          c => aggregate(col("w"), lit(0L), (m, t) => {
            val idx = element_at(idxMap, t)
            when((idx / 64).cast("int") === c,
              m.bitwiseOR(call_function("shiftleft", lit(1L), (idx % 64).cast("int"))))
              .otherwise(m)
          })).as("composed"))
      assert(both.filter(not(col("native") === col("composed"))).count() == 0,
        "vocab bitmaps must be bit-identical to the composed per-chunk fold " +
          "(incl. absent-token skip — the 500-word vocab is a strict subset)")
    }
    checkShingles(); checkBitmap()
    // interpreted parity (the nocodegen discipline)
    val orig = (spark.conf.getOption("spark.sql.codegen.wholeStage"),
      spark.conf.getOption("spark.sql.codegen.factoryMode"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try { checkShingles(); checkBitmap() } finally {
      orig._1.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
      orig._2.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("native-dot LSH buckets and SqDistance match the composed HOF formulations bit-for-bit") {
    val e = load().limit(300)
    // the OLD column formulation of the hyperplane projection, kept here
    // verbatim as the parity oracle for the driver-evaluated weights +
    // native DotProduct that replaced it
    def planeWeightCol(i: org.apache.spark.sql.Column, j: Int) =
      pmod(xxhash64(i * 64 + lit(j)), lit(1000L)).cast("double") / 1000.0 - 0.5
    def composedBucket(bits: Int) = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(col("embedding"), sequence(lit(0L), lit(63L)),
          (x, i) => x.cast("double") * planeWeightCol(i, j)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    def check(): Unit = {
      val both = e.select(
        graft.operators.SimilarityOps.lshBucket(col("embedding"), 8).as("native"),
        composedBucket(8).as("composed"))
      assert(both.filter(not(col("native") === col("composed"))).count() == 0,
        "native-dot hyperplane buckets must equal the composed formulation on every vector")
      val sq = e.select(
        sq_distance(col("embedding"),
          transform(col("embedding"), x => x.cast("double") * 1.5)).as("native"),
        aggregate(zip_with(col("embedding"),
            transform(col("embedding"), x => x.cast("double") * 1.5),
            (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("composed"))
      assert(sq.filter(not(col("native") === col("composed"))).count() == 0,
        "SqDistance must equal the composed (a-b)^2 fold on every vector")
    }
    check()
    val orig = (spark.conf.getOption("spark.sql.codegen.wholeStage"),
      spark.conf.getOption("spark.sql.codegen.factoryMode"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() finally {
      orig._1.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
      orig._2.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("reference hashes agree with Spark builtins on every tail-length class") {
    import graft.functions.RefHash._
    // lengths 0..40 cross every boundary the algorithms branch on:
    // murmur3 4-byte blocks, xxh64 32-byte stripes + 8/4/1-byte tails,
    // sha1 one-vs-two padding blocks; multi-byte UTF-8 included
    val strings = (0 to 40).map("abcdefghijklmnopqrstuvwxyz0123456789ABCD".take(_)) ++
      Seq("café 你好 😀", " ", "\n\t", "a" * 300)
    val df = strings.toDF("s")
    val bad = df.filter(
      !(xxhash64($"s") === ref_xxh64($"s")) ||
      !(hash($"s") === ref_murmur3($"s")) ||
      !(crc32($"s") === ref_crc32($"s")) ||
      !(sha1($"s") === ref_sha1($"s"))).count()
    assert(bad == 0)
    // pin one known SHA-1 vector independent of Spark ("abc" from FIPS 180-1)
    assert(graft.functions.PureHashes.sha1Hex("abc".getBytes("UTF-8")) ==
      "a9993e364706816aba3e25717850c26c9cd0d89d")
  }

  test("null elements and length mismatches match the composed-builtins semantics (advisor r9)") {
    // arrays WITH null elements — the case the r9 advisory flagged:
    // getUTF8String on a null slot diverges between UnsafeArrayData
    // ("") and GenericArrayData (null), so every expression must route
    // through isNullAt and match its composed formulation exactly
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a', CAST(NULL AS STRING), 'b', 'c'), array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D)),
        |  (array(CAST(NULL AS STRING), NULL, 'q'), array(CAST(NULL AS DOUBLE), 1.0D), array(2.0D, 3.0D)),
        |  (array('x', 'y', 'z', NULL, 'w'), array(4.0D, 5.0D), array(6.0D, 7.0D))
        |AS t(w, va, vb)""".stripMargin)
    def composedShingles(k: Int) = transform(
      sequence(lit(1), greatest(size(col("w")) - (k - 1), lit(0))),
      i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j)): _*))
    def check(): Unit = {
      // WordShingles: nulls skipped inside the window, like concat_ws
      for (k <- Seq(2, 3)) {
        val both = df.select(word_shingles(col("w"), k).as("native"),
          composedShingles(k).as("composed"))
        assert(both.filter(not(col("native") === col("composed"))).count() == 0,
          s"k=$k shingles over null-bearing arrays must match the concat_ws form")
      }
      // TokenHashes: null tokens dropped, like the filtered transform
      val th = df.select(token_hashes(col("w")).as("native"),
        transform(filter(col("w"), x => x.isNotNull), x => xxhash64(x)).as("composed"))
      assert(th.filter(not(col("native") === col("composed"))).count() == 0,
        "token_hashes must drop null tokens exactly like transform∘filter")
      // BitmapFromTokens: a null token behaves like an absent one
      val vocab = Array("a", "b", "c", "w", "x")
      val bm = df.select(
        bitmap_from_tokens(col("w"), vocab, 1).as("native"),
        bitmap_from_tokens(filter(col("w"), x => x.isNotNull), vocab, 1).as("composed"))
      assert(bm.filter(not(col("native") === col("composed"))).count() == 0,
        "a null token must be ignored like an out-of-vocabulary one")
      // DotProduct / SqDistance: zip_with semantics — length mismatch
      // null-pads and the summing fold nulls the total
      val mism = df.select(dot_product(col("va"), col("vb")).as("d"),
        sq_distance(col("va"), col("vb")).as("s"),
        aggregate(zip_with(col("va"), col("vb"), (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v).as("dc"),
        aggregate(zip_with(col("va"), col("vb"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v).as("sc"))
      assert(mism.filter(not(col("d") <=> col("dc")) || not(col("s") <=> col("sc")))
        .count() == 0,
        "length-mismatched / null-element vectors must yield NULL like zip_with∘aggregate")
      // equal-length null-free vectors still produce values
      val ok = df.select(dot_product(col("vb"), col("vb")).as("d")).filter(col("d").isNull)
      assert(ok.count() == 0, "well-formed vectors must not regress to null")
    }
    check()
    val orig = (spark.conf.getOption("spark.sql.codegen.wholeStage"),
      spark.conf.getOption("spark.sql.codegen.factoryMode"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() finally {
      orig._1.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
      orig._2.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
