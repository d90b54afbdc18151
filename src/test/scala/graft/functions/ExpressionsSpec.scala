package graft.functions

import graft.SparkTestBase
import graft.text.{Porter2, TextPipeline, PipelineConfig}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("nxs_tokenize matches the pure-Scala pipeline (codegen path)") {
    val texts = Seq(
      "The quick brown foxes jumped over the lazy dogs.",
      "We will play with I.B.M.",
      "Fuglafjørður is in the Faroe Islands",
      "")
    val df = texts.toDF("text")
    val got = df.select(nxs_tokenize($"text")).as[Seq[String]].collect()
    val exp = texts.map(t => TextPipeline.tokens(t, TextPipeline.default).toSeq)
    assert(got.toSeq == exp)
  }

  test("nxs_tokenize null handling and lang column") {
    val df = Seq(("hello worlds", "en"), (null, "en"), ("häuser", "de"))
      .toDF("text", "lang")
    val got = df.select(nxs_tokenize($"text", $"lang")).collect()
    assert(got(0).getSeq[String](0) == Seq("hello", "world"))
    assert(got(1).isNullAt(0))
    // de: no stopword list and no stemmer (reference ships en only)
    assert(got(2).getSeq[String](0) == Seq("hauser"))
  }

  test("nxs_shingles: set semantics, sorted, w-gram count") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("a", "a", "a", "a"), Seq("a"))
      .toDF("tokens")
    val got = df.select(nxs_shingles($"tokens", w = 2)).as[Seq[Long]].collect()
    assert(got(0).length == 3)                   // ab bc cd
    assert(got(0) == got(0).sorted)
    assert(got(1).length == 1)                   // aa aa aa dedup
    assert(got(2).isEmpty)                       // shorter than w
  }

  test("nxs_minhash: identical sets -> identical sigs; est. Jaccard sane") {
    val a = (1 to 200).map(i => s"tok$i")
    val b = (1 to 200).map(i => if (i <= 180) s"tok$i" else s"other$i") // J≈0.818 on tokens
    val df = Seq(a, a, b).toDF("tokens")
    val sigs = df
      .select(nxs_minhash(nxs_shingles($"tokens", w = 1), k = 256).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    val est = sigs(0).zip(sigs(2)).count { case (x, y) => x == y } / 256.0
    // true J = 180/220 = 0.818; 256 perms -> sd ≈ 0.024
    assert(math.abs(est - 180.0 / 220.0) < 0.1, s"est=$est")
  }

  test("nxs_simhash: near-identical token streams -> small hamming distance") {
    val a = (1 to 300).map(i => s"w$i")
    val b = a.updated(5, "CHANGED").updated(100, "ALSO")
    val c = (1 to 300).map(i => s"z$i")
    val df = Seq(a, b, c).toDF("tokens")
    val hs = df.select(nxs_simhash($"tokens")).as[Long].collect()
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(hs(0), hs(1)) <= 12, s"near pair hamming=${ham(hs(0), hs(1))}")
    assert(ham(hs(0), hs(2)) > 12, s"far pair hamming=${ham(hs(0), hs(2))}")
  }

  test("vec_cosine") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(vec_cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
    assert(math.abs(got(2) - math.sqrt(0.5)) < 1e-9)
  }

  test("SQL registration") {
    graft.functions.registerAll(spark)
    Seq("some text here").toDF("text").createOrReplaceTempView("t_expr_sql")
    val n = spark.sql(
      "SELECT size(nxs_tokenize(text)) AS n, nxs_simhash(nxs_tokenize(text)) FROM t_expr_sql")
      .collect()(0).getInt(0)
    assert(n == 1) // 'some' and 'here' are NLTK stopwords
    // full registration surface parses + evaluates
    val r = spark.sql(
      """SELECT size(nxs_band_keys(nxs_minhash(nxs_shingles(nxs_tokenize(text))))),
        |       size(nxs_winnow(nxs_tokenize(text))),
        |       size(nxs_winnow_pos(nxs_tokenize(text))),
        |       size(sign_lsh(array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT)))),
        |       size(delete_variants('abc'))
        |FROM t_expr_sql""".stripMargin).collect()(0)
    assert(r.getInt(0) == 16 && r.getInt(3) == 8)
    assert(r.getInt(4) == 7) // abc + 3 single + 3 double deletes (a b c ab...)
  }

  test("custom:<name> registry filter runs inside the Catalyst expression") {
    graft.text.CustomFilters.register("brit",
      s => Some(if (s == "colour") "color" else s))
    graft.text.CustomFilters.register("nodigits",
      s => if (s.nonEmpty && s.forall(_.isDigit)) None else Some(s))
    val df = Seq("Colour 123 Houses").toDF("text")
    val got = df.select(nxs_tokenize_filters($"text", lit("en"),
      Seq("normalizer", "custom:brit", "custom:nodigits", "stemmer")))
      .as[Seq[String]].collect()
    // brit mutates colour->color (then stemmed), nodigits discards "123"
    assert(got(0) == Seq("color", "hous"))
    // matches the plain-Scala pipeline with the same config (the memo and
    // the Catalyst path must agree with direct filterToken calls)
    val cfg = PipelineConfig(
      filters = Seq("normalizer", "custom:brit", "custom:nodigits", "stemmer"),
      stopwordsEnabled = true)
    assert(TextPipeline.tokens("Colour 123 Houses", cfg).toSeq == Seq("color", "hous"))
    // an unregistered name fails fast on executors, never a silent pass-through
    val err = intercept[Exception] {
      df.select(nxs_tokenize_filters($"text", lit("en"), Seq("custom:nope")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("not registered")), msgs(err).mkString("|"))
  }

  test("vec_cosine: ragged rows degrade to null (codegen path), not a crash") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f), Seq(0.5f)), // dimension mismatch -> null
      (3L, Seq(0.0f, 0.0f), Seq(0.0f, 1.0f))) // zero vector -> 0.0
      .toDF("id", "a", "b")
    val got = df.select($"id", vec_cosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).contains(1.0))
    assert(got(2L).isEmpty, got.toString) // null, job survives
    assert(got(3L).contains(0.0))
    // whole relation still evaluates (one bad row cannot kill the job)
    assert(df.select(vec_cosine($"a", $"b")).count() == 3)
  }

  test("sign_lsh: over-cap dims use the allocation-free derived path, deterministically") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def vec(dim: Int): org.apache.spark.sql.catalyst.util.ArrayData =
      new GenericArrayData((0 until dim).map(i => (i % 7 - 3).toFloat: Any).toArray)
    // big dim (> MAX_CACHED_DIM = 4096): no interning, same value on repeat
    val big1 = SignLshExpr.buckets(vec(5000), 16, 8, 42L)
    val big2 = SignLshExpr.buckets(vec(5000), 16, 8, 42L)
    assert((0 until 8).forall(i => big1.getLong(i) == big2.getLong(i)))
    // cached ≡ derived: same mix chain, bit-identical keys for any dim
    for (dim <- Seq(1, 16, 64, 300)) {
      val cached = SignLshExpr.buckets(vec(dim), 16, 8, 42L)
      val derived = SignLshExpr.bucketsDerived(vec(dim), 16, 8, 42L)
      assert((0 until 8).forall(i => cached.getLong(i) == derived.getLong(i)),
        s"dim=$dim")
    }
  }

  test("expressions stay in WholeStageCodegen") {
    val df = spark.range(10).select(
      nxs_simhash(nxs_tokenize(concat(lit("text number "), $"id"))).as("h"))
    // "*(n)" node prefix = inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().length == 10)
  }
}
