package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).
 * Schema matches BASELINE.json → input_hint:
 *   (url string, warc_ts timestamp, html binary, text string, lang string)
 *
 * Structure: `nClusters` clusters; cluster kind/size/text derived purely from
 * (seed, clusterId, memberIdx) via splitmix64 — fully distributed generation
 * (spark.range over clusters, flatMap members), no driver-side materialize,
 * no wall-clock, replay-stable at any parallelism.
 *
 * Planted duplicate kinds (ground truth in `truth`):
 *   exact       — byte-identical text, different url
 *   near        — 1–10% token edits (MinHash/LSH target)
 *   fuzzy       — character-level perturbations (SimHash target)
 *   substring   — >=60-token shared run inside otherwise distinct pages
 *                 (winnowing pass target)
 *   boilerplate — shared template + unique payload; cluster 0 is a large
 *                 hot-domain cluster to drive join skew
 */
object SyntheticCorpus {

  final case class Config(
      nClusters: Int,
      seed: Long = 42L,
      hotClusterSize: Int = 64,
      sharedRunLen: Int = 80)

  final case class PageRow(
      url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
      text: String, lang: String)

  final case class TruthRow(url_a: String, url_b: String, kind: String)

  // --- deterministic RNG ---
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  @inline def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)
  @inline private def pick(h: Long, n: Int): Int = {
    val m = (h % n).toInt; if (m < 0) m + n else m
  }

  // --- vocabulary ---
  private val syll = Array("ba", "ce", "di", "fo", "gu", "ka", "le", "mi",
    "no", "pu", "ra", "se", "ti", "vo", "wu", "za", "ch", "th", "qu", "str")
  private val stop = Array("the", "a", "of", "to", "and", "in", "is", "for",
    "with", "on", "that", "by", "this", "it", "from", "or", "as", "at")

  def word(seed: Long, rank: Int): String = {
    val h = mix2(seed, 0x776f7264L + rank)
    val len = 2 + pick(h, 3)
    val sb = new StringBuilder
    var i = 0
    while (i <= len) { sb.append(syll(pick(mix2(h, i), syll.length))); i += 1 }
    sb.toString
  }

  /** Zipf-ish vocabulary sample: quadratic rank skew over 8192 words,
    * 25% chance of a real English stopword (exercises the stopword filter). */
  def sampleToken(seed: Long, h: Long): String = {
    if (pick(h, 4) == 0) stop(pick(mix(h), stop.length))
    else {
      val u = (mix(h) >>> 11).toDouble / (1L << 53).toDouble
      word(seed, (u * u * 8192).toInt)
    }
  }

  def kindOf(cfg: Config, c: Long): String = {
    if (c == 0) "boilerplate"
    else pick(mix2(cfg.seed, 0x6b696e64L + c), 100) match {
      case r if r < 70 => "singleton"
      case r if r < 76 => "exact"
      case r if r < 86 => "near"
      case r if r < 91 => "fuzzy"
      case r if r < 95 => "substring"
      case _ => "boilerplate"
    }
  }

  def sizeOf(cfg: Config, c: Long): Int = {
    val kind = kindOf(cfg, c)
    if (c == 0) cfg.hotClusterSize
    else if (kind == "singleton") 1
    else 2 + pick(mix2(cfg.seed, 0x73697a65L + c), 4) // 2..5
  }

  /** Base token stream of cluster c. */
  def baseTokens(cfg: Config, c: Long): Array[String] = {
    val h0 = mix2(cfg.seed, c)
    val len = 60 + pick(h0, 340)
    Array.tabulate(len)(i => sampleToken(cfg.seed, mix2(h0, i)))
  }

  private def render(tokens: Array[String]): String = {
    val sb = new StringBuilder(tokens.length * 7)
    var i = 0
    while (i < tokens.length) {
      if (i > 0) sb.append(' ')
      sb.append(tokens(i))
      if (i % 12 == 11) sb.append('.')
      i += 1
    }
    sb.toString
  }

  /** Token stream of member m of cluster c. */
  def memberTokens(cfg: Config, c: Long, m: Int): Array[String] = {
    val base = baseTokens(cfg, c)
    val kind = kindOf(cfg, c)
    val hm = mix2(mix2(cfg.seed, c), 0x6d656d62L + m)
    if (m == 0 || kind == "exact") return base
    kind match {
      case "near" =>
        // 1..10% token edits: substitute/insert/delete at seeded positions
        val pct = 1 + pick(hm, 10)
        val nEdits = math.max(1, base.length * pct / 100)
        val buf = scala.collection.mutable.ArrayBuffer.from(base)
        var e = 0
        while (e < nEdits && buf.nonEmpty) {
          val he = mix2(hm, e)
          val pos = pick(he, buf.length)
          pick(mix(he), 3) match {
            case 0 => buf(pos) = sampleToken(cfg.seed, mix2(he, 7))
            case 1 => buf.insert(pos, sampleToken(cfg.seed, mix2(he, 11)))
            case 2 => buf.remove(pos)
          }
          e += 1
        }
        buf.toArray
      case "fuzzy" =>
        // character-level perturbations on ~1.5% of tokens
        base.zipWithIndex.map { case (t, i) =>
          val ht = mix2(hm, i)
          if (pick(ht, 64) == 0 && t.length > 2) {
            val p = pick(mix(ht), t.length)
            t.substring(0, p) + ('a' + pick(mix2(ht, 3), 26)).toChar + t.substring(math.min(p + 1, t.length))
          } else t
        }
      case "substring" =>
        // unique prefix + shared run (first sharedRunLen of base) + unique suffix
        val run = base.take(cfg.sharedRunLen)
        val preLen = 40 + pick(hm, 120)
        val sufLen = 40 + pick(mix(hm), 120)
        val pre = Array.tabulate(preLen)(i => sampleToken(cfg.seed, mix2(mix(hm), i)))
        val suf = Array.tabulate(sufLen)(i => sampleToken(cfg.seed, mix2(mix2(hm, 5), i)))
        pre ++ run ++ suf
      case "boilerplate" =>
        // header/footer from base, unique payload in the middle
        val header = base.take(70)
        val footer = base.takeRight(60)
        val payLen = 50 + pick(hm, 150)
        val pay = Array.tabulate(payLen)(i => sampleToken(cfg.seed, mix2(mix2(hm, 9), i)))
        header ++ pay ++ footer
      case _ => base
    }
  }

  def urlOf(cfg: Config, c: Long, m: Int): String = {
    val dom = if (kindOf(cfg, c) == "boilerplate") "hot" else s"d${c % 97}"
    s"https://$dom.example.com/p$c/$m"
  }

  def pageOf(cfg: Config, c: Long, m: Int): PageRow = {
    val toks = memberTokens(cfg, c, m)
    val ts = new java.sql.Timestamp(
      1577836800000L + (mix2(mix2(cfg.seed, c), m) >>> 40)) // 2020-01-01 + <16.7e6 ms
    val lang = if (pick(mix2(cfg.seed, 0x6c616e67L + c), 20) == 0) "de" else "en"
    PageRow(urlOf(cfg, c, m), ts, null, render(toks), lang)
  }

  /** The pages table — distributed, deterministic. */
  def pages(spark: SparkSession, cfg: Config): DataFrame = {
    import spark.implicits._
    spark.range(cfg.nClusters)
      .flatMap { c =>
        (0 until sizeOf(cfg, c)).map(m => pageOf(cfg, c, m))
      }
      .toDF()
  }

  /** Ground-truth intra-cluster pairs (url_a < url_b). */
  def truth(spark: SparkSession, cfg: Config): DataFrame = {
    import spark.implicits._
    spark.range(cfg.nClusters)
      .flatMap { c =>
        val k = kindOf(cfg, c)
        val s = sizeOf(cfg, c)
        for { a <- 0 until s; b <- (a + 1) until s }
          yield TruthRow(urlOf(cfg, c, a), urlOf(cfg, c, b), k)
      }
      .toDF()
  }
}
