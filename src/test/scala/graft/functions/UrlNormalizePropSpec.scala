package graft.functions

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for url_normalize against an INDEPENDENT parser —
  * java.net.URI — over generated URL-safe components: the Column
  * implementation is a regex decomposition, so its structural claims
  * (scheme/host extraction, port handling, query filtering/sorting) are
  * checked here by a parser that shares none of its code. Generated
  * components stay in the URL-safe subset both parsers define identically;
  * percent-encoding and exotic authority forms are out of the op's
  * documented scope. */
class UrlNormalizePropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val TrackRe = "^(utm_[^=&]*|gclid|fbclid|msclkid)(=|$)".r

  private case class Parts(scheme: String, userinfo: Option[String],
      host: String, port: Int, trailDot: Boolean, path: String,
      params: Seq[String], frag: Option[String]) {
    def render: String = {
      val hp = host + (if (trailDot) "." else "") +
        (if (port >= 0) s":$port" else "")
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      scheme + "://" + userinfo.map(_ + "@").getOrElse("") + hp + path + q +
        frag.map("#" + _).getOrElse("")
    }
  }

  private def mixCase(s: String, flips: Int): Gen[String] =
    Gen.listOfN(flips, Gen.choose(0, math.max(0, s.length - 1))).map { idx =>
      val arr = s.toCharArray
      idx.foreach(i => arr(i) = arr(i).toUpper)
      new String(arr)
    }

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val genParam: Gen[String] = Gen.frequency(
    (4, for { k <- word; v <- Gen.option(word) }
      yield v.fold(k)(k + "=" + _)),
    (2, word.map(k => s"utm_$k=x")),
    (1, Gen.oneOf("gclid=abc", "fbclid=1", "msclkid=z", "utm_source", "")),
    (1, word.map(k => s"${k}utm_x=kept"))) // tracking prefix NOT at start

  private val genParts: Gen[Parts] = for {
    scheme0 <- Gen.oneOf("http", "https")
    scheme <- mixCase(scheme0, 2)
    // userinfo is case-sensitive (RFC 3986 §6.2.2.1): generate mixed case
    // and assert it survives verbatim while the host lowercases
    userinfo <- Gen.option(for {
      u <- word.flatMap(mixCase(_, 2))
      pw <- Gen.option(word)
    } yield pw.fold(u)(u + ":" + _))
    hostLabels <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, word))
    host <- mixCase(hostLabels.mkString("."), 3)
    port <- Gen.oneOf(-1, -1, 80, 443, 8080, 65535)
    trailDot <- Gen.oneOf(true, false, false)
    segs <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, word))
    path = if (segs.isEmpty) "" else segs.mkString("/", "/", "")
    params <- Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, genParam))
    frag <- Gen.option(word)
  } yield Parts(scheme, userinfo, host, port, trailDot, path, params, frag)

  private def normalize(urls: Seq[String]): Seq[String] = {
    val out = urls.toDF("url").select(url_normalize($"url")).collect()
    out.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("structural agreement with java.net.URI over generated URLs") {
    val cases = scala.collection.mutable.ArrayBuffer.empty[Parts]
    graft.SeededGen.forAll(genParts, 300)(cases += _)
    val urls = cases.map(_.render).toSeq
    val got = normalize(urls)
    cases.zip(got).foreach { case (p, norm) =>
      assert(norm != null, p.render)
      val uri = new java.net.URI(norm)
      // scheme + host: lowercase of the input's, trailing dot stripped
      assert(uri.getScheme == p.scheme.toLowerCase, p.render)
      assert(uri.getHost == p.host.toLowerCase, s"${p.render} -> $norm")
      // userinfo verbatim (case preserved), host lowercased around it
      assert(Option(uri.getRawUserInfo) == p.userinfo,
        s"${p.render} -> $norm")
      // fragment always dropped
      assert(uri.getFragment == null, norm)
      // default ports dropped, others kept (URI reports -1 for absent)
      val defaultPort =
        (p.scheme.toLowerCase == "http" && p.port == 80) ||
          (p.scheme.toLowerCase == "https" && p.port == 443)
      val expectedPort = if (p.port < 0 || defaultPort) -1 else p.port
      assert(uri.getPort == expectedPort, s"${p.render} -> $norm")
      // path preserved, except empty -> "/"
      assert(uri.getRawPath == (if (p.path.isEmpty) "/" else p.path),
        s"${p.render} -> $norm")
      // query = input params minus tracking/empties, sorted, multiset-kept
      val kept = p.params.filter(x =>
        x.nonEmpty && TrackRe.findFirstIn(x).isEmpty).sorted
      val gotQ = Option(uri.getRawQuery).map(_.split("&").toSeq.sorted)
        .getOrElse(Seq.empty)
      assert(gotQ == kept, s"${p.render} -> $norm")
    }
  }

  test("percent-encoding normalization goldens (RFC 3986 §6.2.2.2)") {
    val cases = Seq(
      // unreserved escapes decode; reserved escapes uppercase their hex
      "http://h/%7ea%2f%4B" -> "http://h/~a%2FK",
      // %25 is '%' itself - reserved, must NOT decode (idempotence)
      "http://h/a%25b" -> "http://h/a%25b",
      // malformed escapes pass through verbatim, including a trailing '%'
      "http://h/%zz%4" -> "http://h/%zz%4",
      "http://h/x%" -> "http://h/x%",
      // escapes normalize in query params too, before the sort
      "http://h/p?b=%41&a=%2f" -> "http://h/p?a=%2F&b=A",
      // and in the host (decoded unreserved rejoins the lowercased host)
      "http://EX%41MPLE.com/" -> "http://example.com/")
    val got = normalize(cases.map(_._1))
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
    // idempotent on every golden
    assert(normalize(got) == got)
  }

  test("idempotence over generated URLs") {
    val cases = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SeededGen.forAll(genParts, 200)(p => cases += p.render)
    val once = normalize(cases.toSeq)
    assert(normalize(once) == once)
  }
}
