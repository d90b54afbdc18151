package graft.search

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, levenshtein}
import org.scalatest.funsuite.AnyFunSuite

/** The 36 distance goldens from /root/reference/src/tests/t_levdist.c:31-66,
  * evaluated through Spark's built-in `levenshtein` expression (which is the
  * engine's fuzzy-resolve primitive — no custom code needed, SURVEY.md F1). */
class LevenshteinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val cases: Seq[(String, String, Int)] = Seq(
    ("kitten", "kitten", 0), ("kitten", "sitten", 1), ("sitting", "kitten", 3),
    ("cat", "chat", 1), ("cat", "cactus", 3), ("cat", "gato", 2),
    ("", "", 0), ("", "a", 1), ("a", "", 1), ("a", "b", 1),
    ("aba", "a", 2), ("aabcc", "bccdd", 4),
    ("ab", "ac", 1), ("ac", "bc", 1), ("abc", "axc", 1), ("abc", "def", 3),
    ("aabbcd", "aabcd", 1), ("aabcd", "aabbcd", 1), ("aaabccc", "", 7),
    ("ABCDEF", "abcdef", 6), ("ABCDEF", "AbCdEf", 3),
    ("hello", "hallo", 1), ("variable", "valuable", 2), ("leaf", "leaves", 3),
    ("ab?cd?ef?", "!ab!cd!ef!", 4), ("john smith", "johnathan smith", 5),
    ("levenshtein", "frankenstein", 6), ("123456789", "101010101", 8),
    ("something", "different", 8))

  test("t_levdist goldens via Spark levenshtein") {
    val got = cases.toDF("a", "b", "exp")
      .select(levenshtein(col("a"), col("b")).as("d"), col("exp"))
      .as[(Int, Int)].collect()
    got.zip(cases).foreach { case ((d, exp), (a, b, _)) =>
      assert(d == exp, s"levenshtein($a,$b)=$d expected $exp")
    }
  }
}
