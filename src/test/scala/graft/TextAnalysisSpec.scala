package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Text analysis: tokenization, quality, language-ID, fingerprints. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c.as("v")).as[T].head()

  test("tokens and counts") {
    assert(one[Seq[String]](TextAnalysis.tokens(col("text")), "Hello, World 42!") ==
      Seq("hello", "world", "42"))
    assert(one[Int](TextAnalysis.tokenCount(col("text")), "a b  c") == 3)
    assert(one[Int](TextAnalysis.tokenCount(col("text")), "") == 0)
  }

  test("subword token count: letter runs + digit runs + symbols") {
    // "don't" -> don + ' + t ; "42nd" -> 42 + nd ; "!" -> 1
    assert(one[Int](TextAnalysis.subwordTokenCount(col("text")), "don't 42nd!") == 6)
  }

  test("alphaRatio and stopwordRatio bounds") {
    assert(one[Double](TextAnalysis.alphaRatio(col("text")), "abc def") == 1.0)
    assert(one[Double](TextAnalysis.alphaRatio(col("text")), "!!!") == 0.0)
    val sr = one[Double](TextAnalysis.stopwordRatio(col("text")), "the cat in the hat")
    assert(math.abs(sr - 3.0 / 5.0) < 1e-9) // the, in, the
  }

  test("qualityScore stays in [0, 1]") {
    val texts = Seq("", "!!!", "the quick brown fox is in the yard",
      "x" * 500, "a b c d e f g h")
    texts.foreach { t =>
      val q = one[Double](TextAnalysis.qualityScore(col("text")), t)
      assert(q >= 0.0 && q <= 1.0, s"quality($t) = $q")
    }
  }

  test("langId identifies real sentences") {
    val cases = Seq(
      "the cat sat on the mat and it is happy that you see it" -> "en",
      "el perro que corre en la casa no se detiene y es un amigo" -> "es",
      "der hund und die katze sind mit den kindern in den garten" -> "de",
      "le chien et les chats sont dans le jardin avec du pain et une pomme" -> "fr",
      "这是一个中文句子" -> "zh",
      "zzz qqq xxx" -> "und")
    cases.foreach { case (text, expected) =>
      assert(one[String](TextAnalysis.langId(col("text")), text) == expected,
        s"langId($text)")
    }
  }

  test("normalizeText collapses separators; fingerprint is stable under reformat") {
    assert(one[String](TextAnalysis.normalizeText(col("text")), "  A,b!!c   d  ") == "a b c d")
    val fp1 = one[String](TextAnalysis.fingerprint(col("text")), "Hello,   World!")
    val fp2 = one[String](TextAnalysis.fingerprint(col("text")), "hello world")
    assert(fp1 == fp2)
    assert(fp1.matches("[0-9a-f]{32}"))
  }

  test("rollingHash matches reference implementation and is order-sensitive") {
    val h1 = one[Long](TextAnalysis.rollingHash(col("text")), "alpha beta gamma")
    val h2 = one[Long](TextAnalysis.rollingHash(col("text")), "gamma beta alpha")
    val h1b = one[Long](TextAnalysis.rollingHash(col("text")), "Alpha  BETA gamma!")
    assert(h1 != h2) // order matters (unlike a bag-of-words hash)
    assert(h1 == h1b) // normalization-invariant
    // Reference recomputation: JVM md5 on single tokens, first 8 hex
    // chars as the 31-bit seed — independent of the Column implementation.
    val m = 2147483647L
    val tokHashes = Seq("alpha", "beta", "gamma").map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % m
    }
    def poly(mult: Long) =
      tokHashes.foldLeft(0L)((acc, h) => java.lang.Math.floorMod(acc * mult + h, m))
    assert(h1 == poly(31L) * 2147483648L + poly(131L))
  }
}
