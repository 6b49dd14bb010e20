package graft

import graft.functions.UrlFunctions
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the URL canonicalizer — laws that must hold for
  * ANY structurally-valid URL, not just the gated plant: idempotence
  * (canonicalizing a canonical URL changes nothing — the defining
  * property of a normal form; a rule that only half-fires would break
  * it), host stability under the raw-variant dressings the plant
  * models, and the hex-parse law behind the md5-keyed theta sketch. */
class UrlPropertySpec extends AnyFunSuite {
  import TestSpark._

  private val scheme = Gen.oneOf("http", "https", "HTTP", "Https")
  private val hostG = for {
    user <- Gen.oneOf("", "u@", "User:Pw@")
    www <- Gen.oneOf("", "www.", "WWW.")
    a <- Gen.choose(1, 8); b <- Gen.choose(1, 6)
    h1 <- Gen.listOfN(a, Gen.alphaNumChar).map(_.mkString)
    h2 <- Gen.listOfN(b, Gen.alphaChar).map(_.mkString)
    cased <- Gen.oneOf[String => String](
      (s: String) => s, (s: String) => s.toUpperCase)
  } yield user + cased(s"$www$h1.$h2")
  private val port = Gen.oneOf("", ":80", ":443", ":8080", ":9")
  private val path = for {
    n <- Gen.choose(0, 3)
    // path segments may contain literal '&' (a legal RFC 3986
    // sub-delim) — the tracking rules must never rewrite it, EVEN
    // when the segment textually matches the tracking class
    // ('&utm_a=1' — the r15 ADVICE divergence: an unscoped rule
    // swallowed the rest of the path and the whole query)
    segs <- Gen.listOfN(n, Gen.oneOf(
      Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
      Gen.const("a&b"), Gen.const("x&utm=1"),
      Gen.const("x&utm_a=1"), Gen.const("p&fbclid=9")))
    trail <- Gen.oneOf("", "/", "//")
  } yield (if (segs.isEmpty) "" else segs.mkString("/", "/", "")) + trail
  private val param = Gen.oneOf("id=3", "Q=Vv", "utm_source=x", "utm_medium=m",
    "fbclid=z", "gclid=g", "a=1", "next=/x/", "r=/a/?b")
  private val query = for {
    n <- Gen.choose(0, 4)
    ps <- Gen.listOfN(n, param)
  } yield if (ps.isEmpty) "" else ps.mkString("?", "&", "")
  private val frag = Gen.oneOf("", "#x", "#sec2")
  private val urlG: Gen[String] = for {
    s0 <- scheme; h <- hostG; p0 <- port; pa <- path; q <- query; f <- frag
  } yield s"$s0://$h$p0$pa$q$f"

  private def canonBatch(urls: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    urls.toDF("u")
      .select(UrlFunctions.canonicalize(col("u")).as("c"),
        UrlFunctions.host(col("u")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("canonicalization is idempotent over random structured URLs") {
    val urls = Gen.listOfN(300, urlG).sample.getOrElse(Seq.empty)
    assert(urls.nonEmpty)
    val once = canonBatch(urls)
    val twice = canonBatch(once.map(_._1))
    val broken = urls.lazyZip(once).lazyZip(twice).collect {
      case (raw, (c1, h1), (c2, h2)) if c1 != c2 || h1 != h2 =>
        s"$raw -> $c1/$h1 -> $c2/$h2"
    }
    assert(broken.isEmpty, s"non-idempotent:\n${broken.take(5).mkString("\n")}")
  }

  test("canonical form never retains tracking params, fragments, or default ports") {
    val urls = Gen.listOfN(300, urlG).sample.getOrElse(Seq.empty)
    val bad = canonBatch(urls).map(_._1).filter { c =>
      // tracking-param residue is a QUERY-scope law: path segments
      // legitimately carry 'utm_'-looking text (see the generator)
      val qry = c.dropWhile(_ != '?')
      c.contains("#") || qry.contains("utm_") || qry.contains("fbclid") ||
        qry.contains("gclid") || c.endsWith("?") ||
        c.matches("^http://[^/:?]*:80([/?].*)?$") ||
        c.matches("^https://[^/:?]*:443([/?].*)?$") ||
        c.matches("^https?://www\\..*")
    }
    assert(bad.isEmpty, s"residue survived: ${bad.take(5)}")
  }

  test("path text is byte-preserved: only query/fragment/authority rules fire") {
    // the direct regression pin for the r15 ADVICE bug: a tracking
    // segment in the PATH must survive, and the query must keep its
    // non-tracking params
    val pairs = Seq(
      "http://a.com/x&utm_a=1/y?id=3" -> "http://a.com/x&utm_a=1/y?id=3",
      "http://a.com/x&utm_a=1/y?utm_b=2&id=3" -> "http://a.com/x&utm_a=1/y?id=3",
      "https://WWW.A.com/p&fbclid=9?gclid=x" -> "https://a.com/p&fbclid=9",
      "http://a.com/x&utm_a=1/" -> "http://a.com/x&utm_a=1")
    val got = canonBatch(pairs.map(_._1)).map(_._1)
    pairs.map(_._2).lazyZip(got).lazyZip(pairs.map(_._1)).foreach {
      case (want, have, raw) => assert(have == want, s"canon($raw)")
    }
  }

  test("the 12-hex-digit theta parse matches BigInt on md5 prefixes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (1 to 200).map(i => s"shingle token run $i")
    val out = keys.toDF("s").select(md5($"s").as("h_k"))
      .select($"h_k",
        (1 to 12).map { i =>
          (expr(s"position(substring(h_k, $i, 1), '0123456789abcdef')") - 1)
            .cast("long") * lit(1L << (4 * (12 - i)))
        }.reduce(_ + _).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.foreach { case (h, v) =>
      assert(v == java.lang.Long.parseLong(h.take(12), 16),
        s"hex parse diverged on $h")
    }
  }
}
