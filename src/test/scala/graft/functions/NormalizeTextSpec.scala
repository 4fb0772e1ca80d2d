package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private def norm(ss: String*): Seq[String] =
    ss.toDF("t").select(TextFunctions.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq

  test("tag strip, entity unescape, order: entities survive as literals") {
    assert(norm("<b>Hi</b> &amp; <i>bye</i>") == Seq("Hi & bye"))
    // &lt;b&gt; unescapes AFTER tag-strip: the literal <b> text survives
    assert(norm("&lt;b&gt;code&lt;/b&gt;") == Seq("<b>code</b>"))
    assert(norm("A&quot;B&#39;C&nbsp;D") == Seq("A\"B'C D"))
  }

  test("smart punctuation, control chars, nbsp, whitespace collapse") {
    assert(norm("“x” – ‘y’ — z") ==
      Seq("\"x\" - 'y' - z"))
    assert(norm("a\u0001b\u0000c") == Seq("a b c"))
    assert(norm("a\u00a0b") == Seq("a b"))
    assert(norm("  a\t\tb \n c  ") == Seq("a b c"))
    assert(norm("") == Seq(""))
  }
}
