package graft.ice

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck model of the HAVING dialect translation
  * ([[ManifestExport.havingToDuckDb]]): one predicate AST is rendered
  * BOTH the way Spark's `Expression.sql` spells it (backtick-quoted
  * identifiers with doubled-backtick escapes — or bare when simple —
  * and typed numeric literal suffixes `L`/`S`/`Y`/`D`/`BD`) and the way
  * DuckDB expects it (double-quoted identifiers, bare literals); the
  * translator applied to the Spark form must equal the DuckDB form
  * exactly, whatever mix of quoting, escapes, exponents, negatives, and
  * suffix-looking STRING content the generator produces. */
class ManifestHavingPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private sealed trait E
  private case class Id(name: String, quoted: Boolean) extends E
  private case class Num(text: String, suffix: String) extends E
  private case class Str(s: String) extends E
  private case class Cmp(l: E, op: String, r: E) extends E
  private case class Logic(l: E, op: String, r: E) extends E

  private def spark(e: E): String = e match {
    case Id(n, true) => "`" + n.replace("`", "``") + "`"
    case Id(n, false) => n
    case Num(t, s) => t + s
    case Str(s) => "'" + s.replace("'", "''") + "'"
    case Cmp(l, op, r) => s"(${spark(l)} $op ${spark(r)})"
    case Logic(l, op, r) => s"(${spark(l)} $op ${spark(r)})"
  }

  private def duck(e: E): String = e match {
    case Id(n, true) => "\"" + n.replace("\"", "\"\"") + "\""
    case Id(n, false) => n
    case Num(t, _) => t
    case Str(s) => "'" + s.replace("'", "''") + "'"
    case Cmp(l, op, r) => s"(${duck(l)} $op ${duck(r)})"
    case Logic(l, op, r) => s"(${duck(l)} $op ${duck(r)})"
  }

  // bare identifiers: start with a letter, word chars only, and must not
  // END in a way that glues onto an operator — any such name Spark would
  // render bare; anything richer gets backticks
  private val genBare: Gen[Id] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.oneOf(Gen.alphaNumChar, Gen.const('_'))).map(_.mkString)
  } yield Id(s"$h$t", quoted = false)
  // quoted identifiers: anything printable, including backticks, double
  // quotes, digits-with-suffix lookalikes ("2L"), spaces
  private val genQuoted: Gen[Id] = Gen.nonEmptyListOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('`', '"', ' ', '.', '-', 'L', 'D'),
    Gen.const('`'))).map(cs => Id(cs.mkString.take(8), quoted = true))
  private val genNum: Gen[Num] = for {
    neg <- Gen.oneOf("", "-")
    whole <- Gen.choose(0, 9999)
    frac <- Gen.option(Gen.choose(0, 99).map(f => s".$f"))
    exp <- Gen.option(Gen.oneOf("E5", "E-3", "E+7")).map(
      e => if (frac.isEmpty) None else e) // exponents only on decimals here
    suffix <- Gen.oneOf("", "L", "S", "Y", "D", "BD")
  } yield Num(s"$neg$whole${frac.getOrElse("")}${exp.getOrElse("")}",
    suffix)
  // strings: suffix-looking digits, quotes, backticks — all untouchable
  private val genStr: Gen[Str] = Gen.listOfN(6, Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('\'', '`', '"', ' ', '.')))
    .map(cs => Str(cs.mkString))

  private val genLeaf: Gen[E] =
    Gen.oneOf(genBare, genQuoted, genNum, genStr)
  private val genCmp: Gen[E] = for {
    l <- genLeaf; r <- genLeaf
    op <- Gen.oneOf("=", "<>", ">", ">=", "<", "<=")
  } yield Cmp(l, op, r)
  private def genExpr(depth: Int): Gen[E] =
    if (depth <= 0) genCmp
    else Gen.frequency(
      2 -> genCmp,
      3 -> (for {
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
        op <- Gen.oneOf("AND", "OR")
      } yield Logic(l, op, r)))

  test("translate(sparkRender(ast)) == duckRender(ast) for arbitrary predicates") {
    check(Prop.forAll(genExpr(3)) { ast =>
      val got = ManifestExport.havingToDuckDb(spark(ast))
      val want = duck(ast)
      if (got != want)
        println(s"spark: ${spark(ast)}\n  got: $got\n want: $want")
      got == want
    })
  }

  test("translated output never leaks a backtick or a typed suffix outside strings") {
    check(Prop.forAll(genExpr(3)) { ast =>
      val out = ManifestExport.havingToDuckDb(spark(ast))
      // strip string literals AND double-quoted identifiers (their
      // content is allowed to look like anything), then look for leaks
      val noStrings = out.replaceAll("'(?:''|[^'])*'", "''")
        .replaceAll("\"(?:\"\"|[^\"])*\"", "\"\"")
      // a typed-suffix LEAK is a NUMERIC LITERAL still wearing its
      // suffix — the token must start at a non-word boundary (a bare
      // identifier like C_G2Y legitimately ends in digit+Y and is fine)
      val suffixLeak =
        """(?<![A-Za-z0-9_])\d+(?:\.\d+)?(?:E[+-]?\d+)?(?:BD|[DLSY])\b""".r
      !noStrings.contains('`') && suffixLeak.findFirstIn(noStrings).isEmpty
    })
  }
}
