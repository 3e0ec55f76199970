package graft

import org.apache.spark.sql.functions._

/** EditVariants (the compiled F30 deletion-neighborhood kernel) must
  * equal the higher-order-function forms it replaced — including the
  * edge shapes the engine's 24-char keys rarely hit (empty, 1-char,
  * multi-byte code points, keys longer than the cap, nulls), so the
  * kernel is a drop-in for ANY caller. The SQL forms here are
  * byte-identical to Dedup's editVarsExpr/editVars2Expr at
  * EditKeyLen = 24.
  */
class EditVariantsSpec extends SparkSpec {

  private val cap = 24

  private val depth1Form =
    s"""array_distinct(concat(array(k),
       |  CASE WHEN length(k) >= 1 THEN
       |    transform(sequence(1, length(k)),
       |      i -> concat(substring(k, 1, i - 1),
       |                  substring(k, i + 1, $cap)))
       |  ELSE array() END))""".stripMargin

  private val depth2Form =
    s"""array_distinct(concat($depth1Form,
       |  CASE WHEN length(k) >= 2 THEN
       |    flatten(transform(sequence(1, length(k)),
       |      i -> transform(filter(sequence(1, length(k)), j -> j > i),
       |        j -> concat(substring(k, 1, i - 1),
       |                    substring(k, i + 1, j - i - 1),
       |                    substring(k, j + 1, $cap)))))
       |  ELSE array() END))""".stripMargin

  private val keys: Seq[String] = Seq(
    "hello world title key 24",       // exactly 24 chars
    "a",                              // single char
    "ab",                             // two chars (one 2-deletion)
    "",                               // empty: identity only
    "aaaa",                           // heavy dedup (all deletions equal)
    "héllo wörld ünïcode",            // 2-byte code points
    "日本語のテキスト",                  // 3-byte code points
    "mixed 日本 and ascii",            // mixed widths
    "this key is far longer than the 24-char cap truncates", // over-cap
    "tab\tand\nnewline chars",        // control chars
    null)                             // null key → [null]

  private def check(depth: Int, form: String): Unit = {
    val df = spark.createDataFrame(
        keys.map(Tuple1(_))).toDF("k")
      .select(col("k"), expr(form).as("want"),
        graft.functions.EditVariants.of(col("k"), depth, cap).as("got"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"depth $depth key=${r.get(0)}: want=${r.get(1)} got=${r.get(2)}")
    }
  }

  test("depth-1 kernel equals the HOF form, order and dedup included") {
    check(1, depth1Form)
  }

  test("depth-2 kernel equals the HOF form, order and dedup included") {
    check(2, depth2Form)
  }

  test("kernel matches the HOF forms on the real editKey distribution") {
    // the actual F30 keys at sf0.001: lowercased trimmed 24-char
    // prefixes of document text — the distribution the query runs on
    val k = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(expr(s"substring(lower(trim(text)), 1, $cap)").as("k"))
    Seq(1 -> depth1Form, 2 -> depth2Form).foreach { case (d, form) =>
      val bad = k.select(expr(form).as("want"),
          graft.functions.EditVariants.of(col("k"), d, cap).as("got"))
        .filter(not(col("want") <=> col("got"))).count()
      assert(bad == 0, s"depth $d: $bad keys diverge")
    }
  }

  test("variant counts stay within the 301 depth-2 bound at 24 chars") {
    val n = graft.functions.EditVariants
      .compute(org.apache.spark.unsafe.types.UTF8String
        .fromString("abcdefghijklmnopqrstuvwx"), 2, cap).numElements()
    assert(n == 1 + 24 + 24 * 23 / 2, s"expected 301 distinct, got $n")
  }
}
