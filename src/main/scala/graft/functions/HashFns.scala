package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * Everything dedup/LSH-shaped needs a hash that Spark and the DuckDB
  * oracle compute IDENTICALLY. md5 is the one digest both engines share
  * bit-for-bit, so the primitive is:
  *
  *   h60(s) = first 15 hex chars of md5(s), parsed as an unsigned int
  *
  * 60 bits fits a signed 64-bit long in both engines
  * (Spark: conv(substr(md5(s),1,15),16,10)::long;
  *  DuckDB: CAST(('0x' || substr(md5(s),1,15)) AS UBIGINT)::BIGINT).
  */
object HashFns {

  /** 60-bit md5-derived hash of a string column (Spark side). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL-registry descriptor for `graft_h60` — the same hash exposed to
    * SQL users via `SparkSessionExtensions` (a builder over builtin
    * expressions; no custom Expression needed). */
  val h60Descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression) = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BinaryType, LongType}
    (FunctionIdentifier("graft_h60"),
      new ExpressionInfo(HashFns.getClass.getName, "graft_h60"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_h60(s) takes exactly 1 argument")
        Cast(Conv(Substring(Md5(Cast(children.head, BinaryType)),
          Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)
      })
  }

  /** DuckDB SQL fragment computing the identical h60 of `expr`. */
  def h60Sql(expr: String): String =
    s"CAST(CAST(('0x' || substr(md5($expr), 1, 15)) AS UBIGINT) AS BIGINT)"

  /** Driver-side (Scala) h60 — same digest, for precomputing literal
    * weights that appear verbatim in both the Spark plan and oracle SQL. */
  def h60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Distinct n-word shingles from an ALREADY-MATERIALIZED words-array
    * column. Callers must pass an attribute (a `split` aliased in its
    * own projection), not an inline `split(...)`: expressions inside
    * higher-order-function lambdas get no subexpression elimination, so
    * an inline split is re-evaluated by every `element_at` — O(W²)
    * string work per document (the r5 q_text_repetition lesson; fixing
    * the shingle builders the same way cut the jaccard/decontaminate
    * family ~2× at sf0.1). CollapseProject never inlines aliases into
    * lambda bodies, so the materialized attribute is stable.
    */
  def shinglesFromWords(words: Column, n: Int): Column =
    array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", (1 to n).map(k => element_at(words, i + k)): _*)))
        .otherwise(array().cast("array<string>")))

  /** Distinct 3-word shingles of a whitespace-tokenized text column.
    * Docs with fewer than 3 words produce no shingles (mirrored by the
    * oracle's len(words) >= 3 guard). Prefer [[shinglesFromWords]] over
    * a materialized words attribute in hot paths (see its scaladoc).
    */
  def wordShingles(text: Column): Column =
    shinglesFromWords(split(text, " "), 3)

  /** DuckDB fragment: distinct 3-word shingles as a list (1-indexed). */
  def wordShinglesSql(textExpr: String): String =
    s"""list_distinct(CASE WHEN len(string_split($textExpr, ' ')) >= 3
       | THEN list_transform(generate_series(1, len(string_split($textExpr, ' ')) - 2),
       |   i -> string_split($textExpr, ' ')[i] || ' ' || string_split($textExpr, ' ')[i+1] || ' ' || string_split($textExpr, ' ')[i+2])
       | ELSE [] END)""".stripMargin.replace("\n", " ")

  /** Distinct n-word shingles for arbitrary n (decontamination wants
    * longer grams than near-dup: a shared 3-gram is usually just a
    * common phrase, a shared 5+-gram is copied text). Docs with fewer
    * than n words produce no shingles, mirrored by the oracle guard.
    * Prefer [[shinglesFromWords]] in hot paths (see its scaladoc). */
  def wordShinglesN(text: Column, n: Int): Column =
    shinglesFromWords(split(text, " "), n)

  /** DuckDB fragment: distinct n-word shingles as a list (1-indexed). */
  def wordShinglesNSql(textExpr: String, n: Int): String = {
    val w = s"string_split($textExpr, ' ')"
    val gram = (0 until n).map(k => s"$w[i+$k]").mkString(" || ' ' || ")
    s"""list_distinct(CASE WHEN len($w) >= $n
       | THEN list_transform(generate_series(1, len($w) - ${n - 1}), i -> $gram)
       | ELSE [] END)""".stripMargin.replace("\n", " ")
  }
}
