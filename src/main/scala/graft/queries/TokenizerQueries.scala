package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Round-6 tokenizer-training surface: the q49/q93/q94/q95 tokenizer-prep
  * spine (vocab, coverage, tokenize, pack) learns an actual trained
  * artifact — a BPE merge table. The merge sequence is integer/string
  * exact (counts + binary string tie-breaks), so a second engine replays
  * it bit-for-bit: the oracle below is the SAME eight merge rounds
  * unrolled in SQL, both engines applying merges with literal
  * left-to-right string replace over ␟-wrapped symbol strings (see
  * [[Bpe]]).
  */
object TokenizerQueries {

  type Q = (SparkSession, String) => DataFrame

  private val NumMerges = 8

  /** q105 — BPE merge learning over the documents word dict: top-8 merges
    * with (count DESC, pair lexicographic) tie-breaks. The corpus is
    * touched ONCE (the word-frequency aggregate); every round after that
    * is dict-scale — a pair-count partial/final aggregate and a 1-row
    * argmax collect, driver-paced like the CC fixpoint.
    */
  val q105_bpe_merges: Q = (s, d) => {
    val dict = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    Bpe.learnMerges(dict, "word", "cnt", NumMerges).orderBy("merge_rank")
  }

  /** The same NumMerges rounds unrolled: dN = the dict after N merges,
    * bN = round N's winning pair. DuckDB's replace is left-to-right
    * non-overlapping like Spark's, and chr(31) sits below every printable
    * codepoint, so `ORDER BY n DESC, p` (p = lhs||chr(31)||rhs) is
    * exactly the (count DESC, lhs, rhs) tie-break.
    */
  val q105Sql: String = {
    def lhsOf(p: String) = s"string_split($p, chr(31))[1]"
    def rhsOf(p: String) = s"string_split($p, chr(31))[2]"
    val rounds = (1 to NumMerges).map { r =>
      val dPrev = s"d${r - 1}"
      val dNext =
        if (r == NumMerges) "" // the final dict is never read
        else s""",
          |d$r AS (
          |  SELECT cnt, replace(s,
          |      chr(31) || ${lhsOf("p")} || chr(31) || chr(31) ||
          |        ${rhsOf("p")} || chr(31),
          |      chr(31) || ${lhsOf("p")} || ${rhsOf("p")} || chr(31)) AS s
          |  FROM $dPrev, b$r)""".stripMargin
      s"""p$r AS (
         |  SELECT p, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, unnest([l[i] || chr(31) || l[i+1]
         |                        for i in generate_series(1, len(l)-1)]) AS p
         |    FROM (SELECT cnt,
         |            string_split(s[2:len(s)-1], chr(31) || chr(31)) AS l
         |          FROM $dPrev))
         |  GROUP BY p),
         |b$r AS (SELECT p, n FROM p$r ORDER BY n DESC, p LIMIT 1)$dNext"""
        .stripMargin
    }.mkString(",\n")
    val readout = (1 to NumMerges).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_rank, ${lhsOf("p")} AS lhs,
         |  ${rhsOf("p")} AS rhs, n FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d0 AS (
       |  SELECT cnt,
       |    chr(31) || array_to_string(
       |      [word[i] for i in generate_series(1, len(word))],
       |      chr(31) || chr(31)) || chr(31) AS s
       |  FROM (
       |    SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
       |      FROM documents)
       |    WHERE len(word) > 0 GROUP BY word)),
       |$rounds
       |SELECT * FROM (
       |$readout)
       |ORDER BY merge_rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q105_bpe_merges" -> q105_bpe_merges)

  val oracleSql: Map[String, String] = Map(
    "q105_bpe_merges" -> q105Sql)
}
